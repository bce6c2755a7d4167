package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

case class Ev(event_id: Long, user_id: Long, event_type: String, ts: Timestamp, value: Double)

/** Structured Streaming twins: the same plan over a MemoryStream must
  * produce the batch answer (stream/batch unification), and watermarked
  * dropDuplicates must collapse replayed event_ids.
  */
class StreamingSpec extends SparkSpec {

  private def ev(id: Long, user: Long, typ: String, t: String, v: Double): Ev =
    Ev(id, user, typ, Timestamp.valueOf(t), v)

  private lazy val sample: Seq[Ev] = Seq(
    ev(1, 1, "click", "2024-01-01 10:05:00", 1.5),
    ev(2, 1, "click", "2024-01-01 10:55:00", 2.5),
    ev(3, 2, "view", "2024-01-01 10:10:00", 3.0),
    ev(4, 2, "click", "2024-01-01 11:01:00", 4.0),
    ev(5, 3, "view", "2024-01-01 11:59:00", 0.5),
    ev(6, 3, "view", "2024-01-01 12:00:00", 7.25))

  test("streaming windowedAgg over MemoryStream equals the batch twin") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[Ev]
    val q = EventStream.windowedAgg(stream.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("winagg").outputMode("complete").start()
    try {
      stream.addData(sample.take(3))
      q.processAllAvailable()
      stream.addData(sample.drop(3))
      q.processAllAvailable()

      val streamed = s.table("winagg")
        .orderBy("hour_start", "event_type").collect().map(_.toSeq).toSeq
      val batch = EventStream.windowedAgg(sample.toDF())
        .orderBy("hour_start", "event_type").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("watermarked dedupByEventId collapses replayed event_ids") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[Ev]
    val q = EventStream.dedupByEventId(stream.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      stream.addData(sample)
      q.processAllAvailable()
      stream.addData(sample.take(4)) // replay inside the watermark horizon
      q.processAllAvailable()
      val n = s.table("dedup").select("event_id").distinct().count()
      val total = s.table("dedup").count()
      assert(n === sample.size.toLong)
      assert(total === sample.size.toLong) // no duplicate rows emitted
    } finally q.stop()
  }

  test("batch eventsWindowed on real data matches the streaming plan run in batch mode") {
    val batchOp = Queries.eventsWindowed(spark, sf001)
      .orderBy("hour_start", "event_type").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val twin = EventStream.windowedAgg(graft.sources.Tables.events(spark, sf001))
      .orderBy("hour_start", "event_type").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(batchOp.toSeq === twin.toSeq)
  }
}
