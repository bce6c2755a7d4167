package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Interval

/** Interval containment join: the bucketized equi-join must produce
  * exactly the naive BETWEEN-join answer for any bucket width, including
  * widths much smaller / larger than the intervals (correctness is
  * width-independent; only candidate volume varies).
  */
class IntervalSpec extends SparkSpec {

  test("bucketized join equals naive BETWEEN join across bucket widths") {
    val s = spark; import s.implicits._
    val rnd = new Random(17)
    val points = Seq.fill(400)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, rnd.nextLong().abs))
      .toDF("k", "t", "pid")
    val ivs = Seq.fill(60) {
      val start = rnd.nextInt(950).toLong
      (rnd.nextInt(10).toLong, start, start + rnd.nextInt(100).toLong, rnd.nextLong().abs)
    }.toDF("k", "lo", "hi", "iid")

    val naive = points.join(ivs, Seq("k"))
      .where(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("k", "pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty)

    for (width <- Seq(7L, 64L, 100000L)) {
      val got = Interval.joinContaining(points, ivs, "k", "t", "lo", "hi",
          payload = Seq("iid"), bucketWidth = width)
        .select("k", "pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === naive, s"width=$width")
    }
  }

  test("points in no interval drop out; overlapping intervals each match") {
    val s = spark; import s.implicits._
    val points = Seq((1L, 50L, 1L), (1L, 500L, 2L)).toDF("k", "t", "pid")
    val ivs = Seq((1L, 40L, 60L, 10L), (1L, 45L, 55L, 11L)).toDF("k", "lo", "hi", "iid")
    val got = Interval.joinContaining(points, ivs, "k", "t", "lo", "hi", Seq("iid"), 50L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 11L))) // point 2 matches nothing
  }
}
