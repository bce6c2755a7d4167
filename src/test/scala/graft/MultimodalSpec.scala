package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("partition-wise decode produces typed metadata + normalized features") {
    val media = Tables.documents(spark, sf001)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length === 500)
    decoded.foreach { d =>
      assert(d.n_bytes > 0)
      assert(d.width === d.n_bytes % 640 && d.height === d.n_bytes % 480)
      assert(d.n_frames === d.n_bytes % 16 + 1)
      assert(d.features.length === 8)
      assert(math.abs(d.features.sum - 1f) < 1e-3) // histogram normalized
      assert(d.thumb_w <= 64 && d.thumb_h <= 64)
      if (d.width > 0 && d.height > 0)
        assert(d.thumb_w > 0 && d.thumb_h > 0)
    }
  }

  test("fitWithin preserves aspect and bounds") {
    assert(Multimodal.fitWithin(640, 480, 64) === ((64, 48)))
    assert(Multimodal.fitWithin(480, 640, 64) === ((48, 64)))
    assert(Multimodal.fitWithin(32, 20, 64) === ((32, 20))) // no upscale
    assert(Multimodal.fitWithin(0, 100, 64) === ((0, 0)))
    assert(Multimodal.fitWithin(10000, 1, 64) === ((64, 1)))
  }

  test("decode is deterministic (stub codec is pure)") {
    val media = Tables.documents(spark, sf001).limit(50)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
    val a = Multimodal.decode(media).collect().sortBy(_.doc_id).map(d => (d.doc_id, d.features.toSeq))
    val b = Multimodal.decode(media).collect().sortBy(_.doc_id).map(d => (d.doc_id, d.features.toSeq))
    assert(a.toSeq === b.toSeq)
  }
}
