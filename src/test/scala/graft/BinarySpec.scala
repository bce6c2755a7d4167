package graft

import org.apache.spark.sql.functions._

import graft.operators.{BinaryIndex, Knn}
import graft.sources.Tables

/** Binary (sign-bit) index: the executor-side packing must equal the
  * driver-side packing bit for bit, and rerank = n must degenerate to
  * the exact answer (the hamming cut then excludes nothing).
  */
class BinarySpec extends SparkSpec {

  test("column signBits equals driver-side signWordsOf on real vectors") {
    val emb = Tables.embeddings(spark, sf001).limit(50).cache()
    val words = BinaryIndex.signWords(col("embedding"), 64)
    val got = emb.select(col("vec_id") +: words: _*).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    emb.collect().foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val v = r.getSeq[Float](r.fieldIndex("embedding")).toArray
      val Array(w0, w1) = BinaryIndex.signWordsOf(v)
      assert(got(id) === ((w0, w1)), s"packing mismatch for vec $id")
    }
  }

  test("rerank = n degenerates to exact search; rerank = 100 keeps high recall") {
    val emb = Tables.embeddings(spark, sf001).cache()
    val n = emb.count().toInt
    val q = emb.where(col("vec_id") === 11L).select("embedding")
      .first().getSeq[Float](0).toArray

    val exact = Knn.searchExact(emb, "vec_id", "embedding", q, k = 10, metric = "l2")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    val degenerate = BinaryIndex.search(emb, "vec_id", "embedding", q, k = 10, rerank = n)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    assert(degenerate === exact, "rerank = n must be the exact brute-force answer")

    val approx = BinaryIndex.search(emb, "vec_id", "embedding", q, k = 10, rerank = 100)
      .collect().map(_.getLong(1)).toSet
    val recall = exact.map(_._2).count(approx.contains) / 10.0
    assert(recall >= 0.5, s"hamming@100 recall too low: $recall")
  }
}
