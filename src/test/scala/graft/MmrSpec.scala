package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Knn

/** Properties of the MMR greedy re-rank (Knn.mmrDiversify). */
class MmrSpec extends SparkSpec {

  /** One query q = x̂ with candidates at known 3-D angles: c1 near q,
    * c2 an EXACT clone of c1 (redundant), c3 relevant but rotated into
    * a different plane (the diverse answer), c4 anti-query.
    */
  private def candFrame() = {
    val q = Array(1.0f, 0.0f, 0.0f)
    val cands = Seq(
      (1L, Array(0.99f, 0.14f, 0.0f)),   // closest to q
      (2L, Array(0.99f, 0.14f, 0.0f)),   // exact duplicate of c1
      (3L, Array(0.9f, 0.0f, 0.435f)),   // relevant AND diverse
      (4L, Array(-0.5f, 0.86f, 0.0f)))   // anti-query
    val schema = StructType(Seq(
      StructField("q_id", LongType), StructField("c_id", LongType),
      StructField("q_vec", ArrayType(FloatType)), StructField("c_vec", ArrayType(FloatType))))
    val rows = cands.map { case (id, v) => Row(10L, id, q.toSeq, v.toSeq) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("first pick is the relevance argmax; exact duplicate deferred for diversity") {
    val out = Knn.mmrDiversify(candFrame(), "q_id", "c_id", "q_vec", "c_vec",
        k = 3, lambda10 = 5)
      .orderBy("pick").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // pick 1: highest cosine to q, tie (c1 vs its clone c2) broken to lower id
    assert(out(0).getLong(2) == 1L)
    // pick 2 must NOT be the exact duplicate (plain top-k would take it):
    // max-sim-to-selected = 1.0 crushes its score; the relevant-but-
    // rotated c3 wins
    assert(out(1).getLong(2) == 3L)
    // the duplicate only surfaces once diversity is exhausted
    assert(out(2).getLong(2) == 2L)
  }

  test("picks are distinct and deterministic across reruns") {
    val a = Knn.mmrDiversify(candFrame(), "q_id", "c_id", "q_vec", "c_vec",
      k = 4, lambda10 = 5).collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val b = Knn.mmrDiversify(candFrame(), "q_id", "c_id", "q_vec", "c_vec",
      k = 4, lambda10 = 5).collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
    assert(a.map(_._2).size == 4)
  }

  test("lambda10 = 10 degenerates to pure relevance ranking") {
    val out = Knn.mmrDiversify(candFrame(), "q_id", "c_id", "q_vec", "c_vec",
        k = 3, lambda10 = 10)
      .orderBy("pick").collect()
    // no diversity penalty: the clone follows its twin immediately
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
  }
}
