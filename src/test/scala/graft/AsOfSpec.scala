package graft

import scala.util.Random

import graft.operators.AsOf

/** As-of join semantics vs a brute-force argmax, including the edges the
  * window construction must get right: equal timestamps (right visible
  * at ≤, largest tie wins), no prior row (null payload), left columns
  * preserved.
  */
class AsOfSpec extends SparkSpec {

  test("handles ties, no-prior rows, and preserves left columns") {
    val s = spark; import s.implicits._
    val left = Seq(
      (1L, 10L, 100L), // before any right row -> null
      (1L, 20L, 101L), // exactly at right ts 20 -> that row visible
      (1L, 25L, 102L),
      (2L, 5L, 200L)   // key with no right rows at all
    ).toDF("k", "t", "left_id")
    val right = Seq(
      (1L, 20L, 7L),
      (1L, 20L, 9L),   // equal-ts tie -> larger id wins
      (1L, 22L, 3L)
    ).toDF("k", "t", "rid")
    val out = AsOf.joinPrior(left, right, "k", "t", Seq("rid"), "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out === Set(
      (1L, 10L, 100L, -1L),
      (1L, 20L, 101L, 9L),
      (1L, 25L, 102L, 3L),
      (2L, 5L, 200L, -1L)))
  }

  test("matches brute force on random data") {
    val s = spark; import s.implicits._
    val rnd = new Random(13)
    val left = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, rnd.nextLong().abs))
    val right = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, rnd.nextLong().abs))
    val got = AsOf.joinPrior(
        left.toDF("k", "t", "left_id"), right.toDF("k", "t", "rid"), "k", "t", Seq("rid"), "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq.sorted

    val expected = left.map { case (k, t, id) =>
      val prior = right.filter(r => r._1 == k && r._2 <= t)
      val best = if (prior.isEmpty) None
                 else Some(prior.maxBy(r => (r._2, r._3))._3)
      (k, t, id, best)
    }.sorted
    assert(got === expected)
  }
}
