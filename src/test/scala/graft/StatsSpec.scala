package graft

import scala.util.Random

import graft.operators.Stats

/** Exact-integer k-sigma membership vs a driver-side BigInt brute
  * force — the decision boundary must agree exactly, row for row.
  */
class StatsSpec extends SparkSpec {

  test("sigmaOutliers matches BigInt brute force; planted spike surfaces") {
    val s = spark; import s.implicits._
    val rnd = new Random(23)
    val rows = Seq.tabulate(500)(i => ("a", i.toLong, rnd.nextGaussian() * 2.0 + 10.0)) ++
      Seq(("a", 9001L, 500.0)) ++ // planted spike
      Seq.tabulate(300)(i => ("b", 1000L + i, rnd.nextDouble()))
    val df = rows.toDF("k", "id", "v")

    val got = Stats.sigmaOutliers(df, "k", "v", k = 3, scale = 4)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.contains(("a", 9001L)), "planted spike must be flagged")

    // brute force with exact integers (same floor fixing)
    val expected = rows.groupBy(_._1).flatMap { case (k, grp) =>
      val xs = grp.map { case (_, id, v) => (id, BigInt(math.floor(v * 10000.0 + 0.5).toLong)) }
      val n = BigInt(xs.size)
      val sSum = xs.map(_._2).sum
      val q = xs.map(t => t._2 * t._2).sum
      xs.collect { case (id, x) if (n * x - sSum).pow(2) > 9 * (n * q - sSum * sSum) => (k, id) }
    }.toSet
    assert(got === expected)
  }

  test("heavyHitters equals brute force under adversarial partitioning") {
    val s = spark; import s.implicits._
    val rnd = new Random(71)
    // zipfish key mix: a few hot keys + a uniform tail, shuffled so
    // hot keys spread across partitions (the MG-completeness edge).
    val keys = Seq.fill(400)(rnd.nextInt(5).toLong) ++          // hot: 5 keys, ~80 each
      Seq.fill(600)(100L + rnd.nextInt(200))                     // tail: 200 keys, ~3 each
    val shuffled = rnd.shuffle(keys)
    for (parts <- Seq(1, 7, 32)) {
      val df = shuffled.toDF("user_id").repartition(parts)
      val got = Stats.heavyHitters(df, "user_id", c = 1.2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val n = keys.size.toLong
      val d = keys.distinct.size.toLong
      val k = math.max(1L, math.ceil(d / 1.2).toLong)
      val expected = keys.groupBy(identity).map { case (key, g) => (key, g.size.toLong) }
        .filter { case (_, cnt) => cnt * (k + 1) > n }.toSet
      assert(got === expected, s"parts=$parts")
      assert(expected.nonEmpty, "test must exercise a non-empty answer")
    }
  }
}
