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
}
