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

  test("eventsTtest matches a driver-side Welch t from the raw values") {
    import org.apache.spark.sql.functions._
    val got = Queries.eventsTtest(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

    val cents = graft.sources.Tables.events(spark, sf001)
      .select(col("event_type"), floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def mom(vs: Array[Long]) = {
      val n = vs.length.toDouble
      val s = vs.sum.toDouble
      val q = vs.map(v => v * v).sum.toDouble
      (n, s / n, (q - s * s / n) / (n - 1.0))
    }
    for (((ta, tb), (na, nb, t)) <- got) {
      val (an, am, av) = mom(cents(ta)); val (bn, bm, bv) = mom(cents(tb))
      assert(na === an.toLong && nb === bn.toLong)
      val expT = (am - bm) / math.sqrt(av / an + bv / bn)
      assert(math.abs(t - expT) < 5e-5, s"$ta vs $tb: $t vs $expT")
    }
    assert(got.size === 10, "5 types give 10 unordered pairs")
  }

  test("eventsPivot cells re-total to the plain per-day sum and per-type sums") {
    import org.apache.spark.sql.functions._
    val pv = Queries.eventsPivot(spark, sf001)
    val types = Seq("click", "error", "purchase", "signup", "view")
    assert(pv.columns.toSeq === ("day" +: types))

    val base = graft.sources.Tables.events(spark, sf001)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"), col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
    val byDay = base.groupBy("day").agg(sum("c").as("tot")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val rowTotals = pv.collect()
      .map(r => (r.getString(0), types.indices.map(i => r.getLong(i + 1)).sum)).toMap
    assert(rowTotals === byDay, "pivot row margins must equal the plain day totals")

    val byType = base.groupBy("event_type").agg(sum("c").as("tot")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val colTotals = types.zipWithIndex.map { case (t, i) =>
      (t, pv.collect().map(_.getLong(i + 1)).sum)
    }.toMap
    assert(colTotals === byType, "pivot column margins must equal the plain type totals")
  }

  test("sigmaOutliers highOnly keeps spikes, drops low-side outliers") {
    val s = spark; import s.implicits._
    // key 'a': 100 values at 10, one at 500 (high outlier), one at -480
    // (low outlier, symmetric magnitude)
    val rows = Seq.tabulate(100)(i => ("a", i.toLong, 10.0)) ++
      Seq(("a", 900L, 500.0), ("a", 901L, -480.0))
    val df = rows.toDF("k", "id", "v")
    val both = Stats.sigmaOutliers(df, "k", "v", k = 3, scale = 0)
      .collect().map(_.getLong(1)).toSet
    val high = Stats.sigmaOutliers(df, "k", "v", k = 3, scale = 0, highOnly = true)
      .collect().map(_.getLong(1)).toSet
    assert(both === Set(900L, 901L))
    assert(high === Set(900L))
  }

  test("events_burst: returned buckets are strictly above their type's mean hourly count") {
    import org.apache.spark.sql.functions._
    val bursts = Queries.eventsBurst(spark, sf001).collect()
    val means = sources.Tables.events(spark, sf001)
      .select(col("event_type"), unix_micros(date_trunc("hour", col("ts"))).as("b"))
      .groupBy("event_type", "b").agg(count(lit(1)).as("n"))
      .groupBy("event_type").agg(avg("n").as("mean"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    bursts.foreach { r =>
      assert(r.getLong(2).toDouble > means(r.getString(0)),
        s"burst bucket must exceed the type mean: $r")
    }
  }

  test("orders_basket_affinity: deterministic top-20, pair ordering and lift consistency at sf0.001") {
    val out = Queries.ordersBasketAffinity(spark, sf001).collect()
    assert(out.length <= 20 && out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "part_a < part_b")
      assert(r.getDouble(3) > 0.0, "lift positive")
    }
    val ns = out.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "pair_n descending")
  }

  test("lineitem_discount_elasticity matches a brute-force per-month OLS at sf0.001") {
    import org.apache.spark.sql.functions._
    val out = Queries.lineitemDiscountElasticity(spark, sf001).collect()
    assert(out.nonEmpty)
    // brute-force recompute for the first month from raw rows
    val m0 = out.head.getString(0)
    val rows = sources.Tables.lineitem(spark, sf001)
      .where(date_format(col("l_shipdate"), "yyyy-MM") === m0)
      .select(col("l_quantity").cast("double"), col("l_discount"))
      .collect().map(r => (math.round(r.getDouble(1) * 100).toDouble, r.getDouble(0)))
    val n = rows.length.toDouble
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxx = rows.map(t => t._1 * t._1).sum; val sxy = rows.map(t => t._1 * t._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out.head.getLong(1) === rows.length.toLong)
    assert(math.abs(out.head.getDouble(2) - slope) < 1e-4)
  }

  test("denseIdCount: dense ids pass through, sparse ids fail LOUDLY") {
    val s = spark; import s.implicits._
    // dense 0..4 → plain count
    val dense = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    assert(Stats.denseIdCount(dense, "id", "n", "t").collect().head.getLong(0) === 5L)
    // sparse (gaps): the partner-hash join would silently lose pairs —
    // the gate must throw instead of returning a count
    val sparse = Seq(0L, 1L, 5L).toDF("id")
    val e = intercept[Exception] {
      Stats.denseIdCount(sparse, "id", "n", "vector_pair_sample").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("dense"),
      s"gate must raise the dense-id contract message, got: ${e.getMessage}")
    // shifted (min != 0) also fails
    val shifted = Seq(1L, 2L, 3L).toDF("id")
    intercept[Exception] { Stats.denseIdCount(shifted, "id", "n", "t").collect() }
  }
}
