package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** Sketch guarantees: HLL estimate within its published error envelope
  * and invariant to partitioning/duplication; Bloom never false-negative
  * and verdicts partition-invariant.
  */
class SketchSpec extends SparkSpec {

  test("hllDistinct: estimate within 3·(1.04/√m) of truth, duplicate- and partition-invariant") {
    val s = spark; import s.implicits._
    val rnd = new Random(11)
    // two keys, different true cardinalities, items inserted with dups
    val items = Seq.tabulate(3000)(i => ("big", s"item-${i % 2000}")) ++
      Seq.tabulate(400)(i => ("small", s"thing-${i % 150}"))
    val df = rnd.shuffle(items).toDF("k", "item")

    val res = Sketch.hllDistinct(df.repartition(7), "k", col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4))).toList
    val byKey = res.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byKey("big")._1 === 2000L)
    assert(byKey("small")._1 === 150L)
    val tol = 3 * 1.04 / math.sqrt(256) // 3 standard errors ≈ 19.5%
    for ((k, (exact, est)) <- byKey)
      assert(math.abs(est - exact) <= tol * exact, s"$k: est=$est exact=$exact")

    // the sketch is a max-merge: duplication and partitioning can't move it
    val res2 = Sketch.hllDistinct(df.unionAll(df).repartition(3), "k", col("item"))
      .collect().map(r => (r.getString(0), r.getDouble(4))).toMap
    for ((k, (_, est)) <- byKey) assert(res2(k) === est, s"$k estimate must be state-deterministic")
  }

  test("cmsFrequency: one-sided (est >= exact always), exact when w >> keys, partition-invariant") {
    val s = spark; import s.implicits._
    val rnd = new Random(17)
    // skewed frequencies over many keys so buckets genuinely collide at w=64
    val rows = (1 to 5000).map(_ => s"u${(math.pow(rnd.nextDouble(), 2) * 400).toInt}")
    val df = rows.toDF("k").repartition(7)
    val probes = df.distinct()
    val res = Sketch.cmsFrequency(df, "k", probes, "k", d = 4, w = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(res.nonEmpty)
    for ((k, exact, est) <- res)
      assert(est >= exact, s"$k: CMS must never underestimate ($est < $exact)")
    // with width >> distinct keys, collisions vanish and est == exact
    val wide = Sketch.cmsFrequency(df, "k", probes, "k", d = 4, w = 1 << 14)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    for ((exact, est) <- wide) assert(est === exact)
    // counters are a sum-merge: partitioning can't move the estimate
    val rep = Sketch.cmsFrequency(df.repartition(3), "k", probes, "k", d = 4, w = 64)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    for ((k, _, est) <- res) assert(rep(k) === est)
  }

  test("bloomGate: zero false negatives, exact truth column, partition-invariant") {
    val s = spark; import s.implicits._
    val rnd = new Random(13)
    val members = Seq.tabulate(80)(i => i.toLong * 3) // multiples of 3
    val probes = Seq.tabulate(400)(_ => rnd.nextLong(600).abs)
    val got = Sketch.bloomGate(
      members.toDF("m").repartition(5), "m",
      probes.toDF("p").repartition(7), "p",
      mBits = 1 << 10, kHashes = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.map(_._1).toSet === probes.toSet, "one verdict per distinct probe")
    val memberSet = members.toSet
    got.foreach { case (u, positive, isMember) =>
      assert(isMember === memberSet.contains(u), s"truth column wrong for $u")
      if (isMember) assert(positive, s"false negative for member $u")
    }
    // with a deliberately small filter (2^10 bits, 240 set) some
    // non-member must false-positive — prove the filter is actually
    // approximate, not accidentally exact
    assert(got.exists { case (_, pos, mem) => pos && !mem },
      "expected ≥1 false positive at this fill factor")
  }

  test("bloomPrune: every true join row survives; pruned ⊆ probe; empty build prunes all") {
    val s = spark; import s.implicits._
    val rnd = new Random(29)
    val build = Seq.tabulate(60)(i => i.toLong * 7) // multiples of 7
    val probe = Seq.tabulate(500)(_ => rnd.nextLong(800).abs)
    val pruned = Sketch.bloomPrune(
      build.toDF("b").repartition(4), "b",
      probe.toDF("p").repartition(6), "p",
      mBits = 1 << 9, kHashes = 3)
      .collect().map(_.getLong(0))
    val buildSet = build.toSet
    // no false negatives: every probe value that actually joins survives
    probe.filter(buildSet.contains).foreach { v =>
      assert(pruned.contains(v), s"bloom dropped true join key $v")
    }
    // soundness: survivors are a sub-multiset of the probe rows
    assert(pruned.length <= probe.length)
    val probeCounts = probe.groupBy(identity).view.mapValues(_.size).toMap
    pruned.groupBy(identity).foreach { case (v, rows) =>
      assert(rows.size <= probeCounts(v), s"pruning duplicated probe row $v")
    }
    // with 2^9 bits and 180 set, non-joining survivors must exist —
    // the join must re-verify, the sketch alone is not the answer
    assert(pruned.exists(v => !buildSet.contains(v)),
      "expected ≥1 false-positive survivor at this fill factor")
    // empty build side prunes everything (vacuous filter, no crash)
    assert(Sketch.bloomPrune(Seq.empty[Long].toDF("b"), "b",
      probe.toDF("p"), "p", mBits = 1 << 9, kHashes = 3).count() === 0L)
  }
}
