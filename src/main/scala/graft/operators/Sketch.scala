package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{roundTo, tokenHash60}

/** Probabilistic-sketch operators in deterministic, oracle-checkable
  * form. Sketches are how a 100 TB engine answers "how many distinct"
  * and "have I seen this" without a global distinct shuffle — but their
  * usual implementations (random seeds, float register merges) defy a
  * hash-match gate. Here every hash is the engine's deterministic
  * md5-based tokenHash60 and every merge is an integer max/sum, so the
  * sketch state — and therefore the estimate — is bit-reproducible at
  * any parallelism, and DuckDB can re-derive it independently.
  */
object Sketch {

  /** HyperLogLog distinct-count estimate per key, next to the exact
    * count for comparison — the Flajolet et al. 2007 estimator with
    * p = 8 (m = 256 registers).
    *
    * Shape at scale: the register state is a (key, reg) → max(rank)
    * partial aggregation — map-side combine leaves at most
    * |keys| × 256 rows regardless of input size, which IS the HLL
    * promise, expressed relationally. The harmonic mean runs on exact
    * integers: Σ 2^(−M_j) is computed as S = Σ 2^(60−M_j) in
    * DECIMAL(38,0) (ranks are ≤ 53, so terms are integral), making the
    * register sum order-independent; the only float ops are the final
    * α·m²·2⁶⁰/S division and the small-range ln branch, identical
    * expression trees in Spark and DuckDB.
    *
    * The exact leg (count_distinct) rides along as the accuracy
    * yardstick — at real scale you drop it; it is the expensive thing
    * this sketch replaces.
    */
  /** The HLL register table (key, reg, mj): a pure max-merge
    * aggregation, so the SAME expression chain maintains the state over
    * a batch table or a stream (max is the streaming-state update;
    * StreamingSpec asserts stream ≡ batch).
    */
  def hllRegisters(df: DataFrame, keyCol: String, item: Column): DataFrame = {
    val h = tokenHash60(item) // 60-bit deterministic hash
    val base = df.select(col(keyCol), h.as("h"))
      .select(col(keyCol),
        shiftright(col("h"), 52).as("reg"),
        col("h").bitwiseAND(lit((1L << 52) - 1)).as("suffix"))
    // rank = leading zeros of the 52-bit suffix + 1, via bit length
    val rank = when(col("suffix") === 0, lit(53))
      .otherwise(lit(53) - length(bin(col("suffix"))))
    base.select(col(keyCol), col("reg"), rank.as("rank"))
      .groupBy(keyCol, "reg")
      .agg(max("rank").as("mj"))
  }

  /** The Flajolet et al. 2007 estimator applied to ANY register table
    * (key, reg, mj) — including max-MERGED states: registers from
    * different sets combined by per-register max estimate the UNION'S
    * cardinality, which is what makes HLL an algebra, not just a
    * counter (see [[graft.Queries.eventsHllSetops]]). Output:
    * (key, n_regs, v_zero, hll_est), hll_est rounded to 4dp.
    */
  def hllEstimate(regs: DataFrame, keyCol: String): DataFrame = {
    val m = 256 // p = 8: top 8 bits select the register
    val summary = regs.groupBy(keyCol)
      .agg(
        count(lit(1)).as("n_regs"),
        sum(call_function("shiftleft", lit(1L), lit(60) - col("mj"))
          .cast("decimal(38,0)")).as("sp"))
      .withColumn("v_zero", lit(m.toLong) - col("n_regs"))
      .withColumn("s_total",
        col("sp") + col("v_zero").cast("decimal(38,0)") *
          lit(new java.math.BigDecimal("1152921504606846976"))) // 2^60
    // raw estimate α_m · m² · 2⁶⁰ / S; small-range: m · ln(m / V)
    val estRaw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble) * lit(1152921504606846976.0) /
      col("s_total").cast("double")
    val est = when(col("est_raw") <= lit(2.5 * m) && col("v_zero") > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
      .otherwise(col("est_raw"))
    summary
      .withColumn("est_raw", estRaw)
      .withColumn("hll_est", roundTo(est, 4))
      .select(col(keyCol), col("n_regs"), col("v_zero"), col("hll_est"))
  }

  def hllDistinct(df: DataFrame, keyCol: String, item: Column): DataFrame = {
    val exact = df.groupBy(keyCol).agg(count_distinct(item).as("n_exact"))
    hllEstimate(hllRegisters(df, keyCol, item), keyCol)
      .join(exact, keyCol)
      .select(col(keyCol), col("n_exact"), col("n_regs"), col("v_zero"), col("hll_est"))
      .orderBy(keyCol)
  }

  /** Count-Min Sketch frequency estimates next to the exact counts —
    * the Cormode–Muthukrishnan point-frequency sketch, completing the
    * sketch suite (HLL = distinct, Bloom = membership, Misra–Gries =
    * heavy hitters, histogram = quantiles, CMS = per-key frequency).
    *
    * State is d×w integer counters as a (row, bucket) → count partial
    * aggregation: ≤ d·w rows at ANY input size, and counters are
    * SUM-mergeable, so the same chain maintains streaming state the way
    * [[hllRegisters]]' max-merge does. Estimates are one-sided:
    * est = min_i C[i][h_i(k)] ≥ exact always (collisions only inflate
    * — property-tested), with error ≤ εn at probability 1−δ for
    * w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉. Deterministic md5 row hashes + pure
    * integer counts make the state bit-reproducible and independently
    * re-derivable by the oracle. The probe side joins the d·w-row
    * counter table (broadcast — it IS the sketch, bounded by
    * construction) map-side; the exact leg rides along as the accuracy
    * yardstick it replaces at scale.
    */
  private def cmsBucket(i: Int, w: Int, c: Column): Column =
    pmod(tokenHash60(concat(lit(s"cms$i:"), c.cast("string"))), lit(w.toLong))

  /** The CMS counter table (i, b, c): a pure count/sum aggregation, so
    * the same chain maintains the state over a batch table or a stream
    * (StreamingSpec asserts stream ≡ batch). Unlike [[hllRegisters]]'
    * max-merge, sum-merged counts are NOT replay-immune — feed an
    * exactly-once source or dedup upstream (e.g. the watermarked
    * event-id dedup) before counting.
    */
  def cmsCounters(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2)
    df.select(posexplode(
        array((0 until d).map(i => cmsBucket(i, w, col(keyCol))): _*)).as(Seq("i", "b")))
      .groupBy("i", "b").agg(count(lit(1)).as("c"))
  }

  def cmsFrequency(df: DataFrame, keyCol: String, probes: DataFrame, probeCol: String,
                   d: Int = 4, w: Int = 256): DataFrame = {
    require(d >= 1 && w >= 2)
    def bucket(i: Int, c: Column): Column = cmsBucket(i, w, c)
    val counters = cmsCounters(df, keyCol, d, w)
    val probeBuckets = probes.select(col(probeCol).as("k")).distinct()
      .select(col("k"), posexplode(
        array((0 until d).map(i => bucket(i, col("k"))): _*)).as(Seq("i", "b")))
    val est = probeBuckets
      .join(broadcast(counters), Seq("i", "b"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
    val exact = df.select(col(keyCol).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("k"), "left")
      .select(col("k"), coalesce(col("n_exact"), lit(0L)).as("n_exact"), col("cms_est"))
      .orderBy("k")
  }

  /** Bloom-filter membership gate: build a filter over `members`, probe
    * every `probes` row, and report per probe both the filter's verdict
    * and the ground truth (so false positives are visible rows and the
    * no-false-negative guarantee is checkable).
    *
    * Relational formulation of the classic bitmap: the set-bit table is
    * at most `mBits` rows (narrow ints, here 2¹⁶ → broadcast), each
    * probe expands to its k positions map-side and semi-joins the
    * broadcast bit set; positive ⇔ all its distinct positions hit.
    * On a real cluster the bit table compacts into an Array[Long]
    * bitmap broadcast (8 KB here) with a map-side contains — the plan
    * shape (broadcast + map-side probe, no probe-side shuffle) is
    * already that one. Deterministic md5 position hashes keep the
    * verdict engine-reproducible.
    */
  /** Map-side Bloom prune of a join's PROBE side: fit the set-bit
    * positions over the build side's join keys (≤ mBits CONSTANT
    * values — the driver-sized fit-artifact shape of KMeans centroids /
    * PQ codebooks, and the exact analog of Spark's own runtime
    * bloom-filter pushdown), then gate probe rows with a codegen InSet
    * test per hash BEFORE they reach the shuffle. False positives
    * survive to the real join, which re-verifies — the sketch can only
    * cost shuffle rows, never correctness. Returns the pruned probe.
    */
  def bloomPrune(build: DataFrame, buildCol: String,
                 probe: DataFrame, probeCol: String,
                 mBits: Int = 1 << 12, kHashes: Int = 3): DataFrame = {
    require(kHashes >= 1 && mBits >= 2)
    // Integer-only position family (keys are integral ids): square the
    // key mod the Mersenne prime to decorrelate sequential ids, then
    // the (2i+1)·h + (i²+7) permutation family (the minhash-permutation
    // spelling) — a few muls/mods per row in codegen, ~100× cheaper
    // than an md5-based hash on the probe side's hot path, and exactly
    // replayable in the oracle's integer SQL. All intermediates stay
    // below 2⁶³ for any long key.
    def positions(c: Column): Seq[Column] = {
      val P = 2147483647L
      val r = pmod(c.cast("long"), lit(P))
      val h = pmod(r * r, lit(P))
      (0 until kHashes).map { i =>
        pmod(h * lit(2L * i + 1) + lit(i.toLong * i + 7L), lit(P)) % lit(mBits.toLong)
      }
    }
    val bits: Array[Long] = build
      .select(explode(array(positions(col(buildCol)): _*)).as("bit")).distinct()
      .collect().map(_.getLong(0))
    if (bits.isEmpty) probe.where(lit(false))
    else probe.where(positions(col(probeCol)).map(_.isin(bits: _*)).reduce(_ && _))
  }

  def bloomGate(members: DataFrame, memberCol: String,
                probes: DataFrame, probeCol: String,
                mBits: Int = 1 << 16, kHashes: Int = 3): DataFrame = {
    require(kHashes >= 1 && mBits >= 2)
    def positions(c: Column): Column = array((0 until kHashes).map { i =>
      pmod(tokenHash60(concat(lit(s"bloom$i:"), c.cast("string"))), lit(mBits.toLong))
    }: _*)
    val bits = members.select(explode(positions(col(memberCol))).as("bit")).distinct()
    val probePos = probes.select(col(probeCol).as("probe"),
        explode(positions(col(probeCol))).as("bit"))
      .distinct()
    val verdict = probePos.join(broadcast(bits.withColumn("hit", lit(1))), Seq("bit"), "left")
      .groupBy("probe")
      .agg((count(lit(1)) === sum(coalesce(col("hit"), lit(0)))).as("bloom_positive"))
    val truth = members.select(col(memberCol).as("probe")).distinct()
      .withColumn("is_member", lit(true))
    verdict.join(truth, Seq("probe"), "left")
      .select(col("probe"), col("bloom_positive"),
        coalesce(col("is_member"), lit(false)).as("is_member"))
      .orderBy("probe")
  }
}
