package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One candidate row flowing into the bounded stratified-sample heap. */
case class StratRow(h: Long, id: Long, payload: Long)

/** Bounded lowest-k by (h, id) — the [[TopKNeighbors]] shape keyed by
  * stratum: each partition ships at most ~max(2k, 64) rows per stratum
  * into the shuffle (map-side combine), so a fixed-budget stratified
  * sample never materializes or sorts a whole stratum. A row_number
  * window does: it sorts every stratum end-to-end, which at 100 TB with
  * a handful of strata is a full sort of the table.
  */
class TopKStrat(k: Int) extends Aggregator[StratRow, Seq[StratRow], Seq[StratRow]] {
  private val cap = math.max(2 * k, 64)

  private def compact(buf: Seq[StratRow]): Seq[StratRow] =
    buf.sortBy(r => (r.h, r.id)).take(k)

  override def zero: Seq[StratRow] = Vector.empty

  override def reduce(buf: Seq[StratRow], in: StratRow): Seq[StratRow] = {
    val next = buf :+ in
    if (next.size >= cap) compact(next) else next
  }

  override def merge(a: Seq[StratRow], b: Seq[StratRow]): Seq[StratRow] = compact(a ++ b)

  override def finish(buf: Seq[StratRow]): Seq[StratRow] = compact(buf)

  override def bufferEncoder: Encoder[Seq[StratRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[StratRow]]()
  override def outputEncoder: Encoder[Seq[StratRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[StratRow]]()
}

/** Exact-integer statistical operators. Parallel double summation is
  * order-nondeterministic (IEEE addition does not associate), so
  * anything built on Σx / Σx² naively cannot hash-match an oracle —
  * instead values are fixed to integers at a declared scale and the
  * moment sums run in DECIMAL(38) (exact in any aggregation order,
  * like DuckDB's int128 sums), making the decision boundary itself
  * exact: no epsilon, no flaky boundary rows at any cluster size.
  */
/** One-pass Gram/sum/count moment accumulator over an embedding column —
  * the state behind exact distributed PCA: a dim×dim integer Gram matrix
  * (inputs fixed to 1e-4 units), the per-dim fixed sums, and the row
  * count, all in a single flat Array[Long] buffer. Each input row does
  * its dim² multiply-adds INSIDE the aggregate buffer (no dim² row
  * explode, no shuffle beyond one buffer per partition); the shuffled
  * state is dim²+dim+1 longs regardless of corpus size.
  *
  * Overflow discipline: |fixed| ≤ 1e4 for unit-range embeddings ⇒ each
  * Gram cell grows ≤ 1e8 per row, so Long holds ~9×10^10 rows; add/
  * multiplyExact makes the bound a loud failure, and past it the state
  * widens to decimal — never a silent wrap.
  */
class GramMoments(dim: Int) extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
  // layout: [0, dim²) gram row-major, [dim², dim²+dim) sums, last = n
  override def zero: Array[Long] = new Array[Long](dim * dim + dim + 1)

  override def reduce(b: Array[Long], x: Seq[Float]): Array[Long] = {
    val f = new Array[Long](dim)
    var i = 0
    while (i < dim) { f(i) = math.floor(x(i) * 1e4 + 0.5).toLong; i += 1 }
    var d = 0
    while (d < dim) {
      val fd = f(d); val off = d * dim
      var e = 0
      while (e < dim) {
        b(off + e) = Math.addExact(b(off + e), Math.multiplyExact(fd, f(e)))
        e += 1
      }
      b(dim * dim + d) = Math.addExact(b(dim * dim + d), fd)
      d += 1
    }
    b(dim * dim + dim) += 1
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object Stats {

  /** 1-row count frame GATED on the id column being dense 0..n−1 — for
    * partner-by-`hash mod n` draws (vector_pair_sample,
    * corpus_contrastive_pairs), whose join back on the raw id silently
    * LOSES pairs when the id space is sparse (the partner id simply
    * doesn't exist). The gate makes the assumption fail LOUDLY in-plan
    * (raise_error, the insertAll dim-contract pattern) instead of
    * shipping a sample that is quietly smaller than promised. On dense
    * data the branch folds away and the frame is the plain count.
    */
  def denseIdCount(df: DataFrame, idCol: String, out: String, what: String): DataFrame =
    df.agg(count(lit(1)).as("__n"), countDistinct(col(idCol)).as("__nd"),
        min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .select(
        // min==0 ∧ max==n−1 alone admits a multiset with duplicates plus
        // a matching gap (ids 0,0,2) that still loses partner pairs —
        // the distinct count closes that hole without assuming the
        // caller passed a primary key.
        when(col("__mn") === 0 && col("__mx") === col("__n") - 1 &&
             col("__nd") === col("__n"), col("__n"))
          .otherwise(raise_error(concat(
            lit(s"$what requires dense UNIQUE $idCol ids 0..n-1: min="),
            coalesce(col("__mn").cast("string"), lit("null")),
            lit(" max="), coalesce(col("__mx").cast("string"), lit("null")),
            lit(" n="), col("__n").cast("string"),
            lit(" distinct="), col("__nd").cast("string"))))
          .cast("long").as(out))

  /** Per-key k-sigma outliers with a fully integer decision rule.
    * With n rows per key, integer values x (the input scaled by
    * 10^scale and rounded), S = Σx, Q = Σx²:
    *
    *   |x − μ| > k·σ  ⇔  (n·x − S)² > k²·(n·Q − S²)
    *
    * — both sides exact integers, so membership is reproducible
    * bit-for-bit. One partial aggregation per key + one broadcast join
    * of the tiny per-key moment table back onto the stream; returns the
    * outlier rows.
    */
  def sigmaOutliers(df: DataFrame, keyCol: String, valueCol: String,
                    k: Int = 3, scale: Int = 4,
                    highOnly: Boolean = false): DataFrame = {
    require(k >= 1 && scale >= 0 && scale <= 9)
    val p = math.pow(10, scale)
    // floor of the binary value — identical in every IEEE engine (the
    // decimal-string rounding of round() is not; see Oracles notes)
    val x = floor(col(valueCol) * p + lit(0.5)).cast("decimal(38,0)")
    val scaled = df.withColumn("x", x)
    val moments = scaled.groupBy(col(keyCol).as("mk"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
    scaled.join(broadcast(moments), col(keyCol) === col("mk"))
      .where({
        val lhs = (col("n") * col("x") - col("s"))
        val rhs = (col("n") * col("q") - col("s") * col("s"))
        val two = lhs * lhs > lit(k * k) * rhs
        // highOnly keeps x > μ deviations only (n·x − S > 0, still exact)
        if (highOnly) two && lhs > lit(0) else two
      })
      .drop("mk", "x", "n", "s", "q")
  }

  /** Single-scan numeric column profile — the warehouse ANALYZE /
    * data-profiling primitive: per column (n, n_null, n_distinct,
    * min, max) with extrema fixed to exact 10^-scale integer units.
    * ONE scan + one aggregation (the multi-distinct runs through
    * Spark's Expand — still a single pass over the data); the
    * per-column rows unpivot from the single agg row via stack, so
    * adding columns never adds scans. Exact n_distinct is the
    * expensive leg at 100 TB — the HLL sketch ([[Sketch.hllDistinct]])
    * is the scale path; this is the truth it approximates.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String], scale: Int = 4): DataFrame = {
    require(cols.nonEmpty)
    val p = math.pow(10, scale)
    def fixed(c: Column) = floor(c * p + lit(0.5)).cast("long")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__nd"),
        min(fixed(col(c))).as(s"${c}__min"),
        max(fixed(col(c))).as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("n"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`").mkString(", ")
    one.select(col("n"),
        expr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_fx, max_fx)"))
      .select("column_name", "n", "n_null", "n_distinct", "min_fx", "max_fx")
      .orderBy("column_name")
  }

  /** Fixed-budget stratified sample: the min(n, k) rows per stratum
    * with the LOWEST (hashCol, idCol) — a deterministic hash rank, so
    * the sample is decorrelated from every attribute. Runs as a
    * [[TopKStrat]] bounded-heap partial aggregation: shuffle volume is
    * O(strata × k) regardless of input size (never a per-stratum sort).
    * Output: (stratum, pick, id, payload), pick = 1-based hash rank.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       payloadCol: String, hashCol: Column, k: Int): DataFrame = {
    val topk = udaf(new TopKStrat(k), Encoders.product[StratRow])
    df.select(col(stratumCol).as("stratum"), hashCol.as("h"),
        col(idCol).cast("long").as("id"), col(payloadCol).cast("long").as("payload"))
      .groupBy("stratum")
      .agg(topk(col("h"), col("id"), col("payload")).as("picks"))
      .select(col("stratum"), posexplode(col("picks")).as(Seq("pos", "p")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("pick"),
        col("p.id").as("id"), col("p.payload").as("payload"))
  }

  /** PROVABLY-EXACT heavy hitters (keys with count·(k+1) > n) via the
    * classic two-pass distributed Misra–Gries composition:
    *
    *  1. each partition runs an MG sketch with k counters — bounded
    *     memory regardless of partition size; MG guarantees every key
    *     with partition count > n_p/(k+1) survives, and by pigeonhole a
    *     global heavy hitter must be partition-heavy somewhere, so the
    *     union of per-partition survivors is a SUPERSET of the answer;
    *  2. the candidate set (≤ k × partitions keys, broadcast) gates an
    *     exact re-count — one semi-joined partial agg over candidate
    *     rows only — and the exact filter count·(k+1) > n drops the
    *     false positives.
    *
    * Net: exact answer, all-integer decision, and the only shuffle is
    * the candidate-key agg. k is sized from the key cardinality d so
    * the threshold lands at ~1.2× the mean key frequency (d is one
    * tiny pre-agg; at 100 TB use a cached stat or a fixed k instead).
    */
  def heavyHitters(df: DataFrame, keyCol: String, c: Double = 1.2): DataFrame = {
    import df.sparkSession.implicits._
    require(c > 1.0, "threshold multiplier must exceed the mean")
    val stats = df.agg(count(lit(1)).as("n"), count_distinct(col(keyCol)).as("d")).head()
    val n = stats.getLong(0)
    val k = math.max(1L, math.ceil(stats.getLong(1) / c).toLong)
    val candidates = df.select(col(keyCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val counters = new java.util.HashMap[Long, Long]()
        it.foreach { key =>
          val cur: Long = counters.getOrDefault(key, 0L)
          if (cur > 0) counters.put(key, cur + 1)
          else if (counters.size < k) counters.put(key, 1L)
          else {
            val entries = counters.entrySet().iterator()
            while (entries.hasNext) {
              val e = entries.next()
              if (e.getValue == 1L) entries.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
        scala.jdk.CollectionConverters.SetHasAsScala(counters.keySet()).asScala.iterator
      }
      .toDF("hh_key").distinct()
    df.join(broadcast(candidates), col(keyCol).cast("long") === col("hh_key"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1) > n)
      .orderBy(col("cnt").desc, col(keyCol))
  }
}
