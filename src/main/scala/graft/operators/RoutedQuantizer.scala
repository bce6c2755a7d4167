package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions._

/** Two-level (coarse→fine) IVF quantizer — the 100 TB replacement for
  * [[IvfIndex.fitScaled]]'s single-level scheme (reference:
  * index_factory.rs:86-107 — faiss's own coarse-quantizer practice for
  * large K).
  *
  * Why the single level caps out: K = n/targetClusterSize grows with
  * the data, and a flat quantizer carries all K centroids as a DRIVER
  * array that rides every plan as a codegen literal — at n = 10⁹ that
  * literal is hundreds of MB of plan, per-row assignment is O(K·dim)
  * compute, and the bounded k-means SAMPLE (≤ 1e5 rows) cannot even
  * produce K distinct centroids past n = 10⁷.
  *
  * The two-level shape keeps every piece bounded or distributed:
  *
  *  - COARSE: √K centroids, sample-fittable at any n (√(n/100) stays
  *    below the 1e5 sample ceiling past n = 10¹⁴), small enough to stay
  *    a codegen literal ([[graft.functions.nearestCentroid]]).
  *  - FINE: ~√K centroids per coarse cell, fit DISTRIBUTED (Lloyd
  *    iterations over a per-cell-bounded sample, all DataFrame ops) and
  *    carried as a TABLE — (coarse_id, cluster, cv) rows — never a plan
  *    literal and never a driver array.
  *  - ASSIGNMENT: map-side coarse argmin (literal), then an equi-join
  *    on coarse_id attaches the cell's fine candidates as one
  *    ARRAY<STRUCT> column and [[graft.functions.nearestCentroidIn]]
  *    picks the argmin in the same codegen stage. While the fine table
  *    fits the broadcast threshold Spark broadcasts it (zero shuffle —
  *    the small-K regime); beyond that it degrades to a co-partitioned
  *    shuffle on coarse_id, which ships each row ONCE with narrow
  *    columns — linear, never O(K)/row. Per-row compute is
  *    O(√K·dim + finePerCell·dim) ≈ O(2√K·dim), vs the flat scheme's
  *    O(K·dim).
  *
  * The ScaleSpec `routed_assign` certificate grows the corpus (and with
  * it the cluster count) 1×/10×/30× and asserts the assignment's
  * shuffle stays within the linear envelope.
  */
final case class RoutedQuantizer(coarse: Array[Array[Float]], fine: DataFrame) {

  def isEmpty: Boolean = coarse.isEmpty

  /** Total fine clusters (one narrow count of the fine table). */
  def k: Long = fine.count()

  /** The per-cell candidate arrays: one row per coarse cell, fine
    * candidates sorted by cluster id ascending (so the argmin's
    * first-minimal tie rule lands on the LOWEST cluster — the oracle's
    * `ORDER BY d2, cluster`).
    */
  private def cells: DataFrame =
    fine.select(col("coarse_id"), struct(col("cluster"), col("cv")).as("fc"))
      .groupBy("coarse_id").agg(sort_array(collect_list(col("fc"))).as("_cands"))

  /** Add the fine `cluster` column to `df` — the two-level index build
    * map pass. No broadcast hint on purpose: Spark broadcasts the cell
    * table while it fits (small-K regime, zero shuffle) and falls back
    * to a co-partitioned shuffle on coarse_id at table-sized K, where a
    * forced broadcast would OOM the driver.
    */
  def assign(df: DataFrame, vecCol: String, out: String = "cluster"): DataFrame =
    df.withColumn("_coarse_id", nearestCentroid(col(vecCol), coarse))
      .join(cells.withColumnRenamed("coarse_id", "_coarse_id"), Seq("_coarse_id"))
      .withColumn(out, nearestCentroidIn(col(vecCol), col("_cands")))
      .drop("_coarse_id", "_cands")

  /** Driver-side coarse route of a query: its `coarseProbe` nearest
    * coarse cells (same arithmetic as [[IvfIndex.probes]]).
    */
  def coarseProbes(queryVec: Array[Float], coarseProbe: Int): Seq[Int] =
    IvfIndex.probes(queryVec, coarse, coarseProbe)

  /** Driver-side two-step probe: route to `coarseProbe` coarse cells,
    * collect ONLY those cells' fine centroids (coarseProbe × finePerCell
    * rows — bounded, never the whole fine table), take the `nprobe`
    * nearest fine clusters. Ties to the lower cluster id, both steps.
    */
  def probes(queryVec: Array[Float], coarseProbe: Int, nprobe: Int): Seq[Int] = {
    val cs = coarseProbes(queryVec, coarseProbe)
    if (cs.isEmpty) return Seq.empty
    val cand = fine.where(col("coarse_id").isin(cs: _*))
      .select(col("cluster"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    cand.map { case (cl, cv) =>
      var acc = 0.0; var i = 0
      val n = math.min(cv.length, queryVec.length)
      while (i < n) {
        val d = queryVec(i).toDouble - cv(i).toDouble
        acc += d * d; i += 1
      }
      (acc, cl)
    }.sortBy(identity).take(math.min(nprobe, cand.length)).map(_._2).toSeq
  }
}

object RoutedQuantizer {

  /** Above this fitted K the corpus-scale builders AND the maintained
    * facade lifecycle switch from the flat literal quantizer to the
    * two-level routed one: below it the flat path is both simpler and
    * faster (one small codegen literal, no fine-table join). Conf-
    * overridable (`spark.graft.routed.kThreshold`) so tests drive the
    * routed branch at oracle/test sizes; every keyed SF sits far below
    * the default.
    */
  val KThresholdDefault = 4096L

  def kThreshold(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.routed.kThreshold").map(_.toLong)
      .getOrElse(KThresholdDefault)

  /** Fit a ~`k`-cluster two-level quantizer. The coarse level is the
    * ordinary sample-fit k-means (⌈√k⌉ centroids); the fine level is
    * `finePerCell = ⌈k/coarseK⌉` centroids per coarse cell, fit by
    * `iters` Lloyd rounds over a per-cell-bounded sample — every step a
    * DataFrame op, so the fine table never transits the driver:
    *
    *  1. init: the finePerCell deterministic seeds per cell (lowest
    *     (hash(vec), vec) order — stable across runs for stable input),
    *     plus the coarse centroid itself for any cell the sample left
    *     empty (EVERY coarse cell has ≥ 1 fine centroid, so assignment
    *     joins are total).
    *  2. iterate: assign each sampled row to its cell's nearest fine
    *     centroid ([[graft.functions.nearestCentroidIn]]), recompute
    *     per-(cell, seed) dimension means, keep the previous centroid
    *     for seeds that lost every row. localCheckpoint per round
    *     truncates the lineage (an L-round lazy chain would replan
    *     exponentially).
    *
    * Global cluster id = coarse_id × finePerCell + seed index —
    * deterministic, no global window. Returned `fine` is eagerly
    * checkpointed: fitting is a build-time cost, reuse is free.
    */
  def fit(emb: DataFrame, vecCol: String, k: Int,
          seed: Long = 42L, iters: Int = 3): RoutedQuantizer = {
    val spark = emb.sparkSession
    import spark.implicits._
    val n = emb.count()
    if (n == 0L)
      return RoutedQuantizer(Array.empty,
        Seq.empty[(Int, Int, Seq[Float])].toDF("coarse_id", "cluster", "cv"))
    val kEff = math.max(1, math.min(k.toLong, n).toInt)
    val coarseK = math.max(1, math.ceil(math.sqrt(kEff.toDouble)).toInt)
    val finePer = math.max(1, math.ceil(kEff.toDouble / coarseK).toInt)
    val coarse = IvfIndex.fit(emb, vecCol, coarseK, seed)

    // per-cell-bounded sample: ~4 rows per fine centroid — enough for
    // finePer means per cell, and the TOTAL (≈ 4k rows) stays
    // proportional to the centroid count, not to n
    val sampleTarget = math.max(4L * kEff, 4096L)
    val frac = math.min(1.0, sampleTarget.toDouble / n)
    val s0 = (if (frac < 1.0) emb.sample(withReplacement = false, frac, seed) else emb)
      .select(col(vecCol).cast("array<float>").as("v"))
      .withColumn("coarse_id", nearestCentroid(col("v"), coarse))
      .persist(StorageLevel.MEMORY_AND_DISK)
    s0.count()

    try {
      val seeds = s0
        .withColumn("rn", row_number().over(
          Window.partitionBy("coarse_id").orderBy(hash(col("v")), col("v"))))
        .where(col("rn") <= finePer)
        .select(col("coarse_id"), (col("rn") - 1).as("fid"), col("v").as("cv"))
      // coarse cells the sample missed seed from their own centroid, so
      // the assignment join is TOTAL (no corpus row can be dropped)
      val fallback = coarse.zipWithIndex
        .map { case (c, i) => (i, 0, c.toSeq) }.toSeq
        .toDF("coarse_id", "fid", "cv")
        .join(seeds.select(col("coarse_id")).distinct(), Seq("coarse_id"), "left_anti")
      var fine = seeds.unionByName(fallback).localCheckpoint()

      for (_ <- 1 to iters) {
        val cands = fine
          .select(col("coarse_id"), struct(col("fid"), col("cv")).as("fc"))
          .groupBy("coarse_id").agg(sort_array(collect_list(col("fc"))).as("_cands"))
        val asg = s0.join(cands, Seq("coarse_id"))
          .withColumn("fid", nearestCentroidIn(col("v"), col("_cands")))
        val means = asg
          .select(col("coarse_id"), col("fid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("coarse_id", "fid", "pos").agg(avg("x").as("m"))
          .groupBy("coarse_id", "fid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            e => e.getField("m").cast("float")).as("next"))
        fine = fine.select(col("coarse_id"), col("fid"), col("cv").as("prev"))
          .join(means, Seq("coarse_id", "fid"), "left_outer")
          .select(col("coarse_id"), col("fid"),
            coalesce(col("next"), col("prev")).as("cv"))
          .localCheckpoint()
      }

      RoutedQuantizer(coarse,
        fine.select(col("coarse_id").cast("int"),
            (col("coarse_id") * finePer + col("fid")).cast("int").as("cluster"),
            col("cv"))
          .localCheckpoint())
    } finally s0.unpersist()
  }

  /** K scaled with the data, like [[IvfIndex.fitScaled]] — but the
    * K-proportional artifact is a table, so the sizing rule no longer
    * carries a driver/plan liability.
    */
  def fitScaled(emb: DataFrame, vecCol: String, targetClusterSize: Long,
                minK: Int = 16, seed: Long = 42L): RoutedQuantizer = {
    val n = emb.count()
    val k = math.max(minK.toLong, (n + targetClusterSize - 1) / targetClusterSize)
    fitCached(emb, vecCol, math.min(k, Int.MaxValue.toLong).toInt, seed)
  }

  /** Fitted-quantizer registry, keyed like [[IvfIndex.fitCached]] on
    * the input's content fingerprint + plan hash: both the keyed query
    * and its oracle builder (same session) must see the IDENTICAL fine
    * table — k-means means are floating-point aggregations whose
    * low bits vary run to run, so the fit runs once and is shared.
    */
  private val fitted = new java.util.concurrent.ConcurrentHashMap[String, RoutedQuantizer]()

  def fitCached(emb: DataFrame, vecCol: String, k: Int, seed: Long = 42L): RoutedQuantizer =
    fitted.computeIfAbsent(
      Artifacts.fingerprintInput(emb,
        s"routed $vecCol $k $seed ${emb.queryExecution.analyzed.semanticHash()}"),
      _ => fit(emb, vecCol, k, seed))

  /** Persist the quantizer as the TABLE artifact it is: the √K coarse
    * matrix as the usual tiny centroid parquet, the fine table as a
    * coarse_id-sorted parquet a reload broadcast-joins (or
    * shuffle-joins, at scale) — never a plan literal.
    */
  def write(spark: SparkSession, rq: RoutedQuantizer, path: String): Unit = {
    IvfIndex.writeCentroids(spark, rq.coarse, s"$path/coarse")
    rq.fine.repartitionByRange(col("coarse_id"), col("cluster"))
      .sortWithinPartitions("coarse_id", "cluster")
      .write.mode("overwrite").parquet(s"$path/fine")
  }

  def read(spark: SparkSession, path: String): RoutedQuantizer =
    RoutedQuantizer(
      IvfIndex.readCentroids(spark, s"$path/coarse"),
      spark.read.parquet(s"$path/fine"))

  /** BATCH two-level routed search — the routed member of the batch
    * family beside [[Knn.searchBatchIvf]]: the base assigns ONCE
    * through the fine-table join; every query routes MAP-SIDE (coarse
    * cells from the √K literal via
    * [[graft.functions.nearestCentroids]], then its fine probes from a
    * per-query bounded window over the routed cells' fine rows —
    * coarseProbe × finePerCell candidates each, never the whole fine
    * table); the (q_id, cluster) probe pairs equi-join the clustered
    * base (both sides corpus-proportional, co-partitioned — never
    * broadcast), and the bounded heap cuts top-k per query. Shuffle =
    * O(n + |q| × (coarseProbe·√K + k)). coarseProbe = coarseK and
    * nprobe = K degenerate to exactly [[Knn.searchBatch]].
    */
  def searchBatch(base: DataFrame, baseId: String, baseVec: String,
                  queries: DataFrame, queryId: String, queryVec: String,
                  rq: RoutedQuantizer, k: Int, coarseProbe: Int, nprobe: Int,
                  metric: String = "l2"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val topk = udaf(new TopKNeighbors(k), Encoders.product[Neighbor])
    val clustered = rq.assign(
      base.select(col(baseId).as("id"), col(baseVec).as("b_vec")), "b_vec")
    val q = queries.select(col(queryId).as("q_id"), col(queryVec).as("q_vec"))
    val probed = q
      .withColumn("coarse_id",
        explode(nearestCentroids(col("q_vec"), rq.coarse, coarseProbe)))
      .join(rq.fine, Seq("coarse_id"))
      .select(col("q_id"), col("cluster"),
        vecL2Sq(col("q_vec"), col("cv")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2"), col("cluster"))))
      .where(col("rn") <= nprobe)
      .select(col("q_id"), col("cluster"))
    val flip = metric == "ip" || metric == "cosine"
    clustered.join(probed, Seq("cluster"))
      .join(q, Seq("q_id"))
      .select(col("q_id"), col("id"),
        Knn.score(metric, col("b_vec"), col("q_vec")).as("dist"))
      .groupBy(col("q_id"))
      .agg(topk(col("id"), col("dist")).as("nn"))
      .select(col("q_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("q_id"), (col("pos") + 1).as("rank"), col("n.id").as("n_id"),
        roundTo(if (flip) -col("n.dist") else col("n.dist"), 4).as("value"))
  }

  /** Two-level IVF search: route the query (coarse cells on the driver
    * — √K literal work; fine probes from ONE bounded collect of the
    * routed cells' fine rows), pre-prune the scan by the COARSE cells
    * (a codegen literal predicate — at scale, a partition filter), then
    * the fine in-cell argmin keeps only the `nprobe` probed fine
    * clusters, and the survivors re-rank exactly. nprobe = k_fine and
    * coarseProbe = coarseK degenerate to exact brute force.
    */
  def search(emb: DataFrame, idCol: String, vecCol: String, rq: RoutedQuantizer,
             queryVec: Array[Float], k: Int, coarseProbe: Int, nprobe: Int,
             metric: String = "l2"): DataFrame = {
    val cells = rq.coarseProbes(queryVec, coarseProbe)
    val probed = rq.probes(queryVec, coarseProbe, nprobe)
    if (cells.isEmpty)
      return Knn.searchExact(emb, idCol, vecCol, queryVec, k, metric)
    val narrowed = emb.where(nearestCentroid(col(vecCol), rq.coarse).isin(cells: _*))
    val pruned = rq.assign(narrowed, vecCol).where(col("cluster").isin(probed: _*))
    Knn.searchExact(pruned, idCol, vecCol, queryVec, k, metric)
  }
}
