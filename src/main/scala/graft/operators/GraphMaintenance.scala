package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions._

/** The crash-safe mutation protocol for a path-backed GRAPH artifact —
  * the maintained-serving lifecycle behind
  * [[graft.api.VectorIndex]]'s insert / upsert / delete verbs
  * (reference contract: db/vector_database.rs:24-83 latest-wins
  * upsert, faiss_index.rs:131 remove_vectors).
  *
  * Why a protocol: a mutation is several physical steps (advance the
  * `_gen` counter, append the batch to the cluster-partitioned data
  * layout, append its symmetrized serving edges, tombstone the
  * superseded standing rows, heal routing) and a crash between any two
  * must never lose an id. The ordering here makes every step
  * idempotent and the whole sequence resumable:
  *
  *  1. `_inflight` marker (`{verb, gen}`, write-temp-then-rename) lands
  *     FIRST — it is the redo log entry.
  *  2. The DATA batch appends at generation `g` (one atomic Spark write
  *     job). From this moment the replacement rows exist; nothing below
  *     can make an id vanish.
  *  3. [[complete]] finishes everything else, driven only by the marker
  *     and the artifact state — so a crashed mutation is finished by
  *     the next verb or by [[graft.api.VectorIndex.load]]:
  *     serve-edge append (skipped if gen-`g` edge rows already exist —
  *     the edge write is one atomic job, so any row means all rows),
  *     tombstone of superseded rows at `upto = g-1` (recomputed from
  *     the data itself: ids with rows at BOTH gen `g` and gen `< g`;
  *     re-appending is idempotent under the max-`upto` read rule),
  *     medoid-entry heal, starved-node re-link, marker clear.
  *
  * Failure modes by window (the crash-injection matrix in ApiSpec):
  * before step 2 — the mutation simply never happened (a generation
  * number is skipped, which nothing observes); between 2 and the
  * tombstone — the id briefly serves BOTH generations (duplicate, never
  * neither) until recovery publishes the tombstone; after the
  * tombstone — only healing remains, and healing is derivable from the
  * live view alone. An id therefore always serves exactly its latest
  * or its pre-batch vector — never neither, never a stale score.
  *
  * Bookkeeping stays O(batch), not O(corpus): the standing-id probe
  * reads the `_ids` sidecar (narrow (id, gen) rows, id-sorted with
  * small row groups so an `id IN (batch)` probe prunes at row-group
  * grain), and the auto-compact policy reads the `_rowcount` manifest
  * (maintained under the lease) instead of counting the data table per
  * mutation.
  */
object GraphMaintenance {

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataPath(p: String) = s"$p/data"
  private def edgesPath(p: String) = s"$p/serve/edges"
  private def entriesPath(p: String) = s"$p/serve/entries"
  private def idsPath(p: String) = s"$p/_ids"

  /** Measurement seam for the recall-under-churn experiment (AnnSpec's
    * CHURN.json): the session conf `spark.graft.graph.heals` (default
    * true) disables the routing heals so the curve can price what they
    * buy — the control arm of the with/without comparison. A conf read
    * once per verb, not a mutable global: the previous `@volatile var`
    * was a race surface (any thread's write changed every in-flight
    * mutation's behavior); a session conf is scoped, observable in the
    * Spark UI, and needs no try/finally discipline beyond unset.
    */
  private def healsEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.graph.heals").forall(_.toBoolean)

  /** Row-group size for serve-edge files: small enough that an
    * `src_id IN (...)` probe (the re-link heal, frontier-style lookups)
    * prunes to a few megabytes regardless of corpus size — with the
    * default 128 MB row groups a range-partitioned edge file is ONE
    * row group and any probe reads the whole file, i.e. grows linearly
    * with the corpus. 4 MB keeps footer overhead negligible for full
    * scans while giving statistics-based pruning real granularity.
    */
  private[operators] val EdgeBlockBytes: Long = 4L << 20

  // ---------------------------------------------------------------- marker

  /** One in-flight mutation: its verb (insert / upsert / delete — only
    * used for observability; recovery derives everything from state)
    * and the generation it stamped.
    */
  final case class Inflight(verb: String, gen: Long)

  private def markerPath(p: String) = new Path(s"$p/_inflight")

  def inflight(spark: SparkSession, p: String): Option[Inflight] = {
    val fs = fsOf(spark, p)
    val mp = markerPath(p)
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      val verb = "\"verb\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(raw).map(_.group(1))
      val gen = "\"gen\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(raw).map(_.group(1).toLong)
      Some(Inflight(verb.getOrElse("unknown"), gen.getOrElse(
        throw new IllegalStateException(s"unreadable _inflight marker at $p: '$raw'"))))
    }
  }

  private[graft] def writeMarker(spark: SparkSession, p: String, verb: String, g: Long): Unit = {
    val fs = fsOf(spark, p)
    val tmp = new Path(s"$p/_inflight_tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"verb": "$verb", "gen": $g}""".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(markerPath(p))) fs.delete(markerPath(p), false)
    require(fs.rename(tmp, markerPath(p)), s"_inflight marker rename failed for $p")
  }

  def clearMarker(spark: SparkSession, p: String): Unit = {
    val fs = fsOf(spark, p)
    if (fs.exists(markerPath(p))) fs.delete(markerPath(p), false)
    val tmp = new Path(s"$p/_inflight_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false)
  }

  // ------------------------------------------------------------ _ids probe

  /** Max batch ids collected to the driver for an `id IN (...)` probe
    * (row-group-pruned footer read); bigger batches fall back to a
    * distributed semi-join over the narrow sidecar.
    */
  private val ProbeIsinMax = 8192

  def idsPresent(spark: SparkSession, p: String): Boolean =
    fsOf(spark, p).exists(new Path(idsPath(p)))

  /** Append the batch's (id, gen) rows to the `_ids` probe sidecar:
    * id-sorted, one file, 1 MB row groups — so a later standing-id
    * probe for a small batch reads O(touched row groups), flat in
    * corpus size, instead of scanning the data table's id column.
    */
  def appendIds(spark: SparkSession, p: String, ids: DataFrame, g: Long): Unit =
    ids.select(col(ids.columns.head).cast("long").as("id"), lit(g).as("gen"))
      .repartition(1).sortWithinPartitions("id")
      .write.mode("append").option("parquet.block.size", (1L << 20).toString)
      .parquet(idsPath(p))

  /** Write the sidecar fresh (save / compact): the full live id set at
    * one generation stamp per row, id-sorted with small row groups.
    */
  def writeIds(spark: SparkSession, p: String, idsWithGen: DataFrame): Unit =
    idsWithGen.select(col("id").cast("long"), col("gen").cast("long"))
      .repartition(1).sortWithinPartitions("id")
      .write.mode("overwrite").option("parquet.block.size", (1L << 20).toString)
      .parquet(idsPath(p))

  /** PHYSICAL standing (id, gen) rows — the `_ids` sidecar when the
    * artifact has one (probe-pruned reads), else the data layout's
    * projected columns (legacy artifacts saved before the sidecar
    * existed — a narrow corpus scan, the shape this sidecar removes).
    */
  def standingIds(spark: SparkSession, p: String): DataFrame =
    if (idsPresent(spark, p))
      spark.read.parquet(idsPath(p)).select(col("id"), col("gen"))
    else
      Tombstones.readWithGen(spark, dataPath(p)).select(col("id"), col("gen"))

  /** The standing (id, gen) rows whose id appears in `batchIds` — the
    * one probe every mutation needs. Small batches push an `id IN`
    * predicate into the sidecar scan (row-group pruning: flat input
    * bytes as the corpus grows); large batches degrade to a semi-join.
    */
  def standingOverlap(spark: SparkSession, p: String, batchIds: DataFrame): DataFrame = {
    val standing = standingIds(spark, p)
    val sample = batchIds.select(col(batchIds.columns.head).cast("long").as("id"))
      .limit(ProbeIsinMax + 1).collect().map(_.getLong(0))
    if (sample.length <= ProbeIsinMax)
      standing.where(col("id").isin(sample.map(Long.box): _*))
    else
      standing.join(batchIds.select(col(batchIds.columns.head).cast("long").as("id")),
        Seq("id"), "leftsemi")
  }

  /** LIVE overlap: the [[standingOverlap]] rows that survive the
    * generation-aware tombstone rule — what the insert verb's
    * new-nodes-only guard checks.
    */
  def liveOverlap(spark: SparkSession, p: String, batchIds: DataFrame): DataFrame =
    Tombstones.filterGen(standingOverlap(spark, p, batchIds), p, "id", "gen")

  // ------------------------------------------------------------- _rowcount

  private def rowcountPath(p: String) = new Path(s"$p/_rowcount")

  /** (physical data rows, as-of generation) — maintained under the
    * lease so [[Tombstones.maybeCompact]]'s growth policy never pays a
    * corpus-wide `count()` per mutation. None on legacy artifacts.
    */
  def readRowCount(spark: SparkSession, p: String): Option[(Long, Long)] = {
    val fs = fsOf(spark, p)
    val rp = rowcountPath(p)
    if (!fs.exists(rp)) None
    else {
      val in = fs.open(rp)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      val parts = raw.trim.split(",")
      scala.util.Try((parts(0).toLong, parts(1).toLong)).toOption
    }
  }

  def writeRowCount(spark: SparkSession, p: String, rows: Long, g: Long): Unit = {
    val fs = fsOf(spark, p)
    val tmp = new Path(s"$p/_rowcount_tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$rows,$g".getBytes("UTF-8")) finally out.close()
    if (fs.exists(rowcountPath(p))) fs.delete(rowcountPath(p), false)
    require(fs.rename(tmp, rowcountPath(p)), s"_rowcount rename failed for $p")
  }

  def clearRowCount(spark: SparkSession, p: String): Unit = {
    val fs = fsOf(spark, p)
    if (fs.exists(rowcountPath(p))) fs.delete(rowcountPath(p), false)
    val tmp = new Path(s"$p/_rowcount_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false)
  }

  /** Physical data rows for the growth policy: the maintained manifest
    * when present, else one narrow count (legacy artifacts only pay it
    * until their next save/compact writes the manifest).
    */
  def physicalRows(spark: SparkSession, p: String): Long =
    readRowCount(spark, p).map(_._1).getOrElse(
      standingIds(spark, p).count())

  /** The tables a GRAPH tombstone fold rewrites, each with its
    * persisted layout reproduced (cluster partitioning on data,
    * src-range sort on the serving edges, id sort on the probe
    * sidecar). An edge dies if EITHER endpoint's tombstone covers its
    * generation; a dead medoid entry disappears (and [[refreshEntries]]
    * re-seeds its cluster) — exactly the read-time filter's semantics,
    * so compaction preserves serve-equality. `_ids` folds only when the
    * artifact has one (legacy artifacts gain it at their next save).
    */
  def compactTables(spark: SparkSession, p: String): Seq[Tombstones.TombTable] = {
    val base = Seq(
      Tombstones.TombTable("data", Seq("id"), partitionCols = Seq("cluster"),
        genCol = Some("gen")),
      Tombstones.TombTable("serve/edges", Seq("src_id", "dst_id"),
        sortCols = Seq("src_id", "dst_id"), genCol = Some("gen"),
        blockBytes = Some(EdgeBlockBytes)),
      Tombstones.TombTable("serve/entries", Seq("id"), genCol = Some("gen")))
    if (idsPresent(spark, p))
      base :+ Tombstones.TombTable("_ids", Seq("id"), sortCols = Seq("id"),
        genCol = Some("gen"), blockBytes = Some(1L << 20))
    else base
  }

  // ---------------------------------------------------------------- verbs

  /** Ingest a normalized batch (insert or upsert — the caller did its
    * verb-specific guards) under the marker protocol. Assumes the lease
    * is held and any PRIOR marker was already completed.
    */
  def ingest(spark: SparkSession, p: String, batch: DataFrame,
             q: GraphQuantizer, k: Int, metric: String,
             verb: String): Unit = {
    val g = Tombstones.nextGen(spark, p)
    writeMarker(spark, p, verb, g)
    // the point of no-loss: once this single atomic write commits, the
    // batch's vectors exist at gen g and every later step only ever
    // ADDS visibility (edges) or REMOVES superseded rows (tombstones).
    // The frozen quantizer (flat literal or routed table) assigns the
    // batch's cluster partitions — the ONE quantizer touch of ingest.
    q.withCluster(batch.withColumn("gen", lit(g)), "vectors")
      .write.mode("append").partitionBy("cluster").parquet(dataPath(p))
    complete(spark, p, q, k, metric)
  }

  /** Tombstone `ids` under the marker protocol: the delete advances the
    * generation too (tombstone at `upto = g-1` ≡ "everything prior"),
    * so its healing appends carry their own stamp and a crashed delete
    * is detectable like any other mutation.
    */
  def remove(spark: SparkSession, p: String, ids: DataFrame,
             q: GraphQuantizer, k: Int, metric: String): Unit = {
    val g = Tombstones.nextGen(spark, p)
    writeMarker(spark, p, "delete", g)
    Tombstones.appendUpto(spark, p, ids.select(col(ids.columns.head).cast("long")), g - 1)
    complete(spark, p, q, k, metric)
  }

  /** Finish (or resume) the in-flight mutation — every step below is a
    * no-op when its effect already landed, so this is safe to call any
    * number of times, from the verb itself or from crash recovery.
    */
  def complete(spark: SparkSession, p: String,
               q: GraphQuantizer, k: Int, metric: String): Unit =
    inflight(spark, p).foreach { m =>
      val g = m.gen
      val dataG = Tombstones.readWithGen(spark, dataPath(p))
        .where(col("gen") === g)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val landed = dataG.limit(1).collect().nonEmpty
        if (landed) {
          val batchIds = dataG.select(col("id"))
          // (a) probe sidecar — before any probe could consult it
          if (idsPresent(spark, p)
              && spark.read.parquet(idsPath(p)).where(col("gen") === g)
                   .limit(1).collect().isEmpty)
            appendIds(spark, p, batchIds, g)
          // (b) serving edges for the batch (atomic job ⇒ any gen-g row
          // means the step completed)
          if (Tombstones.readWithGen(spark, edgesPath(p)).where(col("gen") === g)
                .limit(1).collect().isEmpty)
            appendServeEdges(spark, p, dataG, k, metric, g)
          // (c) supersede the standing rows of the batch's ids — the
          // PUBLISH step: until here both generations served (duplicate,
          // never lost); from here exactly the latest serves. Probing
          // gen < g keeps this recomputable and idempotent.
          val changed = standingOverlap(spark, p, batchIds)
            .where(col("gen") < g).select("id").distinct()
          if (changed.limit(1).collect().nonEmpty)
            Tombstones.appendUpto(spark, p, changed, g - 1)
          // (d) growth-policy manifest
          readRowCount(spark, p).foreach { case (n, asOf) =>
            if (asOf < g) writeRowCount(spark, p, n + dataG.count(), g)
          }
        }
      } finally dataG.unpersist()
      // (e) + (f) routing heals — derived from the live view alone, so
      // they need nothing from the lost batch context
      if (healsEnabled(spark)) {
        refreshEntries(spark, p, q, g)
        relinkStarved(spark, p, k, metric, g)
      }
      // (g) live-entry manifest: the serve-time route auto-switch reads
      // this instead of the build-time routeK² proxy, so an artifact
      // that grows past the threshold under inserts flips the switch
      // without a re-save. One narrow count of the K-bounded entries.
      GraphAnn.writeEntryCount(spark, s"$p/serve",
        Tombstones.filterGen(
          Tombstones.readWithGen(spark, entriesPath(p)), p, "id", "gen").count())
      clearMarker(spark, p)
      if (Tombstones.maybeCompact(spark, p, compactTables(spark, p),
            physicalRows(spark, p)))
        afterCompact(spark, p, q, g)
    }

  /** Post-compaction fixups: the fold just changed the physical row set
    * (refresh the growth-policy manifest from the narrow sidecar) and
    * may have dropped dead medoid entries (re-seed their clusters so
    * the routing invariant — every cluster with live rows has a live
    * entry — holds without waiting for the next mutation).
    */
  def afterCompact(spark: SparkSession, p: String,
                   q: GraphQuantizer, g: Long): Unit = {
    writeRowCount(spark, p, standingIds(spark, p).count(), g)
    refreshEntries(spark, p, q, g)
    GraphAnn.writeEntryCount(spark, s"$p/serve",
      Tombstones.filterGen(
        Tombstones.readWithGen(spark, entriesPath(p)), p, "id", "gen").count())
  }

  /** Resume an orphaned mutation if one is in flight (verb entry /
    * load-time recovery). Assumes the lease is held.
    */
  def recoverIfInflight(spark: SparkSession, p: String,
                        q: GraphQuantizer, k: Int, metric: String): Unit =
    if (inflight(spark, p).isDefined) complete(spark, p, q, k, metric)

  // ---------------------------------------------------------------- edges

  /** Build and append the serving edges for the gen-`g` data slice —
    * exactly the edges [[Knn.appendGraphEdges]] would have produced for
    * the batch BEFORE it joined the layout: candidates are the touched
    * clusters' LIVE standing rows at gen < `g`, minus the batch ids'
    * own superseded rows (the tombstone may not have landed yet — the
    * anti-join makes the exclusion unconditional), plus the batch
    * itself; edges symmetrize with destination vectors attached and
    * append at gen `g`.
    */
  private[graft] def appendServeEdges(spark: SparkSession, p: String, dataG: DataFrame,
                               k: Int, metric: String,
                               g: Long): Unit = {
    // quantizer-AGNOSTIC: both sides read the `cluster` the data layout
    // PERSISTS (written by the frozen quantizer at their own ingest) —
    // re-deriving it here would need the quantizer and compute the
    // identical value
    val batch = dataG.select(col("id"), col("vectors"),
      col("cluster").cast("int").as("cluster"))
    val touched = dataG.select(col("cluster").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val standing = Tombstones.filterGen(
        Tombstones.readWithGen(spark, dataPath(p))
          .where(col("cluster").isin(touched: _*)).where(col("gen") < g),
        p, "id", "gen")
      .join(batch.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("vectors"), col("cluster").cast("int").as("cluster"))
    val cand = standing.unionByName(batch)
    val edges = Knn.clusteredGraphEdges(
        batch.select(col("id").as("q_id"), col("vectors").as("q_vec"), col("cluster")),
        cand.select(col("id"), col("vectors").as("n_vec"), col("cluster")),
        k, metric)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val directed = edges.select(col("q_id").as("src_id"), col("n_id").as("dst_id"))
      val sym = directed.unionByName(
        directed.select(col("dst_id").as("src_id"), col("src_id").as("dst_id")))
        .distinct()
      sym.join(cand.select(col("id").as("dst_id"), col("vectors").as("dst_vec")), "dst_id")
        .select(col("src_id"), col("dst_id"), col("dst_vec"), lit(g).as("gen"))
        .write.mode("append")
        .option("parquet.block.size", EdgeBlockBytes.toString)
        .parquet(edgesPath(p))
    } finally edges.unpersist()
  }

  // ---------------------------------------------------------------- heals

  /** Entry-point heal: every cluster with live data rows must have a
    * live medoid entry, or the beam walk starves (an upserted/deleted
    * id that WAS an entry takes its cluster's routing with it — the
    * attrition that would otherwise leave searchBeam returning zero
    * rows on a non-empty index). Recomputes the medoid (nearest live
    * row to the centroid, ties to lowest id) for exactly the clusters
    * missing one and appends it at gen `g`. Clusters with no live rows
    * stay entry-less (nothing to route to); the check itself is
    * K-bounded plus one partition-pruned scan of the affected clusters.
    */
  def refreshEntries(spark: SparkSession, p: String,
                     q: GraphQuantizer, g: Long): Unit = {
    val liveEntries = Tombstones.filterGen(
      Tombstones.readWithGen(spark, entriesPath(p)), p, "id", "gen")
    // clusters that HAVE a live entry, as a frame — never a driver
    // collect of the full cluster set (K-proportional at routed K)
    val haveDf = liveEntries.select(col("cluster").cast("int").as("cluster")).distinct()
    // clusters missing an entry, with their centroid vector attached —
    // the quantizer's cluster table is a tiny literal (flat) or the
    // fine TABLE (routed); Spark broadcasts whichever side fits
    val missingCv = q.clusterTable(spark).join(haveDf, Seq("cluster"), "left_anti")
    // partition-prune the data scan to the missing clusters when their
    // count is probe-small (heals are batch-bounded in practice: the
    // missing set is the clusters THIS batch's tombstones emptied); a
    // pathological set degrades to the unpruned join instead of a
    // K-proportional driver list
    val missingSmall = missingCv.select(col("cluster"))
      .limit(RelinkIsinMax + 1).collect().map(_.getInt(0))
    if (missingSmall.isEmpty) return
    val live0 = Tombstones.filterGen(
      Tombstones.readWithGen(spark, dataPath(p)), p, "id", "gen")
    val live =
      if (missingSmall.length <= RelinkIsinMax)
        live0.where(col("cluster").isin(missingSmall.map(Int.box): _*))
      else live0
    val medoids = live.select(col("cluster").cast("int").as("cluster"),
        col("id"), col("vectors"))
      .join(missingCv, Seq("cluster"))
      .withColumn("d2", vecL2Sq(col("vectors"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster").orderBy(col("d2"), col("id"))))
      .where(col("rn") === 1)
      .select(col("cluster"), col("id"), col("vectors").as("vec"), lit(g).as("gen"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (medoids.limit(1).collect().nonEmpty) {
        // route upkeep: a routed layout's re-seeded entry joins the route
        // table at append (assigned against the FROZEN route centroids,
        // like data rows against the frozen coarse quantizer) — without
        // this, one heal appends a route-less row and a routed artifact
        // silently degrades to unrouted (the routed walk would never
        // start from the healed entry). Legacy route-less layouts append
        // the original schema unchanged.
        val routeDir = s"$p/serve/route"
        val hasRoute = fsOf(spark, p).exists(new Path(routeDir))
        val stamped =
          if (hasRoute)
            medoids.withColumn("route_cell",
              nearestCentroid(col("vec"), IvfIndex.readCentroids(spark, routeDir)))
          else medoids
        stamped.write.mode("append").parquet(entriesPath(p))
      }
    } finally medoids.unpersist()
  }

  /** Cap on ids pulled to the driver for an edge-table probe: victims
    * are batch-sized and affected nodes are their neighbors, so typical
    * mutations stay far below it; a pathological batch degrades to the
    * distributed (semi-join, unpruned) path instead of failing.
    */
  private val RelinkIsinMax = 4096

  /** Collect up to [[RelinkIsinMax]] longs; None = too many (fall back
    * to the distributed path).
    */
  private def smallIds(df: DataFrame): Option[Array[Long]] = {
    val got = df.limit(RelinkIsinMax + 1).collect().map(_.getLong(0))
    if (got.length <= RelinkIsinMax) Some(got) else None
  }

  private def inIds(c: org.apache.spark.sql.Column, ids: Array[Long]) =
    c.isin(ids.map(Long.box): _*)

  /** Re-link heal: a standing node whose edges died with this batch's
    * victims (the superseded/deleted ids — exactly the sidecar rows at
    * `upto = g-1`) can end up with a starved live out-degree; HNSW's
    * remove+reinsert suffers the same attrition. For every LIVE node
    * that pointed at a victim and now holds fewer than k/2 live
    * out-edges, recompute its top-k against its own cluster's live rows
    * and append the missing edges (both directions, gen `g`).
    *
    * O(batch), not O(edges): the serving layout is SYMMETRIZED (both
    * directions of every pair are written together and die together
    * under the either-endpoint tombstone rule), so "nodes that pointed
    * at a victim" ≡ "out-neighbors of the victims" — which an
    * `src_id IN (victims)` predicate finds with parquet row-group
    * pruning on the src-sorted edge files. Victims / affected / starved
    * sets are batch-bounded by construction and ride the driver as IN
    * lists (capped — an oversized batch degrades to semi-joins); the
    * candidate scan is partition-pruned to the starved nodes' clusters.
    */
  def relinkStarved(spark: SparkSession, p: String,
                    k: Int, metric: String,
                    g: Long): Unit = {
    if (!Tombstones.present(spark, p)) return
    // victims = THIS batch's tombstone appends, probed on the RAW
    // sidecar rows (upto_gen = g-1): the max-folded tombs() view would
    // hide an id that ALSO carries a legacy kill-forever row (upto =
    // MaxValue folds over g-1) and silently skip its neighbors' heal
    val victimsDf = Tombstones.rawUpto(spark, p, g - 1).select(col("id"))
    val victims = smallIds(victimsDf)
    if (victims.exists(_.isEmpty)) return
    val edgesPhys = Tombstones.readWithGen(spark, edgesPath(p))
    // out-neighbors of the victims ≡ their in-neighbors (symmetrized
    // layout) — src-side probe, row-group pruned
    val affectedDf = (victims match {
      case Some(ids) => edgesPhys.where(inIds(col("src_id"), ids))
      case None => edgesPhys.join(victimsDf.withColumnRenamed("id", "src_id"),
        Seq("src_id"), "leftsemi")
    }).select(col("dst_id").as("id")).distinct()
    val affectedLiveDf = Tombstones.filterGen(
      standingIds(spark, p).join(affectedDf, Seq("id"), "leftsemi"), p, "id", "gen")
      .select("id").distinct()
    val affected = smallIds(affectedLiveDf)
    if (affected.exists(_.isEmpty)) return
    val affectedEdges = (affected match {
      case Some(ids) => edgesPhys.where(inIds(col("src_id"), ids))
      case None => edgesPhys.join(affectedLiveDf.withColumnRenamed("id", "src_id"),
        Seq("src_id"), "leftsemi")
    })
    val liveEdges = Tombstones.filterEdgesGen(affectedEdges, p, "src_id", "dst_id", "gen")
      .select(col("src_id"), col("dst_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = liveEdges.groupBy("src_id").agg(count(lit(1)).as("deg"))
      val starvedDf = affectedLiveDf
        .join(deg.withColumnRenamed("src_id", "id"), Seq("id"), "left_outer")
        .where(coalesce(col("deg"), lit(0L)) < math.max(1, k / 2))
        .select("id")
      val starved = smallIds(starvedDf)
      if (starved.exists(_.isEmpty)) return
      val live = Tombstones.filterGen(
        Tombstones.readWithGen(spark, dataPath(p)), p, "id", "gen")
      val starvedRows = (starved match {
        case Some(ids) => live.where(inIds(col("id"), ids))
        case None => live.join(starvedDf, Seq("id"), "leftsemi")
      }).select(col("id"), col("vectors"), col("cluster").cast("int").as("cluster"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val clusters = starvedRows.select("cluster").distinct()
          .collect().map(_.getInt(0)).toSeq
        if (clusters.isEmpty) return
        // quantizer-agnostic: both sides carry the PERSISTED cluster of
        // the frozen quantizer (flat or routed) — no re-assignment
        val cand = live.where(col("cluster").isin(clusters: _*))
          .select(col("id"), col("vectors"), col("cluster").cast("int").as("cluster"))
        val fresh = Knn.clusteredGraphEdges(
            starvedRows.select(col("id").as("q_id"), col("vectors").as("q_vec"),
              col("cluster")),
            cand.select(col("id"), col("vectors").as("n_vec"), col("cluster")),
            k, metric)
          .select(col("q_id").as("src_id"), col("n_id").as("dst_id"))
          .join(liveEdges, Seq("src_id", "dst_id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          if (fresh.limit(1).collect().isEmpty) return
          val sym = fresh.unionByName(
            fresh.select(col("dst_id").as("src_id"), col("src_id").as("dst_id")))
            .distinct()
          sym.join(live.select(col("id").as("dst_id"), col("vectors").as("dst_vec")),
              "dst_id")
            .select(col("src_id"), col("dst_id"), col("dst_vec"), lit(g).as("gen"))
            .write.mode("append")
            .option("parquet.block.size", EdgeBlockBytes.toString)
            .parquet(edgesPath(p))
        } finally fresh.unpersist()
      } finally starvedRows.unpersist()
    } finally liveEdges.unpersist()
  }
}
