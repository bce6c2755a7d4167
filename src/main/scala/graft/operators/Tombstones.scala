package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delete lifecycle for the persisted artifacts (reference:
  * faiss_index.rs:131 remove_vectors, vector_database.rs:32-38): every
  * written-once layout gets a DELETE twin to go with its append twin,
  * without rebuilding the artifact.
  *
  *  - A deletion appends the ids to a `_tombstones/` parquet sidecar
  *    INSIDE the artifact dir. The underscore prefix makes it invisible
  *    to plain `spark.read.parquet(artifact)` (Spark's hidden-path
  *    filter) and ties its lifetime to the artifact version: a corpus
  *    rewrite GCs artifact + tombstones together ([[Artifacts]]).
  *  - Readers apply the sidecar as an anti-join AT READ TIME
  *    ([[filter]]) — when no deletion ever happened the plan is
  *    UNCHANGED (a driver-side fs metadata probe, no join node), so
  *    hash gates and plan guards on the no-delete path are unaffected.
  *  - [[compact]] folds the tombstones into the data files (rewrite
  *    minus deleted ids, crash-safe deterministic-sibling swap — the
  *    [[Retrieval.compactPostings]] discipline) and clears the sidecar,
  *    so post-compaction plans carry no anti-join at all.
  *
  * The sidecar schema is one LONG column `id` regardless of the
  * artifact's own id column name; filters name the artifact column
  * explicitly (a graph artifact filters BOTH endpoint columns).
  */
object Tombstones {

  private val subdir = "_tombstones"

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True iff the artifact has live tombstones — one driver-side
    * metadata probe.
    */
  def present(spark: SparkSession, base: String): Boolean =
    fsOf(spark, base).exists(new Path(s"$base/$subdir"))

  /** Tombstone ids as a 1-column (`id` LONG) frame. */
  def ids(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(s"$base/$subdir").select(col("id").cast("long").as("id"))

  /** Append deletions: `idsDf`'s FIRST column (cast long) are the ids to
    * tombstone. Idempotent at read time (the anti-join dedups); appends
    * under the artifact's own directory so the ids version with it.
    * Rows written here carry no generation bound, so generation-aware
    * readers treat them as kill-EVERY-generation ([[tombs]]).
    */
  def append(spark: SparkSession, base: String, idsDf: DataFrame): Unit =
    idsDf.select(col(idsDf.columns.head).cast("long").as("id"))
      .write.mode("append").parquet(s"$base/$subdir")

  /** Generation-SCOPED tombstone: kills only the rows of each id whose
    * `gen` stamp is <= `uptoGen`; rows appended later (a higher
    * generation) survive the read filter. This is what makes the
    * in-place upsert verb append-only — tombstone the standing rows at
    * upto = g-1, append the replacement batch at gen = g — and lets a
    * deleted id be REUSED without a compact (delete at upto = current
    * generation, re-insert at a later one). Plain [[append]] rows read
    * as upto = Long.MaxValue (delete-forever, the pre-generation
    * semantics old sidecars carry).
    */
  def appendUpto(spark: SparkSession, base: String, idsDf: DataFrame, uptoGen: Long): Unit =
    idsDf.select(col(idsDf.columns.head).cast("long").as("id"),
        lit(uptoGen).as("upto_gen"))
      .write.mode("append").parquet(s"$base/$subdir")

  /** The sidecar folded to (id, upto): the highest generation each dead
    * id's tombstones cover (multiple tombstones for one id compose as
    * their max — a row dies if ANY tombstone covers its generation).
    * mergeSchema because plain [[append]] files lack the `upto_gen`
    * column; those rows coalesce to Long.MaxValue.
    */
  def tombs(spark: SparkSession, base: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(s"$base/$subdir")
    val upto =
      if (raw.columns.contains("upto_gen"))
        coalesce(col("upto_gen").cast("long"), lit(Long.MaxValue))
      else lit(Long.MaxValue)
    raw.select(col("id").cast("long").as("id"), upto.as("upto"))
      .groupBy("id").agg(max("upto").as("upto"))
  }

  /** The DISTINCT ids whose RAW sidecar rows carry exactly
    * `upto_gen = upto` — one mutation batch's own tombstone appends.
    * Deliberately NOT the max-folded [[tombs]] view: an id that also
    * carries a legacy kill-forever row (upto = MaxValue) folds past any
    * generation-scoped stamp there, which would hide it from callers
    * probing for a specific batch (the re-link heal's victim set).
    */
  def rawUpto(spark: SparkSession, base: String, upto: Long): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(s"$base/$subdir")
    if (!raw.columns.contains("upto_gen"))
      raw.select(col("id").cast("long").as("id")).limit(0)
    else
      raw.where(coalesce(col("upto_gen").cast("long"), lit(Long.MaxValue)) === upto)
        .select(col("id").cast("long").as("id")).distinct()
  }

  /** The sidecar's PUBLISHED view, folded to (id, upto): the raw rows
    * are gated by the publish rule — effective iff legacy kill-forever
    * (upto = MaxValue) or already published (upto < publishedGen) —
    * BEFORE the per-id max fold. Gating AFTER the fold is wrong: an id
    * with an older published tombstone (upto = u₀, effective) plus a
    * newer UNPUBLISHED one (upto = g−1 ≥ publishedGen, a second
    * mutation of the same doc in flight) folds to g−1, the gate drops
    * the whole fold, and the published tombstone's effect is lost — a
    * concurrent reader mid-mutation would see the previously-superseded
    * rows resurrect (duplicate doclen rows, corrupted N/avgdl/df).
    */
  def tombsPublished(spark: SparkSession, base: String, publishedGen: Long): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(s"$base/$subdir")
    val upto =
      if (raw.columns.contains("upto_gen"))
        coalesce(col("upto_gen").cast("long"), lit(Long.MaxValue))
      else lit(Long.MaxValue)
    raw.select(col("id").cast("long").as("id"), upto.as("upto"))
      .where(col("upto") === Long.MaxValue || col("upto") < publishedGen)
      .groupBy("id").agg(max("upto").as("upto"))
  }

  /** [[filterGen]] restricted to PUBLISHED tombstones: a tombstone row
    * takes effect only once the artifact's published generation has
    * moved past it (`upto < publishedGen`), with legacy kill-forever
    * rows (upto = MaxValue — written by pre-generation deletes) always
    * effective. This is the read half of the text index's atomic
    * publish: a mutation appends data at gen g and its tombstone at
    * upto = g-1 while `publishedGen = g-1`, and BOTH stay invisible
    * (rows gated by gen <= publishedGen, the tombstone by
    * upto < publishedGen) until ONE rename bumps `_pubgen` to g — so a
    * reader at any kill point sees exactly the pre-batch or the
    * post-batch index, never a mixed or duplicated state. The publish
    * gate applies to the RAW sidecar rows ([[tombsPublished]]) so an
    * in-flight second mutation of an id can never mask its standing
    * published tombstone.
    */
  def filterGenPublished(df: DataFrame, base: String, idCol: String, genCol: String,
                         publishedGen: Long): DataFrame =
    if (!present(df.sparkSession, base)) df
    else {
      val t = tombsPublished(df.sparkSession, base, publishedGen)
        .select(col("id").as("_tomb_id"), col("upto").as("_tomb_upto"))
      df.join(broadcast(t), df(idCol) === col("_tomb_id"), "left_outer")
        .where(col("_tomb_upto").isNull || df(genCol) > col("_tomb_upto"))
        .drop("_tomb_id", "_tomb_upto")
    }

  /** Read a generation-stamped table: mergeSchema (files written before
    * the table gained its `gen` column coexist with stamped appends)
    * and a guaranteed `gen` column (absent or null reads as 0 — every
    * pre-generation row belongs to generation 0 by definition).
    */
  def readWithGen(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(path)
    if (raw.columns.contains("gen"))
      raw.withColumn("gen", coalesce(col("gen").cast("long"), lit(0L)))
    else raw.withColumn("gen", lit(0L))
  }

  /** Generation-aware read filter: a row survives unless a tombstone
    * for its id covers its generation (`gen <= upto`). Strict
    * generalization of [[filter]] — a sidecar of plain rows (upto =
    * MaxValue) reproduces the anti-join exactly. No-op plan when the
    * artifact has no live tombstones. The sidecar is policy-bounded
    * (~20% of the primary table), so it broadcasts.
    */
  def filterGen(df: DataFrame, base: String, idCol: String, genCol: String): DataFrame =
    if (!present(df.sparkSession, base)) df
    else {
      val t = tombs(df.sparkSession, base)
        .select(col("id").as("_tomb_id"), col("upto").as("_tomb_upto"))
      df.join(broadcast(t), df(idCol) === col("_tomb_id"), "left_outer")
        .where(col("_tomb_upto").isNull || df(genCol) > col("_tomb_upto"))
        .drop("_tomb_id", "_tomb_upto")
    }

  /** Edge-table variant of [[filterGen]]: an edge dies if EITHER
    * endpoint has a tombstone covering the EDGE's generation — an edge
    * written at generation g referenced the endpoint rows live at g, so
    * a later tombstone (upto >= g) invalidates it, while an edge
    * appended after the tombstone (gen > upto) references the
    * endpoint's replacement rows and survives.
    */
  def filterEdgesGen(df: DataFrame, base: String, aCol: String, bCol: String,
                     genCol: String): DataFrame =
    if (!present(df.sparkSession, base)) df
    else {
      val t = tombs(df.sparkSession, base)
      val ta = t.select(col("id").as("_ta_id"), col("upto").as("_ta_upto"))
      val tb = t.select(col("id").as("_tb_id"), col("upto").as("_tb_upto"))
      df.join(broadcast(ta), df(aCol) === col("_ta_id"), "left_outer")
        .join(broadcast(tb), df(bCol) === col("_tb_id"), "left_outer")
        .where((col("_ta_upto").isNull || df(genCol) > col("_ta_upto"))
            && (col("_tb_upto").isNull || df(genCol) > col("_tb_upto")))
        .drop("_ta_id", "_ta_upto", "_tb_id", "_tb_upto")
    }

  private def genPath(base: String) = new Path(s"$base/_gen")
  private def genTmpPath(base: String) = new Path(s"$base/_gen_tmp")

  /** The artifact's mutation-generation counter (`_gen` file at the
    * artifact root, beside `_tombstone_policy`): 0 for an artifact no
    * stamped mutation ever touched. Read/advanced only under the
    * single-writer lease, so plain text is race-free.
    *
    * Crash recovery: [[nextGen]] advances write-temp-then-rename, so the
    * only reachable partial state is "`_gen` deleted, `_gen_tmp`
    * complete" — adopted here by finishing the rename. An EXISTING but
    * unparsable `_gen` is unreachable by this protocol (the pre-rename
    * temp write completed before the old file was touched), so it means
    * external interference — fail with the repair instructions instead
    * of silently restarting the counter at 0, which would let old
    * high-`upto` tombstones swallow every future mutation.
    */
  def currentGen(spark: SparkSession, base: String): Long = {
    val fs = fsOf(spark, base)
    val p = genPath(base)
    val tmp = genTmpPath(base)
    if (!fs.exists(p) && fs.exists(tmp))
      require(fs.rename(tmp, p), s"_gen recovery rename failed for $base")
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      try raw.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"unreadable generation counter $p (content: '${raw.take(40)}') — the " +
            "write-temp-then-rename protocol cannot produce this, so the file was " +
            "externally modified; repair: write max(gen) over the artifact's data " +
            "files (SELECT max(gen) FROM parquet(`data`)) into _gen, or save() a " +
            "fresh copy of the index")
      }
    }
  }

  /** Advance and persist the generation counter — one call per mutating
    * batch, under the lease. Returns the NEW generation (stamp the
    * batch's rows/edges with it; tombstone superseded rows at upto =
    * returned - 1). Atomic against crashes: the new value lands in a
    * temp sibling first, then replaces `_gen` (delete + rename — the
    * gap between them is healed by [[currentGen]]'s temp adoption, and
    * a crash before the delete just re-issues the same generation,
    * which nothing was stamped with).
    */
  def nextGen(spark: SparkSession, base: String): Long = {
    val g = currentGen(spark, base) + 1
    val fs = fsOf(spark, base)
    val tmp = genTmpPath(base)
    val out = fs.create(tmp, true)
    try out.write(g.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(genPath(base))) fs.delete(genPath(base), false)
    require(fs.rename(tmp, genPath(base)), s"_gen advance rename failed for $base")
    g
  }

  /** Drop the counter (a full artifact rewrite — save() — resets the
    * generation history along with the sidecar).
    */
  def clearGen(spark: SparkSession, base: String): Unit = {
    val fs = fsOf(spark, base)
    if (fs.exists(genPath(base))) fs.delete(genPath(base), false)
    if (fs.exists(genTmpPath(base))) fs.delete(genTmpPath(base), false)
  }

  /** DISTINCT dead ids in the sidecar — what the growth policy and the
    * stats `dead_fraction` are really about. Appends are only
    * idempotent at read time, so repeated deletes of the same ids
    * inflate the physical row count: counting raw rows would trigger
    * [[maybeCompact]]'s full rewrite prematurely and overstate (even
    * exceed 1.0) the true dead fraction. One narrow column scan of a
    * sidecar the policy bounds at ~20% of the primary table.
    */
  def rowCount(spark: SparkSession, base: String): Long =
    if (!present(spark, base)) 0L
    else spark.read.parquet(s"$base/$subdir").select("id").distinct().count()

  /** Default growth-policy threshold: auto-compact once the sidecar
    * exceeds 20% of the primary table's physical rows. Why 0.2: until
    * the fold, every read scans dead rows too — at ratio r the scan
    * amplification is 1/(1−r), so 0.2 caps it at 1.25×, and the
    * anti-join ships only the sidecar (broadcast ≤ 0.2·n ids — the
    * ScaleSpec `tombstoned_read` certificate measures that shuffle
    * flat in corpus size). Below 0.2 a compaction (a full rewrite of
    * every table) costs more than the reads it saves; above, the dead
    * fraction starts dominating scan work.
    */
  val defaultAutoCompactRatio = 0.2

  private def policyPath(base: String) = new Path(s"$base/_tombstone_policy")

  /** The artifact's recorded policy threshold — the `_tombstone_policy`
    * file inside the artifact dir (written by the first policy check,
    * versioned and GC'd with the artifact like the sidecar); absent →
    * [[defaultAutoCompactRatio]].
    */
  def policyRatio(spark: SparkSession, base: String): Double = {
    val fs = fsOf(spark, base)
    val p = policyPath(base)
    if (!fs.exists(p)) defaultAutoCompactRatio
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toDouble
      finally in.close()
    }
  }

  /** Record the threshold in the artifact's manifest file (idempotent;
    * the delete verbs call this so the policy an artifact lives under
    * is readable beside its sidecar, not buried in library defaults).
    */
  def recordPolicy(spark: SparkSession, base: String,
                   ratio: Double = defaultAutoCompactRatio): Unit = {
    val fs = fsOf(spark, base)
    val p = policyPath(base)
    if (!fs.exists(p)) {
      val out = fs.create(p, true)
      try out.write(ratio.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** The growth policy: between manual `compact` calls the sidecar
    * grows unbounded and every read pays the anti-join — so the delete
    * verbs call this after appending. Folds the sidecar in (the same
    * crash-safe [[compact]]) once its DISTINCT dead ids exceed the
    * recorded threshold × the primary table's physical rows; below it,
    * the append stays the cheap O(batch) operation it should be.
    * Returns true iff it compacted. `primaryRows` is by-name: it costs
    * a footer count and only runs when a sidecar exists.
    */
  def maybeCompact(spark: SparkSession, base: String, tables: Seq[TombTable],
                   primaryRows: => Long): Boolean = {
    if (!present(spark, base)) return false
    recordPolicy(spark, base)
    val ratio = policyRatio(spark, base)
    val side = rowCount(spark, base)
    if (side > ratio * math.max(primaryRows, 1L)) {
      compact(spark, base, tables)
      true
    } else false
  }

  /** Drop the sidecar (after [[compact]] folded it in). The raw-fs
    * delete bypasses Spark's shared file-listing cache, so refresh the
    * path — otherwise a LATER sidecar (new deletes after this compact)
    * can list this one's dead part files and fail mid-scan.
    */
  def clear(spark: SparkSession, base: String): Unit = {
    val fs = fsOf(spark, base)
    val p = new Path(s"$base/$subdir")
    if (fs.exists(p)) fs.delete(p, true)
    spark.catalog.refreshByPath(s"$base/$subdir")
  }

  /** Apply the sidecar at read: anti-join `df.idCol` against the
    * tombstoned ids, or `df` UNCHANGED (no join node) when the artifact
    * has no live tombstones.
    */
  def filter(df: DataFrame, base: String, idCol: String): DataFrame =
    if (!present(df.sparkSession, base)) df
    else {
      val t = ids(df.sparkSession, base)
      df.join(t, df(idCol) === t("id"), "left_anti")
    }

  /** Edge-table variant: a row dies if EITHER endpoint is tombstoned
    * (a deleted vector must vanish both as a query node and as anyone's
    * neighbor).
    */
  def filterEdges(df: DataFrame, base: String, aCol: String, bCol: String): DataFrame =
    if (!present(df.sparkSession, base)) df
    else {
      val t = ids(df.sparkSession, base)
      df.join(t, df(aCol) === t("id"), "left_anti")
        .join(t, df(bCol) === t("id"), "left_anti")
    }

  /** One table of a [[compact]] run: `rel` is the table dir relative to
    * the artifact base ("" when the base IS the table), `filterCols`
    * the columns anti-joined against the sidecar (two for an edge
    * table), `partitionCols`/`sortCols` reproduce the table's layout
    * (partitioned clusters, term-sorted postings).
    */
  final case class TombTable(rel: String, filterCols: Seq[String],
                             partitionCols: Seq[String] = Nil,
                             sortCols: Seq[String] = Nil,
                             genCol: Option[String] = None,
                             blockBytes: Option[Long] = None)

  /** Fold the sidecar into the data: rewrite each table minus the
    * tombstoned rows and clear the sidecar. Swap discipline per table =
    * [[Retrieval.compactPostings]]'s deterministic siblings
    * (`_tomb_new` / `_tomb_old`, `_SUCCESS` as the completeness marker,
    * [[recover]] adopts or restores after a crash). Top-level
    * underscore-prefixed FILES of the old table dir (the Artifacts
    * manifest, the dedup `_built_state` marker) are carried over so the
    * artifact stays committed — and derived-staleness markers keep
    * firing — across the swap. Single-writer, like every compactor.
    */
  def compact(spark: SparkSession, base: String, tables: Seq[TombTable]): Unit = {
    if (!present(spark, base)) return
    val t = ids(spark, base)
    tables.foreach { spec =>
      val dir = if (spec.rel.isEmpty) base else s"$base/${spec.rel}"
      recover(spark, dir)
      val fs = fsOf(spark, dir)
      val fresh = new Path(s"${dir}_tomb_new")
      val old = new Path(s"${dir}_tomb_old")
      // generation-stamped tables fold with the generation-aware keep
      // rule ([[filterGen]] semantics — the fold must preserve exactly
      // what the read filter serves); plain tables keep the anti-join.
      // The rewrite stamps `gen` physically, so a table whose oldest
      // files predate the column comes out schema-uniform.
      val kept = spec.genCol match {
        case Some(g) =>
          val tg = tombs(spark, base)
          spec.filterCols.foldLeft(readWithGen(spark, dir)) { (df, c) =>
            val tt = tg.select(col("id").as(s"_t_$c"), col("upto").as(s"_u_$c"))
            df.join(broadcast(tt), df(c) === col(s"_t_$c"), "left_outer")
              .where(col(s"_u_$c").isNull || df(g) > col(s"_u_$c"))
              .drop(s"_t_$c", s"_u_$c")
          }
            // the fold establishes a new GENERATION-0 BASELINE (exactly
            // like a fresh build, whose files read as gen 0): after it
            // no tombstone exists, and any FUTURE tombstone carries
            // upto ≥ the current generation ≥ every kept stamp — so the
            // restamp is serve-equivalent while collapsing the
            // accumulated per-batch gen slices the readers pay for
            // (TextIndex.stats' postings_slices readout; PersistSpec
            // asserts post-compact slices = 1)
            .withColumn(g, lit(0L))
        case None =>
          spec.filterCols.foldLeft(spark.read.parquet(dir)) { (df, c) =>
            df.join(t, df(c) === t("id"), "left_anti")
          }
      }
      val sorted =
        if (spec.sortCols.nonEmpty)
          kept.repartitionByRange(spec.sortCols.map(col): _*)
            .sortWithinPartitions(spec.sortCols.map(col): _*)
        else kept
      val writer0 = sorted.write.mode("overwrite")
      // reproduce the table's row-group sizing (probe-pruned sidecars
      // and edge files lose their statistics granularity otherwise)
      val writer = spec.blockBytes match {
        case Some(b) => writer0.option("parquet.block.size", b.toString)
        case None    => writer0
      }
      (if (spec.partitionCols.nonEmpty) writer.partitionBy(spec.partitionCols: _*)
       else writer).parquet(fresh.toString)
      // carry the artifact's metadata files across the swap
      fs.listStatus(new Path(dir)).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && n.startsWith("_") && n != "_SUCCESS")
          org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
            new Path(fresh, n), false, spark.sparkContext.hadoopConfiguration)
      }
      if (fs.exists(old)) fs.delete(old, true)
      require(fs.rename(new Path(dir), old), s"tombstone compaction aside-rename failed for $dir")
      require(fs.rename(fresh, new Path(dir)), s"tombstone compaction swap failed for $dir")
      fs.delete(old, true)
      // the swap happened through raw fs renames — drop the stale
      // listing so the next read of the table sees the fresh copy
      spark.catalog.refreshByPath(dir)
    }
    clear(spark, base)
  }

  /** Recover an interrupted [[compact]] of one table dir — same
    * protocol as [[Retrieval.recoverCompaction]] under the `_tomb_*`
    * names. If compaction evidence exists but NO complete copy is
    * recoverable (target missing, `_tomb_new` incomplete, `_tomb_old`
    * absent — a window the swap protocol makes unreachable, so reaching
    * it means external interference), this RAISES instead of silently
    * sweeping the incomplete copy and leaving no table at all.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val target = new Path(dir)
    val fresh = new Path(s"${dir}_tomb_new")
    val old = new Path(s"${dir}_tomb_old")
    val freshComplete = fs.exists(new Path(fresh, "_SUCCESS"))
    if (!fs.exists(target)) {
      if (freshComplete) require(fs.rename(fresh, target),
        s"tombstone compaction recovery failed adopting $fresh")
      else if (fs.exists(old)) require(fs.rename(old, target),
        s"tombstone compaction recovery failed restoring $old")
      else require(!fs.exists(fresh),
        s"tombstone compaction left no recoverable table for $dir: target missing, " +
          s"$fresh incomplete (no _SUCCESS) and $old absent — refusing to delete " +
          "the only remaining copy; restore the table manually")
    }
    if (fs.exists(fresh)) fs.delete(fresh, true)
    if (fs.exists(old)) fs.delete(old, true)
    spark.catalog.refreshByPath(dir)
  }
}
