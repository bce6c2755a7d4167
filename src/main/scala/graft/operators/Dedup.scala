package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions._

/** Deduplication operators for LLM-training-data pipelines.
  *
  * All four near-dup flavors follow the same scale shape: a narrow
  * map-side signature pass (codegen'd, no shuffle), then a shuffle keyed
  * only on small blocking keys (band buckets / source blocks), never an
  * O(n²) global cross join. Pair outputs are deterministic: (a_id <
  * b_id), ordered.
  *
  * Plan-shape rule learned the hard way: signature expressions are built
  * over *materialized narrow columns* (separate projection steps, sigs
  * persisted and re-joined by id after candidate dedup) — composing them
  * inline copies the token-pipeline expression tree into every
  * element_at/slice call-site and the self-join then re-executes it per
  * side, which measured 40× slower at sf0.1.
  *
  * Execution semantics: the pair operators (minhashPairs, simhashPairs,
  * jaccardPrefixPairs, embeddingCosinePairs) EAGERLY materialize their
  * (small) pair output via `localCheckpoint(true)` so the per-call
  * signature cache can be released immediately instead of leaking until
  * LRU pressure. Callers pay the job at call time even if the result is
  * never consumed, and checkpointed blocks are not recomputable after
  * executor loss — the right trade for a single-JVM harness; on a
  * long-lived cluster, replace with `persist` + caller-managed
  * `unpersist` if lazy composition or fault-tolerant lineage matters.
  */
object Dedup {

  /** Exact dedup via content hash: one row per distinct text, keeping the
    * smallest id as the canonical document.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))
      .orderBy("keep_id")

  /** doc_id + minhash signature (32 perms over word 3-shingles), persisted:
    * it is read twice (banding + est_sim join-back) and at 100 TB the
    * equivalent is a materialized signature table (~260 B/doc).
    */
  /** The word n-shingle hash pass both near-dup families consume:
    * (doc_id, gh = 60-bit hashes of word n-grams), one codegen pass.
    * Callers that run SEVERAL dedup legs over the same corpus (e.g.
    * dedup_recall_eval's truth + sketch) persist THIS frame once and
    * feed the `...FromShingles` variants — tokenize/shingle is the
    * dominant map-side cost at corpus scale and must not run per leg.
    */
  // (r16 note: a Skew.spreadScan of the tokenize+shingle inputs was
  // tried on the text kernels and MEASURED SLOWER at sf0.1 — 32
  // concurrent allocation-heavy string tasks inflate CPU 4-10× via
  // GC/allocator contention, while these kernels' dominant stages (the
  // pair joins) already parallelize after the first exchange. The
  // spread stays where it measured faster: the multimodal byte-decode
  // seams, whose per-row work is compute-dense and allocation-light.)
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      wordShingleHash60(wordTokens(col(textCol)), n).as("gh"))

  private def signaturesFromShingles(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), minHashSig(col("gh"), 32).as("sig"))
      .where(col("sig").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** The 8-band × 4-row LSH bucket table of a (doc_id, sig) frame — the
    * ONE banding expression every minhash consumer shares, so banding
    * semantics can never drift between the pair join, the bucket
    * profile, and the estimator calibration.
    */
  private def minhashBands(signed: DataFrame): DataFrame =
    signed
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(7)), b =>
          md5(concat_ws(",", transform(slice(col("sig"), b * 4 + 1, lit(4)), _.cast("string")))
            .cast("binary"))).as("buckets"))
      .select(col("doc_id"), posexplode(col("buckets")).as(Seq("band", "bucket")))

  /** The 4-band × 15-bit key table of a (doc_id, sig) simhash frame. */
  private def simhashBands(signed: DataFrame): DataFrame =
    signed
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(3)), b =>
          call_function("shiftright", col("sig"), (b * 15).cast("int")).bitwiseAND(lit(32767L)))
          .as("keys"))
      .select(col("doc_id"), posexplode(col("keys")).as(Seq("band", "band_key")))

  /** Distinct lower-id-first candidate pairs from a banded bucket table
    * (columns: the two key columns + doc_id): the banding self-join
    * every LSH family member runs. Ships ONLY narrow key/id rows.
    */
  private def bandCandidates(bands: DataFrame, keys: Seq[String]): DataFrame =
    bands.select(col(keys.head), col(keys(1)), col("doc_id").as("a_id"))
      .join(bands.select(col(keys.head), col(keys(1)), col("doc_id").as("b_id")), keys)
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")

  // ===================================================================
  // Written-once dedup signature artifact (the "dedup index")
  // ===================================================================

  /** Handle to a MATERIALIZED dedup artifact: the minhash signature
    * table, the full (uncut) LSH candidate-pair table with signature
    * agreement counts, the full simhash candidate table with hamming
    * distances, and the est ≥ 0.5 connected-component cluster map —
    * written ONCE per corpus as parquet and re-read by every dedup
    * reporting query. This is the batch analog of the reference engine
    * persisting its built index next to the scalar store and serving
    * restarts from disk (reference: src/db/scalar_storage.rs — indexes
    * survive the process; queries never rebuild them), and the §6
    * doctrine "signature tables are worth materializing" made real: at
    * 100 TB the signature table (~260 B/doc) and the candidate table
    * (duplicate-mass-bounded) are THE artifacts a curation pipeline
    * stores, while re-deriving them per report would re-tokenize the
    * corpus seven times. Parquet (not RDD cache) on purpose: it
    * survives `spark.catalog.clearCache()`, executor loss, and process
    * restarts, and the reporting queries' scans prune columns/filters
    * like any other table.
    */
  final case class DedupIndex(spark: SparkSession, base: String) {
    /** (doc_id, sig: array<int> of 32 minhashes) — always current:
      * [[append]] maintains this table, so signature-served reads
      * ([[minhashPairsFromSignatures]]) include ingested docs, and
      * [[delete]] tombstones drop at read.
      */
    def sig: DataFrame =
      Tombstones.filter(spark.read.parquet(s"$base/sig"), s"$base/sig", "doc_id")
    /** (a_id, b_id, m): ALL banding candidates, m = agreeing positions.
      * Build-time derived — fails loudly after an append (see
      * [[requireDerivedFresh]]).
      */
    def cand: DataFrame = {
      requireDerivedFresh("cand")
      spark.read.parquet(s"$base/cand")
    }
    /** (a_id, b_id, hamming): ALL simhash band candidates (build-time
      * derived, append-guarded like [[cand]]).
      */
    def simcand: DataFrame = {
      requireDerivedFresh("simcand")
      spark.read.parquet(s"$base/simcand")
    }
    /** (doc_id, canonical_id, is_dup) at est ≥ 0.5 — unordered
      * (build-time derived, append-guarded like [[cand]]).
      */
    def clusters: DataFrame = {
      requireDerivedFresh("clusters05")
      spark.read.parquet(s"$base/clusters05")
    }

    /** Streaming maintenance: sign an ingested batch with the SAME
      * kernels as the build and append to the signature table. After
      * this, signature-served reads (`sig`,
      * [[minhashPairsFromSignatures]]) see the ingested docs; the
      * build-time derived tables (cand/simcand/clusters) are STALE and
      * their accessors throw until the index is rebuilt — never a
      * silently-incomplete pair set.
      */
    def append(docs: DataFrame, idCol: String, textCol: String): DedupIndex =
     Artifacts.withLease(spark, base, "DedupIndex.append") {
      val batchIds = docs.select(col(idCol).cast("long").as("doc_id"))
      // NEW-docs-only, probed against the RAW sig table (not the
      // tombstone-filtered [[sig]] accessor): a re-appended id would
      // duplicate signature rows, and a delete()d-then-re-appended id
      // would have its fresh rows hidden by the read-time anti-join —
      // silent loss instead of this loud failure
      val dup = batchIds
        .join(spark.read.parquet(s"$base/sig").select("doc_id"),
          Seq("doc_id"), "leftsemi").limit(1).collect()
      require(dup.isEmpty,
        s"DedupIndex.append is new-docs-only: doc_id ${dup.headOption.map(_.get(0)).orNull} " +
          "is already signed (if it was delete()d, compact or rebuild before " +
          "reusing the id); assign fresh ids or rebuild")
      if (Tombstones.present(spark, s"$base/sig")) {
        val t = Tombstones.ids(spark, s"$base/sig")
        val tomb = batchIds.join(t, batchIds("doc_id") === t("id"), "leftsemi")
          .limit(1).collect()
        require(tomb.isEmpty,
          s"DedupIndex.append: doc_id ${tomb.headOption.map(_.get(0)).orNull} is " +
            "tombstoned — its appended signature would be hidden by the read-time " +
            "anti-join; rebuild (Dedup.index(rebuild = true)) before reusing a " +
            "deleted id")
      }
      appendSignatures(docs, idCol, textCol, s"$base/sig")
      this
     }

    /** Delete twin (reference: remove_vectors): tombstone doc_ids under
      * the signature table. Signature-served reads exclude them without
      * a rebuild; the sidecar's files enter the sig dir's fingerprint,
      * so the build-time derived tables (cand/simcand/clusters) fail
      * loudly exactly like after an [[append]] — their pairs still
      * contain the deleted doc and must not be served silently.
      */
    def delete(ids: DataFrame): DedupIndex =
      Artifacts.withLease(spark, base, "DedupIndex.delete") {
        Tombstones.append(spark, s"$base/sig", ids)
        // growth policy: fold the sidecar into the signature table once
        // it exceeds the recorded threshold of sig's physical rows —
        // deletes stay O(batch) below it, reads never pay more than the
        // threshold's dead fraction above it. The derived tables stay
        // loudly stale either way (the fold rewrites sig's file listing,
        // so the fingerprint still mismatches _built_state — their pairs
        // genuinely contain the deleted docs).
        Tombstones.maybeCompact(spark, s"$base/sig",
          Seq(Tombstones.TombTable("", Seq("doc_id"))),
          spark.read.parquet(s"$base/sig").count())
        this
      }

    /** Fold live tombstones into the signature table (the manual twin
      * of the auto-compact policy in [[delete]]; crash-safe swap).
      * After the fold the deleted ids are re-appendable — the loud
      * reuse guards in [[append]] probe rows and tombstones that no
      * longer exist.
      */
    def compact(): DedupIndex =
      Artifacts.withLease(spark, base, "DedupIndex.compact") {
        Tombstones.compact(spark, s"$base/sig",
          Seq(Tombstones.TombTable("", Seq("doc_id"))))
        this
      }

    /** The derived tables are exactly as fresh as the signature table
      * the build wrote; any append since then (through [[append]] OR
      * the raw [[appendSignatures]] pointed at this artifact) changes
      * the sig dir's data-file listing and trips this check.
      */
    private def requireDerivedFresh(what: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(s"$base/sig/_built_state")
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val builtState =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val current = Artifacts.fingerprint(spark, Seq(s"$base/sig"), spec = "built")
        if (builtState != current)
          throw new IllegalStateException(
            s"DedupIndex.$what is stale: signatures were appended since the build, " +
              "and the candidate/cluster tables do not cover the ingested docs — " +
              "serve pair reads from minhashPairsFromSignatures(sig, ...) or force a " +
              s"rebuild with Dedup.index(docs, ..., rebuild = true) ($base)")
      }
    }

    /** [[Dedup.minhashPairs]] served from the artifact: the threshold
      * cut and est_sim = m/32 are arithmetic on the stored agreement
      * count, so any minEst is one pruned scan of the candidate table.
      */
    def minhashPairs(minEst: Double): DataFrame =
      cand.where(col("m").cast("double") / lit(32.0) >= minEst)
        .select(col("a_id"), col("b_id"),
          roundTo(col("m").cast("double") / lit(32.0), 4).as("est_sim"))
        .orderBy("a_id", "b_id")

    /** [[Dedup.simhashPairs]] served from the artifact. */
    def simhashPairs(maxHamming: Int): DataFrame =
      simcand.where(col("hamming") <= maxHamming)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .orderBy("a_id", "b_id")

    /** [[Dedup.resolveClusters]]' est ≥ 0.5 map, re-ordered (parquet
      * drops ordering; readers that key on it re-apply).
      */
    def clustersOrdered: DataFrame =
      clusters.select("doc_id", "canonical_id", "is_dup").orderBy("doc_id")
  }

  /** Registry-resolved [[buildIndex]] (the IndexFactory pattern, like
    * [[IvfIndex.fitCached]]) with the [[Artifacts]] lifecycle: the
    * artifact is keyed on a CONTENT fingerprint of the input files plus
    * the query plan's semantic hash (two different filters over the
    * same files never share an index), so a rewritten corpus
    * invalidates and rebuilds instead of serving stale signatures — the
    * superseded version is GC'd — while a restart adopts the committed
    * on-disk artifact without re-signing anything. Concurrent first
    * callers share one build under the key lock.
    *
    * `rebuild = true` force-drops the committed artifact first
    * ([[Artifacts.invalidate]]) — the programmatic rebuild path after
    * [[DedupIndex.append]] staled the derived tables: an append changes
    * the sig dir, NOT the input-corpus fingerprint, so a plain resolve
    * would re-adopt the appended-to artifact forever.
    */
  def index(docs: DataFrame, idCol: String, textCol: String,
            rebuild: Boolean = false): DedupIndex = {
    val spark = docs.sparkSession
    // the key carries the input LOCATION as well as the plan hash, so
    // two corpora (or two filters of one corpus) get separate artifact
    // families and never GC each other's versions
    val inputDirs = docs.inputFiles
      .map(f => f.substring(0, math.max(f.lastIndexOf('/'), 0)))
      .distinct.sorted.mkString(",")
    val planKey =
      s"${docs.queryExecution.analyzed.semanticHash()} $idCol $textCol $inputDirs"
    val fp = Artifacts.fingerprintInput(docs, spec = s"dedup-v1 $planKey")
    if (rebuild) Artifacts.invalidate(spark, "dedup", Artifacts.corpusKey(planKey))
    val base = Artifacts.resolve(spark, "dedup", Artifacts.corpusKey(planKey), fp) {
      tmp => buildIndex(docs, idCol, textCol, tmp)
    }
    // a crash between the renames of a tombstone-folding compact
    // ([[DedupIndex.compact]] / the auto-compact in delete) can leave
    // the sig table aside under its _tomb_* names — repair before
    // handing out a handle, like TextIndex.load does for its tables
    Tombstones.recover(spark, s"$base/sig")
    DedupIndex(spark, base)
  }

  /** ONE tokenize+sign+band pass over the corpus (per signature family)
    * writes all four artifact tables; every write is either
    * corpus-narrow (signatures) or duplicate-mass-bounded (candidates,
    * whose volume the banding buckets bound — see [[lshBucketProfileFromIndex]]'s
    * certificate). The cluster map reuses the just-written candidate
    * table, so CC never re-signs either.
    */
  private def buildIndex(docs: DataFrame, idCol: String, textCol: String,
                         base: String): Unit = {
    val spark = docs.sparkSession

    val signed = signaturesFromShingles(shingleHashes(docs, idCol, textCol))
    signed.write.mode("overwrite").parquet(s"$base/sig")
    bandCandidates(minhashBands(signed), Seq("band", "bucket"))
      .join(signed.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(signed.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v)).as("m"))
      .write.mode("overwrite").parquet(s"$base/cand")
    signed.unpersist()

    val simsigned = docs
      .select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), simHash60(wordShingleHash60(col("toks"), 1)).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bandCandidates(simhashBands(simsigned), Seq("band", "band_key"))
      .join(simsigned.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(simsigned.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .write.mode("overwrite").parquet(s"$base/simcand")
    simsigned.unpersist()

    val idx = DedupIndex(spark, base)
    resolveClusters(docs, idCol, idx.minhashPairs(0.5).select("a_id", "b_id"))
      .write.mode("overwrite").parquet(s"$base/clusters05")
    // record the signature table's state at build time: the derived
    // tables (cand/simcand/clusters05) are exactly as fresh as THIS
    // listing, and the accessors compare against it to fail loudly
    // after a streaming append (see DedupIndex.requireDerivedFresh)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$base/sig/_built_state"), true)
    try out.write(Artifacts.fingerprint(spark, Seq(s"$base/sig"), spec = "built")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** LSH band-bucket occupancy profile — the banding join's cost
    * certificate: per band, the bucket count, max/mean occupancy, and
    * the candidate-pair volume Σ sz·(sz−1)/2 the self-join generates.
    * A band whose max bucket grows with the corpus marks a degenerate
    * bucket that needs a cap; healthy content-hashed buckets keep sz
    * bounded by true duplicate mass. Runs over the artifact's STORED
    * signatures — re-banding 32 ints per doc is arithmetic;
    * re-tokenizing the corpus is not. 8-row output.
    */
  def lshBucketProfileFromIndex(idx: DedupIndex): DataFrame = {
    val sz = minhashBands(idx.sig).groupBy("band", "bucket").agg(count(lit(1)).as("sz"))
    sz.groupBy("band")
      .agg(count(lit(1)).as("n_buckets"), sum("sz").as("n_docs"), max("sz").as("max_bucket"),
        sum(expr("(sz * (sz - 1)) div 2").cast("decimal(38,0)")).as("p2"))
      .select(col("band"), col("n_buckets"), col("n_docs"), col("max_bucket"),
        col("p2").cast("long").as("n_cand_pairs"),
        roundTo(col("n_docs").cast("double") / col("n_buckets").cast("double"), 4)
          .as("mean_bucket"))
      .orderBy("band")
  }

  /** MinHash estimator calibration — "measure, don't guess" for the
    * sketch itself: over the artifact's candidate pairs with m ≥ 16
    * (est ≥ 0.5), the per-decile gap between the signature estimate
    * (m/32) and the EXACT distinct-shingle Jaccard. All three means
    * are exact-integer sums: estf = m·31250 (10⁶/32 is integral),
    * jacf = ⌊i·10⁶/u⌋ by floor division, errf = |estf − jacf| — no
    * float until the final divide. The agreement count m is
    * stored, so only the EXACT-jaccard leg needs shingle sets — and only
    * for docs that appear in a kept candidate pair (semi-join), never
    * the corpus. At 100 TB the calibration tokenizes the duplicate
    * mass, not the data.
    */
  def minhashEstErrorFromIndex(idx: DedupIndex, docs: DataFrame,
                               idCol: String, textCol: String): DataFrame = {
    val cut = idx.cand.where(col("m") >= 16)
    // Shingle ONLY docs appearing in a kept pair (semi-join pruned) —
    // once per join side. No persist/checkpoint: both legs are
    // candidate-bounded, so the whole query stays a lazy plan (nothing
    // to leak, and the artifact scan is visible to plan guards).
    def g(side: String, out: String): DataFrame = {
      val ids = cut.select(col(side).as("__cid")).distinct()
      shingleHashes(docs.join(ids, docs(idCol) === ids("__cid"), "leftsemi"),
        idCol, textCol)
        .select(col("doc_id").as(side), array_distinct(col("gh")).as(out))
    }
    val paired = cut
      .join(g("a_id", "g_a"), "a_id")
      .join(g("b_id", "g_b"), "b_id")
      .withColumn("i", size(array_intersect(col("g_a"), col("g_b"))).cast("long"))
      .withColumn("u", size(col("g_a")).cast("long") + size(col("g_b")).cast("long") - col("i"))
      .select(expr("(m * 10) div 32").as("bucket"),
        (col("m").cast("long") * lit(31250L)).as("estf"),
        expr("(i * 1000000) div u").as("jacf"))
      .withColumn("errf", abs(col("estf") - col("jacf")))
    val outDf = paired.groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("estf").cast("decimal(38,0)")).as("se"),
        sum(col("jacf").cast("decimal(38,0)")).as("sj"),
        sum(col("errf").cast("decimal(38,0)")).as("sr"))
      .select(col("bucket").cast("int").as("bucket"), col("n_pairs"),
        roundTo(col("se").cast("double") / (col("n_pairs").cast("double") * lit(1e6)), 6)
          .as("mean_est"),
        roundTo(col("sj").cast("double") / (col("n_pairs").cast("double") * lit(1e6)), 6)
          .as("mean_jaccard"),
        roundTo(col("sr").cast("double") / (col("n_pairs").cast("double") * lit(1e6)), 6)
          .as("mean_abs_err"))
      .orderBy("bucket")
    outDf
  }

  /** Streaming maintenance of a [[DedupIndex]] signature table: sign an
    * ingested micro-batch with the SAME shingle/minhash expressions as
    * the index build and append it to the artifact (the
    * [[IvfIndex.appendPartitioned]] analog — no rewrite, no re-sign of
    * the existing corpus). Use as a foreachBatch body: each batch costs
    * O(batch) signing + one narrow append; the maintained table then
    * serves [[minhashPairsFromSignatures]] without ever re-tokenizing.
    */
  def appendSignatures(docs: DataFrame, idCol: String, textCol: String,
                       sigPath: String): Unit =
    shingleHashes(docs, idCol, textCol)
      .select(col("doc_id"), minHashSig(col("gh"), 32).as("sig"))
      .where(col("sig").isNotNull)
      .write.mode("append").parquet(sigPath)

  /** Banding pairs recomputed from a SIGNATURE table (e.g. the
    * maintained artifact after streaming appends): identical banding +
    * agreement arithmetic as the index build — re-banding 32 ints/doc
    * is the cheap pass; the corpus never re-tokenizes.
    */
  def minhashPairsFromSignatures(sig: DataFrame, minEst: Double): DataFrame =
    bandCandidates(minhashBands(sig), Seq("band", "bucket"))
      .join(sig.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .withColumn("est_sim",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v)) / lit(32.0))
      .where(col("est_sim") >= minEst)
      .select(col("a_id"), col("b_id"), roundTo(col("est_sim"), 4).as("est_sim"))
      .orderBy("a_id", "b_id")

  /** SimHash candidate hamming-distance histogram over the artifact's
    * stored candidates — the tuning evidence for [[simhashPairs]]'
    * maxHamming knob: over ALL band candidates (no cut), how many
    * pairs land at each hamming distance, with shares. The ≤ h
    * envelope's completeness holds for h ≤ 3; this shows where the
    * mass actually sits so the knob is chosen from data. (61)-bounded
    * rollup of the stored pair table.
    */
  def simhashHammingHistFromIndex(idx: DedupIndex): DataFrame = {
    val h = idx.simcand.groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
    val tot = h.agg(sum("n_pairs").cast("double").as("t"))
    h.crossJoin(broadcast(tot))
      .select(col("hamming"), col("n_pairs"),
        roundTo(col("n_pairs").cast("double") / col("t"), 4).as("share"))
      .orderBy("hamming")
  }

  /** MinHash + LSH banding near-dup candidates.
    *
    * Signature: 32 minhashes over word 3-shingles (one codegen pass per
    * doc). Banding: 8 bands × 4 rows; docs sharing any band bucket become
    * candidates; est_sim = fraction of agreeing signature positions.
    * The band shuffle carries only (band, bucket-md5, doc_id) — a few
    * bytes per row regardless of document size — and signatures rejoin by
    * id only for the already-deduped candidate pairs.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String, minEst: Double): DataFrame =
    minhashPairsFromShingles(shingleHashes(docs, idCol, textCol), minEst)

  /** [[minhashPairs]] over a pre-shingled (doc_id, gh) frame. */
  def minhashPairsFromShingles(sh: DataFrame, minEst: Double): DataFrame = {
    val signed = signaturesFromShingles(sh)

    val bands = signed
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(7)), b =>
          md5(concat_ws(",", transform(slice(col("sig"), b * 4 + 1, lit(4)), _.cast("string")))
            .cast("binary"))).as("buckets"))
      .select(col("doc_id"), posexplode(col("buckets")).as(Seq("band", "bucket")))

    val cand = bands.select(col("band"), col("bucket"), col("doc_id").as("a_id"))
      .join(bands.select(col("band"), col("bucket"), col("doc_id").as("b_id")), Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")

    val result = cand
      .join(signed.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(signed.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .withColumn("est_sim",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v)) / lit(32.0))
      .where(col("est_sim") >= minEst)
      .select(col("a_id"), col("b_id"), roundTo(col("est_sim"), 4).as("est_sim"))
      .orderBy("a_id", "b_id")

    // Materialize the (small) pair output, then drop the signature cache —
    // otherwise every invocation leaks one cached sig table until LRU
    // pressure (Bench runs each query 3×; long-lived sessions worse).
    val out = result.localCheckpoint(true)
    signed.unpersist()
    out
  }

  /** Incremental near-dup check — the shape a running ingest pipeline
    * needs: candidates form ONLY between the incoming batch (`isNew`
    * rows) and the existing corpus, never corpus×corpus. One signature
    * scan covers both sides; the banding join then has the batch on one
    * side, so its cost is O(batch × bucket-collision rate) and stays flat
    * as the corpus grows — re-running the full self-join dedup per batch
    * would be O(corpus) per ingest at 100 TB. Output: (new_id, old_id,
    * est_sim) for est ≥ minEst.
    */
  def minhashPairsIncremental(docs: DataFrame, idCol: String, textCol: String,
                              isNew: Column, minEst: Double): DataFrame = {
    val signed = docs
      .select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"), isNew.as("is_new"))
      .select(col("doc_id"), minHashSig(wordShingleHash60(col("toks"), 3), 32).as("sig"), col("is_new"))
      .where(col("sig").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val bands = signed
      .select(col("doc_id"), col("is_new"),
        transform(sequence(lit(0), lit(7)), b =>
          md5(concat_ws(",", transform(slice(col("sig"), b * 4 + 1, lit(4)), _.cast("string")))
            .cast("binary"))).as("buckets"))
      .select(col("doc_id"), col("is_new"), posexplode(col("buckets")).as(Seq("band", "bucket")))

    val cand = bands.where(col("is_new")).select(col("band"), col("bucket"), col("doc_id").as("new_id"))
      .join(bands.where(!col("is_new")).select(col("band"), col("bucket"), col("doc_id").as("old_id")),
        Seq("band", "bucket"))
      .select("new_id", "old_id")
      .dropDuplicates("new_id", "old_id")

    val sigs = signed.select(col("doc_id"), col("sig"))
    val result = cand
      .join(sigs.select(col("doc_id").as("new_id"), col("sig").as("sig_a")), "new_id")
      .join(sigs.select(col("doc_id").as("old_id"), col("sig").as("sig_b")), "old_id")
      .withColumn("est_sim",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v)) / lit(32.0))
      .where(col("est_sim") >= minEst)
      .select(col("new_id"), col("old_id"), roundTo(col("est_sim"), 4).as("est_sim"))
      .orderBy("new_id", "old_id")

    // Materialize, then release the signature cache (see minhashPairs).
    val out = result.localCheckpoint(true)
    signed.unpersist()
    out
  }

  /** SimHash near-dup pairs: 60-bit simhash over word tokens, LSH on
    * 4 × 15-bit bands, exact hamming re-rank ≤ maxHamming. Same staged
    * shape as [[minhashPairs]]: narrow band shuffle, sig rejoin by id.
    *
    * Recall envelope (semantics = "LSH candidate pairs with hamming ≤
    * maxHamming", NOT "all pairs ≤ maxHamming"): with 4 bands, a pair
    * whose signatures differ in h bits is guaranteed a candidate when
    * h ≤ 3 (pigeonhole — 3 bits can touch at most 3 of 4 bands, one band
    * matches exactly; DedupSpec proves this against brute force). For
    * 3 < h ≤ maxHamming the pair surfaces only if its differing bits
    * happen to spare one band; the miss probability grows with h.
    * Narrower bands would close that gap but multiply candidates: at
    * 15-bit bands, unrelated docs collide per band with p ≈ 2⁻¹⁵, while
    * the 10 × 6-bit banding that would guarantee h ≤ 9 collides at
    * p ≈ 2⁻⁶ per band — O(n²/64) candidate pairs, a scale-killer. The
    * oracle mirrors the banding exactly, so the gate checks these
    * semantics, not the unbounded ones.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val signed = docs
      .select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), simHash60(wordShingleHash60(col("toks"), 1)).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val bands = signed
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(3)), b =>
          call_function("shiftright", col("sig"), (b * 15).cast("int")).bitwiseAND(lit(32767L)))
          .as("keys"))
      .select(col("doc_id"), posexplode(col("keys")).as(Seq("band", "band_key")))

    val cand = bands.select(col("band"), col("band_key"), col("doc_id").as("a_id"))
      .join(bands.select(col("band"), col("band_key"), col("doc_id").as("b_id")), Seq("band", "band_key"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")

    val result = cand
      .join(signed.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(signed.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy("a_id", "b_id")

    // Materialize, then release the signature cache (see minhashPairs).
    val out = result.localCheckpoint(true)
    signed.unpersist()
    out
  }

  /** Content block key with a PROVABLE size bound for
    * [[ngramJaccardPairs]]: each doc's block is its MINIMUM char-n-gram
    * hash among grams with document frequency ≤ dfCap. Every member of
    * block g contains gram g, so |block| ≤ df(g) ≤ dfCap — a constant
    * bound at ANY corpus size, the same df-cap discipline as
    * [[winnowPairs]]' postings. (A plain min over ALL grams degenerates
    * on templated corpora: one ubiquitous gram with a globally small
    * hash collects a Θ(n) block — measured 3838 of 5000 docs at sf0.1.)
    *
    * Recall envelope: near-dup pairs share their rare grams, so their
    * df-capped minima agree with probability ≈ their Jaccard restricted
    * to rare grams. Docs with NO rare gram (pure template, or a
    * duplicate cluster larger than dfCap) get NULL and never pair —
    * exact dedup and minhash banding own those regimes.
    *
    * Scale shape: the df agg is one partial-agg shuffle over (doc, gram)
    * postings; the rare join is a standard keyed equi-join (NO broadcast
    * hint — the rare set is bounded by min(|Σ|^n, postings/dfCap), small
    * enough that AQE auto-broadcasts it at moderate scale but NOT
    * driver-collectable in general, so the plan must stay a join); the
    * block table that joins back is one narrow (id, long) row per doc.
    */
  def withRareGramBlock(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, dfCap: Long, out: String = "blk"): DataFrame = {
    val g = docs.select(col(idCol).as("__bid"),
      array_distinct(charShinglePoly(col(textCol), n)).as("gs"))
    val ex = g.select(col("__bid"), explode(col("gs")).as("gh"))
    val rare = ex.groupBy("gh").agg(count(lit(1)).as("df")).where(col("df") <= dfCap)
    val blk = ex.join(rare.select("gh"), "gh")
      .groupBy("__bid").agg(min("gh").as(out))
    docs.join(blk, docs(idCol) === blk("__bid"), "left").drop("__bid")
  }

  /** Character n-gram Jaccard similarity pairs, blocked on a grouping
    * column (never global O(n²) — pairs only form within a block).
    *
    * Grams are 60-bit-hashed once per doc so the pair-level set ops run
    * over primitive longs, and a *lossless* size prefilter
    * (min/max ≥ minJaccard ⇒ necessary for J ≥ minJaccard since
    * |A∩B| ≤ min and |A∪B| ≥ max) prunes pairs before any set op.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int, minJaccard: Double,
                        chunks: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // One narrow map pass: each doc ships its sorted gram-hash set ONCE
    // per block (a self-join would copy both ~KB arrays into every one
    // of the O(block²) pair rows — measured 3 GB of row assembly at
    // sf0.1). Pair enumeration is then block-local in memory; blocks are
    // bounded by construction (a real pipeline blocks on minhash buckets
    // or bounded shards), so per-group state stays small at any scale.
    val grams = docs
      .select(col(blockCol).cast("string").as("blk"), col(idCol).as("doc_id"),
        sort_array(array_distinct(charShingleHash60(col(textCol), n))).as("g"))
      .as[(String, Long, Array[Long])]
    blockPairScan(grams, minJaccard, chunks)
  }

  /** [[ngramJaccardPairs]] with the [[withRareGramBlock]] key FUSED into
    * the same pipeline over ONE persisted gram table: postings → df agg
    * → rare join → per-doc min becomes the block key, gram arrays rejoin
    * by id from the cache — a second shingle pass never runs. The rare
    * join carries no broadcast hint (the rare set is bounded by
    * min(|Σ|^n, postings/dfCap) — AQE broadcasts it while it is small,
    * and the plan stays a lawful keyed join when it is not).
    * |block| ≤ dfCap by construction (see [[withRareGramBlock]]).
    */
  def ngramJaccardPairsRareBlocked(docs: DataFrame, idCol: String, textCol: String,
                                   n: Int, minJaccard: Double, dfCap: Long,
                                   chunks: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // persisted like minhashSignatures: the gram table is read three
    // times (df agg, block key, pair-scan rejoin) and — the expensive
    // lesson — explode over an INLINE array expression re-evaluates it
    // per output element (O(len²)/doc); exploding the materialized
    // column is linear.
    val g = docs.select(col(idCol).as("doc_id"),
        sort_array(array_distinct(charShinglePoly(col(textCol), n))).as("g"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ex = g.select(col("doc_id"), explode(col("g")).as("gh"))
    val rare = ex.groupBy("gh").agg(count(lit(1)).as("df")).where(col("df") <= dfCap)
    val blk = ex.join(rare.select("gh"), "gh")
      .groupBy("doc_id").agg(min("gh").cast("string").as("blk"))
    // docs with no rare gram simply have no blk row (inner join drops
    // them): exact dedup / minhash banding own those regimes
    val grams = g.join(blk, "doc_id")
      .select(col("blk"), col("doc_id"), col("g"))
      .as[(String, Long, Array[Long])]
    // materialize, then release the gram cache (see minhashPairs)
    val out = blockPairScan(grams, minJaccard, chunks).localCheckpoint(true)
    g.unpersist()
    out
  }

  /** Block-local exact-Jaccard pair enumeration over (blk, id, sorted
    * gram hashes) rows.
    */
  private def blockPairScan(grams: org.apache.spark.sql.Dataset[(String, Long, Array[Long])],
                            minJaccard: Double, chunks: Int): DataFrame = {
    require(chunks >= 1 && chunks <= 64, "chunks must be in [1, 64]")
    val spark = grams.sparkSession
    import spark.implicits._

    // Triangle distribution of the per-block all-pairs work: each doc
    // hashes to one of C sub-chunks, and every unordered chunk pair
    // {ci, cj} becomes its own task — C·(C+1)/2 tasks per block instead
    // of ONE, so a block no longer serializes onto a single core (and a
    // 10k-doc block at real scale is ~C² smaller per task). Replication
    // factor is C (each doc joins the C chunk-pairs it belongs to);
    // pairs are enumerated exactly once because a cross pair {u, v}
    // exists only in its one (chunk(u), chunk(v)) group.
    // `chunks` trades replication for parallelism: every doc ships
    // `chunks` copies of its gram array, and a block fans out into
    // chunks·(chunks+1)/2 tasks. Worth it for COARSE block keys (few
    // huge blocks that would serialize on one core); pure overhead for
    // content-bounded keys like a minhash bucket, where blocks are
    // already small — pass chunks = 1 there.
    val C = chunks
    val tasks = grams.flatMap { case (blk, id, g) =>
      val c = (id % C + C) % C
      (0 until C.toInt).map { o =>
        val (ci, cj) = if (o <= c.toInt) (o, c.toInt) else (c.toInt, o)
        ((blk, ci, cj), id, g)
      }
    }

    tasks
      .groupByKey(_._1)
      .flatMapGroups { (key: (String, Int, Int), it: Iterator[((String, Int, Int), Long, Array[Long])]) =>
        val (_, ci, cj) = key
        val seen = new scala.collection.mutable.HashSet[Long]
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
        it.foreach { case (_, id, g) =>
          if (seen.add(id)) {
            val c = ((id % C + C) % C).toInt
            if (c == ci) left += ((id, g))
            if (c == cj && cj != ci) right += ((id, g))
          }
        }
        val ls = left.sortBy(_._1).toArray
        val rs = if (ci == cj) ls else right.sortBy(_._1).toArray
        val out = Seq.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < ls.length) {
          val (aId, ga) = ls(i)
          var j = if (ci == cj) i + 1 else 0
          while (j < rs.length) {
            val (bId, gb) = rs(j)
            val na = ga.length; val nb = gb.length
            // lossless prefilter: J ≤ min/max since |A∩B| ≤ min, |A∪B| ≥ max
            if (math.min(na, nb).toDouble >= minJaccard * math.max(na, nb).toDouble) {
              var x = 0; var y = 0; var c = 0
              while (x < na && y < nb) {
                if (ga(x) == gb(y)) { c += 1; x += 1; y += 1 }
                else if (ga(x) < gb(y)) x += 1
                else y += 1
              }
              val jac = c.toDouble / (na + nb - c).toDouble
              if (jac >= minJaccard)
                out += ((math.min(aId, bId), math.max(aId, bId), jac))
            }
            j += 1
          }
          i += 1
        }
        out.result().iterator
      }
      .toDF("a_id", "b_id", "j")
      .select(col("a_id"), col("b_id"), roundTo(col("j"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Corpus-global Jaccard similarity join via document-frequency-ordered
    * prefix filtering — the provably COMPLETE, bounded-block alternative
    * to heuristic blocking (the AllPairs/PPJoin family; Bayardo et al.,
    * WWW'07 "Scaling Up All Pairs Similarity Search"). Every doc's
    * word-token-hash set is ordered by (global df, hash); if
    * J(A,B) ≥ t then |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, so by pigeonhole the two
    * sets share an element inside their first |X| − ⌈t·|X|⌉ + 1
    * elements under ANY common global order. Pairs sharing no prefix
    * token are provably below threshold and never meet — unlike
    * [[ngramJaccardPairs]]' block heuristic, no qualifying pair can be
    * missed, at any corpus size.
    *
    * Scale shape: blocking keys are by construction each doc's RAREST
    * tokens, so bucket sizes are governed by token rarity, not corpus
    * size; candidate pairs ship narrow (id, id) rows and the exact
    * merge-scan re-joins the sorted sets by id. The threshold is the
    * rational minJNum/minJDen so prefix lengths are exact integer
    * arithmetic on both engines (never ⌈0.65·n⌉ in floating point).
    */
  def jaccardPrefixPairs(docs: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3,
                         minJNum: Int = 13, minJDen: Int = 20): DataFrame =
    // word n-gram (default 3-shingle, matching [[minhashPairs]]) sets —
    // selective on templated corpora where plain unigram vocabulary is
    // shared by nearly all documents
    jaccardPrefixPairsFromShingles(
      shingleHashes(docs, idCol, textCol, shingleN), minJNum, minJDen)

  /** [[jaccardPrefixPairs]] over a pre-shingled (doc_id, gh) frame. */
  def jaccardPrefixPairsFromShingles(sh: DataFrame,
                                     minJNum: Int = 13, minJDen: Int = 20): DataFrame = {
    val minJ = minJNum.toDouble / minJDen.toDouble
    val g = sh
      .select(col("doc_id"), sort_array(array_distinct(col("gh"))).as("g"))
      .where(size(col("g")) > 0)
      .withColumn("sz", size(col("g")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val e = g.select(col("doc_id"), col("sz"), explode(col("g")).as("gram"))
    val dfreq = e.groupBy("gram").agg(count(lit(1)).as("df"))
    val pre = e.join(dfreq, "gram")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "gram")))
      .where(col("rn") <= col("sz") - expr(s"(($minJNum * sz + ${minJDen - 1}) div $minJDen)") + 1)
      .select("doc_id", "sz", "gram", "rn")

    // Candidate generation with the two lossless PPJoin prunes, both in
    // exact integer math (measured 133× fewer candidates than the bare
    // prefix join on the templated test corpus):
    //  - length: J ≥ t ⇒ |A∩B| ≥ t·max ⇒ min·den ≥ num·max;
    //  - position: at the FIRST shared prefix element (positions i, j in
    //    the common global order) every other common element lies after
    //    both, so |A∩B| ≤ 1 + min(|A|−i, |B|−j), which must still reach
    //    α = ⌈t/(1+t)·(|A|+|B|)⌉. The first shared element is always
    //    inside both prefixes, so a qualifying pair always survives.
    val pa = pre.select(col("gram"), col("doc_id").as("a_id"), col("sz").as("a_sz"), col("rn").as("a_rn"))
    val pb = pre.select(col("gram"), col("doc_id").as("b_id"), col("sz").as("b_sz"), col("rn").as("b_rn"))
    val cand = pa.join(pb, Seq("gram"))
      .where(col("a_id") < col("b_id")
        && col("a_sz") * minJDen >= col("b_sz") * minJNum
        && col("b_sz") * minJDen >= col("a_sz") * minJNum
        && (lit(1) + least(col("a_sz") - col("a_rn"), col("b_sz") - col("b_rn")))
             * (minJNum + minJDen) >= (col("a_sz") + col("b_sz")) * minJNum)
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")

    val ga = g.select(col("doc_id").as("a_id"), col("g").as("ga"), col("sz").as("na"))
    val gb = g.select(col("doc_id").as("b_id"), col("g").as("gb"), col("sz").as("nb"))
    val result = cand.join(ga, "a_id").join(gb, "b_id")
      .withColumn("inter", sortedIntersectSize(col("ga"), col("gb")).cast("double"))
      .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("j") >= minJ)
      .select(col("a_id"), col("b_id"), roundTo(col("j"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")

    // Materialize, then release the gram cache (see minhashPairs).
    val out = result.localCheckpoint(true)
    g.unpersist()
    out
  }

  /** Winnowing-fingerprint overlap pairs (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003 — MOSS): documents reporting how many selected
    * fingerprints they share. The winnowing guarantee makes this a
    * SUBSTRING-overlap detector (any shared run of ≥ w + k − 1
    * normalized chars is caught), complementing the set-similarity
    * dedups — it finds partial plagiarism/quotation, not just
    * whole-document near-duplicates.
    *
    * Scale shape: fingerprint selection is one codegen map pass keeping
    * ~2/(w+1) of the grams ([[graft.functions.WinnowHashes]]); the
    * posting-list join ships narrow (fp, id) rows, and the `maxDf` cap
    * drops ubiquitous fingerprints (boilerplate grams) so no posting
    * list exceeds maxDf — candidate work is Σ df² over RETAINED
    * fingerprints, bounded per fp, never corpus². df bounds are exact
    * integers; the pair count is an integer — nothing to round.
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 8, w: Int = 4, maxDf: Int = 20, minShared: Int = 5): DataFrame = {
    // same normalization chain as corpus_normalize (proven cross-engine)
    val norm = trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "))
    val fps = docs
      .select(col(idCol).as("doc_id"), explode(winnowHashes(norm, k, w)).as("fp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val kept = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDf)
      .select("fp")
    val filtered = fps.join(kept, "fp")
    val result = filtered.select(col("fp"), col("doc_id").as("a_id"))
      .join(filtered.select(col("fp"), col("doc_id").as("b_id")), Seq("fp"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy("a_id", "b_id")
    // Materialize, then release the fingerprint cache (see minhashPairs).
    val out = result.localCheckpoint(true)
    fps.unpersist()
    out
  }

  /** Connected-component canonicalization: every doc maps to the smallest
    * id in its near-dup cluster (the step that turns candidate pairs
    * into an actual dedup decision). Min-label propagation — the Pregel
    * shape: each iteration is one join + min-aggregate, converging in
    * O(max cluster diameter) rounds; dup clusters are shallow in
    * practice so this is a handful of narrow (id, label) shuffles. The
    * driver loop only checks the convergence count, it never holds data.
    */
  def resolveClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                      graphPartitions: Int = 4, maxIters: Int = 50): DataFrame = {
    // The dup-pair graph is orders of magnitude smaller than the corpus
    // (bounded by LSH banding), so iteration tables run on a handful of
    // partitions — per-round scheduling otherwise dominates.
    // Both edge directions from ONE pass over the pair pipeline: a
    // unionAll(pairs, pairs.swapped) would evaluate the upstream
    // candidate-pair plan twice before the persist (measured ~2× the
    // whole minhash leg at sf0.1) — the map-side explode duplicates
    // each row instead.
    val edges = pairs
      .select(explode(array(
        struct(col("a_id").cast("long").as("u"), col("b_id").cast("long").as("v")),
        struct(col("b_id").cast("long").as("u"), col("a_id").cast("long").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .coalesce(graphPartitions)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Isolated docs provably keep their own label — iterate ONLY over
    // nodes that appear in an edge (near-dup fraction, orders of
    // magnitude smaller than the corpus) and left-join the rest back at
    // the end. Iteration state is (id, label) pairs of the dup subgraph.
    // localCheckpoint each round: the round's plan references `labels`
    // three times, so WITHOUT lineage truncation the logical plan grows
    // 3^i nodes — by round 12 Catalyst re-analyzes ~500k nodes per
    // action (measured ~80 s/round of pure driver time). Checkpointing
    // keeps the plan constant-size; data stays on executors.
    var labels = edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .coalesce(graphPartitions)
      .localCheckpoint(true)
    // Convergence probe: labels only ever decrease (everything feeding
    // the min-agg includes the old label), so Σlabel strictly decreases
    // until the fixpoint — a one-stage agg on the tiny label table
    // replaces a join + count job per round.
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum("label")).first()
      if (r.isNullAt(0)) 0L else r.getLong(0) // empty pair graph: no rounds run
    }
    var prevSum = labelSum(labels)
    var changed = true
    var iter = 0
    // One propagation round, built LAZILY: neighbor-min propagation +
    // pointer jumping (label := label of label). Jumping relays the
    // min through already-updated labels, so the frontier advances
    // 1–2 hops per round (measured: a diameter-23 component converges
    // in 15 rounds, not 23; a 50-doc dup chain in ~6) — a constant-
    // factor win over plain propagation, not the full O(log d) of
    // synchronized tree hanging.
    def step(cur: DataFrame): DataFrame = {
      val prop = edges.join(cur, edges("v") === cur("id"))
        .select(edges("u").as("id"), col("label"))
      val l2 = cur.select(col("id").as("jid"), col("label").as("jlabel"))
      val jumped = cur.join(l2, cur("label") === l2("jid"))
        .select(col("id"), col("jlabel").as("label"))
      cur.unionAll(prop).unionAll(jumped)
        .groupBy("id").agg(min("label").as("label"))
    }
    while (changed && iter < maxIters) {
      // ONE propagation round per materialization. The r3 version ran
      // three nested steps per checkpoint to amortize driver latency,
      // but measured cost is SUPER-linear in plan depth (3-step cycle
      // 2.4 s vs 1-step cycle 0.28 s at sf0.1 — AQE re-plans every
      // stage of the 9-shuffle nested DAG), so shallow-and-often wins
      // at every graph size. The convergence probe stops the loop the
      // round after the fixpoint, so maxIters is a runaway BACKSTOP,
      // not a budget — raised from 12 after the mutual-kNN component
      // graph (diameter 23 at sf0.01) measured 15 relay rounds to
      // converge and the old cap silently split a 53-node component.
      // Relay speed is between 1 and 2 hops/round (neighbor propagation
      // + label-of-label jumping), so 50 rounds covers diameters far
      // beyond any LSH dup cluster or kNN component this engine builds.
      val next = step(labels)
        .coalesce(graphPartitions)
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      changed = nextSum != prevSum
      prevSum = nextSum
      labels = next
      iter += 1
    }
    // The cap is a runaway BACKSTOP, not a budget: if labels were still
    // moving when it hit, the component map is WRONG (split components —
    // exactly the silent failure the 12-iter cap shipped once). Fail
    // loudly instead of returning it; callers on a genuinely deeper
    // graph raise maxIters, they don't get quietly wrong clusters.
    if (changed)
      throw new IllegalStateException(
        s"resolveClusters did not converge in $maxIters rounds (labels still " +
          "changing) — the returned map would contain split components; " +
          "raise maxIters for graphs of this diameter")
    edges.unpersist()
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("canonical_id"),
        (coalesce(col("label"), col("doc_id")) =!= col("doc_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup pairs, blocked on banded sign-LSH buckets
    * (the same staged shape as [[minhashPairs]], which is what keeps this
    * bounded at 100 TB — the round-1 version was an all-pairs self-join
    * on a constant-cardinality block key, i.e. O(n²) shuffle AND compute
    * with both 256-byte vectors riding in every pair row).
    *
    * Stage 1 (map-side, codegen): every vector gets `bands` bucket ids —
    * one [[graft.functions.lshBucket]] kernel per band, one scan pass.
    * Stage 2: the candidate shuffle carries only (band, bucket, id);
    * pairs form per bucket, so cost is Σ bucket² — bounded by sizing
    * nBits ~ log2(n / targetBucketSize), never global O(n²).
    * Stage 3: vectors re-join BY ID only for the deduped candidates and
    * the exact cosine filter runs on that small pair set.
    *
    * Candidate semantics (like [[simhashPairs]]): pairs that share ≥ 1
    * band bucket; recall for cosine-c pairs is 1-(1-p^nBits)^bands,
    * p = 1-θ/π — e.g. ≥ 0.99 for c ≥ 0.9 at 8 bands × 4 bits
    * (property-tested in DedupSpec).
    */
  /** Embedding near-dup pairs via banded sign-LSH blocking, DF-CAPPED:
    * the hyperplane set is FIXED (2^nBits buckets per band), so bucket
    * populations grow ∝ n and an uncapped within-bucket self-join is
    * quadratic BY CONSTRUCTION — the round-11 ScaleSpec certificate
    * measured the uncapped shape at 661× shuffle on 30× rows. The fix
    * is the repo's standing block discipline (winnow / rare-gram /
    * customer_id_linkage): buckets collect to sorted id arrays in ONE
    * shuffle, blocks over `bucketCap` ids are excluded from pair
    * expansion (dense sign-buckets are degenerate near-dup mass —
    * SemDeDup's dense-cell argument; exact duplication is owned by
    * [[exact]]/[[minhashPairs]]) but COUNTED, pair expansion is
    * map-side combination generation over the ≤ cap arrays, and the
    * completeness envelope (n_capped_buckets, n_ids_in_capped) rides
    * every output row — the report says what it excluded. Candidate
    * volume is ≤ bands · n · cap — linear, certified at 1×/10×/30×.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                           bandPlanes: Array[Array[Array[Float]]],
                           minCosine: Double, bucketCap: Int = 256): DataFrame = {
    val blocksAll = emb
      .select(col(idCol).as("vec_id"),
        array(bandPlanes.map(pl => lshBucket(col(vecCol), pl)).toSeq: _*).as("bks"))
      .select(col("vec_id"), posexplode(col("bks")).as(Seq("band", "bucket")))
      .groupBy("band", "bucket")
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
      .persist(StorageLevel.DISK_ONLY) // narrow block table: one shuffle, two consumers

    val capStats = blocksAll.where(size(col("ids")) > bucketCap)
      .agg(count(lit(1)).as("n_capped_buckets"),
        coalesce(sum(size(col("ids")).cast("long")), lit(0L)).as("n_ids_in_capped"))

    val cand = blocksAll.where(size(col("ids")) <= bucketCap)
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> named_struct('a_id', a, 'b_id', b))))"))
        .as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")

    val result = cand
      .join(emb.select(col(idCol).as("a_id"), col(vecCol).as("va")), "a_id")
      .join(emb.select(col(idCol).as("b_id"), col(vecCol).as("vb")), "b_id")
      .withColumn("cosine", vecCosine(col("va"), col("vb")))
      .where(col("cosine") >= minCosine)
      .crossJoin(broadcast(capStats))
      .select(col("a_id"), col("b_id"), roundTo(col("cosine"), 4).as("cosine"),
        col("n_capped_buckets"), col("n_ids_in_capped"))
      .orderBy("a_id", "b_id")

    // Materialize, then release the block cache (see minhashPairs).
    val out = result.localCheckpoint(true)
    blocksAll.unpersist()
    out
  }

  /** Exact repeated-span SCRUB — the actionable transform behind the
    * duplicated-span report (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": remove every duplicated
    * occurrence, keep one): each occurrence of a cross-document
    * `spanLen`-word span is excised from the token stream EXCEPT in the
    * span's canonical owner (min id), and surviving tokens are
    * reassembled in position order.
    *
    * Scale shape: one codegen shingle pass rides the scan; ownership is
    * a (span) partial agg; covered positions are a bounded spanLen×
    * explode of the foreign occurrences; the excision is a
    * (doc, position) anti equi-join; reassembly sorts each doc's
    * surviving (pos, token) structs locally. Nothing is quadratic and
    * no driver-side state exists. Note the splice semantics: removing a
    * block can make its neighbors adjacent, so scrubbing is (like the
    * paper's suffix-array pass) NOT idempotent by construction — new
    * spans can form across splice points.
    *
    * Output: (doc_id, n_tok_in, n_tok_kept, kept_text).
    */
  def spanScrub(docs: DataFrame, idCol: String, textCol: String,
                spanLen: Int = 8): DataFrame = {
    require(spanLen >= 2)
    val toks = docs.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))
    val occ = toks.select(col("doc_id"),
      posexplode(wordShingleStrings(col("toks"), spanLen)).as(Seq("pos", "span")))
    val owner = occ.groupBy("span").agg(min("doc_id").as("keeper"))
    val covered = occ.join(owner, "span")
      .where(col("doc_id") > col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (spanLen - 1))).as("cpos"))
      .distinct()
    // both sides descend from `toks` — alias explicitly so the equi-keys
    // resolve by name, not by Spark's positional self-join fallback
    val tokPos = toks.select(col("doc_id"), posexplode(col("toks")).as(Seq("tpos", "tok")))
    val kept = tokPos.as("tp").join(covered.as("cv"),
        col("tp.doc_id") === col("cv.doc_id") && col("tp.tpos") === col("cv.cpos"),
        "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("tpos"), col("tok")))),
          s => s("tok"))).as("kept_text"))
    toks.select(col("doc_id"), size(col("toks")).as("n_tok_in"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok_in"),
        coalesce(col("n_tok_kept"), lit(0L)).as("n_tok_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
      .orderBy("doc_id")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    * removal by coarse-clustering the embedding space and comparing
    * cosine ONLY within a cluster — the blocking key is the k-means
    * cell, so pair work is Σ|cluster|² instead of corpus². With
    * centroids fit at a target cluster size (K grows with n,
    * [[IvfIndex.fitScaled]]) that sum is O(n × targetClusterSize) —
    * linear in the corpus, embarrassingly parallel per cluster, and the
    * only shuffle is the (cluster) equi-join key. Cross-cluster dups
    * are deliberately out of reach (the SemDeDup trade); the measured
    * gap vs exhaustive search is the dedup_recall_eval idiom.
    *
    * Returns the DROP list: one row per discarded vector with its
    * canonical survivor (the min lower id among ≥-threshold in-cluster
    * neighbors), the cluster, and the strongest cosine that condemned it.
    */
  def semanticDrop(emb: DataFrame, idCol: String, vecCol: String,
                   centroids: Array[Array[Float]], minCosine: Double): DataFrame = {
    val clustered = emb.select(
      col(idCol).cast("long").as("vec_id"),
      nearestCentroid(col(vecCol), centroids).as("cluster"),
      col(vecCol).as("v"))
    val a = clustered.select(col("cluster"), col("vec_id").as("a_id"), col("v").as("va"))
    val b = clustered.select(col("cluster"), col("vec_id").as("b_id"), col("v").as("vb"))
    a.join(b, Seq("cluster"))
      .where(col("a_id") < col("b_id"))
      .withColumn("c", vecCosine(col("va"), col("vb")))
      .where(col("c") >= minCosine)
      .groupBy(col("cluster"), col("b_id"))
      .agg(min(col("a_id")).as("canonical_id"), max(col("c")).as("mc"))
      .select(col("b_id").as("vec_id"), col("canonical_id"), col("cluster"),
        roundTo(col("mc"), 4).as("max_cos"))
      .orderBy("vec_id")
  }
}
