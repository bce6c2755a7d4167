package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Text retrieval — the keyword leg a real vector-search deployment runs
  * next to ANN (the reference serves vectors only; hybrid keyword+vector
  * ranking is what its users bolt on first). Everything here is a pure
  * partial-agg plan over the inverted-index shape (term-keyed rows):
  * nothing global-sorts the corpus and the only driver-visible data is
  * the top-k result.
  *
  * Cross-engine exactness: per-term BM25 contributions are computed in
  * double, then fixed to integers via floor(x·10⁶ + 0.5) — floor of the
  * BINARY value, identical in any IEEE engine (unlike decimal-string
  * rounding) — so the per-document sum is an exact long addition in any
  * aggregation order, and ranking compares exact integers.
  */
object Retrieval {

  /** BM25 (Robertson/Sparck-Jones, the Okapi formulation) top-k:
    * score(D, Q) = Σ_{t ∈ Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
    * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    *
    * Scale shape: per-term tf comes from ONE pass of the
    * [[graft.functions.stopwordVotes]] codegen kernel (each query term
    * is a singleton set), so no token ever leaves its row — the only
    * rows entering any shuffle are the ≤ |Q| (doc, term-index, tf)
    * postings of MATCHING docs. df is a |Q|-row aggregate broadcast
    * back; document length rides the posting row; corpus stats (N,
    * Σ|D|) are one 1-row aggregate cross-joined as a broadcast.
    * Shuffles: df groupBy, per-doc score sum, final top-k TakeOrdered —
    * all partial-aggregated, all O(matching docs), never O(corpus
    * tokens).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1)
    val sets = queryTerms.map(t => Array(t)).toArray
    val base = docs.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        stopwordVotes(col("toks"), sets).as("tfv"))

    // 1-row corpus stats (N, avgdl): exact long sum / exact long count ⇒
    // one double division, bit-identical in any engine.
    val stats = base.agg(
      count(lit(1)).as("n_corpus"),
      sum(col("dl")).as("sum_dl"))

    // Postings: ≤ |Q| narrow rows per MATCHING doc (tf already counted
    // map-side), zero rows for the rest of the corpus.
    val postings = base
      .select(col("doc_id"), col("dl"), posexplode(col("tfv")).as(Seq("ti", "tf")))
      .where(col("tf") > 0)

    val dfreq = postings.groupBy("ti").agg(count(lit(1)).as("df"))

    val idf = log((col("n_corpus") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / (col("sum_dl").cast("double") / col("n_corpus")))))

    postings
      .join(broadcast(dfreq), "ti")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        // exact integer fixing of each term contribution (see object doc)
        floor(idf * tfNorm * lit(1000000.0) + lit(0.5)).cast("long").as("s6"))
      .groupBy("doc_id")
      .agg(sum("s6").as("s6"))
      .orderBy(col("s6").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("s6").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), roundTo(col("s6") / lit(1000000.0), 4).as("score"))
  }

  /** The inverted-index build: full-vocabulary postings
    * (term, doc_id, tf, dl), GLOBALLY RANGE-SORTED BY TERM so a
    * materialized copy prunes at parquet row-group/file level for any
    * `term IN (...)` query — the text-side persisted index next to the
    * IVF/PQ vector layouts (one tokenize pass at build time; query-time
    * IO is O(postings of the query terms), the inverted-index
    * contract). dl rides the posting row so scoring needs no join back
    * to a length table.
    */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postingsFromTokens(tokensProjection(docs, idCol, textCol))

  /** The (doc_id, toks[, meta...]) projection both index tables derive
    * from — the ONE tokenize pass. [[graft.api.TextIndex.build]]
    * persists it once and feeds the stored copy to both `fromTokens`
    * plans, so the corpus is tokenized exactly once per build.
    * `metaCols` ride through to the doc-length table (the filter-index
    * columns of [[bm25TopKFromIndexFiltered]]).
    */
  def tokensProjection(docs: DataFrame, idCol: String, textCol: String,
                       metaCols: String*): DataFrame =
    docs.select(col(idCol).as("doc_id") +: wordTokens(col(textCol)).as("toks")
      +: metaCols.map(col): _*)

  /** [[buildPostings]]' plan tail over an already-tokenized projection.
    * POSITIONAL (r9): each posting carries the sorted 1-based token
    * positions of its term — the Lucene-style positional index that
    * makes phrase search ([[phraseSearchFromIndex]]) a pure
    * postings-join, at the honest ~tf ints/posting storage cost every
    * positional index pays. Non-positional consumers (BM25) prune the
    * column at the scan.
    */
  def postingsFromTokens(tokens: DataFrame): DataFrame =
    tokens
      .select(col("doc_id"), size(col("toks")).as("dl"),
        posexplode(col("toks")).as(Seq("p", "term")))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), min("dl").as("dl"),
        sort_array(collect_list((col("p") + 1).cast("int"))).as("positions"))
      .orderBy("term", "doc_id")

  /** Per-doc token lengths — the index's companion stats table: N and
    * Σ|D| must count ZERO-token documents too, which have no posting
    * rows (corpus-narrow: one (doc_id, dl) row per document).
    */
  def buildDocLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docLengthsFromTokens(tokensProjection(docs, idCol, textCol))

  /** [[buildDocLengths]]' plan tail over an already-tokenized
    * projection — any metadata columns the projection carries ride
    * through beside (doc_id, dl).
    */
  def docLengthsFromTokens(tokens: DataFrame): DataFrame = {
    val meta = tokens.columns.filterNot(c => c == "doc_id" || c == "toks")
    tokens.select(col("doc_id") +: size(col("toks")).as("dl") +: meta.map(col): _*)
  }

  /** [[buildDocLengths]] with carried metadata columns — the text-side
    * analog of the reference's scalar filter index riding the index
    * artifact (filter_index.rs value→ids beside the vectors): a
    * metadata predicate prunes the doc-side artifact scan directly, no
    * join back to the raw corpus at query time
    * ([[bm25TopKFromIndexFiltered]]).
    */
  def buildDocLengthsWithMeta(docs: DataFrame, idCol: String, textCol: String,
                              metaCols: String*): DataFrame =
    docLengthsFromTokens(tokensProjection(docs, idCol, textCol, metaCols: _*))

  /** Streaming maintenance of a materialized postings index: tokenize
    * an ingested micro-batch with the SAME kernel as the build and
    * append its postings/doc-length rows (the
    * [[graft.operators.Dedup.appendSignatures]] /
    * `IvfIndex.appendPartitioned` analog — no rewrite, no re-tokenize
    * of the standing corpus). Appended files carry their own min/max
    * term footers, so term pruning stays CORRECT; it just prunes at
    * file granularity for the new files until ordinary parquet
    * compaction re-sorts them — the same hygiene contract as the
    * cluster-partitioned vector layout.
    */
  /** `gen` (the facade's generational maintenance) stamps both tables'
    * appended rows with the batch's generation, and flips the write
    * order to DOC-LENGTHS FIRST: a doclen row exists for every doc
    * (including zero-token ones), so crash recovery can decide from the
    * doclen slice alone whether the batch's postings must exist — and
    * roll the batch forward or back accordingly
    * ([[graft.api.TextIndex]]'s `_inflight` protocol).
    */
  def appendPostings(docs: DataFrame, idCol: String, textCol: String,
                     postingsPath: String, docLengthsPath: String,
                     metaCols: Seq[String] = Seq.empty,
                     gen: Option[Long] = None): Unit = {
    def stamp(df: DataFrame): DataFrame =
      gen.map(g => df.withColumn("gen", lit(g))).getOrElse(df)
    if (gen.isDefined) {
      stamp(buildDocLengthsWithMeta(docs, idCol, textCol, metaCols: _*))
        .write.mode("append").parquet(docLengthsPath)
      stamp(buildPostings(docs, idCol, textCol))
        .write.mode("append").parquet(postingsPath)
    } else {
      buildPostings(docs, idCol, textCol)
        .write.mode("append").parquet(postingsPath)
      buildDocLengthsWithMeta(docs, idCol, textCol, metaCols: _*)
        .write.mode("append").parquet(docLengthsPath)
    }
  }

  /** Exact phrase search over the positional index — the Lucene
    * PhraseQuery analog (the capability that separates a real inverted
    * index from a bag-of-words score table): documents where the query
    * terms occur at CONSECUTIVE token positions in order, ranked by
    * exact phrase frequency.
    *
    * Scale shape: ONE term-pruned scan of the postings artifact
    * (`term IN (phrase)` reaches the sorted scan), then |phrase|−1
    * doc_id equi-joins of the pruned posting rows — every side is
    * O(df of a phrase term), never the corpus — with the positional
    * intersection `acc ∩ (positions_i − i)` as in-row array math.
    * Phrase tf = |∩ᵢ (positionsᵢ − i)| — exact integers (positions are
    * distinct by construction), so ranking is deterministic with the
    * doc_id tie-break.
    */
  def phraseSearchFromIndex(postings: DataFrame, phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.size >= 2 && k >= 1)
    val pruned = postings.where(col("term").isin(phrase.distinct: _*))
      .select(col("term"), col("doc_id"), col("positions"))
    val start = pruned.where(col("term") === phrase.head)
      .select(col("doc_id"), col("positions").as("acc"))
    val matched = phrase.zipWithIndex.tail.foldLeft(start) { case (acc, (t, i)) =>
      acc.join(pruned.where(col("term") === t)
          .select(col("doc_id"), col("positions").as("pi")), Seq("doc_id"))
        .select(col("doc_id"),
          array_intersect(col("acc"), transform(col("pi"), x => x - i)).as("acc"))
        .where(size(col("acc")) > 0)
    }
    matched.select(col("doc_id"), size(col("acc")).as("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("phrase_tf").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("phrase_tf"))
  }

  /** Proximity (sloppy-phrase) search over the positional index — the
    * n-clause SpanNear analog beside [[phraseSearchFromIndex]]'s exact
    * phrase: documents where the terms occur IN ORDER with each
    * consecutive gap within `window` tokens, ranked by the exact count
    * of such ordered position chains (for two terms: the ordered pair
    * count). Same scale shape as the phrase join
    * ([[phraseSearchFromIndex]]'s foldLeft): |terms|−1 doc_id
    * equi-joins of term-pruned posting rows — every side O(df of a
    * term), never the corpus — with the chain math in-row. The fold
    * state is the (position, chains-ending-here) list of the prefix:
    * each step re-anchors on the next term's positions and sums the
    * reachable prefix chains, O(tf_prev · tf_next) per doc per step —
    * the cost every positional engine pays for slop.
    */
  def nearSearchFromIndex(postings: DataFrame, terms: Seq[String],
                          window: Int, k: Int): DataFrame = {
    require(terms.size >= 2 && window >= 1 && k >= 1)
    val pruned = postings.where(col("term").isin(terms.distinct: _*))
      .select(col("term"), col("doc_id"), col("positions"))
    // (p, c): c chains of the terms-so-far prefix end at position p
    val start = pruned.where(col("term") === terms.head)
      .select(col("doc_id"),
        transform(col("positions"), p => struct(p.as("p"), lit(1L).as("c"))).as("acc"))
    val chained = terms.tail.foldLeft(start) { (acc, t) =>
      acc.join(pruned.where(col("term") === t)
          .select(col("doc_id"), col("positions").as("pi")), Seq("doc_id"))
        .select(col("doc_id"),
          filter(
            transform(col("pi"), q => struct(q.as("p"),
              aggregate(col("acc"), lit(0L), (s, e) =>
                s + when(q > e.getField("p") && q - e.getField("p") <= window,
                  e.getField("c")).otherwise(lit(0L))).as("c"))),
            e => e.getField("c") > 0L).as("acc"))
        .where(size(col("acc")) > 0)
    }
    chained
      .select(col("doc_id"),
        aggregate(col("acc"), lit(0L), (s, e) => s + e.getField("c"))
          .cast("int").as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("n_pairs").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("n_pairs"))
  }

  /** Two-term overload (the original SpanNear pair shape). */
  def nearSearchFromIndex(postings: DataFrame, a: String, b: String,
                          window: Int, k: Int): DataFrame =
    nearSearchFromIndex(postings, Seq(a, b), window, k)

  /** Compaction for an appended postings index: re-range-sort the whole
    * table by (term, doc_id) and atomically swap it in, restoring
    * row-group-level term pruning (each append adds whole-batch files
    * whose term range spans the batch vocabulary, so pruning degrades
    * to file granularity until this runs — the hygiene contract the
    * appended layout documents). Data is only re-SORTED, never
    * re-derived: no tokenize, no aggregation — one shuffle of the
    * posting rows, the same cost class as ordinary parquet compaction.
    * Crash-safe swap at DETERMINISTIC sibling names (the Artifacts-style
    * commit discipline): the compacted copy is fully written (with its
    * `_SUCCESS` marker) at `<path>_compact_new` while readers still see
    * the live table, then the live table renames aside to
    * `<path>_compact_old`, the new copy renames in, and the old copy is
    * deleted. A crash in ANY window leaves a complete copy resolvable at
    * a deterministic name, and [[recoverCompaction]] (run at the start
    * of every compaction and by [[graft.api.TextIndex.load]]) adopts or
    * cleans it — never a missing index recoverable only by hunting for
    * a UUID scratch dir. Still single-writer: run it from the
    * maintenance role that owns the index, like any compactor.
    */
  def compactPostings(spark: org.apache.spark.sql.SparkSession,
                      postingsPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(postingsPath)
    val fs = target.getFileSystem(conf)
    recoverCompaction(spark, postingsPath)
    val fresh = new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_new")
    val old = new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_old")
    // generation-aware read: generationally-appended files carry a
    // `gen` column the build's files lack — a plain read would infer
    // one file's schema and silently DROP the stamps the read filter
    // needs. The rewrite comes out schema-uniform.
    // gen-0 baseline restamp, same reasoning as the tombstone fold's
    // (Tombstones.compact): no tombstones exist on this path and every
    // future one covers any kept stamp, so collapsing the per-batch gen
    // slices is serve-equivalent
    Tombstones.readWithGen(spark, postingsPath)
      .withColumn("gen", org.apache.spark.sql.functions.lit(0L))
      .orderBy("term", "doc_id")
      .write.mode("overwrite").parquet(fresh.toString)
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(target, old), s"compaction aside-rename failed for $postingsPath")
    require(fs.rename(fresh, target), s"compaction swap failed for $postingsPath")
    fs.delete(old, true)
  }

  /** Recover an interrupted [[compactPostings]]: if the live table is
    * missing, adopt the COMPLETE compacted copy at `_compact_new` (its
    * `_SUCCESS` marker proves the write finished) or, failing that,
    * restore the aside-renamed previous copy at `_compact_old`; if the
    * live table exists, sweep any leftover siblings. Idempotent and
    * cheap (driver-side fs metadata only) — [[graft.api.TextIndex.load]]
    * runs it so a restart always resolves a complete index at the
    * index's own path.
    */
  def recoverCompaction(spark: org.apache.spark.sql.SparkSession,
                        postingsPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(postingsPath)
    val fs = target.getFileSystem(conf)
    val fresh = new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_new")
    val old = new org.apache.hadoop.fs.Path(s"${postingsPath}_compact_old")
    val freshComplete = fs.exists(new org.apache.hadoop.fs.Path(fresh, "_SUCCESS"))
    if (!fs.exists(target)) {
      if (freshComplete) require(fs.rename(fresh, target),
        s"compaction recovery failed adopting $fresh")
      else if (fs.exists(old)) require(fs.rename(old, target),
        s"compaction recovery failed restoring $old")
      else require(!fs.exists(fresh),
        s"compaction left no recoverable table for $postingsPath: target missing, " +
          s"$fresh incomplete (no _SUCCESS) and $old absent — refusing to delete " +
          "the only remaining copy; restore the table manually")
    }
    if (fs.exists(fresh)) fs.delete(fresh, true)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** [[bm25TopK]] served from a materialized [[buildPostings]] index:
    * the `term IN (query)` filter pushes to the postings scan (range-
    * sorted ⇒ row-group prune), df is the |Q|-row aggregate over the
    * pruned postings, and the scoring arithmetic is IDENTICAL to the
    * from-scratch operator — same floor-fixed integer contributions,
    * same exact-long sum, same (score, id) TakeOrdered cut.
    */
  def bm25TopKFromIndex(postings: DataFrame, docLengths: DataFrame,
                        queryTerms: Seq[String], k: Int,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1)
    val stats = docLengths.agg(count(lit(1)).as("n_corpus"), sum(col("dl")).as("sum_dl"))
    val p = postings.where(col("term").isin(queryTerms: _*))
    scoreTail(p, stats, k, k1, b)
  }

  /** The shared single-query scoring tail over pruned postings
    * (doc_id, term, tf, dl) + a 1-row (n_corpus, sum_dl) stats frame:
    * |Q|-row df broadcast, floor-fixed integer contributions, exact-long
    * per-doc sum, (score, id) TakeOrdered cut.
    */
  private def scoreTail(p: DataFrame, stats: DataFrame, k: Int,
                        k1: Double, b: Double): DataFrame = {
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_corpus") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / (col("sum_dl").cast("double") / col("n_corpus")))))
    p.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idf * tfNorm * lit(1000000.0) + lit(0.5)).cast("long").as("s6"))
      .groupBy("doc_id")
      .agg(sum("s6").as("s6"))
      .orderBy(col("s6").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("s6").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), roundTo(col("s6") / lit(1000000.0), 4).as("score"))
  }

  /** Metadata-filtered BM25 from the shared index — the text analog of
    * the reference's filter-composed ANN search (filter_index.rs
    * Operation::Equal ∘ hnsw_index.rs search_vectors_filter): score the
    * query over ONLY the documents satisfying `docFilter`, with corpus
    * stats (N, avgdl) and df recomputed over the filtered sub-corpus —
    * provably identical to building an index on the filtered corpus
    * (RetrievalSpec), while serving from the SHARED artifacts.
    *
    * Scale shape: `docFilter` prunes the doc-side artifact scan
    * directly (metadata columns ride the doc-length table the way dl
    * rides the posting row — [[buildDocLengthsWithMeta]]), the term
    * predicate prunes the postings scan, and the two compose by
    * BROADCASTING the term-pruned postings (O(Σ df of the query
    * terms), the bound every keyword engine already accepts) into the
    * allowed-docs scan — the corpus-proportional side never shuffles
    * and never broadcasts.
    */
  def bm25TopKFromIndexFiltered(postings: DataFrame, docLengths: DataFrame,
                                docFilter: Column, queryTerms: Seq[String], k: Int,
                                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1)
    val allowed = docLengths.where(docFilter)
    val stats = allowed.agg(count(lit(1)).as("n_corpus"), sum(col("dl")).as("sum_dl"))
    val pruned = postings.where(col("term").isin(queryTerms: _*))
    val p = allowed.select(col("doc_id")).join(broadcast(pruned), Seq("doc_id"))
    scoreTail(p, stats, k, k1, b)
  }

  /** [[bm25TopKBatch]] served from the materialized index: postings
    * prune to the union query vocabulary via a broadcast semi-join on
    * the sorted index scan; everything downstream (df, contributions,
    * per-query sums, bounded-heap cut, leave-self-out) is the identical
    * plan tail.
    */
  def bm25TopKBatchFromIndex(postings: DataFrame, docLengths: DataFrame,
                             queryTerms: DataFrame, k: Int,
                             k1: Double = 1.2, b: Double = 0.75,
                             excludeQueryDoc: Boolean = false): DataFrame = {
    require(k >= 1)
    val stats = docLengths.agg(count(lit(1)).as("n_corpus"), sum(col("dl")).as("sum_dl"))
    val vocab = queryTerms.select("term").distinct()
    val p = postings.join(broadcast(vocab), Seq("term"), "leftsemi")
    batchScoreTail(p, stats, queryTerms, k, k1, b, excludeQueryDoc)
  }

  /** Metadata-filtered BATCH BM25 from the shared index — the text twin
    * of the vector side's filtered batch kernel, completing the
    * composition square (single/batch × unfiltered/filtered): every
    * (q_id, term) query is answered over ONLY the documents satisfying
    * `docFilter`, with stats and df recomputed over the sub-corpus —
    * per query, provably identical to [[bm25TopKFromIndexFiltered]]
    * (RetrievalSpec). Same scale shape as the filtered single: the
    * filter prunes the doc-side artifact scan, the union query
    * vocabulary prunes the postings scan, and the vocab-pruned postings
    * (O(Σ df), the bound every keyword engine accepts) BROADCAST into
    * the allowed side — the corpus-proportional leg never shuffles.
    */
  def bm25TopKBatchFromIndexFiltered(postings: DataFrame, docLengths: DataFrame,
                                     docFilter: Column, queryTerms: DataFrame, k: Int,
                                     k1: Double = 1.2, b: Double = 0.75,
                                     excludeQueryDoc: Boolean = false): DataFrame = {
    require(k >= 1)
    val allowed = docLengths.where(docFilter)
    val stats = allowed.agg(count(lit(1)).as("n_corpus"), sum(col("dl")).as("sum_dl"))
    val vocab = queryTerms.select("term").distinct()
    val pruned = postings.join(broadcast(vocab), Seq("term"), "leftsemi")
    val p = allowed.select(col("doc_id")).join(broadcast(pruned), Seq("doc_id"))
    batchScoreTail(p, stats, queryTerms, k, k1, b, excludeQueryDoc)
  }

  /** The shared batch scoring tail over pruned postings + a 1-row stats
    * frame: |vocab|-row df broadcast, floor-fixed integer contributions,
    * per-(query, doc) exact-long sums via the term→query broadcast join,
    * bounded-heap stratified cut — shuffle O(queries × k).
    */
  private def batchScoreTail(p: DataFrame, stats: DataFrame, queryTerms: DataFrame,
                             k: Int, k1: Double, b: Double,
                             excludeQueryDoc: Boolean): DataFrame = {
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_corpus") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / (col("sum_dl").cast("double") / col("n_corpus")))))
    val contrib = p
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"),
        floor(idf * tfNorm * lit(1000000.0) + lit(0.5)).cast("long").as("s6"))
    val scoredAll = contrib
      .join(broadcast(queryTerms.select(col("q_id"), col("term"))), Seq("term"))
      .groupBy("q_id", "doc_id")
      .agg(sum("s6").as("s6"))
    val scored = if (excludeQueryDoc) scoredAll.where(col("doc_id") =!= col("q_id")) else scoredAll
    Stats.stratifiedSample(scored, "q_id", "doc_id", "s6", -col("s6"), k)
      .select(col("stratum").as("q_id"), col("pick").as("rank"),
        col("id").as("doc_id"), col("payload").as("s6"))
  }

  /** Batch BM25: many queries scored in one plan, each query a SET of
    * terms arriving as DATA rows (q_id, term) — the bulk-evaluation /
    * doc-as-query shape, vs [[bm25TopK]]'s single literal query.
    *
    * Scale shape: the postings prune to the union of query vocabularies
    * BEFORE any shuffle (semi join against the distinct term set —
    * bounded by queries × terms/query, so it broadcasts), then tf is a
    * partial-agg count per (doc, term). df and the 1-row corpus stats
    * are shared across all queries. Per-(query, doc) sums fan out via
    * the term→query join (query-set-bounded, broadcast like
    * [[bm25TopK]]'s df), and the final cut is the [[Stats]] bounded-heap
    * stratified aggregator — shuffle O(queries × k), never a per-query
    * sort of the scored corpus.
    *
    * `excludeQueryDoc` drops doc_id == q_id before the cut (the
    * leave-self-out eval convention when queries are corpus docs).
    */
  def bm25TopKBatch(docs: DataFrame, idCol: String, textCol: String,
                    queryTerms: DataFrame, k: Int,
                    k1: Double = 1.2, b: Double = 0.75,
                    excludeQueryDoc: Boolean = false): DataFrame = {
    require(k >= 1)
    val toksDf = docs.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val stats = toksDf.agg(count(lit(1)).as("n_corpus"), sum(col("dl")).as("sum_dl"))
    val vocab = queryTerms.select("term").distinct()
    val postings = toksDf
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(vocab), Seq("term"), "leftsemi")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))

    val idf = log((col("n_corpus") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / (col("sum_dl").cast("double") / col("n_corpus")))))

    val contrib = postings
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"),
        floor(idf * tfNorm * lit(1000000.0) + lit(0.5)).cast("long").as("s6"))
    val scoredAll = contrib
      .join(broadcast(queryTerms.select(col("q_id"), col("term"))), Seq("term"))
      .groupBy("q_id", "doc_id")
      .agg(sum("s6").as("s6"))
    val scored = if (excludeQueryDoc) scoredAll.where(col("doc_id") =!= col("q_id")) else scoredAll
    Stats.stratifiedSample(scored, "q_id", "doc_id", "s6", -col("s6"), k)
      .select(col("stratum").as("q_id"), col("pick").as("rank"),
        col("id").as("doc_id"), col("payload").as("s6"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
    * rrf(d) = Σ_legs 1/(c + rank_leg(d)), missing leg contributes 0.
    * Ranks are exact ints, so every fused score is the same short sum of
    * exact rationals in leg order — bit-identical across engines, no
    * rounding games needed until the display column.
    *
    * Both legs arrive as (doc_id, rank) top-n lists (a few rows each), so
    * the fusion is a full outer join of two k-row tables — driver-trivial
    * at any corpus scale; the heavy lifting already happened in the legs.
    */
  /** Alpha-weighted hybrid fusion (the "alpha" knob vector stores
    * expose next to RRF): min-max-normalize each leg's score inside its
    * own top-k' list, then blend α·vec + (1−α)·text. `distLeg` carries
    * (doc_id, v4) 1e-4-fixed DISTANCES (lower better), `scoreLeg`
    * (doc_id, s4) 1e-4-fixed SCORES (higher better); normalization is
    * a single exact-long subtraction/division per row, so the blend is
    * two multiplies and an add — the identical tree in the oracle.
    * The unpartitioned min/max windows run over the k'-bounded leg
    * lists (never the corpus) — cardinality-bounded by construction.
    */
  def weightedFuse(distLeg: DataFrame, scoreLeg: DataFrame, k: Int,
                   alpha: Double = 0.6): DataFrame = {
    val w = Window.partitionBy()
    val a = distLeg
      .withColumn("mx", max("v4").over(w)).withColumn("mn", min("v4").over(w))
      .select(col("doc_id"),
        when(col("mx") === col("mn"), lit(1.0))
          .otherwise((col("mx") - col("v4")).cast("double")
            / (col("mx") - col("mn")).cast("double")).as("na"))
    val b = scoreLeg
      .withColumn("mx", max("s4").over(w)).withColumn("mn", min("s4").over(w))
      .select(col("doc_id"),
        when(col("mx") === col("mn"), lit(1.0))
          .otherwise((col("s4") - col("mn")).cast("double")
            / (col("mx") - col("mn")).cast("double")).as("nb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (lit(alpha) * coalesce(col("na"), lit(0.0))
          + lit(1.0 - alpha) * coalesce(col("nb"), lit(0.0))).as("h"))
      .orderBy(col("h").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("h").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), graft.functions.roundTo(col("h"), 6).as("hybrid"))
  }

  def rrfFuse(legA: DataFrame, legB: DataFrame, k: Int, c: Int = 60): DataFrame = {
    val a = legA.select(col("doc_id"), col("rank").as("rank_a"))
    val b = legB.select(col("doc_id"), col("rank").as("rank_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"),
        roundTo(col("rrf"), 6).as("rrf"),
        col("rank_a").cast("int").as("rank_vec"),
        col("rank_b").cast("int").as("rank_text"))
  }
}
