package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Corpus-preparation operators — the steps between "raw deduped text"
  * and "training shards" in a large-scale LLM data pipeline. None of
  * these exist in the reference (it stops at vector serving); they are
  * the first-class pipeline mandate of this engine. Every op is a pure
  * narrow/partial-agg plan or a bounded window — nothing global-sorts
  * the corpus, nothing collects to the driver.
  */
object Corpus {

  /** Deterministic train/val/test split: bucket = hash(salt ∥ doc_id)
    * mod 100, thresholds in percent. Hash-based (not random) so the
    * assignment is stable across runs, machines, and table layouts —
    * the property a reproducible training pipeline needs. One map-side
    * pass, no shuffle.
    */
  def split(docs: DataFrame, idCol: String,
            trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "split thresholds must leave room for a test slice")
    val bucket = pmod(tokenHash60(concat(lit("split:"), col(idCol).cast("string"))), lit(100L))
    docs.select(
        col(idCol).as("doc_id"),
        bucket.cast("int").as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .orderBy("doc_id")
  }

  /** Top-k vocabulary by term frequency (ties broken lexically): the
    * classic partial-agg word count — explode is map-side, the groupBy
    * combines per partition before the (word-keyed) shuffle, and the
    * top-k cut is TakeOrderedAndProject, never a global sort. `n_docs`
    * (document frequency) rides the same shuffle via a two-level agg:
    * distinct (word, doc) first, so no count-distinct state explosion.
    */
  def vocab(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        explode(wordTokens(col(textCol))).as("word"))
    val perDoc = words.groupBy("word", "doc_id").agg(count(lit(1)).as("tf"))
    perDoc.groupBy("word")
      .agg(sum("tf").as("n"), count(lit(1)).as("n_docs"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)
      // cardinality bound: window runs over the k post-limit rows only
      .withColumn("rank", row_number().over(Window.orderBy(col("n").desc, col("word"))))
      .select("rank", "word", "n", "n_docs")
      .orderBy("rank")
  }

  /** The composed cleaning pipeline a pretraining corpus goes through:
    * keep documents that (a) classify as the target language, (b) score
    * at or above the quality threshold, and (c) are the canonical
    * (min-id) copy of their exact-duplicate group. Language + quality
    * come from the fused one-scan [[TextAnalysis.langQuality]] pass;
    * canonicalization is the single shuffle (window over md5(text)) —
    * one scan, one shuffle at any scale. The threshold compares the
    * 4-dp ROUNDED score (identical scale-round-unscale on both
    * engines), so the filter can never knife-edge on a ulp.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            lang: String = "en", minScore: Double = 0.5): DataFrame =
    TextAnalysis.langQuality(docs, idCol, textCol)
      .withColumn("canon_id",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .where(col("doc_id") === col("canon_id")
        && col("lang_pred") === lang && col("score") >= minScore)
      .select("doc_id", "lang_pred", "score")
      .orderBy("doc_id")

  /** Deterministic weighted mixture sampling — the up/down-sampling step
    * that turns raw per-source corpora into a training mixture ("2 epochs
    * of wiki, 0.3 of crawl"). Each document keeps or drops by comparing
    * its stable hash bucket against its source's percentage rate, so the
    * sample is reproducible across runs, machines, and table layouts, and
    * needs no global state — one map-side pass, no shuffle, any scale.
    * Sources absent from `rates` fall back to `defaultRate`.
    */
  def sampleMixture(docs: DataFrame, idCol: String, sourceCol: String,
                    rates: Map[String, Int], defaultRate: Int): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0, 100]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, r).otherwise(acc)
    }
    val bucket = pmod(tokenHash60(concat(lit("sample:"), col(idCol).cast("string"))), lit(100L))
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        bucket.cast("int").as("bucket"), rate.as("rate"))
      .where(col("bucket") < col("rate"))
      .select("doc_id", "source", "bucket", "rate")
      .orderBy("doc_id")
  }

  /** Contiguous sequence packing (concat-then-chunk): within each
    * `groupCol` stream, documents in doc-id order accumulate into bins
    * of `budget` tokens — bin = ⌊exclusive-running-token-sum / budget⌋,
    * i.e. a document starts a new bin when the budget is exhausted.
    * The window sorts only within a group (a source shard), which is
    * the natural packing unit at 100 TB — global packing order across
    * shards is neither needed nor desirable (it would serialize the
    * corpus).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    groupCol: String, budget: Int = 512): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val n = regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
    val w = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("doc_id"), col(groupCol).as("grp"), n.as("n_tok"))
      .withColumn("bin", floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / budget))
      .orderBy("grp", "doc_id")
  }

  /** Test-set decontamination (the GPT-3 §B appendix step): flag every
    * training document that shares at least one word n-gram with any
    * held-out eval document, so benchmark answers can be scrubbed from
    * the pretraining mixture. Eval membership reuses the deterministic
    * hash [[split]] (bucket ≥ 100−testPct), so corpus and eval set need
    * no side input. Returns (doc_id, n_shared) for contaminated train
    * docs only — n_shared = how many of the doc's DISTINCT n-grams also
    * occur anywhere in the eval slice.
    *
    * Scale shape: an eval/benchmark set is tiny relative to a 100 TB
    * corpus, so its distinct-gram set is collected into a broadcast
    * hash join — the train side stays one map-side pass (tokenize →
    * shingle-hash → explode distinct) plus one doc_id-keyed partial
    * agg. No shuffle ever carries text or full gram sets.
    */
  /** Top-k distinguishing terms per document by tf·idf with the idf as
    * the exact rational N/df: score = (tf·N)/df computed as one IEEE
    * division of two exact longs — bit-identical in every engine, so
    * both the RANKING and the reported 4-dp score are reproducible
    * (a transcendental ln-idf would differ in the last ulp across
    * libm implementations and knife-edge the rank order).
    *
    * Plan: one explode + (doc, word) partial agg for tf; the word→df
    * table is vocab-sized (≪ corpus even at 100 TB) so it joins back
    * broadcast; the per-doc top-k is a row_number window partitioned by
    * doc_id — no global sort anywhere.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "need a positive per-document cut")
    val nDocs = docs.count()
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(wordTokens(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val wordDf = perDoc.groupBy("word").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score_raw").desc, col("word"))
    perDoc.join(broadcast(wordDf), "word")
      .withColumn("score_raw", (col("tf") * lit(nDocs)) / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("word"), col("tf"), col("df"),
        roundTo(col("score_raw"), 4).as("score"))
      .orderBy("doc_id", "rank")
  }

  /** Corpus bigram language-model table: for every context word w1,
    * the top-k continuations w2 with exact counts c(w1,w2), context
    * total c(w1·) and the MLE probability — the "corpus → model
    * artifact" step (the count tables a KenLM-style estimator starts
    * from). p = c12/c1 is one IEEE division of exact longs, so both
    * ranking and the 4-dp probability are engine-reproducible.
    *
    * Plan: bigram explode is map-side (one codegen shingle pass); one
    * partial agg keyed (w1,w2); context totals + top-k ride a single
    * w1-partitioned window — the second shuffle is vocab²-sized, not
    * corpus-sized, at any scale.
    */
  def bigramLm(docs: DataFrame, textCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "need a positive per-context cut")
    val pairs = docs
      .select(explode(wordShingleStrings(wordTokens(col(textCol)), 2)).as("gm"))
      .select(substring_index(col("gm"), " ", 1).as("w1"),
        substring_index(col("gm"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val w = Window.partitionBy("w1")
    val rankW = Window.partitionBy("w1").orderBy(col("c12").desc, col("w2"))
    pairs
      .withColumn("c1", sum(col("c12")).over(w))
      .withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= k)
      .select(col("w1"), col("rank"), col("w2"), col("c12"), col("c1"),
        roundTo(col("c12") / col("c1"), 4).as("p"))
      .orderBy("w1", "rank")
  }

  /** TextRank keyword ranking (Mihalcea/Tarau 2004 — PageRank over the
    * word co-occurrence graph): nodes are words, edges are observed
    * bigrams weighted c₁₂/c₁, damping 0.85, `iters` fixed-point
    * rounds, top-`k` words by final rank.
    *
    * The iteration is EXACT integer arithmetic at scale 10⁹:
    * pr'(v) = 0.15·10⁹ + Σ_{u→v} ⌊⌊pr(u)·850/1000⌋·c₁₂/c₁⌋ — every
    * contribution is a floor-divided long, so per-node sums are
    * order-independent and the whole trajectory (and final ranking) is
    * engine-reproducible: the oracle unrolls the same three rounds in
    * SQL. Shape: one bigram count shuffle builds the edge table; each
    * round is an edge⋈rank join + partial-agg sum keyed by the
    * destination — the Pregel shape, like cluster resolution, with a
    * fixed round count so the plan is statically bounded (no
    * checkpoint needed).
    */
  def textrank(docs: DataFrame, textCol: String, iters: Int = 3, k: Int = 20): DataFrame = {
    require(iters >= 1 && k >= 1)
    // Persist the RAW bigram counts: everything downstream (out-degree,
    // edge table, node set) derives from this vocab²-bounded table, so
    // the corpus-scale tokenize+shingle pass runs exactly ONCE — without
    // this persist it re-runs for each derivation (it did: 3 scans).
    val edges0 = docs
      .select(explode(wordShingleStrings(wordTokens(col(textCol)), 2)).as("gm"))
      .select(substring_index(col("gm"), " ", 1).as("u"),
        substring_index(col("gm"), " ", -1).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outW = edges0.groupBy("u").agg(sum("c12").as("c1"))
    val edges = edges0.join(outW, "u")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges0.select(col("u").as("node"))
      .unionAll(edges0.select(col("v").as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.withColumn("pr", lit(1000000000L))
    for (_ <- 1 to iters) {
      // the rank table is vocab-bounded (≪ edges, ≪ corpus) at any data
      // size, so it BROADCASTS into the persisted edge table — edges
      // never re-shuffle across rounds; only the (node, m) partial agg
      // and the tiny rank merge move
      val contrib = edges.join(broadcast(pr.withColumnRenamed("node", "u")), "u")
        .select(col("v").as("node"),
          expr("((((pr * 850) div 1000) * c12) div c1)").as("m"))
        .groupBy("node").agg(sum("m").as("in_m"))
      pr = nodes.join(broadcast(contrib), Seq("node"), "left")
        .select(col("node"), (lit(150000000L) + coalesce(col("in_m"), lit(0L))).as("pr"))
    }
    val out = pr.orderBy(col("pr").desc, col("node")).limit(k)
      // cardinality bound: window runs over the k post-limit rows only
      .withColumn("rank", row_number().over(Window.orderBy(col("pr").desc, col("node"))))
      .select(col("rank"), col("node").as("word"), col("pr"))
      .localCheckpoint(true)
    edges.unpersist(); nodes.unpersist(); edges0.unpersist()
    out
  }

  /** Bigram-LM document scoring — the CCNet/KenLM-style quality filter:
    * score every document by its mean log-probability under the
    * corpus's own add-one-smoothed bigram model,
    * p(w₂|w₁) = (c₁₂ + 1) / (c₁ + V). Junk (rare-bigram-heavy) docs
    * score low; templated/fluent docs score high — the standard
    * perplexity-based pretraining filter with the LM trained in the
    * same query.
    *
    * Cross-engine exactness: each bigram's log-prob is fixed ONCE in
    * the model table via floor(ln(p)·10⁶ + 0.5); per-doc totals are
    * then exact integer sums (order-independent at any parallelism),
    * divided a single time. Scale shape: doc-bigram instances collapse
    * to per-doc distinct counts BEFORE joining the model (the join
    * ships |distinct bigrams per doc| rows, not |tokens|), and the
    * model itself is two partial aggregations bounded by observed
    * vocab², never by corpus size.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))
    val vDf = toks.select(explode(col("toks")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val db = toks
      .select(col("doc_id"), explode(wordShingleStrings(col("toks"), 2)).as("gm"))
      .select(col("doc_id"),
        substring_index(col("gm"), " ", 1).as("w1"),
        substring_index(col("gm"), " ", -1).as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("nij"))
    val c12 = db.groupBy("w1", "w2").agg(sum("nij").as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val model = c12.join(c1, "w1").crossJoin(vDf)
      .select(col("w1"), col("w2"),
        floor(log((col("c12") + lit(1.0)) / (col("c1") + col("v"))) * 1000000.0 + lit(0.5))
          .cast("long").as("s6"))
    db.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("nij").as("n_bigrams"), sum(col("nij") * col("s6")).as("ss"))
      .select(col("doc_id"), col("n_bigrams"),
        roundTo(col("ss") / (col("n_bigrams") * lit(1000000.0)), 4).as("lm_score"))
      .orderBy("doc_id")
  }

  /** Fixed-size overlapping token chunking — the RAG/context-window prep
    * step (chunk size `chunkTokens`, stride `strideTokens`; overlap =
    * size − stride). Start offsets explode map-side off the one
    * tokenizer pass (no shuffle except the presentation sort); each
    * chunk reports its token span and a content digest, the narrow form
    * an embedding/indexing stage consumes. Deterministic by
    * construction: offsets are 0, stride, 2·stride … < n_tok, the tail
    * chunk may be short, every token is covered, and docs with zero
    * tokens chunk to nothing.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int = 64, strideTokens: Int = 48): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1 && strideTokens <= chunkTokens,
      "stride must not exceed chunk size (or tokens would be skipped)")
    docs
      .select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(strideTokens))).as("start_tok"))
      .withColumn("chunk", slice(col("toks"), col("start_tok") + 1, lit(chunkTokens)))
      .select(col("doc_id"),
        (col("start_tok") / strideTokens).cast("int").as("chunk_idx"),
        col("start_tok"),
        size(col("chunk")).as("n_toks"),
        md5(concat_ws(" ", col("chunk")).cast("binary")).as("digest"))
      .orderBy("doc_id", "chunk_idx")
  }

  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 5, trainPct: Int = 80, testFrom: Int = 90): DataFrame = {
    require(n >= 2 && trainPct > 0 && testFrom >= trainPct,
      "need word n-grams and train/test buckets that do not overlap")
    val bucket = pmod(tokenHash60(concat(lit("split:"), col(idCol).cast("string"))), lit(100L))
    val grams = docs
      .select(col(idCol).as("doc_id"), bucket.as("b"),
        explode(array_distinct(wordShingleHash60(wordTokens(col(textCol)), n))).as("gram"))
    val evalGrams = grams.where(col("b") >= testFrom).select("gram").distinct()
    grams.where(col("b") < trainPct)
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }
}
