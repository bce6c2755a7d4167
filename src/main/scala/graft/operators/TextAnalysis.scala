package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Text-analysis operators for LLM-pipeline curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure map-side
  * projections of built-in (codegen'd) functions — at 100 TB these run
  * at scan speed with zero shuffle.
  */
object TextAnalysis {

  val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "was",
    "for", "on", "with", "as", "at", "this", "but", "be", "are", "have")
  val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den",
    "von", "im", "auf", "sich", "auch", "eine", "als", "werden", "aus", "bei")
  val stopFr = Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "pas",
    "dans", "pour", "sur", "au", "plus", "sont", "avec", "ne", "mais", "ou")
  val stopEs = Seq("el", "los", "y", "es", "que", "se", "por", "con", "para", "no",
    "las", "una", "su", "al", "como", "lo", "pero", "sus", "le", "ya")

  private def stopCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit): _*)))

  /** The lang_pred decision over the four vote columns — single
    * definition shared by [[langId]] and the fused [[langQuality]]
    * (deterministic priority en>de>fr>es).
    */
  private def langPredCol(nEn: Column, nDe: Column, nFr: Column, nEs: Column): Column =
    when(nEn === 0 && nDe === 0 && nFr === 0 && nEs === 0, "und")
      .when(nEn >= nDe && nEn >= nFr && nEn >= nEs, "en")
      .when(nDe >= nFr && nDe >= nEs, "de")
      .when(nFr >= nEs, "fr")
      .otherwise("es")

  /** Stopword-vote language ID with deterministic priority en>de>fr>es.
    * All four languages vote in one codegen pass ([[stopwordVotes]]).
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sets = Array(stopEn.toArray, stopDe.toArray, stopFr.toArray, stopEs.toArray)
    docs.select(col(idCol).as("doc_id"),
        stopwordVotes(wordTokens(col(textCol)), sets).as("v"))
      .select(col("doc_id"),
        col("v").getItem(0).as("n_en"), col("v").getItem(1).as("n_de"),
        col("v").getItem(2).as("n_fr"), col("v").getItem(3).as("n_es"))
      .withColumn("lang_pred",
        langPredCol(col("n_en"), col("n_de"), col("n_fr"), col("n_es")))
      .select("doc_id", "lang_pred", "n_en", "n_de", "n_fr", "n_es")
      .orderBy("doc_id")
  }

  /** Source × predicted-language composition: the [[langId]] vote per
    * doc rolled up to a (sources × 5)-bounded share matrix. One
    * tokenize+vote map pass; the share window runs on the bounded agg.
    */
  def langMix(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val sets = Array(stopEn.toArray, stopDe.toArray, stopFr.toArray, stopEs.toArray)
    docs.select(col(srcCol).as("source"),
        stopwordVotes(wordTokens(col(textCol)), sets).as("v"))
      .select(col("source"),
        langPredCol(col("v").getItem(0), col("v").getItem(1),
          col("v").getItem(2), col("v").getItem(3)).as("lang_pred"))
      .groupBy("source", "lang_pred").agg(count(lit(1)).as("n_docs"))
      .withColumn("t", sum("n_docs").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
      .select(col("source"), col("lang_pred"), col("n_docs"),
        roundTo(col("n_docs").cast("double") / col("t").cast("double"), 4).as("share"))
      .orderBy("source", "lang_pred")
  }

  /** Heuristic quality score in [0,1] from token count, mean token
    * length, stopword ratio, punctuation ratio. Arithmetic is written in
    * the exact order the oracle mirrors (IEEE ops are order-sensitive).
    */
  /** The quality formula over a frame carrying (text, toks, n_tok,
    * n_stop) — single definition, so [[quality]] and [[langQuality]]
    * cannot drift. Arithmetic is written in the exact order the oracle
    * mirrors (IEEE ops are order-sensitive).
    */
  private def withQualityScore(df: DataFrame): DataFrame = df
    .withColumn("mean_len",
      when(col("n_tok") === 0, 0.0).otherwise(
        sumStrLen(col("toks")).cast("double") / col("n_tok").cast("double")))
    .withColumn("punct_ratio",
      when(length(col("text")) === 0, 0.0).otherwise(
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double") /
          length(col("text")).cast("double")))
    .withColumn("stop_ratio",
      when(col("n_tok") === 0, 0.0)
        .otherwise(col("n_stop").cast("double") / col("n_tok").cast("double")))
    .withColumn("score",
      when(col("n_tok") === 0, 0.0).otherwise(
        lit(0.25) * least(col("n_tok").cast("double") / 50.0, lit(1.0)) +
        lit(0.25) * greatest(lit(0.0), lit(1.0) - abs(col("mean_len") - 5.0) / 5.0) +
        lit(0.25) * least(col("stop_ratio") * 5.0, lit(1.0)) +
        lit(0.25) * (lit(1.0) - least(col("punct_ratio") * 10.0, lit(1.0)))))

  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        wordTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("text"), col("toks"),
        size(col("toks")).as("n_tok"), stopCount(col("toks"), stopEn).as("n_stop"))
      .transform(withQualityScore)
      .select(col("doc_id"), col("n_tok"),
        roundTo(col("mean_len"), 4).as("mean_len"), roundTo(col("score"), 4).as("score"))
      .orderBy("doc_id")

  /** Fused one-scan language ID + quality score: one tokenizer pass, one
    * stopword-vote pass (n_stop IS the English vote), zero extra scans —
    * what a corpus pipeline composes instead of re-reading the table per
    * signal. Output: (doc_id, text, lang_pred, score 4-dp), unordered
    * (callers filter/aggregate next).
    */
  def langQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sets = Array(stopEn.toArray, stopDe.toArray, stopFr.toArray, stopEs.toArray)
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        wordTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("text"), col("toks"),
        size(col("toks")).as("n_tok"), stopwordVotes(col("toks"), sets).as("v"))
      .select(col("doc_id"), col("text"), col("toks"), col("n_tok"),
        col("v").getItem(0).as("n_en"), col("v").getItem(1).as("n_de"),
        col("v").getItem(2).as("n_fr"), col("v").getItem(3).as("n_es"),
        col("v").getItem(0).as("n_stop"))
      .transform(withQualityScore)
      .withColumn("lang_pred",
        langPredCol(col("n_en"), col("n_de"), col("n_fr"), col("n_es")))
      .select(col("doc_id"), col("text"), col("lang_pred"),
        roundTo(col("score"), 4).as("score"))
  }

  /** Whitespace tokens + BPE-ish segment count (letters runs / single
    * digits / punctuation marks — a proxy for byte-pair token counts).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
        col(idCol).as("doc_id"),
        when(length(trim(col(textCol))) === 0, 0)
          .otherwise(size(split(trim(col(textCol)), "\\s+"))).as("n_ws_tokens"),
        regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Polynomial rolling-hash fingerprint (base 31 mod 1e9+7) over the
    * raw character stream — one codegen kernel pass (the built-in chain
    * re-evaluated interpreted lambdas per character).
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), rollingFingerprint(col(textCol)).as("fp"))
      .orderBy("doc_id")

  /** Gopher-style within-document repetition signals (Rae et al. 2021,
    * "Scaling Language Models" §A1.1 — the filters that catch boilerplate
    * and degenerate generations): fraction of word-2-gram occurrences
    * belonging to the single most frequent 2-gram, and the fraction of
    * word-3-gram occurrences that are repeats (1 − distinct/total).
    *
    * Shape: shingle hashes are one codegen map pass; both signals are
    * per-doc partial aggregations keyed by doc_id (combine happens
    * map-side, the shuffle carries one row per distinct in-doc gram).
    * Fractions are single exact-rounded double divisions of longs —
    * bit-identical cross-engine before the display rounding.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("toks"))

    val g2 = toks.select(col("doc_id"), explode(wordShingleHash60(col("toks"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top2"), sum("c").as("n2"))

    val g3 = toks.select(col("doc_id"), explode(wordShingleHash60(col("toks"), 3)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("d3"), sum("c").as("n3"))

    // left joins from the doc list: short docs (no 2/3-grams) report 0.0
    toks.select(col("doc_id"))
      .join(g2, Seq("doc_id"), "left")
      .join(g3, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n2"), lit(0L)).as("n_2grams"),
        roundTo(when(col("n2").isNull, 0.0)
          .otherwise(col("top2").cast("double") / col("n2").cast("double")), 4).as("top_2gram_frac"),
        roundTo(when(col("n3").isNull, 0.0)
          .otherwise(lit(1.0) - col("d3").cast("double") / col("n3").cast("double")), 4).as("dup_3gram_frac"))
      .orderBy("doc_id")
  }
}
