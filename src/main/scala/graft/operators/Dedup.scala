package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Deduplication operators for LLM-training-data pipelines.
  *
  * All four near-dup flavors follow the same scale shape: a narrow
  * map-side signature pass (codegen'd, no shuffle), then a shuffle
  * keyed only on small blocking keys (band buckets / source blocks),
  * never an O(n²) global cross join. Pair outputs are deterministic:
  * (a_id < b_id), ordered.
  */
object Dedup {

  /** Exact dedup via content hash: one row per distinct text, keeping the
    * smallest id as the canonical document.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))
      .orderBy("keep_id")

  /** MinHash + LSH banding near-dup candidates.
    *
    * Signature: 32 minhashes over word 3-shingles (one codegen pass per
    * doc). Banding: 8 bands × 4 rows; docs sharing any band bucket become
    * candidates; est_sim = fraction of agreeing signature positions.
    * Shuffle is keyed on (band, bucket-md5) only — O(n) rows of a few
    * bytes regardless of document size.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String, minEst: Double): DataFrame = {
    val sig = minHashSig(
      transform(wordShingles(wordTokens(col(textCol)), 3), s => tokenHash60(s)), 32)
    val signed = docs.select(col(idCol).as("doc_id"), sig.as("sig")).where(col("sig").isNotNull)

    val bands = signed
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bucket",
        md5(concat_ws(",", transform(slice(col("sig"), col("band") * 4 + 1, lit(4)), _.cast("string")))
          .cast("binary")))

    val a = bands.select(col("band"), col("bucket"), col("doc_id").as("a_id"), col("sig").as("sig_a"))
    val b = bands.select(col("band"), col("bucket"), col("doc_id").as("b_id"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("est_sim",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v)) / lit(32.0))
      .where(col("est_sim") >= minEst)
      .select(col("a_id"), col("b_id"), round(col("est_sim"), 4).as("est_sim"))
      .orderBy("a_id", "b_id")
  }

  /** SimHash near-dup pairs: 60-bit simhash over word tokens, LSH on
    * 4 × 15-bit bands, exact hamming re-rank ≤ maxHamming.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val sig = simHash60(transform(wordTokens(col(textCol)), t => tokenHash60(t)))
    val signed = docs.select(col(idCol).as("doc_id"), sig.as("sig"))

    val bands = signed
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_key", expr("shiftright(sig, band * 15) & 32767"))

    val a = bands.select(col("band"), col("band_key"), col("doc_id").as("a_id"), col("sig").as("sig_a"))
    val b = bands.select(col("band"), col("band_key"), col("doc_id").as("b_id"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_key"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy("a_id", "b_id")
  }

  /** Character n-gram Jaccard similarity pairs, blocked on a grouping
    * column (never global O(n²) — pairs only form within a block).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int, minJaccard: Double): DataFrame = {
    val grams = docs.select(
      col(blockCol).as("blk"), col(idCol).as("doc_id"),
      array_distinct(charShingles(col(textCol), n)).as("g"))
    val a = grams.select(col("blk"), col("doc_id").as("a_id"), col("g").as("ga"))
    val b = grams.select(col("blk"), col("doc_id").as("b_id"), col("g").as("gb"))
    a.join(b, Seq("blk"))
      .where(col("a_id") < col("b_id"))
      .withColumn("jaccard",
        size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb"))).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Embedding-cosine near-dup pairs within blocks (exact within block;
    * the 100 TB path swaps the block key for an LSH bucket — see
    * LshIndex — which keeps the same pair semantics at bounded cost).
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                           blockCol: String, minCosine: Double): DataFrame = {
    val a = emb.select(col(blockCol).as("blk"), col(idCol).as("a_id"), col(vecCol).as("va"))
    val b = emb.select(col(blockCol).as("blk"), col(idCol).as("b_id"), col(vecCol).as("vb"))
    a.join(b, Seq("blk"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cosine", vecCosine(col("va"), col("vb")))
      .where(col("cosine") >= minCosine)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 4).as("cosine"))
      .orderBy("a_id", "b_id")
  }
}
