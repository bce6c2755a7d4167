package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.{functions => F}

/** Column-API surface of the engine's custom Catalyst expressions,
  * plus the text-pipeline building blocks (expressed with built-in
  * codegen'd functions so the DuckDB oracle can mirror them 1:1).
  */
package object functions {

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Round a double to `digits` decimals with semantics REPRODUCIBLE in
    * DuckDB: scale, round-half-away-from-zero the binary value, unscale
    * (`round(x * 10^n) / 10^n` on both sides). Spark's `round(x, n)`
    * rounds the double's shortest DECIMAL string (BigDecimal.valueOf),
    * DuckDB rounds the BINARY value — near .xxxx5 the two disagree by
    * one ulp of output (observed at sf0.001). Every oracle-checked
    * operator rounds through this.
    */
  def roundTo(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    F.round(c * p, 0) / p
  }

  /** Inner product (reference MetricType::InnerProduct, index_factory.rs:44). */
  def vecDot(a: Column, b: Column): Column = col(VecDot(expr(a), expr(b)))

  /** Squared L2 distance (faiss FLAT L2 semantics). */
  def vecL2Sq(a: Column, b: Column): Column = col(VecL2Sq(expr(a), expr(b)))

  /** True L2 distance. */
  def vecL2(a: Column, b: Column): Column = F.sqrt(vecL2Sq(a, b))

  /** Cosine similarity. */
  def vecCosine(a: Column, b: Column): Column = col(VecCosine(expr(a), expr(b)))

  /** L2 norm. */
  def vecNorm(a: Column): Column = col(VecNorm(expr(a)))

  /** 0-based nearest-centroid id (IVF coarse quantizer). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Float]]): Column =
    col(NearestCentroid(expr(vec), centroids))

  /** The nprobe nearest centroid ids, ascending by distance. */
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    col(NearestCentroids(expr(vec), centroids, nprobe))

  /** Fine-quantizer argmin over a row-carried candidate array
    * (ARRAY<STRUCT<cluster INT, cv ARRAY<FLOAT>>>) — the two-level
    * quantizer's second leg; ties to the first minimal candidate in
    * array order.
    */
  def nearestCentroidIn(vec: Column, cands: Column): Column =
    col(NearestCentroidIn(expr(vec), expr(cands)))

  /** Random-hyperplane LSH bucket id in [0, 2^planes). */
  def lshBucket(vec: Column, planes: Array[Array[Float]]): Column =
    col(LshBucket(expr(vec), planes))

  /** Sign-bit word for the binary (hamming) index: bit j set iff
    * vec[offset + j] > 0, width ≤ 63 bits.
    */
  def signBits(vec: Column, offset: Int, width: Int): Column =
    col(SignBits(expr(vec), offset, width))

  /** Z-order (Morton) interleave of two non-negative longs, nBits each. */
  def interleaveBits(a: Column, b: Column, nBits: Int): Column =
    col(InterleaveBits(expr(a), expr(b), nBits))

  /** 60-bit SimHash over pre-hashed tokens (ARRAY<LONG>). */
  def simHash60(tokenHashes: Column): Column = col(SimHash60(expr(tokenHashes)))

  /** MinHash signature (ARRAY<LONG> of length numHashes) over pre-hashed shingles. */
  def minHashSig(shingleHashes: Column, numHashes: Int): Column =
    col(MinHashSig(expr(shingleHashes), numHashes))

  /** tokenHash60 of every word n-shingle, one codegen pass (≡
    * `transform(wordShingles(toks, n), tokenHash60)` but ~40× faster).
    */
  def wordShingleHash60(tokens: Column, n: Int): Column =
    col(WordShingleHash60(expr(tokens), n))

  /** tokenHash60 of every char n-shingle, one codegen pass. */
  def charShingleHash60(text: Column, n: Int): Column =
    col(CharShingleHash60(expr(text), n))

  /** Base-31 mod-1e9+7 polynomial hash of every char n-shingle, one
    * codegen pass (no md5 — see [[CharShinglePoly]]).
    */
  def charShinglePoly(text: Column, n: Int): Column =
    col(CharShinglePoly(expr(text), n))

  /** Per-language stopword match counts over a token array, one pass. */
  def stopwordVotes(tokens: Column, sets: Array[Array[String]]): Column =
    col(StopwordVotes(expr(tokens), sets))

  /** SQ8 quantize-reconstruct-score in one codegen pass (see
    * [[Sq8ReconstructL2Sq]]).
    */
  def sq8ReconstructL2Sq(vec: Column, mins: Array[Double], maxs: Array[Double],
                         query: Array[Float]): Column =
    col(Sq8ReconstructL2Sq(expr(vec), mins, maxs, query))

  /** |A ∩ B| of two ascending-sorted long arrays (merge scan). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    col(SortedIntersectSize(expr(a), expr(b)))

  // ---------------------------------------------------------------------
  // Text building blocks. All built-ins (codegen'd), all mirrored in the
  // DuckDB oracles — see graft.Oracles.
  // ---------------------------------------------------------------------

  /** Lowercased alphanumeric word tokens (codegen kernel; equivalence
    * with the built-in regex chain is property-tested).
    */
  def wordTokens(text: Column): Column = col(TokenizeWords(expr(text)))

  /** Reference formulation of [[wordTokens]] in pure built-ins (kept for
    * the equivalence property test and as executable documentation of the
    * semantics the DuckDB oracle mirrors).
    */
  def wordTokensBuiltin(text: Column): Column =
    F.filter(F.split(F.lower(F.regexp_replace(text, "[^A-Za-z0-9]+", " ")), " "), t => F.length(t) > 0)

  /** Deterministic 60-bit hash of a string token: first 15 hex chars of md5. */
  def tokenHash60(tok: Column): Column =
    F.conv(F.substring(F.md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Space-joined word n-shingles, one codegen pass (≡ [[wordShingles]],
    * equivalence fuzz-tested) — the hot-path form for the bigram family.
    */
  def wordShingleStrings(tokens: Column, n: Int): Column =
    col(WordShingleStrings(expr(tokens), n))

  /** Word n-gram shingles: ["a","b","c"] with n=2 → ["a b","b c"].
    * (Guarded: sequence(1, 0) would count DOWN in Spark, so short inputs
    * return an empty array explicitly. Kept as the equivalence-test
    * reference for [[wordShingleStrings]] and for one-off call sites.)
    */
  def wordShingles(tokens: Column, n: Int): Column =
    F.when(F.size(tokens) < n, F.array().cast("array<string>"))
      .otherwise(F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        i => F.concat_ws(" ", (0 until n).map(j => F.element_at(tokens, i + j)): _*)))

  // F.substring historically takes Int pos; route Column pos through the
  // SQL function registry (still fully codegen'd).
  private def substrDyn(text: Column, pos: Column, len: Int): Column =
    F.call_function("substring", text, pos, F.lit(len))

  /** Character n-gram shingles of a string (same short-input guard). */
  def charShingles(text: Column, n: Int): Column =
    F.when(F.length(text) < n, F.array().cast("array<string>"))
      .otherwise(F.transform(
        F.sequence(F.lit(1), F.length(text) - (n - 1)),
        i => substrDyn(text, i, n)))

  /** Polynomial rolling-hash fingerprint of a string (mod 1e9+7, base 31):
    * acc_0 = 0; acc_{i+1} = (acc_i * 31 + codepoint_i) mod (1e9+7).
    * One codegen pass; equivalence with [[rollingFingerprintBuiltin]] is
    * fuzz-tested. Empty string → 0.
    */
  def rollingFingerprint(text: Column): Column = col(RollingFingerprint(expr(text)))

  /** Reference formulation of [[rollingFingerprint]] in pure built-ins
    * (per-character interpreted lambdas — kept as the equivalence-test
    * reference and executable documentation of the semantics the DuckDB
    * oracle mirrors; only valid for length ≥ 1, since sequence(1, 0)
    * counts down).
    */
  def rollingFingerprintBuiltin(text: Column): Column =
    F.aggregate(
      F.transform(F.sequence(F.lit(1), F.length(text)), i => F.ascii(substrDyn(text, i, 1)).cast("long")),
      F.lit(0L),
      (acc, c) => (acc * 31L + c) % 1000000007L)

  /** Σ code-point length over ARRAY<STRING>, one codegen pass. */
  def sumStrLen(arr: Column): Column = col(SumStrLen(expr(arr)))

  /** Winnowing fingerprint selection (sorted distinct window-min k-gram
    * hashes) — see [[WinnowHashes]].
    */
  def winnowHashes(text: Column, k: Int, w: Int): Column =
    col(WinnowHashes(expr(text), k, w))
}
