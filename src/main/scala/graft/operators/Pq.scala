package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Product quantization (Jégou/Douze/Schmid, TPAMI 2011, "Product
  * Quantization for Nearest Neighbor Search" — the compression scheme
  * behind faiss's PQ/IVFPQ indexes, the family the reference builds via
  * its faiss backend, reference: src/core/index_factory.rs).
  *
  * The 100 TB story: a 64-dim float vector is 256 bytes; its PQ code is
  * `m` sub-quantizer ids — 8 bytes at m=8 — a 32× smaller table that
  * turns a petabyte of embeddings into tens of TB of scannable codes.
  * Search is ADC (asymmetric distance computation): the query builds an
  * m × ksub lookup table of exact sub-distances ONCE (driver-side, tiny),
  * and every candidate's approximate distance is m table lookups — no
  * float math per row. The codes scan is narrow, codegen'd, and at real
  * scale the codes table is the materialized column you keep hot while
  * raw vectors stay cold (they're only touched by the final re-rank,
  * fetched BY ID for rerank ≪ n candidates).
  *
  * Training: one seeded KMeans per subspace over a bounded sample —
  * invariant to corpus size, like [[IvfIndex.fit]].
  *
  * Cross-engine exactness: per-subspace sub-distances are doubles from
  * identical float literals; each is fixed to a long via
  * floor(d²·10⁹ + 0.5) (floor of the binary value — no decimal-string
  * rounding), so ADC totals are exact long sums in any order and the
  * candidate ranking compares exact integers. The DuckDB oracle
  * re-derives codes and the lookup table from the same codebook literals.
  */
/** SQ8 scalar quantization — the simplest member of the faiss
  * quantization family (1 byte/dim = 4× under float32, no codebooks):
  * per-dimension [min, max] training bounds, byte codes by affine
  * rounding, search ranks by distance to the RECONSTRUCTION. Training
  * bounds are plain min/max aggregates (order-independent ⇒ exactly
  * reproducible), so unlike PQ the oracle needs no parameter literals —
  * DuckDB re-derives the bounds from the data itself.
  */
object SqIndex {

  /** Per-dimension (min, max) over the table — 64 tiny rows to the
    * driver; at 100 TB the same two aggregates run on a sample.
    */
  def fitBounds(emb: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy("d")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy("d")
      .collect()
    (rows.map(_.getAs[Double]("mn")), rows.map(_.getAs[Double]("mx")))
  }

  private val fittedBounds =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Array[Double])]()

  /** Registry-cached [[fitBounds]] (the IndexFactory pattern), keyed on
    * content fingerprint + plan hash like [[IvfIndex.fitCached]] — a
    * mid-JVM table rewrite refits instead of serving stale bounds.
    */
  def fitBoundsCached(emb: DataFrame, vecCol: String): (Array[Double], Array[Double]) =
    fittedBounds.computeIfAbsent(
      Artifacts.fingerprintInput(emb,
        s"sq8 $vecCol ${emb.queryExecution.analyzed.semanticHash()}"),
      _ => fitBounds(emb, vecCol))

  /** Rank by distance to the SQ8 reconstruction — quantize, reconstruct
    * and score in one codegen pass over the scan, top-k via TakeOrdered.
    */
  def search(emb: DataFrame, idCol: String, vecCol: String,
             mins: Array[Double], maxs: Array[Double],
             queryVec: Array[Float], k: Int): DataFrame =
    emb.select(col(idCol).as("id"),
        sq8ReconstructL2Sq(col(vecCol), mins, maxs, queryVec).as("score"))
      .orderBy(col("score"), col("id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("score"), col("id"))))
      .select(col("rank"), col("id"), roundTo(sqrt(col("score")), 4).as("value"))

  /** The facade contract shared with [[BinaryIndex.search]] and
    * [[PqIndex.searchAnyMetric]]: a metric-agnostic coarse stage
    * (reconstruction-L2 candidates, one codegen scan + TakeOrdered) and
    * the index metric applied only in the exact re-rank of the `rerank`
    * survivors.
    */
  def searchAnyMetric(emb: DataFrame, idCol: String, vecCol: String,
                      mins: Array[Double], maxs: Array[Double],
                      queryVec: Array[Float], k: Int, rerank: Int,
                      metric: String = "l2"): DataFrame = {
    require(rerank >= k)
    val candidates = emb
      .select(col(idCol).as("cand_id"),
        sq8ReconstructL2Sq(col(vecCol), mins, maxs, queryVec).as("sq"))
      .orderBy(col("sq"), col("cand_id"))
      .limit(rerank)
      .select("cand_id")
    val pruned = emb.join(broadcast(candidates), col(idCol) === col("cand_id"), "leftsemi")
    Knn.searchExact(pruned, idCol, vecCol, queryVec, k, metric)
  }

  /** Batch SQ8 search — one scan serves all queries: each row's
    * RECONSTRUCTION (quantize → dequantize, query-independent) is
    * computed once map-side, the coarse stage ranks every (row, query)
    * pair by reconstruction-L2 (the [[Knn.searchBatch]] cross shape —
    * the pair math is the codegen VecL2Sq kernel), the per-query
    * rerank cut is the bounded heap, and [[Knn.rerankBatch]] finishes
    * under the index metric. The coarse score is float-reconstructed
    * (vs the single-query fused double kernel) — a coarse-stage-only
    * difference that the exact re-rank washes out, same contract as
    * every quantized backend.
    */
  def searchBatch(emb: DataFrame, idCol: String, vecCol: String,
                  queries: DataFrame, qIdCol: String, qVecCol: String,
                  mins: Array[Double], maxs: Array[Double],
                  k: Int, rerank: Int, metric: String = "l2"): DataFrame = {
    require(rerank >= k)
    val recon = array(mins.indices.map { d =>
      val mn = mins(d); val mx = maxs(d)
      if (mx <= mn) lit(mn.toFloat)
      else {
        val xd = element_at(col("v"), d + 1).cast("double")
        val clamped = least(greatest((xd - lit(mn)) / lit(mx - mn), lit(0.0)), lit(1.0))
        val code = floor(clamped * lit(255.0) + lit(0.5))
        (lit(mn) + code * lit((mx - mn) / 255.0)).cast("float")
      }
    }: _*)
    val q = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    val rows = emb.select(col(idCol).as("cand_id"), col(vecCol).as("v"))
      .select(col("cand_id"), recon.as("recon"))
    val scored = rows.crossJoin(broadcast(q))
      .select(col("q_id"), col("cand_id"),
        floor(graft.functions.vecL2Sq(col("recon"), col("q_vec")) * lit(1e9) + lit(0.5))
          .cast("long").as("r9"))
    val cand = Stats.stratifiedSample(scored, "q_id", "cand_id", "r9", col("r9"), rerank)
      .select(col("stratum").as("q_id"), col("id").as("cand_id"))
    Knn.rerankBatch(emb, idCol, vecCol, cand, q, "q_id", "q_vec", k, metric)
  }

  /** Persist the trained per-dimension bounds (dim tiny rows) so a
    * reloaded index serves without re-running the bounds aggregates —
    * the SQ analog of [[IvfIndex.writeCentroids]].
    */
  def writeBounds(spark: org.apache.spark.sql.SparkSession,
                  mins: Array[Double], maxs: Array[Double], path: String): Unit = {
    import spark.implicits._
    mins.indices.map(d => (d, mins(d), maxs(d))).toDF("d", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readBounds(spark: org.apache.spark.sql.SparkSession,
                 path: String): (Array[Double], Array[Double]) = {
    val rows = spark.read.parquet(path).orderBy("d").collect()
    (rows.map(_.getAs[Double]("mn")), rows.map(_.getAs[Double]("mx")))
  }
}

object PqIndex {

  /** `m` codebooks of `ksub` centroids over the dim/m-wide subspaces.
    * codebooks(j)(c) is the c-th centroid of subspace j.
    */
  def fit(emb: DataFrame, vecCol: String, dim: Int, m: Int, ksub: Int,
          seed: Long = 42L, maxSample: Long = 100000L): Array[Array[Array[Float]]] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val n = emb.count()
    if (n == 0L) return Array.empty
    val frac = math.min(1.0, maxSample.toDouble / math.max(1L, n))
    val sampled = (if (frac < 1.0) emb.sample(withReplacement = false, frac, seed) else emb)
      .select(col(vecCol).cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kEff = math.max(1, math.min(ksub.toLong, n).toInt)
    val books = Array.tabulate(m) { j =>
      val sub = sampled.select(array_to_vector(slice(col("v"), j * dsub + 1, dsub)).as("features"))
      new KMeans().setK(kEff).setSeed(seed + j).setMaxIter(8).fit(sub)
        .clusterCenters.map(_.toArray.map(_.toFloat))
    }
    sampled.unpersist()
    books
  }

  private val fitted =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Float]]]]()

  /** Registry-cached [[fit]] (the IndexFactory pattern), keyed on
    * content fingerprint + plan hash like [[IvfIndex.fitCached]] — a
    * mid-JVM table rewrite refits instead of serving stale codebooks.
    */
  def fitCached(emb: DataFrame, vecCol: String, dim: Int, m: Int, ksub: Int,
                seed: Long = 42L): Array[Array[Array[Float]]] =
    fitted.computeIfAbsent(
      Artifacts.fingerprintInput(emb,
        s"pq $vecCol $m $ksub $seed ${emb.queryExecution.analyzed.semanticHash()}"),
      _ => fit(emb, vecCol, dim, m, ksub, seed))

  /** The PQ code of a vector: array of `m` sub-quantizer ids — each an
    * argmin over that subspace's codebook, reusing the codegen
    * [[graft.functions.nearestCentroid]] kernel per subspace (ties to the
    * lower id, matching the oracle). This is the "encode" map pass whose
    * output is the materialized codes column at scale.
    */
  def encode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    val dsub = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (book, j) =>
      nearestCentroid(slice(vec, j * dsub + 1, dsub), book)
    }.toSeq: _*)
  }

  /** Driver-side ADC lookup table for a query: table(j)(c) =
    * floor(‖q_j − codebook_j_c‖² · 10⁹ + 0.5) — exact-integer-fixed
    * squared sub-distances (see object doc). m × ksub longs.
    */
  def adcTable(queryVec: Array[Float], codebooks: Array[Array[Array[Float]]]): Array[Array[Long]] = {
    val dsub = codebooks.head.head.length
    codebooks.zipWithIndex.map { case (book, j) =>
      book.map { cent =>
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = queryVec(j * dsub + i).toDouble - cent(i).toDouble
          acc += d * d
          i += 1
        }
        math.floor(acc * 1e9 + 0.5).toLong
      }
    }
  }

  /** Approximate distance of a codes row: Σ_j table(j)(code_j) — m array
    * lookups summed left-to-right, all longs, fully codegen'd built-ins.
    */
  def adcScore(codes: Column, table: Array[Array[Long]]): Column =
    table.zipWithIndex.map { case (row, j) =>
      element_at(typedLit(row), element_at(codes, j + 1) + 1)
    }.reduceLeft(_ + _)

  /** PQ search: ADC scan over the codes → top-`rerank` candidate ids →
    * exact re-rank of those candidates by true L2 → top-k. The first
    * stage reads only codes (8 bytes/row at m=8) and TakeOrders on an
    * exact integer; raw vectors are joined BY ID for the `rerank`
    * survivors only — the two-stage shape faiss IVFPQ serves with.
    */
  /** Persist the fitted codebooks — m × ksub rows of (subspace,
    * centroid, vec), the PQ analog of [[IvfIndex.writeCentroids]]
    * (O(m·ksub·dsub) floats — driver-sized at any corpus scale).
    */
  def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
                     codebooks: Array[Array[Array[Float]]], path: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, c) => (j, c, cent.toSeq) }
    }.toSeq.toDF("subspace", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readCodebooks(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[Array[Array[Float]]] =
    spark.read.parquet(path).collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)
      }

  /** Facade search under ANY index metric, optionally over a
    * pre-encoded `codes` column (the loaded "codes hot" layout): ADC
    * L2 candidates (narrow integer TakeOrdered — reads only id+codes
    * when the column is persisted, thanks to parquet column pruning) →
    * broadcast semi-join prune → exact re-rank of the `rerank`
    * survivors under the index metric. Mirrors [[BinaryIndex.search]]'s
    * contract: the coarse stage is metric-agnostic structure (L2 /
    * hamming), the metric applies in the exact re-rank.
    */
  def searchAnyMetric(emb: DataFrame, idCol: String, vecCol: String,
                      codesCol: Option[String], codebooks: Array[Array[Array[Float]]],
                      queryVec: Array[Float], k: Int, rerank: Int,
                      metric: String = "l2"): DataFrame = {
    require(rerank >= k)
    val table = adcTable(queryVec, codebooks)
    val codes = codesCol match {
      case Some(c) => emb.select(col(idCol).as("cand_id"), col(c).cast("array<int>").as("codes"))
      case None    => emb.select(col(idCol).as("cand_id"), encode(col(vecCol), codebooks).as("codes"))
    }
    val candidates = codes
      .select(col("cand_id"), adcScore(col("codes"), table).as("adc9"))
      .orderBy(col("adc9"), col("cand_id"))
      .limit(rerank)
      .select("cand_id")
    val pruned = emb.join(broadcast(candidates), col(idCol) === col("cand_id"), "leftsemi")
    Knn.searchExact(pruned, idCol, vecCol, queryVec, k, metric)
  }

  /** Batch ADC search — ONE codes scan serves ALL queries (the 100 TB
    * batch-ANN shape for the quantized backend, the PQ twin of
    * [[Knn.searchBatchIvf]]): each query's m × ksub ADC lookup table is
    * computed IN-PLAN on the queries side (a flat m·ksub long array,
    * exactly [[adcTable]]'s floor-fixed integers) and broadcasts with
    * the query set; every persisted codes row scores against every
    * query via m array lookups summed as exact longs — map-side work on
    * the single codes scan, never a per-query re-scan. The per-query
    * rerank cut is the bounded-heap stratified aggregate (shuffle
    * O(queries × rerank)), survivors fetch raw vectors BY ID (one
    * narrow broadcast-pruned fetch of the cold table), and the exact
    * metric ranks the final top-k per query.
    */
  def searchBatchAdc(codes: DataFrame, emb: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     codebooks: Array[Array[Array[Float]]],
                     k: Int, rerank: Int, metric: String = "l2"): DataFrame = {
    require(rerank >= k)
    val spark = codes.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    // the codebook as DATA (m·ksub tiny rows), not as literal
    // expressions: a literal m × ksub × dsub projection blows the
    // 64 KB whole-stage-codegen method limit and silently runs
    // interpreted (measured 4.9 s vs 0.9 s at sf0.1) — the join shape
    // keeps every stage inside codegen and scales to any (m, ksub)
    val cb = codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, c) => (j, c, cent.toSeq) }
    }.toSeq.toDF("j", "c", "cv")
    val q = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    // per-(query, subspace, code) floor-fixed sub-distance — exactly
    // [[adcTable]]'s arithmetic (the VecL2Sq kernel accumulates doubles
    // in ascending dimension order, then floor(x·1e9 + 0.5))
    val qt = q.crossJoin(broadcast(cb))
      .select(col("q_id"), (col("j") * ksub + col("c")).as("slot"),
        floor(vecL2Sq(slice(col("q_vec"), col("j") * dsub + 1, lit(dsub)), col("cv"))
          * lit(1e9) + lit(0.5)).cast("long").as("d9"))
    // flat slot-ordered m·ksub long array per query, broadcast with
    // the query set (exact integers — the collect_list order is washed
    // out by the sort)
    val qAdc = qt.groupBy("q_id")
      .agg(transform(array_sort(collect_list(struct(col("slot"), col("d9")))),
        x => x.getField("d9")).as("adcf"))
    val scored = codes
      .select(col("id").as("cand_id"), col("codes").cast("array<int>").as("codes"))
      .crossJoin(broadcast(qAdc))
      .select(col("q_id"), col("cand_id"),
        (0 until m).map(j => element_at(col("adcf"),
          element_at(col("codes"), j + 1) + lit(j * ksub + 1)))
          .reduceLeft(_ + _).as("adc9"))
    val cand = Stats.stratifiedSample(scored, "q_id", "cand_id", "adc9",
        col("adc9"), rerank)
      .select(col("stratum").as("q_id"), col("id").as("cand_id"))
    Knn.rerankBatch(emb, idCol, vecCol, cand, q, "q_id", "q_vec", k, metric)
  }

  /** Materialize the codes table — (id, m tinyint codes) ≈ 8 bytes of
    * index per vector at m=8 — the artifact a 100 TB deployment keeps
    * hot while the raw vector table stays cold. Encode runs once at
    * ingest; every later search scans only this narrow table.
    */
  def writeCodes(emb: DataFrame, idCol: String, vecCol: String,
                 codebooks: Array[Array[Array[Float]]], path: String): Unit =
    emb.select(col(idCol).as("id"),
        encode(col(vecCol), codebooks).cast("array<tinyint>").as("codes"))
      .write.mode("overwrite").parquet(path)

  /** Serve from a [[writeCodes]] layout: ADC-rank the persisted codes
    * (narrow scan, integer TakeOrdered), then join the raw vector table
    * BY ID for the `rerank` survivors only — the cold side is touched
    * for a few hundred rows regardless of corpus size.
    */
  def searchPersisted(spark: org.apache.spark.sql.SparkSession, codesPath: String,
                      emb: DataFrame, idCol: String, vecCol: String,
                      codebooks: Array[Array[Array[Float]]], queryVec: Array[Float],
                      k: Int, rerank: Int): DataFrame = {
    require(rerank >= k)
    val table = adcTable(queryVec, codebooks)
    // tombstones (delete twin) apply at the codes load — no-op join-free
    // plan when nothing was ever deleted
    val codes = Tombstones.filter(spark.read.parquet(codesPath), codesPath, "id")
      .select(col("id"), col("codes").cast("array<int>").as("codes"))
    val candidates = codes
      .select(col("id"), adcScore(col("codes"), table).as("adc9"))
      .orderBy(col("adc9"), col("id"))
      .limit(rerank)
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    candidates.join(vecs, "id")
      .select(col("id"), vecL2(col("v"), typedLit(queryVec)).as("score"))
      .orderBy(col("score"), col("id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("score"), col("id"))))
      .select(col("rank"), col("id"), roundTo(col("score"), 4).as("value"))
  }

  /** IVFPQ — faiss's workhorse composition (the "IVFx,PQy" factory
    * string family the reference's faiss backend builds): IVF coarse
    * pruning picks nprobe clusters, PQ ADC ranks only the survivors,
    * exact re-rank finishes. At 100 TB: partition-prune to nprobe/K of
    * the files, scan 8-byte codes instead of 256-byte vectors inside
    * them, touch raw vectors for `rerank` rows — the three multiplied
    * savings that make petabyte ANN serveable.
    */
  def searchIvf(emb: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]],
                queryVec: Array[Float], k: Int, nprobe: Int, rerank: Int): DataFrame = {
    val probed = IvfIndex.probes(queryVec, centroids, nprobe)
    val pruned = emb.where(IvfIndex.assign(col(vecCol), centroids).isin(probed: _*))
    search(pruned, idCol, vecCol, codebooks, queryVec, k, rerank)
  }

  def search(emb: DataFrame, idCol: String, vecCol: String,
             codebooks: Array[Array[Array[Float]]], queryVec: Array[Float],
             k: Int, rerank: Int): DataFrame = {
    require(rerank >= k)
    val table = adcTable(queryVec, codebooks)
    // at scale this select IS the persisted codes table (encode happens
    // once at ingest); the ADC scan then never touches the vectors
    val codes = emb.select(col(idCol).as("id"), encode(col(vecCol), codebooks).as("codes"))
    val candidates = codes
      .select(col("id"), adcScore(col("codes"), table).as("adc9"))
      .orderBy(col("adc9"), col("id"))
      .limit(rerank)
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    candidates.join(vecs, "id")
      .select(col("id"), vecL2(col("v"), typedLit(queryVec)).as("score"))
      .orderBy(col("score"), col("id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("score"), col("id"))))
      .select(col("rank"), col("id"), roundTo(col("score"), 4).as("value"))
  }
}
