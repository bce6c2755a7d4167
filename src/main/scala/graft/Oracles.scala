package graft

import org.apache.spark.sql.SparkSession

/** DuckDB oracle SQL, one entry per SQL-expressible key in
  * SparkEntry.queries. Column names, types, rounding and ORDER BY are
  * kept in lock-step with [[Queries]] — the driver sorts columns by name
  * and hash-compares values, so both sides must agree bit-for-bit after
  * `round(..., n)`.
  *
  * Vector math is spelled out element-by-element (sequential
  * left-to-right double accumulation) to match the codegen loops in
  * graft.functions.VectorExpressions exactly.
  *
  * The approximate-ANN oracles ([[dynamic]]) embed the fitted index
  * parameters (KMeans centroids / LSH hyperplanes) as exact float
  * literals: Verify generates them in the same session that ran the
  * queries, and DuckDB independently re-derives cluster assignment,
  * probe pruning and ranking from those parameters — a full
  * row/schema/hash check of the approximate search paths.
  */
object Oracles {

  /** Σ (a_i-b_i)^2 in double, sequential. */
  private def l2sq(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  private def l2(a: String, b: String): String = s"sqrt(${l2sq(a, b)})"

  private def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def norm(a: String): String =
    s"sqrt(list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))"

  private def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (${norm(a)} * ${norm(b)}))"

  // ----- text-pipeline building blocks (mirror graft.functions 1:1) -----

  /** Lowercased alphanumeric word tokens of `documents.text`. */
  private val toks =
    "list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '), t -> len(t) > 0)"

  /** 60-bit token hash: first 15 hex chars of md5, parsed via fold
    * (DuckDB has no conv()). Mirrors graft.functions.tokenHash60.
    */
  private def tokenHash60(t: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16), " +
      s"ii -> CAST(strpos('0123456789abcdef', substr(md5($t), ii, 1)) - 1 AS BIGINT))), (a, d) -> a * 16 + d)"

  private def stopCount(words: Seq[String]): String =
    s"len(list_filter(toks, t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t)))"

  /** The lang-vote + rounded-quality-score pipeline as a reusable CTE
    * chain ending in `lang(doc_id, lang_pred)` and `sc(doc_id, score)` —
    * shared by corpus_clean and corpus_stats, mirroring the fused
    * TextAnalysis.langQuality pass. (text_langid / text_quality keep
    * their standalone spellings because they expose the intermediate
    * columns.)
    */
  private lazy val langScoreCtes: String =
    s"""t AS (SELECT doc_id, text, $toks AS toks FROM documents),
       |c AS (SELECT doc_id, ${stopCount(stopEn)} AS n_en, ${stopCount(stopDe)} AS n_de,
       |        ${stopCount(stopFr)} AS n_fr, ${stopCount(stopEs)} AS n_es FROM t),
       |lang AS (SELECT doc_id,
       |  CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0 THEN 'und'
       |       WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
       |       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
       |       WHEN n_fr >= n_es THEN 'fr'
       |       ELSE 'es' END AS lang_pred FROM c),
       |x AS (SELECT doc_id, text, toks, len(toks) AS n_tok, ${stopCount(stopEn)} AS n_stop FROM t),
       |y AS (SELECT doc_id, n_tok,
       |  CASE WHEN n_tok = 0 THEN 0.0 ELSE
       |    CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS ml,
       |  CASE WHEN len(text) = 0 THEN 0.0 ELSE
       |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / CAST(len(text) AS DOUBLE) END AS pr,
       |  CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS sr
       |  FROM x),
       |sc AS (SELECT doc_id,
       |  (round((CASE WHEN n_tok = 0 THEN 0.0 ELSE
       |    0.25 * least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) +
       |    0.25 * greatest(0.0, 1.0 - abs(ml - 5.0) / 5.0) +
       |    0.25 * least(sr * 5.0, 1.0) +
       |    0.25 * (1.0 - least(pr * 10.0, 1.0)) END) * 10000.0) / 10000.0) AS score FROM y)""".stripMargin

  /** Matryoshka truncation recall: exact top-k over list_slice prefixes
    * vs the full-dimension exact answer — the DuckDB twin of
    * [[Queries.annMatryoshkaCurve]].
    */
  private def matryoshkaSql(queryId: Long, k: Int, dims: Seq[Int]): String = {
    val branches = dims.map { d =>
      s"""b$d AS (SELECT $d AS dim, count(*) AS n_hits FROM exact
         |WHERE id IN (SELECT e.vec_id FROM embeddings e, q
         |             ORDER BY ${l2sq(s"list_slice(e.embedding, 1, $d)", s"list_slice(q.qv, 1, $d)")}, e.vec_id LIMIT $k))""".stripMargin
    }.mkString(",\n")
    val union = dims.map(d => s"SELECT * FROM b$d").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |exact AS (SELECT e.vec_id AS id FROM embeddings e, q
       |          ORDER BY ${l2sq("e.embedding", "q.qv")}, e.vec_id LIMIT $k),
       |$branches
       |SELECT dim, n_hits, (round((n_hits / $k) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY dim""".stripMargin
  }

  /** The DSIR hashed-bigram LLR chain (langScoreCtes included) ending
    * in `d(doc_id, n_bigrams, ss)` — shared by corpus_dsir and
    * corpus_dsir_sample. ss is the exact integer dot product of
    * per-doc bucket counts with the 1e-6-fixed per-bucket LLRs.
    */
  private lazy val dsirCtes: String =
    s"""$langScoreCtes,
       |tgt AS (SELECT doc_id, CAST(floor(score * 10000.0 + 0.5) AS BIGINT) >= 7500 AS is_t FROM sc),
       |dsh AS (SELECT doc_id, CASE WHEN len(toks) < 2 THEN [] ELSE
       |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END AS sh FROM t),
       |dgm AS (SELECT doc_id, unnest(sh) AS gm FROM dsh),
       |db AS (SELECT doc_id, ${tokenHash60("gm")} % 256 AS bucket, CAST(count(*) AS BIGINT) AS nb
       |       FROM dgm GROUP BY 1, 2),
       |marg AS (SELECT bucket,
       |           CAST(sum(CASE WHEN tgt.is_t THEN nb ELSE 0 END) AS BIGINT) AS ct,
       |           CAST(sum(nb) AS BIGINT) AS cr
       |         FROM db JOIN tgt USING (doc_id) GROUP BY 1),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr FROM marg),
       |model AS (SELECT bucket,
       |            CAST(floor(ln(CAST(CAST(ct + 1 AS HUGEINT) * (tr + 256) AS DOUBLE)
       |              / CAST(CAST(cr + 1 AS HUGEINT) * (tt + 256) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS s6
       |          FROM marg, tot),
       |d AS (SELECT doc_id, CAST(sum(nb) AS BIGINT) AS n_bigrams,
       |        CAST(sum(nb * s6) AS HUGEINT) AS ss
       |      FROM db JOIN model USING (bucket) GROUP BY 1)""".stripMargin

  /** The minhash signature/banding pipeline as a reusable CTE chain
    * ending in `est(a_id, b_id, e)` — shared by dedup_minhash and
    * dedup_clusters.
    */
  /** Signature + banding half of the chain (ends at `bands`); the pair
    * tails below differ between the self-join and the incremental
    * new-vs-corpus variants.
    */
  private lazy val minhashSigCtes: String =
    s"""t AS (SELECT doc_id, $toks AS toks FROM documents),
       |sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [] ELSE
       |         list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh
       |       FROM t),
       |hs AS (SELECT doc_id, list_transform(sh, s -> ${tokenHash60("s")}) AS hs FROM sh WHERE len(sh) > 0),
       |sig AS (SELECT doc_id, list_transform(range(0, 32), j ->
       |          list_min(list_transform(hs, h -> ((2*j + 1) * (h % 2147483647) + (j*j + 7)) % 2147483647))) AS sig
       |        FROM hs),
       |bands AS (SELECT doc_id, sig, r.range AS band, list_slice(sig, r.range * 4 + 1, r.range * 4 + 4) AS bucket
       |          FROM sig, range(0, 8) r)""".stripMargin

  private lazy val minhashCtes: String =
    s"""$minhashSigCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |est AS (SELECT a_id, b_id,
       |          list_sum(list_transform(range(1, 33), i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 32.0 AS e
       |        FROM cand JOIN sig sa ON sa.doc_id = a_id JOIN sig sb ON sb.doc_id = b_id)""".stripMargin

  /** The full prefix-filter jaccard pair query (j ≥ 13/20) as a
    * nestable parenthesized SELECT with its own WITH scope — shared by
    * dedup_jaccard_prefix and the dedup_recall_eval composition.
    */
  private lazy val jaccardPairsSelect: String =
    s"""(WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
       |bg AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [] ELSE
       |         list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh FROM t),
       |g0 AS (SELECT doc_id, list_sort(list_distinct(list_transform(sh, tk -> ${tokenHash60("tk")}))) AS g FROM bg),
       |g AS (SELECT doc_id, g, len(g) AS sz FROM g0 WHERE len(g) > 0),
       |e AS (SELECT doc_id, sz, unnest(g) AS gram FROM g),
       |dfq AS (SELECT gram, count(*) AS df FROM e GROUP BY gram),
       |pre AS (SELECT e.doc_id, e.sz, e.gram,
       |          row_number() OVER (PARTITION BY e.doc_id ORDER BY dfq.df, e.gram) AS rn
       |        FROM e JOIN dfq USING (gram)
       |        QUALIFY rn <= e.sz - ((13 * e.sz + 19) // 20) + 1),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM pre a JOIN pre b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |         WHERE a.sz * 20 >= b.sz * 13 AND b.sz * 20 >= a.sz * 13
       |           AND (1 + least(a.sz - a.rn, b.sz - b.rn)) * 33 >= (a.sz + b.sz) * 13),
       |p AS (SELECT a_id, b_id,
       |        CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE) /
       |        CAST(ga.sz + gb.sz - len(list_intersect(ga.g, gb.g)) AS DOUBLE) AS j
       |      FROM cand JOIN g ga ON ga.doc_id = a_id JOIN g gb ON gb.doc_id = b_id)
       |SELECT a_id, b_id, j FROM p WHERE j >= 0.65)""".stripMargin

  /** BM25 pipeline as a reusable CTE chain ending in `bm(rank, doc_id,
    * s6)` — top-`k` by the exact-integer score (each term contribution is
    * fixed via floor(x·10⁶ + 0.5), floor of the BINARY value, so the
    * per-doc sum is order-independent and cross-engine identical). Terms
    * and constants mirror [[Queries.bm25Terms]] /
    * [[operators.Retrieval.bm25TopK]] expression-for-expression.
    */
  private def bm25Ctes(k: Int, where: String = "", from: String = "documents"): String =
    s"""t AS (SELECT doc_id, $toks AS toks FROM $from$where),
       |st AS (SELECT count(*) AS n_corpus, CAST(sum(len(toks)) AS BIGINT) AS sum_dl FROM t),
       |p0 AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
       |p AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl FROM p0
       |      WHERE term IN ('spark', 'hash', 'join', 'window', 'vector') GROUP BY doc_id, term),
       |dfq AS (SELECT term, count(*) AS df FROM p GROUP BY term),
       |contrib AS (SELECT p.doc_id,
       |    CAST(floor(ln((st.n_corpus - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
       |      * ((p.tf * (1.2 + 1.0)) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * (p.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_corpus)))))
       |      * 1000000.0 + 0.5) AS BIGINT) AS s6
       |  FROM p JOIN dfq USING (term) CROSS JOIN st),
       |bm AS (SELECT CAST(row_number() OVER (ORDER BY s6 DESC, doc_id) AS INT) AS rank, doc_id, s6
       |       FROM (SELECT doc_id, CAST(sum(s6) AS BIGINT) AS s6 FROM contrib GROUP BY doc_id)
       |       ORDER BY s6 DESC, doc_id LIMIT $k)""".stripMargin

  /** PPM payload geometry (spec v1 — graft.operators.Multimodal,
    * TESTDATA.md): per document its utf-8 byte count n, frame edge
    * w = 2 + n%3, raster size fsz = 3·w², frame count nf = n div fsz + 1.
    * Every multimodal oracle predicts the Spark PARSER's output from
    * this arithmetic.
    */
  private def ppmGeomCte(alias: String, where: String = ""): String =
    s"""${alias}0 AS (SELECT doc_id, text, octet_length(encode(text)) AS n,
       |        2 + octet_length(encode(text)) % 3 AS w FROM documents$where),
       |$alias AS (SELECT doc_id, text, n, w, 3 * w * w AS fsz,
       |        n // (3 * w * w) + 1 AS nf FROM ${alias}0)""".stripMargin

  /** The decoder's 8-bin pixel-byte histogram features, re-derived: text
    * bytes via ascii(char) (pure ASCII) plus the final frame's zero
    * padding in bin 0, normalized by nf·fsz total pixel bytes in FLOAT32.
    */
  private def ppmFeatCtes(alias: String, where: String = ""): String =
    s"""${ppmGeomCte(s"${alias}g", where)},
       |$alias AS (SELECT doc_id,
       |  list_transform(range(0, 8), j ->
       |    CAST(CAST(len(list_filter(range(1, len(text) + 1), i -> ascii(substr(text, i, 1)) >> 5 = j))
       |         + CASE WHEN j = 0 THEN nf * fsz - n ELSE 0 END AS FLOAT)
       |         / CAST(nf * fsz AS FLOAT) AS FLOAT)) AS features
       |  FROM ${alias}g)""".stripMargin

  /** MIXED-table features: even doc_ids take the raster histogram
    * (pixel bytes + the final frame's zero padding in bin 0, normalized
    * by nf·fsz), odd take the audio histogram (raw sample bytes = the
    * text bytes, normalized by n) — both re-derived from text, both in
    * FLOAT32 like the decoders.
    *
    * PURE-ASCII lock-step (the same corpus assumption [[ppmFeatCtes]]
    * states): the odd (WAV) branch counts CHARACTERS (`range` over
    * `len(text)`, `ascii(substr)`) but normalizes by the OCTET length
    * the Spark decoder histograms — these agree only while every
    * document byte is ASCII (one byte per character, code points ≤
    * 127). The driver's documents table is ASCII by construction; a
    * future non-ASCII corpus must switch this CTE to octet positions
    * or the oracle diverges from the decoder instead of going
    * hash-red on the real cause.
    */
  private def avFeatCtes(alias: String): String =
    s"""${ppmGeomCte(s"${alias}g")},
       |$alias AS (SELECT doc_id,
       |  CASE WHEN doc_id % 2 = 0 THEN
       |    list_transform(range(0, 8), j ->
       |      CAST(CAST(len(list_filter(range(1, len(text) + 1), i -> ascii(substr(text, i, 1)) >> 5 = j))
       |           + CASE WHEN j = 0 THEN nf * fsz - n ELSE 0 END AS FLOAT)
       |           / CAST(nf * fsz AS FLOAT) AS FLOAT))
       |  ELSE
       |    list_transform(range(0, 8), j ->
       |      CAST(CAST(len(list_filter(range(1, len(text) + 1), i -> ascii(substr(text, i, 1)) >> 5 = j)) AS FLOAT)
       |           / CAST(n AS FLOAT) AS FLOAT))
       |  END AS features
       |  FROM ${alias}g)""".stripMargin

  // MUST stay in lock-step with graft.operators.TextAnalysis.stop* —
  // ASCII-only by construction (tokens are ASCII-alnum runs).
  private val stopEn = graft.operators.TextAnalysis.stopEn
  private val stopDe = graft.operators.TextAnalysis.stopDe
  private val stopFr = graft.operators.TextAnalysis.stopFr
  private val stopEs = graft.operators.TextAnalysis.stopEs

  /** Single-query exact k-NN: score ascending, deterministic id tie-break.
    * `valueExpr` maps the ascending score back to the reported metric.
    */
  private def knnSql(scoreExpr: String, valueOfScore: String, where: String, queryId: Long, k: Int): String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |d AS (SELECT e.vec_id AS id, $scoreExpr AS score FROM embeddings e, q $where)
       |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
       |       (round(($valueOfScore) * 10000.0) / 10000.0) AS value
       |FROM d ORDER BY score, id LIMIT $k""".stripMargin

  // ----- parameter-literal ANN oracles (generated per Verify run) -----

  /** A float as the exact decimal expansion of its value — parses back to
    * the identical float in any correctly-rounding engine (the expansion
    * is finite and exactly representable, so VARCHAR → DOUBLE → REAL
    * loses nothing).
    */
  private def floatLit(f: Float): String =
    s"CAST('${new java.math.BigDecimal(f.toDouble).toPlainString}' AS DOUBLE)"

  private def vecLit(v: Array[Float]): String =
    v.map(floatLit).mkString("CAST([", ", ", "] AS REAL[])")

  /** `(VALUES (0, vec), (1, vec), ...) AS t(idCol, vecCol)` literal table. */
  private def paramRows(rows: Array[Array[Float]], idCol: String, vecCol: String): String =
    rows.zipWithIndex
      .map { case (v, i) => s"($i, ${vecLit(v)})" }
      .mkString("(SELECT * FROM (VALUES ", ", ", s") AS t($idCol, $vecCol))")

  /** `(VALUES (kid, cluster, vec), ...) AS f(kid, cluster, fv)` — the
    * fine level of the two-level quantizer as a literal table.
    */
  private def fineRows(rows: Seq[(Int, Int, Array[Float])]): String =
    rows.map { case (kid, cl, v) => s"($kid, $cl, ${vecLit(v)})" }
      .mkString("(SELECT * FROM (VALUES ", ", ", ") AS f(kid, cluster, fv))")

  /** Two-level routed IVF search — the DuckDB twin of
    * [[operators.RoutedQuantizer.search]] given both centroid levels as
    * literals: coarse argmin per vector (ties to lowest kid), fine
    * argmin WITHIN the vector's coarse cell (ties to lowest cluster),
    * the query's coarseProbe-coarse/nprobe-fine probe sets re-derived
    * the same way, scan narrowed to the probed coarse cells, survivors
    * re-ranked exactly.
    */
  private def routedIvfSql(coarse: Array[Array[Float]], fine: Seq[(Int, Int, Array[Float])],
                           queryId: Long, k: Int, coarseProbe: Int, nprobe: Int): String =
    s"""WITH coarse AS ${paramRows(coarse, "kid", "kv")},
       |fine AS ${fineRows(fine)},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |casg AS (SELECT e.vec_id, c.kid, ${l2sq("e.embedding", "c.kv")} AS d2
       |         FROM embeddings e CROSS JOIN coarse c),
       |co AS (SELECT vec_id, kid FROM casg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, kid) = 1),
       |qco AS (SELECT c.kid FROM coarse c, q ORDER BY ${l2sq("q.qv", "c.kv")}, c.kid LIMIT $coarseProbe),
       |qf AS (SELECT f.cluster FROM fine f JOIN qco ON f.kid = qco.kid, q
       |       ORDER BY ${l2sq("q.qv", "f.fv")}, f.cluster LIMIT $nprobe),
       |fasg AS (SELECT co.vec_id, f.cluster, ${l2sq("e.embedding", "f.fv")} AS d2
       |         FROM co JOIN fine f ON f.kid = co.kid
       |         JOIN embeddings e ON e.vec_id = co.vec_id
       |         WHERE co.kid IN (SELECT kid FROM qco)),
       |cl AS (SELECT vec_id, cluster FROM fasg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
       |d AS (SELECT e.vec_id AS id, ${l2("e.embedding", "q.qv")} AS score
       |      FROM embeddings e JOIN cl ON cl.vec_id = e.vec_id, q
       |      WHERE cl.cluster IN (SELECT cluster FROM qf))
       |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
       |       (round((score) * 10000.0) / 10000.0) AS value
       |FROM d ORDER BY score, id LIMIT $k""".stripMargin

  /** BATCH two-level routed search — the DuckDB twin of
    * [[operators.RoutedQuantizer.searchBatch]]: global coarse→fine
    * assignment of every vector, PER-QUERY routing (coarse top
    * coarseProbe, fine top nprobe within those cells), candidates =
    * vectors in the query's probed fine clusters, bounded top-k per
    * query.
    */
  private def routedBatchIvfSql(coarse: Array[Array[Float]], fine: Seq[(Int, Int, Array[Float])],
                                k: Int, coarseProbe: Int, nprobe: Int): String =
    s"""WITH coarse AS ${paramRows(coarse, "kid", "kv")},
       |fine AS ${fineRows(fine)},
       |casg AS (SELECT e.vec_id, c.kid, ${l2sq("e.embedding", "c.kv")} AS d2
       |         FROM embeddings e CROSS JOIN coarse c),
       |co AS (SELECT vec_id, kid FROM casg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, kid) = 1),
       |fasg AS (SELECT co.vec_id, f.cluster, ${l2sq("e.embedding", "f.fv")} AS d2
       |         FROM co JOIN fine f ON f.kid = co.kid
       |         JOIN embeddings e ON e.vec_id = co.vec_id),
       |cl AS (SELECT vec_id, cluster FROM fasg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
       |qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
       |qco AS (SELECT q_id, kid FROM (
       |          SELECT qs.q_id, c.kid, ${l2sq("qs.qv", "c.kv")} AS d2
       |          FROM qs CROSS JOIN coarse c) t
       |        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, kid) <= $coarseProbe),
       |qf AS (SELECT q_id, cluster FROM (
       |          SELECT qco.q_id, f.cluster, ${l2sq("qs.qv", "f.fv")} AS d2
       |          FROM qco JOIN fine f ON f.kid = qco.kid
       |          JOIN qs ON qs.q_id = qco.q_id) t
       |       QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, cluster) <= $nprobe),
       |d AS (SELECT qf.q_id, e.vec_id AS n_id, ${l2("e.embedding", "qs.qv")} AS score
       |      FROM qf JOIN cl ON cl.cluster = qf.cluster
       |      JOIN embeddings e ON e.vec_id = cl.vec_id
       |      JOIN qs ON qs.q_id = qf.q_id)
       |SELECT q_id,
       |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) AS INT) AS rank,
       |       n_id, (round((score) * 10000.0) / 10000.0) AS value
       |FROM d QUALIFY rank <= $k ORDER BY q_id, rank""".stripMargin

  /** IVF single-query search: assignment (argmin centroid, ties to lowest
    * id), nprobe probe pruning, exact L2 re-rank — the DuckDB twin of
    * [[operators.IvfIndex.search]] given the same centroids.
    */
  private def ivfSql(centroids: Array[Array[Float]], queryId: Long, k: Int, nprobe: Int,
                     andWhere: String = ""): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |probe AS (SELECT c.cid FROM cents c, q ORDER BY ${l2sq("q.qv", "c.cv")}, c.cid LIMIT $nprobe),
       |d AS (SELECT e.vec_id AS id, ${l2("e.embedding", "q.qv")} AS score
       |      FROM embeddings e JOIN cl ON cl.vec_id = e.vec_id, q
       |      WHERE cl.cid IN (SELECT cid FROM probe)$andWhere)
       |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
       |       (round((score) * 10000.0) / 10000.0) AS value
       |FROM d ORDER BY score, id LIMIT $k""".stripMargin

  /** Batch IVF k-NN: per-query probe sets over the same literal
    * centroids; top-k per query by (distance, id) — the DuckDB twin of
    * [[operators.Knn.searchBatchIvf]].
    */
  private def batchIvfSql(centroids: Array[Array[Float]], k: Int, nprobe: Int,
                          andWhere: String = ""): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |qd AS (SELECT q.q_id, c.cid, ${l2sq("q.qv", "c.cv")} AS d2 FROM q CROSS JOIN cents c),
       |probe AS (SELECT q_id, cid FROM qd
       |          QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, cid) <= $nprobe),
       |d AS (SELECT p.q_id, e.vec_id AS n_id, ${l2("e.embedding", "q.qv")} AS score
       |      FROM probe p JOIN cl ON cl.cid = p.cid JOIN embeddings e ON e.vec_id = cl.vec_id
       |      JOIN q ON q.q_id = p.q_id WHERE TRUE$andWhere)
       |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) AS INT) AS rank,
       |       n_id, (round((score) * 10000.0) / 10000.0) AS value
       |FROM d QUALIFY rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Centroid-based silhouette per cluster from the spliced centroid
    * literals — the DuckDB twin of [[Queries.vectorSilhouette]].
    */
  private def silhouetteSql(centroids: Array[Array[Float]]): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |r AS (SELECT vec_id, cid, d2,
       |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM asg),
       |p AS (SELECT a.vec_id, a.cid AS own_cid, sqrt(a.d2) AS a, sqrt(b.d2) AS b
       |      FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
       |s AS (SELECT own_cid, CASE WHEN a = b THEN CAST(0 AS BIGINT)
       |        ELSE CAST(floor((b - a) / (CASE WHEN a > b THEN a ELSE b END) * 1000000.0 + 0.5) AS BIGINT) END AS s6
       |      FROM p)
       |SELECT own_cid AS cid, count(*) AS n,
       |  (round((CAST(sum(s6) AS DOUBLE) / (count(*) * 1000000.0)) * 1000000.0) / 1000000.0) AS mean_silhouette
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** recall@k of the IVF leg vs the exact leg, both reproduced here —
    * the DuckDB twin of [[Queries.annRecallEval]].
    */
  private def recallEvalSql(centroids: Array[Array[Float]], queryId: Long,
                            k: Int, nprobe: Int): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |exact AS (SELECT e.vec_id AS id FROM embeddings e, q
       |          ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k),
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |probe AS (SELECT c.cid FROM cents c, q ORDER BY ${l2sq("q.qv", "c.cv")}, c.cid LIMIT $nprobe),
       |approx AS (SELECT e.vec_id AS id FROM embeddings e JOIN cl ON cl.vec_id = e.vec_id, q
       |           WHERE cl.cid IN (SELECT cid FROM probe)
       |           ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k),
       |h AS (SELECT count(*) AS n_hits FROM exact JOIN approx USING (id))
       |SELECT $k AS k, $nprobe AS nprobe, n_hits,
       |       (round((n_hits / $k) * 10000.0) / 10000.0) AS recall FROM h""".stripMargin

  /** recall@k at several nprobe settings in one statement — the shared
    * assignment/exact legs factor out, each probe set is its own LIMIT.
    */
  private def recallCurveSql(centroids: Array[Array[Float]], queryId: Long,
                             k: Int, nprobes: Seq[Int]): String = {
    val branches = nprobes.map { np =>
      s"""b$np AS (SELECT $np AS nprobe, count(*) AS n_hits FROM exact
         |WHERE id IN (SELECT e.vec_id FROM embeddings e JOIN cl ON cl.vec_id = e.vec_id, q
         |             WHERE cl.cid IN (SELECT c.cid FROM cents c, q
         |                              ORDER BY ${l2sq("q.qv", "c.cv")}, c.cid LIMIT $np)
         |             ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k))""".stripMargin
    }.mkString(",\n")
    val union = nprobes.map(np => s"SELECT * FROM b$np").mkString(" UNION ALL ")
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |exact AS (SELECT e.vec_id AS id FROM embeddings e, q
       |          ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k),
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |$branches
       |SELECT nprobe, n_hits, (round((n_hits / $k) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY nprobe""".stripMargin
  }

  /** k-NN graph recall: the approx leg is [[knnJoinSql]] verbatim (as a
    * subquery); the exact leg is the brute-force all-pairs top-k; the
    * row is edge-set intersection counts + one rounded division.
    */
  private def graphRecallSql(centroids: Array[Array[Float]], k: Int): String =
    s"""WITH approx AS (SELECT q_id, n_id FROM (${knnJoinSql(centroids, k)}) a),
       |d AS (SELECT x.vec_id AS q_id, y.vec_id AS n_id, ${l2("x.embedding", "y.embedding")} AS s
       |      FROM embeddings x JOIN embeddings y ON x.vec_id <> y.vec_id),
       |ex AS (SELECT q_id, n_id FROM d
       |       QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY s, n_id) <= $k),
       |tc AS (SELECT count(*) AS n_exact FROM ex),
       |ac AS (SELECT count(*) AS n_approx FROM approx),
       |hc AS (SELECT count(*) AS n_hit FROM ex JOIN approx USING (q_id, n_id))
       |SELECT n_exact, n_approx, n_hit,
       |  (round((n_hit / n_exact) * 10000.0) / 10000.0) AS recall
       |FROM tc, ac, hc""".stripMargin

  /** LSH tuning curve: shared exact leg, one bucket assignment, one
    * Hamming-ball branch per radius — the DuckDB twin of
    * [[Queries.annLshRecallCurve]].
    */
  private def lshRecallCurveSql(planes: Array[Array[Float]], queryId: Long,
                                k: Int, radii: Seq[Int]): String = {
    val branches = radii.map { r =>
      s"""b$r AS (SELECT $r AS radius, count(*) AS n_hits FROM exact
         |WHERE id IN (SELECT e.vec_id FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id, q, ctr
         |             WHERE bit_count(xor(bk.bucket, ctr.center)) <= $r
         |             ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k))""".stripMargin
    }.mkString(",\n")
    val union = radii.map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ")
    s"""WITH pl AS ${paramRows(planes, "p", "wv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |exact AS (SELECT e.vec_id AS id FROM embeddings e, q
       |          ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k),
       |bdot AS (SELECT e.vec_id, pl.p, ${dot("e.embedding", "pl.wv")} AS d
       |         FROM embeddings e CROSS JOIN pl),
       |bk AS (SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bdot GROUP BY vec_id),
       |ctr AS (SELECT bucket AS center FROM bk WHERE vec_id = $queryId),
       |$branches
       |SELECT radius, n_hits, (round((n_hits / $k) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY radius""".stripMargin
  }

  /** k-NN graph: same single-probe cluster blocking as
    * [[operators.Knn.knnJoinIvf]] — assignment (argmin centroid, ties to
    * lowest id), same-cluster pairs, exact L2 rank.
    */
  private def knnJoinSql(centroids: Array[Array[Float]], k: Int): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |d AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id)
       |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) AS INT) AS rank,
       |       n_id, (round((score) * 10000.0) / 10000.0) AS value
       |FROM d QUALIFY rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Graph reciprocity over the SAME IVF-blocked k-NN graph as
    * [[knnJoinSql]]: mutual pairs via a self-join of the edge list.
    */
  private def knnMutualSql(centroids: Array[Array[Float]], k: Int): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |d AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |g AS (SELECT q_id, n_id FROM d
       |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $k),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
       |         CAST(count(DISTINCT q_id) AS BIGINT) AS n_nodes FROM g),
       |mu AS (SELECT CAST(count(*) AS BIGINT) AS n_mutual_pairs
       |       FROM g a JOIN g b ON a.q_id = b.n_id AND a.n_id = b.q_id
       |       WHERE a.q_id < a.n_id)
       |SELECT st.n_nodes, st.n_edges, mu.n_mutual_pairs,
       |  (round((CAST(mu.n_mutual_pairs AS DOUBLE) * 2.0 / CAST(st.n_edges AS DOUBLE)) * 10000.0) / 10000.0) AS reciprocity
       |FROM st, mu""".stripMargin

  /** Mutual-kNN connected components: the knnMutualSql graph chain, the
    * reciprocal edge set, a recursive-CTE transitive closure (the
    * dedup_clusters pattern), then the component-size histogram.
    */
  private def knnComponentsSql(centroids: Array[Array[Float]], k: Int): String =
    s"""WITH RECURSIVE cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |d AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |g AS (SELECT q_id, n_id FROM d
       |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $k),
       |mp AS (SELECT a.q_id AS u, a.n_id AS v FROM g a
       |       JOIN g b ON a.q_id = b.n_id AND a.n_id = b.q_id WHERE a.q_id < a.n_id),
       |edges AS (SELECT u, v FROM mp UNION ALL SELECT v, u FROM mp),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
       |canon AS (SELECT u AS id, least(u, min(v)) AS canonical FROM reach GROUP BY u),
       |asgn AS (SELECT e.vec_id, coalesce(c.canonical, e.vec_id) AS canonical
       |         FROM embeddings e LEFT JOIN canon c ON c.id = e.vec_id),
       |szs AS (SELECT canonical, CAST(count(*) AS BIGINT) AS sz FROM asgn GROUP BY canonical)
       |SELECT sz, CAST(count(*) AS BIGINT) AS n_components
       |FROM szs GROUP BY sz ORDER BY sz""".stripMargin

  /** The shared CTE chain of the graph-ANN walk ([[Queries.annGraph]]):
    * re-derive the IVF-blocked top-`graphK` graph from the centroid
    * literals, symmetrize it, pick the per-cluster medoid entries, then
    * UNROLL the beam walk — each hop h takes the top-`beam` of the rows
    * scored in round h−1 as its frontier, expands their out-edges minus
    * everything visited, and scores the new ids.
    */
  /** The serving-graph CTE prefix shared by the single and batch walks:
    * assignment, medoid entries, the IVF-blocked top-`graphK` graph,
    * symmetrized.
    */
  private def graphBaseCtes(centroids: Array[Array[Float]], graphK: Int,
                            mat: Boolean = false, where: String = ""): String = {
    // DuckDB INLINES non-recursive CTEs per reference: the multi-walk
    // beam-knob oracle references this chain from 15 hop CTEs, and
    // inlined re-evaluation of the pair join goes combinatorial (it
    // filled the disk at sf0.1). MATERIALIZED pins each shared CTE to
    // one evaluation — semantics identical. `where` filters the CORPUS
    // the graph is built over (the filtered-serving twin); the query
    // vector CTE stays unfiltered — the probe is request-side data.
    val m = if (mat) "MATERIALIZED " else ""
    s"""cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS $m(SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c$where),
       |own AS $m(SELECT vec_id, cid, d2 FROM asg
       |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |cl AS $m(SELECT vec_id, cid FROM own),
       |med AS $m(SELECT vec_id AS id FROM own
       |        QUALIFY row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) = 1),
       |d AS $m(SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |g AS $m(SELECT q_id, n_id FROM d
       |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $graphK),
       |sym AS $m(SELECT q_id AS src, n_id AS dst FROM g
       |        UNION SELECT n_id AS src, q_id AS dst FROM g)""".stripMargin
  }

  /** One unrolled hop chain — f/x/s/v CTEs per round, names suffixed
    * with `sfx` so several beams' walks can share one WITH clause (all
    * start from the same v0, so round 1's visited set is `v0`
    * regardless of suffix).
    */
  private def graphHopChain(beam: Int, hops: Int, sfx: String = "",
                            sym: String = "sym"): String =
    (1 to hops).map { h =>
      val fresh = if (h == 1) "v0" else s"s${h - 1}$sfx"
      val prev = if (h == 1) "v0" else s"v${h - 1}$sfx"
      s"""f$h$sfx AS (SELECT id FROM $fresh ORDER BY dist, id LIMIT $beam),
         |x$h$sfx AS (SELECT DISTINCT s.dst AS id FROM f$h$sfx f JOIN $sym s ON s.src = f.id
         |        WHERE s.dst NOT IN (SELECT id FROM $prev)),
         |s$h$sfx AS (SELECT x.id, ${l2("e.embedding", "q.qv")} AS dist
         |        FROM x$h$sfx x JOIN embeddings e ON e.vec_id = x.id, q),
         |v$h$sfx AS (SELECT * FROM $prev UNION ALL SELECT * FROM s$h$sfx)""".stripMargin
    }.mkString(",\n")

  private def graphWalkCtes(centroids: Array[Array[Float]], queryId: Long,
                            graphK: Int, beam: Int, hops: Int,
                            where: String = ""): String =
    s"""${graphBaseCtes(centroids, graphK, where = where)},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |v0 AS (SELECT m.id, ${l2("e.embedding", "q.qv")} AS dist
       |       FROM med m JOIN embeddings e ON e.vec_id = m.id, q),
       |${graphHopChain(beam, hops)}""".stripMargin

  /** Batch walk: the same unrolled rounds PER QUERY (partitioned
    * QUALIFY cuts, correlated NOT EXISTS for the visited set) — the
    * DuckDB twin of [[Queries.knnBatchGraph]].
    */
  private def graphBeamBatchSql(centroids: Array[Array[Float]],
                                graphK: Int, beam: Int, hops: Int, k: Int,
                                where: String = "",
                                route: Option[(Array[Array[Float]], Int)] = None): String = {
    val hopCtes = (1 to hops).map { h =>
      val fresh = if (h == 1) "v0" else s"s${h - 1}"
      s"""f$h AS (SELECT q_id, id FROM $fresh
         |        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dist, id) <= $beam),
         |x$h AS (SELECT DISTINCT f.q_id, s.dst AS id FROM f$h f JOIN sym s ON s.src = f.id
         |        WHERE NOT EXISTS (SELECT 1 FROM v${h - 1} v
         |                          WHERE v.q_id = f.q_id AND v.id = s.dst)),
         |s$h AS (SELECT x.q_id, x.id, ${l2("e.embedding", "qs.qv")} AS dist
         |        FROM x$h x JOIN embeddings e ON e.vec_id = x.id
         |        JOIN qs ON qs.q_id = x.q_id),
         |v$h AS (SELECT * FROM v${h - 1} UNION ALL SELECT * FROM s$h)""".stripMargin
    }.mkString(",\n")
    // hop 0: every medoid per query (exact), or — the ROUTED batch —
    // only the medoids whose route cell (argmin over the spliced route
    // centroids, ties lowest rid) is among the query's routeProbe
    // nearest route cells (the per-query map-side route the Spark walk
    // computes with nearestCentroids)
    val v0 = route match {
      case Some((rc, rp)) =>
        s"""rt AS ${paramRows(rc, "rid", "rv")},
           |masg AS (SELECT m.id, r.rid, ${l2sq("e.embedding", "r.rv")} AS d2
           |         FROM med m JOIN embeddings e ON e.vec_id = m.id CROSS JOIN rt r),
           |mcell AS (SELECT id, rid FROM masg
           |          QUALIFY row_number() OVER (PARTITION BY id ORDER BY d2, rid) = 1),
           |qrt AS (SELECT q_id, rid FROM (
           |          SELECT qs.q_id, r.rid, ${l2sq("qs.qv", "r.rv")} AS d2
           |          FROM qs CROSS JOIN rt r) t
           |        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, rid) <= $rp),
           |v0 AS (SELECT qr.q_id, mc.id, ${l2("e.embedding", "qs.qv")} AS dist
           |       FROM qrt qr JOIN mcell mc ON mc.rid = qr.rid
           |       JOIN qs ON qs.q_id = qr.q_id
           |       JOIN embeddings e ON e.vec_id = mc.id)""".stripMargin
      case None =>
        s"""v0 AS (SELECT qs.q_id, m.id, ${l2("e.embedding", "qs.qv")} AS dist
           |       FROM med m JOIN embeddings e ON e.vec_id = m.id CROSS JOIN qs)""".stripMargin
    }
    s"""WITH ${graphBaseCtes(centroids, graphK, where = where)},
       |qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
       |$v0,
       |$hopCtes
       |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist, id) AS INT) AS rank,
       |       id AS n_id, (round((dist) * 10000.0) / 10000.0) AS value
       |FROM v$hops QUALIFY rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** The serving-graph CTE prefix re-derived through the TWO-LEVEL
    * routed quantizer (the branch the corpus-scale builders auto-switch
    * to above Queries.routedKThreshold) given BOTH levels as literals:
    * per-vector coarse argmin (ties lowest kid), fine argmin WITHIN the
    * coarse cell (ties lowest cluster — [[graft.functions.nearestCentroidIn]]'s
    * first-minimal rule over the cluster-sorted candidate array), one
    * medoid per FINE cluster (nearest to its fine centroid, ties lowest
    * id), the cluster-blocked top-`graphK` graph, symmetrized. Produces
    * the same CTE names (cl/med/d/g/sym) as [[graphBaseCtes]], so the
    * walk chains compose unchanged.
    */
  private def routedGraphBaseCtes(coarse: Array[Array[Float]],
                                  fine: Seq[(Int, Int, Array[Float])],
                                  graphK: Int): String =
    s"""rcoarse AS ${paramRows(coarse, "kid", "kv")},
       |rfine AS ${fineRows(fine)},
       |casg AS (SELECT e.vec_id, c.kid, ${l2sq("e.embedding", "c.kv")} AS d2
       |         FROM embeddings e CROSS JOIN rcoarse c),
       |co AS (SELECT vec_id, kid FROM casg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, kid) = 1),
       |fasg AS (SELECT co.vec_id, f.cluster, ${l2sq("e.embedding", "f.fv")} AS d2
       |         FROM co JOIN rfine f ON f.kid = co.kid
       |         JOIN embeddings e ON e.vec_id = co.vec_id),
       |own AS (SELECT vec_id, cluster AS cid, d2 FROM fasg
       |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
       |cl AS (SELECT vec_id, cid FROM own),
       |med AS (SELECT vec_id AS id FROM own
       |        QUALIFY row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) = 1),
       |d AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |g AS (SELECT q_id, n_id FROM d
       |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $graphK),
       |sym AS (SELECT q_id AS src, n_id AS dst FROM g
       |        UNION SELECT n_id AS src, q_id AS dst FROM g)""".stripMargin

  /** Beam serve over the ROUTED-QUANTIZER-built serving layout — the
    * DuckDB twin of [[Queries.annGraphRoutedForced]]: the full routed
    * build chain (two-level assignment → fine-cluster medoids → blocked
    * graph → symmetrize) re-derived from the quantizer tables the
    * artifact itself persists, then the standard unrolled walk.
    */
  private def routedForcedGraphBeamSql(coarse: Array[Array[Float]],
                                       fine: Seq[(Int, Int, Array[Float])],
                                       queryId: Long, graphK: Int, beam: Int,
                                       hops: Int, k: Int): String =
    s"""WITH ${routedGraphBaseCtes(coarse, fine, graphK)},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |v0 AS (SELECT m.id, ${l2("e.embedding", "q.qv")} AS dist
       |       FROM med m JOIN embeddings e ON e.vec_id = m.id, q),
       |${graphHopChain(beam, hops)}
       |SELECT CAST(row_number() OVER (ORDER BY dist, id) AS INT) AS rank, id,
       |       (round((dist) * 10000.0) / 10000.0) AS value
       |FROM v$hops ORDER BY dist, id LIMIT $k""".stripMargin

  /** The MUTATED maintained-GRAPH lifecycle re-derived end-to-end — the
    * DuckDB twin of [[Queries.annGraphMutated]], given the artifact's
    * frozen quantizer as literals. Replays the ENTIRE verb chain the
    * facade ran (gen 0 build → gen 1 insert → gen 2 upsert → gen 3
    * delete) from spec arithmetic:
    *
    *  - gen-0 state: assignment/medoids/blocked-graph/symmetrized edges
    *    over the ORIGINAL corpus (the standard base chain);
    *  - per mutating generation: the batch's cluster assignment against
    *    the frozen centroids, its serve-edge append (top-`graphK` vs
    *    the LIVE standing rows of the touched clusters minus the batch
    *    ids, symmetrized) — [[graft.operators.GraphMaintenance.appendServeEdges]];
    *  - the generation-scoped tombstone algebra: upsert targets die at
    *    upto = 1, deletes at upto = 2; an edge at gen γ dies iff an
    *    endpoint's tombstone covers γ — so gen-2 replacement edges of
    *    an upserted id outlive its gen-1 tombstone while its gen-0
    *    edges die ([[graft.operators.Tombstones.filterEdgesGen]]);
    *  - the medoid re-seed heal per generation (clusters with live rows
    *    but no live entry get the nearest live row, ties lowest id);
    *  - the starved-node re-link per generation with tombstones: the
    *    victims' live out-neighbors, their MULTISET live out-degree,
    *    the < graphK/2 floor, fresh top-`graphK` edges minus standing
    *    live pairs, symmetrized
    *    ([[graft.operators.GraphMaintenance.relinkStarved]]);
    *  - finally the standard unrolled beam walk over the LIVE entries /
    *    edges / vectors.
    *
    * Any drift in the protocol — resurrection, a missed heal, a
    * mis-scoped tombstone, a wrong candidate set — lands on different
    * rows and goes hash-red.
    */
  private def mutatedGraphBeamSql(cents: Array[Array[Float]],
                                  insertId: Long, insertSrc: Long,
                                  upserts: Seq[(Long, Long)], deletes: Seq[Long],
                                  queryId: Long, graphK: Int, beam: Int,
                                  hops: Int, k: Int): String = {
    val ut = upserts.map(_._1)
    val utL = ut.mkString(", ")
    val dlL = deletes.mkString(", ")
    val all4 = (ut ++ deletes).mkString(", ")
    val halfK = math.max(1, graphK / 2)
    val u2rows = upserts.map { case (tgt, src) =>
      s"SELECT CAST($tgt AS BIGINT) AS vec_id, (SELECT embedding FROM embeddings WHERE vec_id = $src) AS embedding"
    }.mkString("\n       |       UNION ALL ").stripMargin
    // the walk over the live view: hop scoring joins lv3 (every live
    // edge's dst_vec equals the dst's live vector — an edge referencing
    // a superseded row is dead by the generation rule)
    val hopCtes = (1 to hops).map { h =>
      val fresh = if (h == 1) "wv0" else s"ws${h - 1}"
      val prev = if (h == 1) "wv0" else s"wv${h - 1}"
      s"""wf$h AS (SELECT id FROM $fresh ORDER BY dist, id LIMIT $beam),
         |wx$h AS (SELECT DISTINCT s.dst AS id FROM wf$h f JOIN msym s ON s.src = f.id
         |        WHERE s.dst NOT IN (SELECT id FROM $prev)),
         |ws$h AS (SELECT x.id, ${l2("l.embedding", "q.qv")} AS dist
         |        FROM wx$h x JOIN lv3 l ON l.vec_id = x.id, q),
         |wv$h AS (SELECT * FROM $prev UNION ALL SELECT * FROM ws$h)""".stripMargin
    }.mkString(",\n")
    s"""WITH cents AS ${paramRows(cents, "cid", "cv")},
       |asg AS MATERIALIZED (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |own AS MATERIALIZED (SELECT vec_id, cid, d2 FROM asg
       |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |cl AS MATERIALIZED (SELECT vec_id, cid FROM own),
       |med AS MATERIALIZED (SELECT cid, vec_id AS id FROM own
       |        QUALIFY row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) = 1),
       |d AS MATERIALIZED (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |g AS MATERIALIZED (SELECT q_id, n_id FROM d
       |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $graphK),
       |e0 AS MATERIALIZED (SELECT q_id AS src, n_id AS dst FROM g
       |        UNION SELECT n_id AS src, q_id AS dst FROM g),
       |u1 AS (SELECT CAST($insertId AS BIGINT) AS vec_id,
       |              (SELECT embedding FROM embeddings WHERE vec_id = $insertSrc) AS embedding),
       |u2 AS ($u2rows),
       |uc1 AS (SELECT u.vec_id, c.cid FROM u1 u CROSS JOIN cents c
       |        QUALIFY row_number() OVER (PARTITION BY u.vec_id
       |          ORDER BY ${l2sq("u.embedding", "c.cv")}, c.cid) = 1),
       |uc2 AS (SELECT u.vec_id, c.cid FROM u2 u CROSS JOIN cents c
       |        QUALIFY row_number() OVER (PARTITION BY u.vec_id
       |          ORDER BY ${l2sq("u.embedding", "c.cv")}, c.cid) = 1),
       |lv1 AS MATERIALIZED (SELECT cl.vec_id, e.embedding, cl.cid
       |        FROM cl JOIN embeddings e USING (vec_id)
       |        UNION ALL SELECT u.vec_id, u.embedding, uc1.cid FROM u1 u JOIN uc1 USING (vec_id)),
       |lv2 AS MATERIALIZED (SELECT * FROM lv1 WHERE vec_id NOT IN ($utL)
       |        UNION ALL SELECT u.vec_id, u.embedding, uc2.cid FROM u2 u JOIN uc2 USING (vec_id)),
       |lv3 AS MATERIALIZED (SELECT * FROM lv2 WHERE vec_id NOT IN ($dlL)),
       |b1 AS (SELECT u.vec_id, u.embedding, uc1.cid FROM u1 u JOIN uc1 USING (vec_id)),
       |cand1 AS (SELECT cl.vec_id, e.embedding, cl.cid FROM cl JOIN embeddings e USING (vec_id)
       |          WHERE cl.cid IN (SELECT DISTINCT cid FROM uc1) AND cl.vec_id <> $insertId
       |          UNION ALL SELECT * FROM b1),
       |e1g AS (SELECT b.vec_id AS q_id, c.vec_id AS id FROM b1 b
       |        JOIN cand1 c ON c.cid = b.cid AND c.vec_id <> b.vec_id
       |        QUALIFY row_number() OVER (PARTITION BY b.vec_id
       |          ORDER BY ${l2("c.embedding", "b.embedding")}, c.vec_id) <= $graphK),
       |e1 AS (SELECT q_id AS src, id AS dst FROM e1g UNION SELECT id, q_id FROM e1g),
       |miss1 AS (SELECT c.cid, c.cv FROM cents c WHERE c.cid NOT IN (SELECT cid FROM med)),
       |ent1 AS (SELECT l.cid, l.vec_id AS id FROM lv1 l JOIN miss1 m ON m.cid = l.cid
       |        QUALIFY row_number() OVER (PARTITION BY l.cid
       |          ORDER BY ${l2sq("l.embedding", "m.cv")}, l.vec_id) = 1),
       |b2 AS (SELECT u.vec_id, u.embedding, uc2.cid FROM u2 u JOIN uc2 USING (vec_id)),
       |cand2 AS (SELECT l.vec_id, l.embedding, l.cid FROM lv1 l
       |          WHERE l.cid IN (SELECT DISTINCT cid FROM uc2) AND l.vec_id NOT IN ($utL)
       |          UNION ALL SELECT * FROM b2),
       |e2g AS (SELECT b.vec_id AS q_id, c.vec_id AS id FROM b2 b
       |        JOIN cand2 c ON c.cid = b.cid AND c.vec_id <> b.vec_id
       |        QUALIFY row_number() OVER (PARTITION BY b.vec_id
       |          ORDER BY ${l2("c.embedding", "b.embedding")}, c.vec_id) <= $graphK),
       |e2 AS (SELECT q_id AS src, id AS dst FROM e2g UNION SELECT id, q_id FROM e2g),
       |le2 AS (SELECT cid, id FROM med WHERE id NOT IN ($utL)
       |        UNION ALL SELECT cid, id FROM ent1),
       |miss2 AS (SELECT c.cid, c.cv FROM cents c WHERE c.cid NOT IN (SELECT cid FROM le2)),
       |ent2 AS (SELECT l.cid, l.vec_id AS id FROM lv2 l JOIN miss2 m ON m.cid = l.cid
       |        QUALIFY row_number() OVER (PARTITION BY l.cid
       |          ORDER BY ${l2sq("l.embedding", "m.cv")}, l.vec_id) = 1),
       |pe2 AS MATERIALIZED (SELECT src, dst, 0 AS gen FROM e0
       |        UNION ALL SELECT src, dst, 1 FROM e1
       |        UNION ALL SELECT src, dst, 2 FROM e2),
       |affl2 AS (SELECT DISTINCT p.dst AS id FROM pe2 p
       |          WHERE p.src IN ($utL) AND p.dst IN (SELECT vec_id FROM lv2)),
       |ledge2 AS MATERIALIZED (SELECT p.src, p.dst FROM pe2 p
       |          WHERE p.src IN (SELECT id FROM affl2)
       |            AND (p.gen > 1 OR (p.src NOT IN ($utL) AND p.dst NOT IN ($utL)))),
       |deg2 AS (SELECT src, count(*) AS deg FROM ledge2 GROUP BY src),
       |st2 AS (SELECT a.id FROM affl2 a LEFT JOIN deg2 d2x ON d2x.src = a.id
       |        WHERE coalesce(d2x.deg, 0) < $halfK),
       |f2d AS (SELECT s.vec_id AS q_id, c.vec_id AS id, ${l2("c.embedding", "s.embedding")} AS sc
       |        FROM lv2 s JOIN lv2 c ON c.cid = s.cid AND c.vec_id <> s.vec_id
       |        WHERE s.vec_id IN (SELECT id FROM st2)),
       |f2g AS (SELECT q_id, id FROM f2d
       |        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sc, id) <= $graphK),
       |f2n AS (SELECT q_id, id FROM f2g
       |        WHERE NOT EXISTS (SELECT 1 FROM ledge2 e WHERE e.src = f2g.q_id AND e.dst = f2g.id)),
       |r2 AS (SELECT q_id AS src, id AS dst FROM f2n UNION SELECT id, q_id FROM f2n),
       |le3 AS (SELECT cid, id FROM med WHERE id NOT IN ($all4)
       |        UNION ALL SELECT cid, id FROM ent1 WHERE id NOT IN ($dlL)
       |        UNION ALL SELECT cid, id FROM ent2 WHERE id NOT IN ($dlL)),
       |miss3 AS (SELECT c.cid, c.cv FROM cents c WHERE c.cid NOT IN (SELECT cid FROM le3)),
       |ent3 AS (SELECT l.cid, l.vec_id AS id FROM lv3 l JOIN miss3 m ON m.cid = l.cid
       |        QUALIFY row_number() OVER (PARTITION BY l.cid
       |          ORDER BY ${l2sq("l.embedding", "m.cv")}, l.vec_id) = 1),
       |pe3 AS MATERIALIZED (SELECT src, dst, gen FROM pe2
       |        UNION ALL SELECT src, dst, 2 AS gen FROM r2),
       |affl3 AS (SELECT DISTINCT p.dst AS id FROM pe3 p
       |          WHERE p.src IN ($dlL) AND p.dst IN (SELECT vec_id FROM lv3)),
       |ledge3 AS MATERIALIZED (SELECT p.src, p.dst FROM pe3 p
       |          WHERE p.src IN (SELECT id FROM affl3)
       |            AND (CASE WHEN p.gen <= 1
       |                 THEN p.src NOT IN ($all4) AND p.dst NOT IN ($all4)
       |                 ELSE p.src NOT IN ($dlL) AND p.dst NOT IN ($dlL) END)),
       |deg3 AS (SELECT src, count(*) AS deg FROM ledge3 GROUP BY src),
       |st3 AS (SELECT a.id FROM affl3 a LEFT JOIN deg3 d3x ON d3x.src = a.id
       |        WHERE coalesce(d3x.deg, 0) < $halfK),
       |f3d AS (SELECT s.vec_id AS q_id, c.vec_id AS id, ${l2("c.embedding", "s.embedding")} AS sc
       |        FROM lv3 s JOIN lv3 c ON c.cid = s.cid AND c.vec_id <> s.vec_id
       |        WHERE s.vec_id IN (SELECT id FROM st3)),
       |f3g AS (SELECT q_id, id FROM f3d
       |        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sc, id) <= $graphK),
       |f3n AS (SELECT q_id, id FROM f3g
       |        WHERE NOT EXISTS (SELECT 1 FROM ledge3 e WHERE e.src = f3g.q_id AND e.dst = f3g.id)),
       |r3 AS (SELECT q_id AS src, id AS dst FROM f3n UNION SELECT id, q_id FROM f3n),
       |ment AS (SELECT DISTINCT id FROM (SELECT id FROM le3 UNION ALL SELECT id FROM ent3)),
       |msym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |        SELECT src, dst FROM pe2 WHERE gen <= 1
       |          AND src NOT IN ($all4) AND dst NOT IN ($all4)
       |        UNION ALL SELECT src, dst FROM pe2 WHERE gen = 2
       |          AND src NOT IN ($dlL) AND dst NOT IN ($dlL)
       |        UNION ALL SELECT src, dst FROM r2
       |          WHERE src NOT IN ($dlL) AND dst NOT IN ($dlL)
       |        UNION ALL SELECT src, dst FROM r3)),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |wv0 AS (SELECT m.id, ${l2("l.embedding", "q.qv")} AS dist
       |        FROM ment m JOIN lv3 l ON l.vec_id = m.id, q),
       |$hopCtes
       |SELECT CAST(row_number() OVER (ORDER BY dist, id) AS INT) AS rank, id,
       |       (round((dist) * 10000.0) / 10000.0) AS value
       |FROM wv$hops ORDER BY dist, id LIMIT $k""".stripMargin
  }

  /** Per-phase walk cost profile — the DuckDB twin of
    * [[Queries.annGraphCostModel]]: the same unrolled walk CTEs, with
    * each phase COUNTED instead of cut — hop 0's scored entries (full
    * vs what the entry route at `routeProbe` would score), per round
    * the edge rows the frontier join reads and the new candidates
    * scored.
    */
  private def graphCostModelSql(cents: Array[Array[Float]],
                                routeCents: Array[Array[Float]],
                                queryId: Long, graphK: Int, beam: Int,
                                hops: Int, routeProbe: Int): String = {
    val perHop = (1 to hops).map { h =>
      s"""UNION ALL SELECT 'h${h}_edge_rows' AS phase, CAST(count(*) AS BIGINT) AS n_rows
         |FROM f$h f JOIN sym s ON s.src = f.id
         |UNION ALL SELECT 'h${h}_scored', CAST(count(*) AS BIGINT) FROM x$h""".stripMargin
    }.mkString("\n")
    s"""WITH ${graphWalkCtes(cents, queryId, graphK, beam, hops)},
       |rt AS ${paramRows(routeCents, "rid", "rv")},
       |mcell AS (SELECT id, rid FROM (
       |          SELECT m.id, r.rid, ${l2sq("e.embedding", "r.rv")} AS d2
       |          FROM med m JOIN embeddings e ON e.vec_id = m.id CROSS JOIN rt r) t
       |        QUALIFY row_number() OVER (PARTITION BY id ORDER BY d2, rid) = 1),
       |qrt AS (SELECT rid FROM (SELECT r.rid, ${l2sq("q.qv", "r.rv")} AS d2
       |          FROM rt r, q) t
       |        QUALIFY row_number() OVER (ORDER BY d2, rid) <= $routeProbe)
       |SELECT phase, n_rows FROM (
       |SELECT 'h0_entries_scored' AS phase, CAST(count(*) AS BIGINT) AS n_rows FROM v0
       |UNION ALL SELECT 'h0_routed_entries', CAST(count(*) AS BIGINT)
       |FROM mcell mc JOIN qrt ON qrt.rid = mc.rid
       |$perHop
       |) ORDER BY phase""".stripMargin
  }

  /** Route-health watchdog — the DuckDB twin of
    * [[Queries.annGraphRouteHealth]]: exact vs routed top-3 entry
    * overlap per sampled query at each routeProbe, exact-integer hit
    * sums with one division at the end.
    */
  private def routeHealthSql(cents: Array[Array[Float]],
                             routeCents: Array[Array[Float]],
                             rps: Seq[Int]): String = {
    val perRp = rps.map { rp =>
      s"""qr$rp AS (SELECT q_id, rid FROM (
         |          SELECT qs.q_id, r.rid, ${l2sq("qs.qv", "r.rv")} AS d2
         |          FROM qs CROSS JOIN rt r) t
         |        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, rid) <= $rp),
         |ro$rp AS (SELECT q_id, id FROM (
         |          SELECT s.q_id, s.id, s.dist FROM sc s
         |          JOIN qr$rp qq ON qq.q_id = s.q_id AND qq.rid = s.rid) t
         |        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dist, id) <= 3),
         |h$rp AS (SELECT e.q_id, CAST(count(*) AS BIGINT) AS h FROM ex e
         |        JOIN ro$rp r ON r.q_id = e.q_id AND r.id = e.id GROUP BY e.q_id),
         |row$rp AS (SELECT CAST($rp AS INT) AS route_probe,
         |          CAST(count(*) AS BIGINT) AS n_queries,
         |          CAST(sum(h) AS BIGINT) AS sum_hits,
         |          CAST(min(h) AS BIGINT) AS min_hits
         |        FROM (SELECT qs.q_id, coalesce(hh.h, 0) AS h
         |              FROM qs LEFT JOIN h$rp hh ON hh.q_id = qs.q_id) t)""".stripMargin
    }.mkString(",\n")
    val unions = rps.map(rp => s"SELECT * FROM row$rp").mkString(" UNION ALL ")
    s"""WITH cents AS ${paramRows(cents, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |own AS (SELECT vec_id, cid, d2 FROM asg
       |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |med AS (SELECT vec_id AS id FROM own
       |        QUALIFY row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) = 1),
       |rt AS ${paramRows(routeCents, "rid", "rv")},
       |qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
       |mcell AS (SELECT id, rid FROM (
       |          SELECT m.id, r.rid, ${l2sq("e.embedding", "r.rv")} AS d2
       |          FROM med m JOIN embeddings e ON e.vec_id = m.id CROSS JOIN rt r) t
       |        QUALIFY row_number() OVER (PARTITION BY id ORDER BY d2, rid) = 1),
       |sc AS MATERIALIZED (SELECT qs.q_id, m.id, mc.rid, ${l2("e.embedding", "qs.qv")} AS dist
       |      FROM med m JOIN embeddings e ON e.vec_id = m.id
       |      JOIN mcell mc ON mc.id = m.id CROSS JOIN qs),
       |ex AS (SELECT q_id, id FROM sc
       |       QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dist, id) <= 3),
       |$perRp
       |SELECT route_probe, n_queries, sum_hits,
       |       (round((CAST(sum_hits AS DOUBLE) / (CAST(n_queries AS DOUBLE) * 3.0)) * 10000.0) / 10000.0) AS avg_recall,
       |       (round((CAST(min_hits AS DOUBLE) / 3.0) * 10000.0) / 10000.0) AS min_recall
       |FROM ($unions) ORDER BY route_probe""".stripMargin
  }

  /** Graph-ANN beam serve — the DuckDB twin of [[Queries.annGraph]]
    * (with `where`, of [[Queries.filteredAnnGraph]]: the walk over the
    * graph OF the filtered corpus).
    */
  private def graphBeamSql(centroids: Array[Array[Float]], queryId: Long,
                           graphK: Int, beam: Int, hops: Int, k: Int,
                           where: String = ""): String =
    s"""WITH ${graphWalkCtes(centroids, queryId, graphK, beam, hops, where)}
       |SELECT CAST(row_number() OVER (ORDER BY dist, id) AS INT) AS rank, id,
       |       (round((dist) * 10000.0) / 10000.0) AS value
       |FROM v$hops ORDER BY dist, id LIMIT $k""".stripMargin

  /** ROUTED graph-ANN beam serve — the DuckDB twin of
    * [[Queries.annGraphRouted]]: same walk as [[graphBeamSql]], but
    * hop 0 starts from only the medoids whose route cell (argmin over
    * the spliced route centroids, ties to lowest rid) is among the
    * query's `routeProbe` nearest route cells.
    */
  private def routedGraphBeamSql(centroids: Array[Array[Float]],
                                 routeCents: Array[Array[Float]],
                                 queryId: Long, graphK: Int, beam: Int, hops: Int,
                                 k: Int, routeProbe: Int): String =
    s"""WITH ${graphBaseCtes(centroids, graphK)},
       |rt AS ${paramRows(routeCents, "rid", "rv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |masg AS (SELECT m.id, r.rid, ${l2sq("e.embedding", "r.rv")} AS d2
       |         FROM med m JOIN embeddings e ON e.vec_id = m.id CROSS JOIN rt r),
       |mcell AS (SELECT id, rid FROM masg
       |          QUALIFY row_number() OVER (PARTITION BY id ORDER BY d2, rid) = 1),
       |qrt AS (SELECT r.rid FROM rt r, q ORDER BY ${l2sq("q.qv", "r.rv")}, r.rid LIMIT $routeProbe),
       |v0 AS (SELECT mc.id, ${l2("e.embedding", "q.qv")} AS dist
       |       FROM mcell mc JOIN embeddings e ON e.vec_id = mc.id, q
       |       WHERE mc.rid IN (SELECT rid FROM qrt)),
       |${graphHopChain(beam, hops)}
       |SELECT CAST(row_number() OVER (ORDER BY dist, id) AS INT) AS rank, id,
       |       (round((dist) * 10000.0) / 10000.0) AS value
       |FROM v$hops ORDER BY dist, id LIMIT $k""".stripMargin

  /** recall@10 after 0..hops rounds — the DuckDB twin of
    * [[Queries.annGraphRecallCurve]].
    */
  private def graphBeamCurveSql(centroids: Array[Array[Float]], queryId: Long,
                                graphK: Int, beam: Int, hops: Int): String = {
    val branches = (0 to hops).map { h =>
      s"""b$h AS (SELECT $h AS hops, count(*) AS n_hits FROM ex
         |WHERE id IN (SELECT id FROM v$h ORDER BY dist, id LIMIT 10))""".stripMargin
    }.mkString(",\n")
    val union = (0 to hops).map(h => s"SELECT * FROM b$h").mkString(" UNION ALL ")
    s"""WITH ${graphWalkCtes(centroids, queryId, graphK, beam, hops)},
       |ex AS (SELECT e.vec_id AS id FROM embeddings e, q
       |       ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT 10),
       |$branches
       |SELECT hops, n_hits, (round((n_hits / 10) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY hops""".stripMargin
  }

  /** recall@10 per beam width at fixed hops — the DuckDB twin of
    * [[Queries.annGraphBeamCurve]] (the ef_search-analog knob). One
    * WITH clause: the base graph, entries and v0 shared; each beam's
    * walk unrolls as its own suffixed hop chain.
    */
  private def graphBeamKnobCurveSql(centroids: Array[Array[Float]], queryId: Long,
                                    graphK: Int, beams: Seq[Int], hops: Int): String = {
    val chains = beams.map(b => graphHopChain(b, hops, sfx = s"w$b")).mkString(",\n")
    val branches = beams.map { b =>
      s"""bw$b AS (SELECT $b AS beam, count(*) AS n_hits FROM ex
         |WHERE id IN (SELECT id FROM v${hops}w$b ORDER BY dist, id LIMIT 10))""".stripMargin
    }.mkString(",\n")
    val union = beams.map(b => s"SELECT * FROM bw$b").mkString(" UNION ALL ")
    s"""WITH ${graphBaseCtes(centroids, graphK, mat = true)},
       |q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |v0 AS MATERIALIZED (SELECT m.id, ${l2("e.embedding", "q.qv")} AS dist
       |       FROM med m JOIN embeddings e ON e.vec_id = m.id, q),
       |ex AS MATERIALIZED (SELECT e.vec_id AS id FROM embeddings e, q
       |       ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT 10),
       |$chains,
       |$branches
       |SELECT beam, n_hits, (round((n_hits / 10) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY beam""".stripMargin
  }

  /** recall@10 per graph DEGREE at fixed beam/hops — the DuckDB twin of
    * [[Queries.annGraphDegreeCurve]] (the M knob). One WITH clause: the
    * pair scores, medoid entries, v0 and the exact leg are shared and
    * MATERIALIZED (the beam-knob oracle's inlining lesson); each degree
    * gets its own top-K cut of the SAME ranking (the prefix property the
    * Spark artifact exploits), its symmetrized edge set, and a suffixed
    * unrolled walk. n_edges = that degree's symmetrized edge-set size —
    * the storage cost riding each recall row.
    */
  private def graphDegreeKnobCurveSql(centroids: Array[Array[Float]], queryId: Long,
                                      degrees: Seq[Int], beam: Int, hops: Int): String = {
    val perK = degrees.map { kk =>
      s"""gk$kk AS MATERIALIZED (SELECT q_id, n_id FROM d
         |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $kk),
         |symk$kk AS MATERIALIZED (SELECT q_id AS src, n_id AS dst FROM gk$kk
         |        UNION SELECT n_id AS src, q_id AS dst FROM gk$kk)""".stripMargin
    }.mkString(",\n")
    val chains = degrees.map(kk =>
      graphHopChain(beam, hops, sfx = s"k$kk", sym = s"symk$kk")).mkString(",\n")
    val branches = degrees.map { kk =>
      s"""bk$kk AS (SELECT $kk AS degree,
         |  (SELECT count(*) FROM ex
         |   WHERE id IN (SELECT id FROM v${hops}k$kk ORDER BY dist, id LIMIT 10)) AS n_hits,
         |  (SELECT count(*) FROM symk$kk) AS n_edges)""".stripMargin
    }.mkString(",\n")
    val union = degrees.map(kk => s"SELECT * FROM bk$kk").mkString(" UNION ALL ")
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS MATERIALIZED (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |own AS MATERIALIZED (SELECT vec_id, cid, d2 FROM asg
       |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |cl AS MATERIALIZED (SELECT vec_id, cid FROM own),
       |med AS MATERIALIZED (SELECT vec_id AS id FROM own
       |        QUALIFY row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) = 1),
       |d AS MATERIALIZED (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |v0 AS MATERIALIZED (SELECT m.id, ${l2("e.embedding", "q.qv")} AS dist
       |       FROM med m JOIN embeddings e ON e.vec_id = m.id, q),
       |ex AS MATERIALIZED (SELECT e.vec_id AS id FROM embeddings e, q
       |       ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT 10),
       |$perK,
       |$chains,
       |$branches
       |SELECT degree, n_hits,
       |  (round((n_hits / 10) * 10000.0) / 10000.0) AS recall, n_edges
       |FROM ($union) u ORDER BY degree""".stripMargin
  }

  /** recall@10 per (degree, beam) CELL at fixed hops — the DuckDB twin
    * of [[Queries.annGraphDegreeBeamGrid]] (the knob family's
    * interaction term). Same MATERIALIZED base as the degree curve;
    * each degree's prefix cut + symmetrized edge set is shared by its
    * beams, and every cell gets one suffixed unrolled walk.
    */
  private def graphDegreeBeamGridSql(centroids: Array[Array[Float]], queryId: Long,
                                     degrees: Seq[Int], beams: Seq[Int],
                                     hops: Int): String = {
    val perK = degrees.map { kk =>
      s"""gk$kk AS MATERIALIZED (SELECT q_id, n_id FROM d
         |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $kk),
         |symk$kk AS MATERIALIZED (SELECT q_id AS src, n_id AS dst FROM gk$kk
         |        UNION SELECT n_id AS src, q_id AS dst FROM gk$kk)""".stripMargin
    }.mkString(",\n")
    val chains = (for { kk <- degrees; b <- beams } yield
      graphHopChain(b, hops, sfx = s"k${kk}b$b", sym = s"symk$kk")).mkString(",\n")
    val branches = (for { kk <- degrees; b <- beams } yield
      s"""bk${kk}b$b AS (SELECT $kk AS degree, $b AS beam,
         |  (SELECT count(*) FROM ex
         |   WHERE id IN (SELECT id FROM v${hops}k${kk}b$b ORDER BY dist, id LIMIT 10)) AS n_hits)""".stripMargin)
      .mkString(",\n")
    val union = (for { kk <- degrees; b <- beams } yield s"SELECT * FROM bk${kk}b$b")
      .mkString(" UNION ALL ")
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS MATERIALIZED (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |own AS MATERIALIZED (SELECT vec_id, cid, d2 FROM asg
       |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |cl AS MATERIALIZED (SELECT vec_id, cid FROM own),
       |med AS MATERIALIZED (SELECT vec_id AS id FROM own
       |        QUALIFY row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) = 1),
       |d AS MATERIALIZED (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |v0 AS MATERIALIZED (SELECT m.id, ${l2("e.embedding", "q.qv")} AS dist
       |       FROM med m JOIN embeddings e ON e.vec_id = m.id, q),
       |ex AS MATERIALIZED (SELECT e.vec_id AS id FROM embeddings e, q
       |       ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT 10),
       |$perK,
       |$chains,
       |$branches
       |SELECT degree, beam, n_hits,
       |  (round((n_hits / 10) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY degree, beam""".stripMargin
  }

  /** WALK-TIME filtered graph search — the DuckDB twin of
    * [[Queries.filteredAnnGraphWalk]]: the walk unrolls over the FULL
    * graph (one suffixed chain per distinct beam, shared across
    * predicates — the walk is filter-independent), and only the final
    * top-10 cut gates on each predicate; recall against the exact
    * filtered answer, with the measured selectivity riding each row.
    */
  private def graphFilteredWalkSql(centroids: Array[Array[Float]], queryId: Long,
                                   graphK: Int, hops: Int,
                                   preds: Seq[(String, String, Int, Int)]): String = {
    val beams = (preds.map(_._3) ++ preds.map(_._4) :+ 8).distinct.sorted
    val chains = beams.map(b => graphHopChain(b, hops, sfx = s"w$b")).mkString(",\n")
    val perPred = preds.zipWithIndex.map { case ((_, sqlPred, _, _), i) =>
      s"""pass$i AS MATERIALIZED (SELECT vec_id AS id FROM embeddings e WHERE $sqlPred),
         |exf$i AS MATERIALIZED (SELECT e.vec_id AS id FROM embeddings e, q WHERE $sqlPred
         |       ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT 10)""".stripMargin
    }.mkString(",\n")
    val branches = preds.zipWithIndex.map { case ((name, _, comp, adapt), i) =>
      s"""bp$i AS (SELECT '$name' AS predicate,
         |  (round((CAST((SELECT count(*) FROM pass$i) AS DOUBLE)
         |          / CAST((SELECT count(*) FROM embeddings) AS DOUBLE)) * 10000.0) / 10000.0) AS selectivity,
         |  8 AS beam_plain,
         |  (SELECT count(*) FROM exf$i WHERE id IN
         |     (SELECT id FROM v${hops}w8 WHERE id IN (SELECT id FROM pass$i)
         |      ORDER BY dist, id LIMIT 10)) AS hits_plain,
         |  $comp AS beam_comp,
         |  (SELECT count(*) FROM exf$i WHERE id IN
         |     (SELECT id FROM v${hops}w$comp WHERE id IN (SELECT id FROM pass$i)
         |      ORDER BY dist, id LIMIT 10)) AS hits_comp,
         |  $adapt AS beam_adapt,
         |  (SELECT count(*) FROM exf$i WHERE id IN
         |     (SELECT id FROM v${hops}w$adapt WHERE id IN (SELECT id FROM pass$i)
         |      ORDER BY dist, id LIMIT 10)) AS hits_adapt)""".stripMargin
    }.mkString(",\n")
    val union = preds.indices.map(i => s"SELECT * FROM bp$i").mkString(" UNION ALL ")
    s"""WITH ${graphBaseCtes(centroids, graphK, mat = true)},
       |q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |v0 AS MATERIALIZED (SELECT m.id, ${l2("e.embedding", "q.qv")} AS dist
       |       FROM med m JOIN embeddings e ON e.vec_id = m.id, q),
       |$chains,
       |$perPred,
       |$branches
       |SELECT predicate, selectivity, beam_plain, hits_plain,
       |  (round((hits_plain / 10) * 10000.0) / 10000.0) AS recall_plain,
       |  beam_comp, hits_comp,
       |  (round((hits_comp / 10) * 10000.0) / 10000.0) AS recall_comp,
       |  beam_adapt, hits_adapt,
       |  (round((hits_adapt / 10) * 10000.0) / 10000.0) AS recall_adapt
       |FROM ($union) u ORDER BY predicate""".stripMargin
  }

  /** Cost + recall per nprobe from the same fitted centroids — the
    * DuckDB twin of [[Queries.annTradeoffTable]].
    */
  private def annTradeoffSql(centroids: Array[Array[Float]], queryId: Long, k: Int,
                             nprobes: Seq[Int]): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |pops AS (SELECT cid, CAST(count(*) AS BIGINT) AS pop FROM cl GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       |pord AS (SELECT c.cid, CAST(row_number() OVER (ORDER BY ${l2sq("q.qv", "c.cv")}, c.cid) AS INT) AS pr
       |         FROM cents c, q),
       |ex AS (SELECT e.vec_id AS id FROM embeddings e, q
       |       QUALIFY row_number() OVER (ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id) <= $k),
       |u AS (SELECT unnest([${nprobes.mkString(", ")}]) AS nprobe),
       |sc AS (SELECT u.nprobe, CAST(sum(pops.pop) AS BIGINT) AS rows_scanned
       |       FROM u JOIN pord ON pord.pr <= u.nprobe JOIN pops ON pops.cid = pord.cid
       |       GROUP BY 1),
       |ap AS (SELECT u.nprobe, e.vec_id AS id FROM u
       |       JOIN pord ON pord.pr <= u.nprobe
       |       JOIN cl ON cl.cid = pord.cid
       |       JOIN embeddings e ON e.vec_id = cl.vec_id, q
       |       QUALIFY row_number() OVER (PARTITION BY u.nprobe ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id) <= $k),
       |ht AS (SELECT ap.nprobe, CAST(count(*) AS BIGINT) AS n_hits
       |       FROM ap JOIN ex ON ap.id = ex.id GROUP BY 1)
       |SELECT u.nprobe, sc.rows_scanned,
       |  (round((CAST(sc.rows_scanned AS DOUBLE) / CAST(tot.n AS DOUBLE)) * 10000.0) / 10000.0) AS frac,
       |  coalesce(ht.n_hits, 0) AS n_hits,
       |  (round((coalesce(ht.n_hits, 0) / 10.0) * 10000.0) / 10000.0) AS recall
       |FROM u JOIN sc USING (nprobe) LEFT JOIN ht USING (nprobe), tot
       |ORDER BY u.nprobe""".stripMargin

  /** Majority label per cluster from the same fitted centroids — the
    * DuckDB twin of [[Queries.vectorClusterPurity]].
    */
  private def vectorClusterPuritySql(centroids: Array[Array[Float]]): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, e.label, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, label, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |g AS (SELECT cid AS cluster, label, CAST(count(*) AS BIGINT) AS c FROM cl GROUP BY 1, 2),
       |f AS (SELECT cluster, label, c, CAST(sum(c) OVER (PARTITION BY cluster) AS BIGINT) AS n,
       |        row_number() OVER (PARTITION BY cluster ORDER BY c DESC, label) AS rk FROM g)
       |SELECT cluster, label AS majority_label, n AS n_vectors, c AS n_majority,
       |  (round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 10000.0) / 10000.0) AS purity
       |FROM f WHERE rk = 1 ORDER BY cluster""".stripMargin

  /** Scan-economics report from the same fitted artifacts: probe sets
    * re-derived in SQL, membership counted in one aggregation — the
    * DuckDB twin of [[Queries.annCostModel]].
    */
  private def annCostModelSql(centroids: Array[Array[Float]], planes: Array[Array[Float]],
                              ivfQ: Long, lshQ: Long, nprobe: Int, radius: Int,
                              rerank: Int): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |pl AS ${paramRows(planes, "p", "wv")},
       |q2 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $ivfQ),
       |q3 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $lshQ),
       |pc AS (SELECT cid FROM (SELECT c.cid, ${l2sq("q2.qv", "c.cv")} AS d2 FROM cents c, q2) z
       |       QUALIFY row_number() OVER (ORDER BY d2, cid) <= $nprobe),
       |ctr AS (SELECT CAST(sum(CASE WHEN d > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS center
       |        FROM (SELECT pl.p, ${dot("q3.qv", "pl.wv")} AS d FROM pl, q3) z),
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |bd AS (SELECT e.vec_id, pl.p, ${dot("e.embedding", "pl.wv")} AS d
       |       FROM embeddings e CROSS JOIN pl),
       |bk AS (SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bd GROUP BY vec_id),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CASE WHEN cl.cid IN (SELECT cid FROM pc) THEN 1 ELSE 0 END) AS BIGINT) AS n_ivf,
       |        CAST(sum(CASE WHEN bit_count(xor(bk.bucket, ctr.center)) <= $radius THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh
       |      FROM cl JOIN bk USING (vec_id), ctr)
       |SELECT index, rows_scanned,
       |  (round((CAST(rows_scanned AS DOUBLE) / CAST(n AS DOUBLE)) * 10000.0) / 10000.0) AS frac
       |FROM (
       |  SELECT n, 'flat' AS index, n AS rows_scanned FROM a
       |  UNION ALL SELECT n, 'ivf_nprobe4', n_ivf FROM a
       |  UNION ALL SELECT n, 'lsh_r1', n_lsh FROM a
       |  UNION ALL SELECT n, 'pq_adc', n + $rerank FROM a
       |  UNION ALL SELECT n, 'binary', n + $rerank FROM a) u
       |ORDER BY index""".stripMargin

  /** Label-agreement report over the same within-cluster k-NN graph —
    * the DuckDB twin of [[Queries.knnLabelConsistency]].
    */
  private def knnLabelConsistencySql(centroids: Array[Array[Float]], k: Int): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |d AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |e2 AS (SELECT q_id, n_id FROM d
       |       QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $k),
       |pv AS (SELECT e2.q_id, ea.label AS q_label, CAST(count(*) AS BIGINT) AS n_nb,
       |         CAST(sum(CASE WHEN ea.label = eb.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same
       |       FROM e2 JOIN embeddings ea ON ea.vec_id = e2.q_id
       |               JOIN embeddings eb ON eb.vec_id = e2.n_id
       |       GROUP BY 1, 2)
       |SELECT q_label AS label, CAST(count(*) AS BIGINT) AS n_vectors,
       |  (round((CAST(sum(n_same) AS DOUBLE) / CAST(sum(n_nb) AS DOUBLE)) * 10000.0) / 10000.0) AS agreement,
       |  CAST(sum(CASE WHEN n_same = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_all_disagree
       |FROM pv GROUP BY 1 ORDER BY label""".stripMargin

  /** In-degree histogram of the within-cluster k-NN graph from the same
    * scaled centroids — the DuckDB twin of [[Queries.knnHubness]].
    */
  private def knnHubnessSql(centroids: Array[Array[Float]], k: Int): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |d AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, ${l2("ea.embedding", "eb.embedding")} AS score
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |e2 AS (SELECT q_id, n_id FROM d
       |       QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= $k),
       |ic AS (SELECT n_id, CAST(count(*) AS BIGINT) AS c FROM e2 GROUP BY 1),
       |ind AS (SELECT e.vec_id, CAST(coalesce(ic.c, 0) AS BIGINT) AS indeg
       |        FROM embeddings e LEFT JOIN ic ON ic.n_id = e.vec_id),
       |h AS (SELECT indeg, CAST(count(*) AS BIGINT) AS n_vectors FROM ind GROUP BY 1),
       |t AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS tot FROM h)
       |SELECT indeg, n_vectors,
       |  (round((CAST(n_vectors AS DOUBLE) / CAST(tot AS DOUBLE)) * 10000.0) / 10000.0) AS share
       |FROM h, t ORDER BY indeg""".stripMargin

  /** LSH bucketed search: sign-of-dot bucket per vector over the literal
    * hyperplanes, Hamming-radius multi-probe around the query's bucket,
    * exact L2 re-rank — the DuckDB twin of [[operators.LshIndex.search]].
    */
  private def lshSql(planes: Array[Array[Float]], queryId: Long, k: Int, radius: Int): String =
    s"""WITH pl AS ${paramRows(planes, "p", "wv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |bdot AS (SELECT e.vec_id, pl.p, ${dot("e.embedding", "pl.wv")} AS d
       |         FROM embeddings e CROSS JOIN pl),
       |bk AS (SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bdot GROUP BY vec_id),
       |ctr AS (SELECT bucket AS center FROM bk WHERE vec_id = $queryId),
       |d AS (SELECT e.vec_id AS id, ${l2("e.embedding", "q.qv")} AS score
       |      FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id, q, ctr
       |      WHERE bit_count(xor(bk.bucket, ctr.center)) <= $radius)
       |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
       |       (round((score) * 10000.0) / 10000.0) AS value
       |FROM d ORDER BY score, id LIMIT $k""".stripMargin

  /** Banded-LSH embedding dedup: per-band bucket per vector over the
    * literal hyperplanes (row id = band·nBits + bit), candidates = pairs
    * sharing any band bucket, exact cosine filter on candidates — the
    * DuckDB twin of [[operators.Dedup.embeddingCosinePairs]].
    */
  /** Banded sign-LSH near-dup pairs with the df-capped block discipline
    * (buckets over `cap` ids excluded from pair expansion but counted;
    * the completeness envelope rides every row) — the DuckDB twin of
    * [[operators.Dedup.embeddingCosinePairs]].
    */
  private def embeddingLshSql(bandPlanes: Array[Array[Array[Float]]], minCosine: Double,
                              cap: Int = 256): String = {
    val nBits = bandPlanes.head.length
    s"""WITH ${embeddingLshCandCtes(bandPlanes, cap)}
       |SELECT a_id, b_id, (round((p.c) * 10000.0) / 10000.0) AS cosine,
       |       cap.n_capped_buckets, cap.n_ids_in_capped
       |FROM p CROSS JOIN cap WHERE p.c >= $minCosine ORDER BY a_id, b_id""".stripMargin
  }

  /** The shared df-capped sign-LSH candidate chain (blocks, cap stats,
    * candidate pairs with exact cosines).
    */
  private def embeddingLshCandCtes(bandPlanes: Array[Array[Array[Float]]], cap: Int): String = {
    val nBits = bandPlanes.head.length
    s"""pl AS ${paramRows(bandPlanes.flatten, "pid", "wv")},
       |bdot AS (SELECT e.vec_id, pl.pid // $nBits AS band, pl.pid % $nBits AS p,
       |                ${dot("e.embedding", "pl.wv")} AS d
       |         FROM embeddings e CROSS JOIN pl),
       |bk AS (SELECT vec_id, band, CAST(sum(CASE WHEN d > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
       |       FROM bdot GROUP BY vec_id, band),
       |pop AS (SELECT band, bucket, count(*) AS c FROM bk GROUP BY 1, 2),
       |cap AS (SELECT CAST(count(*) FILTER (WHERE c > $cap) AS BIGINT) AS n_capped_buckets,
       |          CAST(coalesce(sum(c) FILTER (WHERE c > $cap), 0) AS BIGINT) AS n_ids_in_capped
       |        FROM pop),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |         FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |         JOIN pop ON pop.band = a.band AND pop.bucket = a.bucket
       |         WHERE pop.c <= $cap),
       |p AS (SELECT a_id, b_id, ${cosine("ea.embedding", "eb.embedding")} AS c
       |      FROM cand JOIN embeddings ea ON ea.vec_id = a_id JOIN embeddings eb ON eb.vec_id = b_id)""".stripMargin
  }

  /** Candidate-pair counts per cosine threshold over the SAME capped
    * candidate set — the DuckDB twin of
    * [[Queries.dedupEmbeddingThresholdCurve]]. LEFT JOIN (not a filtered
    * cross join) so a threshold with zero pairs still yields its row.
    */
  private def embeddingThresholdCurveSql(bandPlanes: Array[Array[Array[Float]]],
                                         thresholds: Seq[Double], cap: Int = 256): String = {
    val ts = thresholds.map(t => s"CAST($t AS DOUBLE)").mkString(", ")
    s"""WITH ${embeddingLshCandCtes(bandPlanes, cap)},
       |r AS (SELECT (round((p.c) * 10000.0) / 10000.0) AS c4 FROM p),
       |u AS (SELECT unnest([$ts]) AS t)
       |SELECT u.t AS min_cosine, CAST(count(r.c4) AS BIGINT) AS n_pairs
       |FROM u LEFT JOIN r ON r.c4 >= u.t
       |GROUP BY u.t ORDER BY min_cosine""".stripMargin
  }

  /** PQ ADC search: per-subspace code assignment (argmin over the literal
    * codebooks, ties to lowest id), exact-integer-fixed ADC lookup-table
    * scores (floor(d²·10⁹ + 0.5) — floor of the binary value, identical
    * cross-engine), top-`rerank` candidates, exact L2 re-rank — the
    * DuckDB twin of [[operators.PqIndex.search]].
    */
  private def pqSql(books: Array[Array[Array[Float]]], queryId: Long, k: Int, rerank: Int): String = {
    val ksub = books.head.length
    val dsub = books.head.head.length
    def sub(v: String) = s"list_slice($v, (cb.pid // $ksub) * $dsub + 1, (cb.pid // $ksub) * $dsub + $dsub)"
    s"""WITH cb AS ${paramRows(books.flatten, "pid", "cv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |asg AS (SELECT e.vec_id, cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |          ${l2sq(sub("e.embedding"), "cb.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cb),
       |code AS (SELECT vec_id, j, c FROM asg
       |         QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) = 1),
       |qt AS (SELECT cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |         CAST(floor(${l2sq(sub("q.qv"), "cb.cv")} * 1000000000.0 + 0.5) AS BIGINT) AS d9
       |       FROM cb CROSS JOIN q),
       |adc AS (SELECT code.vec_id AS id, CAST(sum(qt.d9) AS BIGINT) AS adc9
       |        FROM code JOIN qt USING (j, c) GROUP BY code.vec_id),
       |cand AS (SELECT id FROM adc ORDER BY adc9, id LIMIT $rerank),
       |d AS (SELECT e.vec_id AS id, ${l2("e.embedding", "q.qv")} AS score
       |      FROM embeddings e JOIN cand ON cand.id = e.vec_id, q)
       |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
       |       (round((score) * 10000.0) / 10000.0) AS value
       |FROM d ORDER BY score, id LIMIT $k""".stripMargin
  }

  /** Point-lookup cost report from the measured per-file layout stats,
    * spliced in as literals (the layouts are physical artifacts DuckDB
    * cannot list): the oracle re-derives rows-touched, file counts and
    * fractions independently, and CROSS-CHECKS each layout's literal
    * row counts against the raw embeddings table — a corrupted literal
    * drops its layout row and the compare goes red.
    */
  private def lookupCostSql(stats: Seq[(String, Long, Long, Long)],
                            probes: Seq[Long]): String = {
    val vals = stats.map { case (layout, mn, mx, cnt) =>
      s"('$layout', CAST($mn AS BIGINT), CAST($mx AS BIGINT), CAST($cnt AS BIGINT))"
    }.mkString(", ")
    val prVals = probes.map(p => s"(CAST($p AS BIGINT))").mkString(", ")
    s"""WITH fs(layout, mn, mx, cnt) AS (VALUES $vals),
       |pr(pid) AS (VALUES $prVals),
       |tot AS (SELECT count(*) AS n FROM embeddings),
       |good AS (SELECT layout FROM fs GROUP BY layout
       |         HAVING CAST(sum(cnt) AS BIGINT) = (SELECT n FROM tot)),
       |hit AS (SELECT fs.layout, fs.cnt,
       |          (SELECT count(*) FROM pr WHERE pr.pid BETWEEN fs.mn AND fs.mx) AS n_hit
       |        FROM fs JOIN good USING (layout))
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       |       CAST(sum(cnt * n_hit) AS BIGINT) AS rows_touched,
       |       (round((CAST(sum(cnt * n_hit) AS DOUBLE)
       |         / ((SELECT n FROM tot) * ${probes.size}.0)) * 1000000.0) / 1000000.0) AS frac
       |FROM hit GROUP BY layout ORDER BY layout""".stripMargin
  }

  /** Batch twin of [[pqSql]]: every vec_id % 100 == 0 row is a query;
    * the per-query ADC tables, the rerank-`rerank` candidate cut
    * (adc9, id ascending per query) and the exact per-query re-rank all
    * re-derived from the same codebook literals.
    */
  private def pqBatchSql(books: Array[Array[Array[Float]]], k: Int, rerank: Int): String = {
    val ksub = books.head.length
    val dsub = books.head.head.length
    def sub(v: String) = s"list_slice($v, (cb.pid // $ksub) * $dsub + 1, (cb.pid // $ksub) * $dsub + $dsub)"
    s"""WITH cb AS ${paramRows(books.flatten, "pid", "cv")},
       |q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
       |asg AS (SELECT e.vec_id, cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |          ${l2sq(sub("e.embedding"), "cb.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cb),
       |code AS (SELECT vec_id, j, c FROM asg
       |         QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) = 1),
       |qt AS (SELECT q.q_id, cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |         CAST(floor(${l2sq(sub("q.qv"), "cb.cv")} * 1000000000.0 + 0.5) AS BIGINT) AS d9
       |       FROM cb CROSS JOIN q),
       |adc AS (SELECT qt.q_id, code.vec_id AS id, CAST(sum(qt.d9) AS BIGINT) AS adc9
       |        FROM code JOIN qt USING (j, c) GROUP BY 1, 2),
       |cand AS (SELECT q_id, id FROM adc
       |         QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc9, id) <= $rerank),
       |d AS (SELECT c.q_id, e.vec_id AS n_id, ${l2("e.embedding", "q.qv")} AS score
       |      FROM cand c JOIN embeddings e ON e.vec_id = c.id JOIN q ON q.q_id = c.q_id)
       |SELECT q_id,
       |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) AS INT) AS rank,
       |       n_id, (round((score) * 10000.0) / 10000.0) AS value
       |FROM d QUALIFY rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** Per-subspace PQ reconstruction MSE from the same codebook literals
    * — the DuckDB twin of [[Queries.pqDistortion]] (assignment ties to
    * the lower code id, error integer-fixed like the ADC tables).
    */
  private def pqDistortionSql(books: Array[Array[Array[Float]]]): String = {
    val ksub = books.head.length
    val dsub = books.head.head.length
    def sub(v: String) = s"list_slice($v, (cb.pid // $ksub) * $dsub + 1, (cb.pid // $ksub) * $dsub + $dsub)"
    s"""WITH cb AS ${paramRows(books.flatten, "pid", "cv")},
       |asg AS (SELECT e.vec_id, cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |          ${l2sq(sub("e.embedding"), "cb.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cb),
       |best AS (SELECT vec_id, j, CAST(floor(d2 * 1000000000.0 + 0.5) AS BIGINT) AS e9
       |         FROM asg QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) = 1)
       |SELECT CAST(j AS INT) AS j, count(*) AS n,
       |  (round((CAST(sum(e9) AS DOUBLE) / (count(*) * 1000000000.0)) * 1000000.0) / 1000000.0) AS mse
       |FROM best GROUP BY j ORDER BY j""".stripMargin
  }

  /** PQ code-utilization entropy from the same codebook literals:
    * assignment re-derived per subspace, entropy integer-fixed per
    * distinct count (the corpus_entropy discipline) — the DuckDB twin
    * of [[Queries.pqCodeEntropy]].
    */
  private def pqCodeEntropySql(books: Array[Array[Array[Float]]]): String = {
    val ksub = books.head.length
    val dsub = books.head.head.length
    def sub(v: String) = s"list_slice($v, (cb.pid // $ksub) * $dsub + 1, (cb.pid // $ksub) * $dsub + $dsub)"
    s"""WITH cb AS ${paramRows(books.flatten, "pid", "cv")},
       |asg AS (SELECT e.vec_id, cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |          ${l2sq(sub("e.embedding"), "cb.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cb),
       |best AS (SELECT vec_id, j, c FROM asg
       |         QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) = 1),
       |cc AS (SELECT j, c, CAST(count(*) AS BIGINT) AS cnt FROM best GROUP BY 1, 2),
       |s AS (SELECT j, CAST(sum(cnt) AS BIGINT) AS n, count(*) AS n_used,
       |        CAST(sum(CAST(cnt AS DECIMAL(18,0)) *
       |          CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) AS s_fixed
       |      FROM cc GROUP BY 1)
       |SELECT CAST(j AS INT) AS j, n_used,
       |  (round((ln(CAST(n AS DOUBLE)) - s_fixed / (CAST(n AS DOUBLE) * 1000000.0)) * 10000.0) / 10000.0) AS entropy_nats,
       |  (round((CAST(n_used AS DOUBLE) / $ksub.0) * 10000.0) / 10000.0) AS utilization
       |FROM s ORDER BY j""".stripMargin
  }

  /** 2σ distance outliers from the same centroid literals: assignment,
    * 1e-6 fixed distances, the exact-integer sigma rule in HUGEINT —
    * the DuckDB twin of [[Queries.embeddingOutliers]].
    */
  private def embeddingOutliersSql(centroids: Array[Array[Float]]): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid AS cluster, sqrt(d2) AS d FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |x AS (SELECT vec_id, cluster, d,
       |        CAST(floor(d * 1000000.0 + 0.5) AS HUGEINT) AS x FROM cl),
       |m AS (SELECT cluster, CAST(count(*) AS HUGEINT) AS n,
       |        CAST(sum(x) AS HUGEINT) AS s, CAST(sum(x * x) AS HUGEINT) AS q
       |      FROM x GROUP BY 1)
       |SELECT vec_id, CAST(x.cluster AS INT) AS cluster,
       |  (round((d) * 10000.0) / 10000.0) AS dist
       |FROM x JOIN m USING (cluster)
       |WHERE (n * x.x - s) * (n * x.x - s) > 4 * (n * q - s * s) AND (n * x.x - s) > 0
       |ORDER BY vec_id""".stripMargin

  /** IVF cluster-balance report from the same centroid literals. */
  private def ivfImbalanceSql(centroids: Array[Array[Float]]): String = {
    val k = centroids.length
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |c AS (SELECT cid AS cluster, count(*) AS n FROM cl GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
       |SELECT CAST(cluster AS INT) AS cluster, n,
       |  (round((CAST(n AS DOUBLE) / CAST(t AS DOUBLE)) * 10000.0) / 10000.0) AS share,
       |  (round((CAST(n AS DOUBLE) * $k.0 / CAST(t AS DOUBLE)) * 10000.0) / 10000.0) AS balance
       |FROM c, t ORDER BY cluster""".stripMargin
  }

  /** PQ rerank tuning curve: shared codebook/ADC chain, one branch per
    * rerank budget — the DuckDB twin of [[Queries.annPqRecallCurve]].
    */
  private def pqRecallCurveSql(books: Array[Array[Array[Float]]], queryId: Long,
                               k: Int, reranks: Seq[Int]): String = {
    val ksub = books.head.length
    val dsub = books.head.head.length
    def sub(v: String) = s"list_slice($v, (cb.pid // $ksub) * $dsub + 1, (cb.pid // $ksub) * $dsub + $dsub)"
    val branches = reranks.map { r =>
      s"""b$r AS (SELECT $r AS rerank, count(*) AS n_hits FROM exact
         |WHERE id IN (SELECT e.vec_id FROM embeddings e
         |             JOIN (SELECT id FROM adc ORDER BY adc9, id LIMIT $r) cand
         |               ON cand.id = e.vec_id, q
         |             ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k))""".stripMargin
    }.mkString(",\n")
    val union = reranks.map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ")
    s"""WITH cb AS ${paramRows(books.flatten, "pid", "cv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |exact AS (SELECT e.vec_id AS id FROM embeddings e, q
       |          ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k),
       |asg AS (SELECT e.vec_id, cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |          ${l2sq(sub("e.embedding"), "cb.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cb),
       |code AS (SELECT vec_id, j, c FROM asg
       |         QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) = 1),
       |qt AS (SELECT cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |         CAST(floor(${l2sq(sub("q.qv"), "cb.cv")} * 1000000000.0 + 0.5) AS BIGINT) AS d9
       |       FROM cb CROSS JOIN q),
       |adc AS (SELECT code.vec_id AS id, CAST(sum(qt.d9) AS BIGINT) AS adc9
       |        FROM code JOIN qt USING (j, c) GROUP BY code.vec_id),
       |$branches
       |SELECT rerank, n_hits, (round((n_hits / $k) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY rerank""".stripMargin
  }

  /** SQ8 rerank curve: candidates by the identical quantize-reconstruct
    * distance as the `ann_sq8` oracle (sequential list_sum, id
    * tie-break), exact L2 re-rank of the top-r, recall vs the exact
    * top-k. The rerank = n leg keeps every candidate ⇒ recall 1.0.
    */
  private def sqRerankCurveSql(queryId: Long, k: Int, reranks: Seq[Int]): String = {
    val recon =
      """(CASE WHEN mma.mxs[i] > mma.mns[i]
        | THEN mma.mns[i] + least(greatest(floor((CAST(e.embedding[i] AS DOUBLE) - mma.mns[i])
        |        / (mma.mxs[i] - mma.mns[i]) * 255.0 + 0.5), 0.0), 255.0) / 255.0 * (mma.mxs[i] - mma.mns[i])
        | ELSE mma.mns[i] END)""".stripMargin.replaceAll("\n\\s*", " ")
    val branches = reranks.map { r =>
      s"""b$r AS (SELECT $r AS rerank, count(*) AS n_hits FROM exact
         |WHERE id IN (SELECT e.vec_id FROM embeddings e
         |             JOIN (SELECT id FROM sqd ORDER BY sqv, id LIMIT $r) cand
         |               ON cand.id = e.vec_id, q
         |             ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k))""".stripMargin
    }.mkString(",\n")
    val union = reranks.map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |mm AS (SELECT dd.range AS i, min(CAST(e.embedding[dd.range] AS DOUBLE)) AS mn,
       |              max(CAST(e.embedding[dd.range] AS DOUBLE)) AS mx
       |       FROM embeddings e CROSS JOIN range(1, 65) dd GROUP BY dd.range),
       |mma AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM mm),
       |exact AS (SELECT e.vec_id AS id FROM embeddings e, q
       |          ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k),
       |sqd AS (SELECT e.vec_id AS id,
       |  list_sum(list_transform(
       |    list_transform(range(1, 65), i -> CAST(q.qv[i] AS DOUBLE) - $recon),
       |    v -> v * v)) AS sqv
       |  FROM embeddings e, q, mma),
       |$branches
       |SELECT rerank, n_hits, (round((n_hits / $k) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY rerank""".stripMargin
  }

  /** Binary sign-bit rerank curve: hamming candidates with the identical
    * bit packing as the `ann_binary` oracle, exact L2 re-rank, recall vs
    * the exact top-k; rerank = n closes at 1.0.
    */
  private def binaryRerankCurveSql(queryId: Long, k: Int, reranks: Seq[Int]): String = {
    val branches = reranks.map { r =>
      s"""b$r AS (SELECT $r AS rerank, count(*) AS n_hits FROM exact
         |WHERE id IN (SELECT e.vec_id FROM embeddings e
         |             JOIN (SELECT id FROM w, qw
         |                   ORDER BY bit_count(xor(w0, q0)) + bit_count(xor(w1, q1)), id
         |                   LIMIT $r) cand
         |               ON cand.id = e.vec_id, q
         |             ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k))""".stripMargin
    }.mkString(",\n")
    val union = reranks.map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |qw AS (SELECT
       |  CAST(list_sum(list_transform(range(1, 33), i -> CASE WHEN qv[i] > 0 THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END)) AS BIGINT) AS q0,
       |  CAST(list_sum(list_transform(range(33, 65), i -> CASE WHEN qv[i] > 0 THEN 1::BIGINT << (i - 33) ELSE 0::BIGINT END)) AS BIGINT) AS q1
       |  FROM q),
       |w AS (SELECT vec_id AS id,
       |  CAST(list_sum(list_transform(range(1, 33), i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END)) AS BIGINT) AS w0,
       |  CAST(list_sum(list_transform(range(33, 65), i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT << (i - 33) ELSE 0::BIGINT END)) AS BIGINT) AS w1
       |  FROM embeddings),
       |exact AS (SELECT e.vec_id AS id FROM embeddings e, q
       |          ORDER BY ${l2("e.embedding", "q.qv")}, e.vec_id LIMIT $k),
       |$branches
       |SELECT rerank, n_hits, (round((n_hits / $k) * 10000.0) / 10000.0) AS recall
       |FROM ($union) u ORDER BY rerank""".stripMargin
  }

  /** IVFPQ: IVF cluster assignment + nprobe pruning (literal centroids)
    * feeding the PQ code/ADC/re-rank chain (literal codebooks) — the
    * DuckDB twin of [[operators.PqIndex.searchIvf]].
    */
  private def ivfpqSql(centroids: Array[Array[Float]], books: Array[Array[Array[Float]]],
                       queryId: Long, k: Int, nprobe: Int, rerank: Int): String = {
    val ksub = books.head.length
    val dsub = books.head.head.length
    def sub(v: String) = s"list_slice($v, (cb.pid // $ksub) * $dsub + 1, (cb.pid // $ksub) * $dsub + $dsub)"
    s"""WITH cents AS ${paramRows(centroids, "cid", "cw")},
       |cb AS ${paramRows(books.flatten, "pid", "cv")},
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |casg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cw")} AS d2
       |         FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM casg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |probe AS (SELECT c.cid FROM cents c, q ORDER BY ${l2sq("q.qv", "c.cw")}, c.cid LIMIT $nprobe),
       |base AS (SELECT e.vec_id, e.embedding FROM embeddings e JOIN cl ON cl.vec_id = e.vec_id
       |         WHERE cl.cid IN (SELECT cid FROM probe)),
       |asg AS (SELECT e.vec_id, cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |          ${l2sq(sub("e.embedding"), "cb.cv")} AS d2
       |        FROM base e CROSS JOIN cb),
       |code AS (SELECT vec_id, j, c FROM asg
       |         QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) = 1),
       |qt AS (SELECT cb.pid // $ksub AS j, cb.pid % $ksub AS c,
       |         CAST(floor(${l2sq(sub("q.qv"), "cb.cv")} * 1000000000.0 + 0.5) AS BIGINT) AS d9
       |       FROM cb CROSS JOIN q),
       |adc AS (SELECT code.vec_id AS id, CAST(sum(qt.d9) AS BIGINT) AS adc9
       |        FROM code JOIN qt USING (j, c) GROUP BY code.vec_id),
       |cand AS (SELECT id FROM adc ORDER BY adc9, id LIMIT $rerank),
       |d AS (SELECT b.vec_id AS id, ${l2("b.embedding", "q.qv")} AS score
       |      FROM base b JOIN cand ON cand.id = b.vec_id, q)
       |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
       |       (round((score) * 10000.0) / 10000.0) AS value
       |FROM d ORDER BY score, id LIMIT $k""".stripMargin
  }

  /** Oracles that depend on fitted index parameters: must be generated in
    * the session that ran the queries (Verify), so both sides see the
    * identical centroid/plane matrices. Parameters here mirror
    * [[Queries.annIvf]], [[Queries.knnBatchIvf]], [[Queries.annLsh]],
    * [[Queries.dedupEmbedding]].
    */
  /** SemDeDup drop list given literal centroids: cluster assignment
    * (argmin, ties to lowest id), within-cluster cosine pairs, per-victim
    * canonical survivor — the DuckDB twin of [[operators.Dedup.semanticDrop]].
    */
  private def semanticSql(centroids: Array[Array[Float]], minCosine: Double): String =
    s"""WITH cents AS ${paramRows(centroids, "cid", "cv")},
       |asg AS (SELECT e.vec_id, c.cid, ${l2sq("e.embedding", "c.cv")} AS d2
       |        FROM embeddings e CROSS JOIN cents c),
       |cl AS (SELECT vec_id, cid FROM asg
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
       |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cid AS cluster,
       |             ${cosine("ea.embedding", "eb.embedding")} AS c
       |      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |      JOIN embeddings ea ON ea.vec_id = a.vec_id
       |      JOIN embeddings eb ON eb.vec_id = b.vec_id)
       |SELECT b_id AS vec_id, min(a_id) AS canonical_id, cluster,
       |       (round(max(c) * 10000.0) / 10000.0) AS max_cos
       |FROM p WHERE c >= $minCosine
       |GROUP BY b_id, cluster ORDER BY vec_id""".stripMargin

  def dynamic(spark: SparkSession, dir: String): Map[String, String] = {
    val emb = sources.Tables.embeddings(spark, dir)
    val centroids = operators.IvfIndex.fitCached(emb, "embedding", k = 16)
    val scaledCents = operators.IvfIndex.fitScaled(emb, "embedding", targetClusterSize = 100L)
    // the filtered-serving twin fits its quantizer on the FILTERED
    // corpus (the facade's searchFiltered semantics: the graph OF the
    // filtered base, not a filter over the full graph)
    val scaledCentsFlt = operators.IvfIndex.fitScaled(
      emb.where(org.apache.spark.sql.functions.col("label") === 2),
      "embedding", targetClusterSize = 100L)
    val planes = operators.LshIndex.planes(nBits = 4, dim = 64)
    val dedupPlanes = operators.LshIndex.bandPlanes(bands = 8, nBits = 4, dim = 64)
    val pqBooks = operators.PqIndex.fitCached(emb, "embedding", dim = 64, m = 8, ksub = 16)
    Map(
      "ann_pq" -> pqSql(pqBooks, queryId = 5L, k = 10, rerank = 100),
      "knn_batch_pq" -> pqBatchSql(pqBooks, k = 5, rerank = 100),
      "lookup_cost_model" -> lookupCostSql(
        Queries.lookupLayoutStats(spark, dir).collect()
          .map(r => (r.getAs[String]("layout"), r.getAs[Long]("mn"),
            r.getAs[Long]("mx"), r.getAs[Long]("cnt"))).toSeq.sorted,
        Queries.lookupProbeIds),
      "pq_distortion" -> pqDistortionSql(pqBooks),
      "pq_code_entropy" -> pqCodeEntropySql(pqBooks),
      "embedding_outliers" -> embeddingOutliersSql(centroids),
      "ann_ivf_imbalance" -> ivfImbalanceSql(centroids),
      "ann_pq_recall_curve" -> pqRecallCurveSql(pqBooks, queryId = 5L, k = 10,
        reranks = Seq(10, 25, 50, 100, 500)),
      "ann_ivfpq" -> ivfpqSql(centroids, pqBooks, queryId = 6L, k = 10, nprobe = 4, rerank = 100),
      // persisted codes must not change the answer, only what gets read
      "ann_pq_persisted" -> pqSql(pqBooks, queryId = 8L, k = 10, rerank = 100),
      "ann_ivf" -> ivfSql(centroids, queryId = 2L, k = 10, nprobe = 4),
      // the two-level routed quantizer: both levels spliced as literals
      // (fixed K = 64 keeps the fine table a bounded literal), the full
      // coarse->fine route re-derived in SQL
      "ann_ivf_routed" -> {
        val rq = operators.RoutedQuantizer.fitCached(emb, "embedding", k = 64)
        val fineLit = rq.fine.orderBy("cluster").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray)).toSeq
        routedIvfSql(rq.coarse, fineLit, queryId = 7L, k = 10, coarseProbe = 4, nprobe = 8)
      },
      "knn_batch_ivf_routed" -> {
        val rq = operators.RoutedQuantizer.fitCached(emb, "embedding", k = 64)
        val fineLit = rq.fine.orderBy("cluster").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray)).toSeq
        routedBatchIvfSql(rq.coarse, fineLit, k = 5, coarseProbe = 3, nprobe = 6)
      },
      // identical parameters to ann_ivf — the persisted layout must not
      // change the answer, only where the pruning happens (file listing).
      "ann_ivf_persisted" -> ivfSql(centroids, queryId = 2L, k = 10, nprobe = 4),
      "knn_batch_ivf" -> batchIvfSql(centroids, k = 5, nprobe = 4),
      // same kernel with the label filter on the BASE side only — the
      // queries stay unfiltered, exactly like the Spark plan
      "filtered_knn_batch" -> batchIvfSql(centroids, k = 5, nprobe = 4,
        andWhere = " AND e.label = 2"),
      // the graph build scales K with n (fitScaled) — splice THOSE centroids
      "knn_join_ivf" -> knnJoinSql(scaledCents, k = 3),
      "knn_hubness" -> knnHubnessSql(scaledCents, k = 3),
      "knn_mutual" -> knnMutualSql(scaledCents, k = 3),
      "knn_components" -> knnComponentsSql(scaledCents, k = 3),
      "knn_label_consistency" -> knnLabelConsistencySql(scaledCents, k = 3),
      "ann_cost_model" -> annCostModelSql(centroids, planes, ivfQ = 2L, lshQ = 3L,
        nprobe = 4, radius = 1, rerank = 100),
      "knn_graph_recall" -> graphRecallSql(scaledCents, k = 3),
      // the serving walk runs over the SAME scaled-centroid graph
      "ann_graph" -> graphBeamSql(scaledCents, queryId = 13L,
        graphK = 16, beam = 8, hops = 3, k = 10),
      // routed hop 0: route centroids read from the artifact (fit over
      // its own medoid entries at build), spliced as literals
      "ann_graph_routed" -> {
        val routeCents = operators.IvfIndex.readCentroids(spark,
          s"${Queries.graphServePath(spark, dir)}/route")
        routedGraphBeamSql(scaledCents, routeCents, queryId = 13L, graphK = 16,
          beam = 8, hops = 3, k = 10, routeProbe = 2)
      },
      "ann_graph_recall_curve" -> graphBeamCurveSql(scaledCents, queryId = 13L,
        graphK = 16, beam = 8, hops = 3),
      "ann_graph_beam_curve" -> graphBeamKnobCurveSql(scaledCents, queryId = 13L,
        graphK = 16, beams = Seq(2, 4, 8, 16, 32), hops = 3),
      "ann_graph_degree_curve" -> graphDegreeKnobCurveSql(scaledCents, queryId = 13L,
        degrees = Seq(3, 8, 16, 32), beam = 8, hops = 3),
      "ann_graph_degree_beam_grid" -> graphDegreeBeamGridSql(scaledCents, queryId = 13L,
        degrees = Seq(3, 16, 32), beams = Seq(2, 8, 32), hops = 3),
      // predicates + comp/adapt beams from the ONE shared helper, so
      // both engines walk the identical beam set (the adaptive beam is
      // clamp(ceil(8/sel), 8, 64) from the measured selectivity)
      "filtered_ann_graph_walk" -> graphFilteredWalkSql(scaledCents, queryId = 13L,
        graphK = 16, hops = 3,
        preds = Queries.filteredWalkPreds(spark, dir)
          .map(t => (t._1, t._3, t._4, t._5))),
      "filtered_ann_graph" -> graphBeamSql(scaledCentsFlt, queryId = 13L,
        graphK = 16, beam = 8, hops = 3, k = 10, where = " WHERE e.label = 2"),
      "filtered_knn_batch_graph" -> graphBeamBatchSql(scaledCentsFlt,
        graphK = 16, beam = 8, hops = 3, k = 5, where = " WHERE e.label = 2"),
      "knn_batch_graph" -> graphBeamBatchSql(scaledCents,
        graphK = 16, beam = 8, hops = 3, k = 5),
      // the PRODUCTION batch walk with the entry route held ON — the
      // hash gate on the routed hop 0 (per-query route cells + medoid
      // route cells re-derived from the artifact's spliced route
      // literals); the auto-switched path executes exactly this above
      // the entry-count threshold
      "knn_batch_graph_routed" -> {
        val routeCents = operators.IvfIndex.readCentroids(spark,
          s"${Queries.graphServePath(spark, dir)}/route")
        graphBeamBatchSql(scaledCents, graphK = 16, beam = 8, hops = 3, k = 5,
          route = Some((routeCents, operators.GraphAnn.RouteProbe)))
      },
      // FILTER × ROUTE composed: the filtered artifact's OWN route
      // literals (fit over the filtered medoids at build) gate hop 0,
      // every other CTE carries the label predicate — the composed
      // filtered-batch plan the big-E regime executes, at oracle scale
      "filtered_knn_batch_graph_routed" -> {
        val routeCentsFlt = operators.IvfIndex.readCentroids(spark,
          s"${Queries.filteredGraphServePath(spark, dir)}/route")
        graphBeamBatchSql(scaledCentsFlt, graphK = 16, beam = 8, hops = 3, k = 5,
          where = " WHERE e.label = 2",
          route = Some((routeCentsFlt, operators.GraphAnn.RouteProbe)))
      },
      // the MUTATED maintained lifecycle: centroids read from the
      // artifact the facade save froze; the oracle replays the whole
      // verb chain (insert/upsert/delete + edges/tombstones/heals/
      // re-links) from them — see mutatedGraphBeamSql
      "ann_graph_mutated" -> {
        val base = Queries.mutatedGraphPath(spark, dir)
        val mcents = operators.IvfIndex.readCentroids(spark, s"$base/centroids")
        mutatedGraphBeamSql(mcents, Queries.graphMutInsertId,
          Queries.graphMutInsertSrc, Queries.graphMutUpserts,
          Queries.graphMutDeletes,
          queryId = 13L, graphK = 16, beam = 8, hops = 3, k = 10)
      },
      // per-phase walk cost profile over the standing serving artifact
      "ann_graph_cost_model" -> {
        val routeCents = operators.IvfIndex.readCentroids(spark,
          s"${Queries.graphServePath(spark, dir)}/route")
        graphCostModelSql(scaledCents, routeCents, queryId = 13L,
          graphK = 16, beam = 8, hops = 3,
          routeProbe = operators.GraphAnn.RouteProbe)
      },
      // frozen-route recall watchdog at routeProbe 1/2/4
      "ann_graph_route_health" -> {
        val routeCents = operators.IvfIndex.readCentroids(spark,
          s"${Queries.graphServePath(spark, dir)}/route")
        routeHealthSql(scaledCents, routeCents, Seq(1, 2, 4))
      },
      // the ROUTED-QUANTIZER builder branch forced to oracle scale: the
      // quantizer tables come from the artifact itself (buildServingRouted
      // persists them — distributed Lloyd means are not bit-stable
      // across sessions), both levels splice as literals
      "ann_graph_routed_forced" -> {
        val base = Queries.routedForcedServePath(spark, dir)
        val rq = operators.RoutedQuantizer.read(spark, s"$base/quantizer")
        val fineLit = rq.fine.orderBy("cluster").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray)).toSeq
        routedForcedGraphBeamSql(rq.coarse, fineLit, queryId = 13L, graphK = 16,
          beam = 8, hops = 3, k = 10)
      },
      "dedup_semantic" -> semanticSql(scaledCents, minCosine = 0.35),
      "ann_recall_eval" -> recallEvalSql(centroids, queryId = 4L, k = 10, nprobe = 4),
      "vector_silhouette" -> silhouetteSql(centroids),
      "ann_recall_curve" -> recallCurveSql(centroids, queryId = 4L, k = 10,
        nprobes = Seq(1, 2, 4, 8, 16)),
      "ann_tradeoff_table" -> annTradeoffSql(centroids, queryId = 4L, k = 10,
        nprobes = Seq(1, 2, 4, 8, 16)),
      "vector_cluster_purity" -> vectorClusterPuritySql(centroids),
      "ann_lsh" -> lshSql(planes, queryId = 3L, k = 10, radius = 1),
      "ann_lsh_recall_curve" -> lshRecallCurveSql(planes, queryId = 3L, k = 10,
        radii = Seq(0, 1, 2, 3, 4)),
      // the reference's filtered ANN search (hnsw_index.rs
      // search_vectors_filter): same centroids, label predicate ANDed
      // into the pruned scan — filter and probe compose.
      "filtered_ann_ivf" -> ivfSql(centroids, queryId = 12L, k = 10, nprobe = 4,
        andWhere = " AND e.label = 2"),
      // identical parameters to filtered_ann_ivf — the persisted layout
      // must not change the answer, only where the pruning happens
      // (partition listing ∩ pushed label filter).
      "filtered_ann_ivf_persisted" -> ivfSql(centroids, queryId = 12L, k = 10, nprobe = 4,
        andWhere = " AND e.label = 2"),
      // rerank ladders end at rerank = n (every candidate survives ⇒
      // provably recall 1.0); n re-derived identically on both sides.
      "ann_sq8_rerank_curve" -> sqRerankCurveSql(queryId = 9L, k = 10,
        reranks = Seq(10, 25, 50, 100, emb.count().toInt)),
      "ann_binary_rerank_curve" -> binaryRerankCurveSql(queryId = 11L, k = 10,
        reranks = Seq(10, 25, 50, 100, emb.count().toInt)),
      "dedup_embedding" -> embeddingLshSql(dedupPlanes, minCosine = 0.35),
      "dedup_embedding_threshold_curve" -> embeddingThresholdCurveSql(dedupPlanes,
        thresholds = Seq(0.2, 0.35, 0.5, 0.65, 0.8)))
  }

  val sql: Map[String, String] = Map(

    // ================= A. vector-DB core =================

    "knn_flat_l2" -> knnSql(l2("e.embedding", "q.qv"), "score", "", 0, 10),

    "knn_flat_ip" -> knnSql(s"-(${dot("e.embedding", "q.qv")})", "-score", "", 0, 10),

    "knn_cosine" -> knnSql(s"-(${cosine("e.embedding", "q.qv")})", "-score", "", 0, 10),

    "knn_batch" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
         |d AS (SELECT q.q_id, e.vec_id AS n_id, ${l2("e.embedding", "q.qv")} AS score
         |      FROM embeddings e, q)
         |SELECT q_id,
         |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) AS INT) AS rank,
         |       n_id, (round((score) * 10000.0) / 10000.0) AS value
         |FROM d QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // IVF with nprobe=K probes every cluster ⇒ exact brute force.
    "ann_ivf_exact" -> knnSql(l2("e.embedding", "q.qv"), "score", "", 2, 10),

    // SQ8: per-dim [min,max] bounds re-derived from the data
    // (order-independent aggregates), quantize-reconstruct-score per
    // vector with the identical clamp/floor/affine double arithmetic in
    // ascending dimension order, sequential list_sum.
    "ann_sq8" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 9),
        |mm AS (SELECT dd.range AS i, min(CAST(e.embedding[dd.range] AS DOUBLE)) AS mn,
        |              max(CAST(e.embedding[dd.range] AS DOUBLE)) AS mx
        |       FROM embeddings e CROSS JOIN range(1, 65) dd GROUP BY dd.range),
        |mma AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM mm),
        |d AS (SELECT e.vec_id AS id,
        |  list_sum(list_transform(
        |    list_transform(range(1, 65), i ->
        |      CAST(q.qv[i] AS DOUBLE) - (CASE WHEN mma.mxs[i] > mma.mns[i]
        |        THEN mma.mns[i] + least(greatest(floor((CAST(e.embedding[i] AS DOUBLE) - mma.mns[i])
        |               / (mma.mxs[i] - mma.mns[i]) * 255.0 + 0.5), 0.0), 255.0) / 255.0 * (mma.mxs[i] - mma.mns[i])
        |        ELSE mma.mns[i] END)),
        |    v -> v * v)) AS score
        |  FROM embeddings e, q, mma)
        |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
        |       (round((sqrt(score)) * 10000.0) / 10000.0) AS value
        |FROM d ORDER BY score, id LIMIT 10""".stripMargin,

    // binary (sign-bit) index: sign words re-derived from the data with
    // the identical bit packing, hamming candidate cut at 100 (exact
    // integer, id tie-break), exact L2 re-rank — no parameter literals.
    "ann_binary" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
         |qw AS (SELECT
         |  CAST(list_sum(list_transform(range(1, 33), i -> CASE WHEN qv[i] > 0 THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END)) AS BIGINT) AS q0,
         |  CAST(list_sum(list_transform(range(33, 65), i -> CASE WHEN qv[i] > 0 THEN 1::BIGINT << (i - 33) ELSE 0::BIGINT END)) AS BIGINT) AS q1
         |  FROM q),
         |w AS (SELECT vec_id AS id,
         |  CAST(list_sum(list_transform(range(1, 33), i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END)) AS BIGINT) AS w0,
         |  CAST(list_sum(list_transform(range(33, 65), i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT << (i - 33) ELSE 0::BIGINT END)) AS BIGINT) AS w1
         |  FROM embeddings),
         |cand AS (SELECT id FROM w, qw
         |         ORDER BY bit_count(xor(w0, q0)) + bit_count(xor(w1, q1)), id LIMIT 100),
         |d AS (SELECT e.vec_id AS id, ${l2("e.embedding", "q.qv")} AS score
         |      FROM embeddings e JOIN cand ON cand.id = e.vec_id, q)
         |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
         |       (round((score) * 10000.0) / 10000.0) AS value
         |FROM d ORDER BY score, id LIMIT 10""".stripMargin,

    "filtered_knn_eq" -> knnSql(l2("e.embedding", "q.qv"), "score", "WHERE e.label = 3", 1, 10),

    "filtered_knn_ne" -> knnSql(l2("e.embedding", "q.qv"), "score", "WHERE e.label <> 3", 1, 10),

    // radius search: data-dependent cardinality, unrounded filter on both
    // engines (identical sequential double arithmetic), rounded output.
    "knn_range" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 4),
         |d AS (SELECT e.vec_id AS id, ${l2("e.embedding", "q.qv")} AS score FROM embeddings e, q)
         |SELECT id, (round((score) * 10000.0) / 10000.0) AS value
         |FROM d WHERE score <= 1.25 ORDER BY score, id""".stripMargin,

    // CDC fold: per key the highest (ver, op, payload) change wins;
    // surviving 'D' rows tombstone; unchanged base rows pass through.
    "cdc_apply" ->
      """WITH ch AS (
        |  SELECT vec_id, 1 AS ver, 'U' AS op, label + 50 AS label FROM embeddings WHERE vec_id % 10 = 0
        |  UNION ALL SELECT vec_id, 2, 'U', label + 60 FROM embeddings WHERE vec_id % 20 = 0
        |  UNION ALL SELECT vec_id, 3, 'D', -1 FROM embeddings WHERE vec_id % 30 = 0
        |  UNION ALL SELECT vec_id + 2000000, 1, 'I', -7 FROM embeddings WHERE vec_id % 97 = 0),
        |latest AS (SELECT vec_id, op, label FROM ch
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ver DESC, op DESC, label DESC) = 1)
        |SELECT e.vec_id, e.label FROM embeddings e
        |WHERE e.vec_id NOT IN (SELECT vec_id FROM latest)
        |UNION ALL SELECT vec_id, label FROM latest WHERE op <> 'D'
        |ORDER BY vec_id""".stripMargin,

    // per-(label, dim) exact 1e-6-fixed component sums, one division.
    "vector_centroids" ->
      """SELECT label, dd.range - 1 AS d, count(*) AS n,
        |  (round((CAST(sum(CAST(floor(CAST(embedding[dd.range] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
        |          / (count(*) * 1000000.0)) * 10000.0) / 10000.0) AS mean
        |FROM embeddings CROSS JOIN range(1, 65) dd
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // exact centroid separation: integer cross-multiplied numerators
    // (HUGEINT sums), one sqrt + one division at the end.
    "vector_centroid_dist" ->
      """WITH c AS (SELECT label, dd.range - 1 AS d, count(*) AS n,
        |        CAST(sum(CAST(floor(CAST(embedding[dd.range] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s6
        |      FROM embeddings CROSS JOIN range(1, 65) dd GROUP BY 1, 2),
        |p AS (SELECT a.label AS label_a, b.label AS label_b, max(a.n) AS na, max(b.n) AS nb,
        |        sum(CAST(a.s6 * b.n - b.s6 * a.n AS HUGEINT) * CAST(a.s6 * b.n - b.s6 * a.n AS HUGEINT)) AS num
        |      FROM c a JOIN c b ON a.d = b.d AND a.label < b.label
        |      GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |  (round((sqrt(CAST(num AS DOUBLE)) / (na * nb * 1000000.0)) * 10000.0) / 10000.0) AS dist
        |FROM p ORDER BY label_a, label_b""".stripMargin,

    // per-label top-2 by (distance, id) — identical sequential double
    // arithmetic, rank within group.
    "knn_per_label" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 13),
         |d AS (SELECT e.label, e.vec_id AS id, ${l2("e.embedding", "q.qv")} AS score
         |      FROM embeddings e, q)
         |SELECT label,
         |       CAST(row_number() OVER (PARTITION BY label ORDER BY score, id) AS INT) AS rank,
         |       id, (round((score) * 10000.0) / 10000.0) AS value
         |FROM d QUALIFY rank <= 2 ORDER BY label, rank""".stripMargin,

    "upsert" ->
      """WITH upd AS (
        |  SELECT vec_id, label + 100 AS label FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, -1 AS label FROM embeddings WHERE vec_id % 97 = 0)
        |SELECT vec_id, label FROM upd
        |UNION ALL
        |SELECT e.vec_id, e.label FROM embeddings e ANTI JOIN upd u ON e.vec_id = u.vec_id
        |ORDER BY vec_id""".stripMargin,

    "delete_ids" ->
      "SELECT vec_id, label FROM embeddings WHERE vec_id % 13 <> 0 ORDER BY vec_id",

    // Delete twin on the PERSISTED layouts: both legs are exactness-mode
    // (nprobe = K / rerank >= n => brute force over survivors), so the
    // oracle is plain k-NN over vec_id NOT IN (0, 59) — id 0 is the
    // query's own vector, rank 1 at distance 0 without the delete.
    "delete_persisted" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id AS id, ${l2("e.embedding", "q.qv")} AS score
         |      FROM embeddings e, q WHERE e.vec_id NOT IN (0, 59)),
         |top AS (SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
         |        (round((score) * 10000.0) / 10000.0) AS value
         |        FROM d ORDER BY score, id LIMIT 10)
         |SELECT 'ivf' AS backend, rank, id, value FROM top
         |UNION ALL SELECT 'pq' AS backend, rank, id, value FROM top
         |ORDER BY backend, rank""".stripMargin,

    "query_by_id" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = 42",

    "filter_index_build" ->
      """SELECT label AS value, count(*) AS cnt, min(vec_id) AS min_id,
        |       max(vec_id) AS max_id, CAST(sum(vec_id) AS BIGINT) AS id_sum
        |FROM embeddings GROUP BY label ORDER BY value""".stripMargin,

    "index_stats" ->
      s"""WITH x AS (SELECT CAST(len(embedding) AS INT) AS dim, ${norm("embedding")} AS nrm FROM embeddings)
         |SELECT dim, count(*) AS n, (round((avg(nrm)) * 10000.0) / 10000.0) AS avg_norm,
         |       (round((min(nrm)) * 10000.0) / 10000.0) AS min_norm, (round((max(nrm)) * 10000.0) / 10000.0) AS max_norm
         |FROM x GROUP BY dim ORDER BY dim""".stripMargin,

    // text-index stats re-derived from raw text (the Spark side reads
    // the materialized postings; values must agree exactly).
    "text_index_stats" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |l AS (SELECT doc_id, len(toks) AS dl FROM t),
         |p AS (SELECT w AS term, doc_id, CAST(count(*) AS BIGINT) AS tf
         |      FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY w, doc_id),
         |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term),
         |ps AS (SELECT CAST(count(*) AS BIGINT) AS n_postings, CAST(sum(tf) AS BIGINT) AS n_tokens FROM p),
         |vs AS (SELECT CAST(count(*) AS BIGINT) AS n_terms, CAST(max(df) AS BIGINT) AS max_df FROM d),
         |ds AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM l)
         |SELECT ds.n_docs, vs.n_terms, ps.n_postings, ps.n_tokens, vs.max_df,
         |  (round((CAST(ps.n_postings AS DOUBLE) / CAST(ds.n_docs AS DOUBLE)) * 10000.0) / 10000.0) AS postings_per_doc,
         |  (round((CAST(ds.sum_dl AS DOUBLE) / CAST(ds.n_docs AS DOUBLE)) * 10000.0) / 10000.0) AS avg_dl
         |FROM ds, ps, vs""".stripMargin,

    // ================= B. deduplication =================

    "dedup_exact" ->
      "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n FROM documents GROUP BY 1 ORDER BY keep_id",

    "dedup_minhash" ->
      s"""WITH $minhashCtes
         |SELECT a_id, b_id, (round((e) * 10000.0) / 10000.0) AS est_sim FROM est WHERE e >= 0.25 ORDER BY a_id, b_id""".stripMargin,

    // dedup threshold curve: conditional counts over the same minhash
    // pair legs; cuts compare the ROUNDED estimate like the Spark side
    // (1/32-multiple estimates never knife-edge the 0.4/0.6/0.8 cuts).
    "dedup_threshold_curve" ->
      s"""WITH $minhashCtes
         |SELECT count(*) FILTER (WHERE e >= 0.25) AS n_025,
         |  count(*) FILTER (WHERE e >= 0.25 AND (round((e) * 10000.0) / 10000.0) >= 0.4) AS n_040,
         |  count(*) FILTER (WHERE e >= 0.25 AND (round((e) * 10000.0) / 10000.0) >= 0.6) AS n_060,
         |  count(*) FILTER (WHERE e >= 0.25 AND (round((e) * 10000.0) / 10000.0) >= 0.8) AS n_080
         |FROM est""".stripMargin,

    // near-dup pairs rolled up by unordered source pair (least/greatest
    // canonicalization) — same minhash legs as dedup_minhash.
    "dedup_cross_source" ->
      s"""WITH $minhashCtes,
         |pairs AS (SELECT a_id, b_id FROM est WHERE e >= 0.25),
         |j AS (SELECT least(da.source, db.source) AS source_a,
         |        greatest(da.source, db.source) AS source_b
         |      FROM pairs p JOIN documents da ON p.a_id = da.doc_id
         |      JOIN documents db ON p.b_id = db.doc_id)
         |SELECT source_a, source_b, count(*) AS n_pairs
         |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Contrastive triplets: minhash positives + hash-arithmetic
    // negative draw stepped past collisions (doc_ids dense 0..n-1).
    "corpus_contrastive_pairs" ->
      s"""WITH $minhashCtes,
         |nn AS (SELECT count(*) AS n_docs FROM documents),
         |p AS (SELECT a_id, b_id, (round((e) * 10000.0) / 10000.0) AS est_sim FROM est WHERE e >= 0.5),
         |h AS (SELECT a_id, b_id, est_sim,
         |        ${tokenHash60("'neg:' || CAST(a_id AS VARCHAR) || ':' || CAST(b_id AS VARCHAR)")} % n_docs AS h0,
         |        n_docs FROM p, nn)
         |SELECT a_id AS anchor_id, b_id AS pos_id,
         |  CASE WHEN h0 <> a_id AND h0 <> b_id THEN h0
         |       WHEN (h0 + 1) % n_docs <> a_id AND (h0 + 1) % n_docs <> b_id THEN (h0 + 1) % n_docs
         |       ELSE (h0 + 2) % n_docs END AS neg_id,
         |  est_sim
         |FROM h ORDER BY anchor_id, pos_id""".stripMargin,

    // Zipf coverage: rank/cumsum over the vocabulary table only;
    // coverages from exact long sums, one division each.
    "corpus_zipf_coverage" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
         |w0 AS (SELECT unnest(toks) AS word FROM t),
         |wc AS (SELECT word, count(*) AS n FROM w0 GROUP BY 1),
         |rk AS (SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS r,
         |         sum(n) OVER (ORDER BY n DESC, word ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |       FROM wc),
         |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot, count(*) AS n_vocab FROM wc)
         |SELECT max(tt.n_vocab) AS n_vocab, max(tt.tot) AS n_tokens,
         |  (round((CAST(max(CASE WHEN r <= 1 THEN cum END) AS DOUBLE) / max(tt.tot)) * 1000000.0) / 1000000.0) AS cov_1,
         |  (round((CAST(max(CASE WHEN r <= 10 THEN cum END) AS DOUBLE) / max(tt.tot)) * 1000000.0) / 1000000.0) AS cov_10,
         |  (round((CAST(max(CASE WHEN r <= 100 THEN cum END) AS DOUBLE) / max(tt.tot)) * 1000000.0) / 1000000.0) AS cov_100,
         |  (round((CAST(max(CASE WHEN r <= 1000 THEN cum END) AS DOUBLE) / max(tt.tot)) * 1000000.0) / 1000000.0) AS cov_1000
         |FROM rk, tt""".stripMargin,

    // graph cohesion of the near-dup pairs: the oracle counts triangles
    // by the independent a<b<c three-way join (no orientation), wedges
    // from exact degree sums.
    "dedup_graph_stats" ->
      s"""WITH $minhashCtes,
         |edges AS (SELECT a_id AS x, b_id AS y FROM est WHERE e >= 0.25),
         |deg AS (SELECT v, count(*) AS d FROM
         |          (SELECT x AS v FROM edges UNION ALL SELECT y FROM edges) GROUP BY v),
         |ns AS (SELECT count(*) AS n_nodes,
         |         CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
         |ne AS (SELECT count(*) AS n_edges FROM edges),
         |tri AS (SELECT count(*) AS n_triangles FROM edges e1
         |        JOIN edges e2 ON e2.x = e1.y
         |        JOIN edges e3 ON e3.x = e1.x AND e3.y = e2.y)
         |SELECT n_nodes, n_edges, n_wedges, n_triangles,
         |  CASE WHEN n_wedges = 0 THEN 0.0
         |       ELSE (round((3.0 * n_triangles / n_wedges) * 10000.0) / 10000.0) END AS global_cc
         |FROM ns, ne, tri""".stripMargin,

    // Duplicate-cluster canonicalization: transitive closure of the
    // est >= 0.5 minhash pairs (recursive CTE), min id per component.
    "dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
         |pairs AS (SELECT a_id, b_id FROM est WHERE e >= 0.5),
         |edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
         |canon AS (SELECT u AS id, least(u, min(v)) AS canonical FROM reach GROUP BY u)
         |SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS canonical_id,
         |       (coalesce(c.canonical, d.doc_id) <> d.doc_id) AS is_dup
         |FROM documents d LEFT JOIN canon c ON c.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // batch×corpus only: the doc_id % 10 = 0 slice is the "incoming
    // batch"; same signature chain as dedup_minhash.
    "dedup_incremental" ->
      s"""WITH $minhashSigCtes,
         |cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
         |         WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
         |est AS (SELECT new_id, old_id,
         |          list_sum(list_transform(range(1, 33), i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 32.0 AS e
         |        FROM cand JOIN sig sa ON sa.doc_id = new_id JOIN sig sb ON sb.doc_id = old_id)
         |SELECT new_id, old_id, (round((e) * 10000.0) / 10000.0) AS est_sim
         |FROM est WHERE e >= 0.5 ORDER BY new_id, old_id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |hs AS (SELECT doc_id, list_transform(toks, t -> ${tokenHash60("t")}) AS hs FROM t),
         |sg AS (SELECT doc_id, list_sum(list_transform(range(0, 60), j ->
         |         CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |              THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS sig
         |       FROM hs),
         |bands AS (SELECT doc_id, sig, r.range AS band, (sig >> (r.range * 15)) & 32767 AS band_key
         |          FROM sg, range(0, 4) r),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |hm AS (SELECT a_id, b_id, bit_count(xor(sa.sig, sb.sig)) AS hamming
         |       FROM cand JOIN sg sa ON sa.doc_id = a_id JOIN sg sb ON sb.doc_id = b_id)
         |SELECT a_id, b_id, hamming FROM hm WHERE hamming <= 8 ORDER BY a_id, b_id""".stripMargin,

    // block key = min 8-gram hash among grams with df <= 100 (the
    // rare-gram cap): |block| <= df <= 100 by construction — mirrors
    // Dedup.ngramJaccardPairsRareBlocked. Gram hash is the winnow
    // polynomial (base-31 mod 1e9+7 over code points, CharShinglePoly).
    "dedup_ngram_jaccard" ->
      """WITH g0 AS (SELECT doc_id,
        |  CASE WHEN len(text) < 8 THEN [] ELSE
        |    list_transform(range(1, len(text) - 6), i ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(0, 8), j -> CAST(ascii(substr(text, CAST(i + j AS INT), 1)) AS BIGINT))),
        |        (a, c) -> (a * 31 + c) % 1000000007)) END AS gh
        |  FROM documents),
        |g AS (SELECT doc_id, list_distinct(gh) AS g FROM g0),
        |ex AS (SELECT doc_id, unnest(g) AS gh FROM g),
        |rare AS (SELECT gh FROM ex GROUP BY gh HAVING count(*) <= 100),
        |blks AS (SELECT doc_id, min(gh) AS blk FROM ex JOIN rare USING (gh) GROUP BY doc_id),
        |gb AS (SELECT g.doc_id, g.g, blks.blk FROM g JOIN blks ON g.doc_id = blks.doc_id),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |        CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
        |        CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE) AS j
        |      FROM gb a JOIN gb b ON a.blk = b.blk AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, (round((j) * 10000.0) / 10000.0) AS jaccard FROM p WHERE j >= 0.65 ORDER BY a_id, b_id""".stripMargin,

    // df-ordered prefix filtering: a pair with J >= 13/20 must share a
    // token within each side's first sz - ceil(13*sz/20) + 1 under the
    // global (df, hash) order; prefix lengths in exact integer math.
    "dedup_jaccard_prefix" ->
      s"""SELECT a_id, b_id, (round((j) * 10000.0) / 10000.0) AS jaccard
         |FROM $jaccardPairsSelect jp ORDER BY a_id, b_id""".stripMargin,

    // precision/recall of the minhash sketch (est ≥ 0.65) against the
    // PROVABLY-complete prefix-filter jaccard pairs at the same
    // threshold — both sides re-derived independently, composed via
    // subquery-scoped WITH blocks; counts exact, two long divisions.
    "dedup_recall_eval" ->
      s"""WITH truth AS (SELECT a_id, b_id FROM $jaccardPairsSelect jp),
         |sketch AS (SELECT a_id, b_id FROM
         |  (WITH $minhashCtes SELECT a_id, b_id FROM est WHERE e >= 0.65) ms),
         |tc AS (SELECT count(*) AS n_truth FROM truth),
         |sc AS (SELECT count(*) AS n_sketch FROM sketch),
         |hc AS (SELECT count(*) AS n_hit FROM truth JOIN sketch USING (a_id, b_id))
         |SELECT n_truth, n_sketch, n_hit,
         |  (round((n_hit / n_truth) * 10000.0) / 10000.0) AS recall,
         |  (round((n_hit / n_sketch) * 10000.0) / 10000.0) AS prec
         |FROM tc, sc, hc""".stripMargin,

    // exact duplicated 8-word spans: the oracle rebuilds every span from
    // the same token stream and the comparison is exact strings and
    // exact counts throughout.
    "dedup_spans" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN [] ELSE
         |         list_transform(range(1, len(toks) - 6), i ->
         |           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
         |           || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]) END AS sh
         |       FROM t),
         |s AS (SELECT doc_id, unnest(sh) AS span FROM sh)
         |SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
         |FROM s GROUP BY span HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, n_occ DESC, span LIMIT 50""".stripMargin,

    // span scrub: same spans, same min-doc ownership; the kept token
    // stream is rebuilt with an ORDER BY-qualified string_agg so the
    // reconstructed text is exact, not order-lucky.
    "corpus_span_scrub" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(toks) < 8 THEN [] ELSE
         |         list_transform(range(1, len(toks) - 6), i ->
         |           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
         |           || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]) END AS sh
         |       FROM t),
         |occ0 AS (SELECT doc_id, unnest(list_transform(range(0, len(sh)),
         |           i -> {'pos': i, 'span': sh[CAST(i + 1 AS INT)]})) AS u FROM sh),
         |occ AS (SELECT doc_id, u.pos AS pos, u.span AS span FROM occ0),
         |own AS (SELECT span, min(doc_id) AS keeper FROM occ GROUP BY span),
         |cov AS (SELECT DISTINCT o.doc_id, o.pos + r.range AS cpos
         |        FROM occ o JOIN own USING (span), range(0, 8) r
         |        WHERE o.doc_id > own.keeper),
         |tp0 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks)),
         |          i -> {'tpos': i, 'tok': toks[CAST(i + 1 AS INT)]})) AS u FROM t),
         |tp AS (SELECT doc_id, u.tpos AS tpos, u.tok AS tok FROM tp0),
         |kept AS (SELECT tp.doc_id, count(*) AS n_tok_kept,
         |           string_agg(tp.tok, ' ' ORDER BY tp.tpos) AS kept_text
         |         FROM tp WHERE NOT EXISTS (SELECT 1 FROM cov c
         |           WHERE c.doc_id = tp.doc_id AND c.cpos = tp.tpos)
         |         GROUP BY tp.doc_id)
         |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tok_in,
         |  CAST(coalesce(k.n_tok_kept, 0) AS BIGINT) AS n_tok_kept,
         |  coalesce(k.kept_text, '') AS kept_text
         |FROM t LEFT JOIN kept k USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // winnowing (k=8, w=4): gram hashes re-derived with the identical
    // base-31 mod-1e9+7 polynomial over the normalized chars, window
    // minima, per-doc distinct, df-capped posting join — all integers.
    "dedup_winnow" ->
      """WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s FROM documents),
        |g AS (SELECT doc_id, list_transform(range(1, len(s) - 6), i ->
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(range(0, 8), j -> CAST(ascii(substr(s, CAST(i + j AS INT), 1)) AS BIGINT))),
        |          (a, c) -> (a * 31 + c) % 1000000007)) AS gh
        |      FROM n WHERE len(s) >= 8),
        |m AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(1, len(gh) - 3) + 1),
        |        j -> list_min(list_slice(gh, CAST(j AS INT), CAST(j + 3 AS INT))))) AS fps FROM g),
        |f AS (SELECT doc_id, unnest(fps) AS fp FROM m),
        |kept AS (SELECT fp FROM f GROUP BY fp HAVING count(*) >= 2 AND count(*) <= 20),
        |fk AS (SELECT f.doc_id, f.fp FROM f JOIN kept USING (fp))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
        |FROM fk a JOIN fk b USING (fp)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 5
        |ORDER BY 1, 2""".stripMargin,

    // ================= C. text analysis =================

    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |c AS (SELECT doc_id, ${stopCount(stopEn)} AS n_en, ${stopCount(stopDe)} AS n_de,
         |        ${stopCount(stopFr)} AS n_fr, ${stopCount(stopEs)} AS n_es FROM t)
         |SELECT doc_id,
         |  CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0 THEN 'und'
         |       WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
         |       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
         |       WHEN n_fr >= n_es THEN 'fr'
         |       ELSE 'es' END AS lang_pred,
         |  n_en, n_de, n_fr, n_es
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
         |x AS (SELECT doc_id, text, toks, len(toks) AS n_tok, ${stopCount(stopEn)} AS n_stop FROM t),
         |y AS (SELECT doc_id, n_tok,
         |  CASE WHEN n_tok = 0 THEN 0.0 ELSE
         |    CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS ml,
         |  CASE WHEN len(text) = 0 THEN 0.0 ELSE
         |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / CAST(len(text) AS DOUBLE) END AS pr,
         |  CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS sr
         |  FROM x)
         |SELECT doc_id, n_tok, (round((ml) * 10000.0) / 10000.0) AS mean_len,
         |  (round((CASE WHEN n_tok = 0 THEN 0.0 ELSE
         |    0.25 * least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) +
         |    0.25 * greatest(0.0, 1.0 - abs(ml - 5.0) / 5.0) +
         |    0.25 * least(sr * 5.0, 1.0) +
         |    0.25 * (1.0 - least(pr * 10.0, 1.0)) END) * 10000.0) / 10000.0) AS score
         |FROM y ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN len(text) = 0 THEN CAST(0 AS BIGINT) ELSE
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, len(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) END AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "bm25_topk" ->
      s"""WITH ${bm25Ctes(10)}
         |SELECT rank, doc_id, (round((s6 / 1000000.0) * 10000.0) / 10000.0) AS score
         |FROM bm ORDER BY rank""".stripMargin,

    // The MUTATED text index (Queries.mutatedTextPath: append + upsert +
    // delete through the facade verbs): BM25 re-derived over the MERGED
    // latest-wins corpus — documents minus the deleted ids, the
    // upserted docs' texts REPLACED, the appended doc added. doc 7 is
    // upserted at gen 2 and deleted at gen 3, so its replacement rows
    // must die too (tombstone layering); doc 3's gen-2 rows must
    // outlive its gen-1 tombstone. N, avgdl, df, tf all shift with the
    // merge — a resurrected generation or half-applied publish lands on
    // different stats and goes hash-red.
    "bm25_topk_mutated" -> {
      val gone = (Queries.bm25MutDeletes ++
        Queries.bm25MutUpserts.map(_._1)).distinct.sorted.mkString(", ")
      val added = (Queries.bm25MutUpserts.filterNot(u =>
          Queries.bm25MutDeletes.contains(u._1))
        ++ Seq(Queries.bm25MutAppendId -> Queries.bm25MutAppendText))
        .map { case (id, text) =>
          s"SELECT CAST($id AS BIGINT) AS doc_id, '${text}' AS text" }
        .mkString("\n         UNION ALL ")
      s"""WITH docm AS (SELECT doc_id, text FROM documents WHERE doc_id NOT IN ($gone)
         |         UNION ALL $added),
         |${bm25Ctes(10, from = "docm")}
         |SELECT rank, doc_id, (round((s6 / 1000000.0) * 10000.0) / 10000.0) AS score
         |FROM bm ORDER BY rank""".stripMargin
    },

    // Phrase search: phrase tf re-derived from RAW text (count of
    // positions i where toks[i] = t1 and toks[i+1] = t2 — the oracle
    // never sees the positional index, only reproduces its answer).
    "text_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |m AS (SELECT doc_id, CAST(len(list_filter(range(1, len(toks)),
         |        i -> toks[i] = 'table' AND toks[i+1] = 'hash')) AS INT) AS phrase_tf
         |      FROM t)
         |SELECT CAST(row_number() OVER (ORDER BY phrase_tf DESC, doc_id) AS INT) AS rank,
         |       doc_id, phrase_tf
         |FROM m WHERE phrase_tf > 0 ORDER BY phrase_tf DESC, doc_id LIMIT 10""".stripMargin,

    // Proximity search: ordered (i, j) pairs with 0 < j−i ≤ 4 over the
    // two terms' raw-text positions — the oracle rebuilds both position
    // lists from the text and counts pairs the same way.
    "text_near_search" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(list_sum(list_transform(
         |    list_filter(range(1, len(toks) + 1), i -> toks[i] = 'table'),
         |    i -> len(list_filter(range(1, len(toks) + 1),
         |           j -> toks[j] = 'hash' AND j > i AND j - i <= 4)))) AS INT) AS n_pairs
         |  FROM t)
         |SELECT CAST(row_number() OVER (ORDER BY n_pairs DESC, doc_id) AS INT) AS rank,
         |       doc_id, n_pairs
         |FROM m WHERE n_pairs > 0 ORDER BY n_pairs DESC, doc_id LIMIT 10""".stripMargin,

    // n-clause proximity: ordered (i, j, l) chains with each gap in
    // (0, 4] over the three terms' raw-text positions — the oracle
    // rebuilds all three position lists from the text and counts the
    // same chains the fold counts.
    "text_near_search_multi" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(list_sum(list_transform(
         |    list_filter(range(1, len(toks) + 1), i -> toks[i] = 'table'),
         |    i -> list_sum(list_transform(
         |      list_filter(range(1, len(toks) + 1),
         |        j -> toks[j] = 'hash' AND j > i AND j - i <= 4),
         |      j -> len(list_filter(range(1, len(toks) + 1),
         |        l -> toks[l] = 'join' AND l > j AND l - j <= 4)))))) AS INT) AS n_pairs
         |  FROM t)
         |SELECT CAST(row_number() OVER (ORDER BY n_pairs DESC, doc_id) AS INT) AS rank,
         |       doc_id, n_pairs
         |FROM m WHERE n_pairs > 0 ORDER BY n_pairs DESC, doc_id LIMIT 10""".stripMargin,

    // Filtered BM25 ≡ BM25 over the lang = 'en' sub-corpus (stats, df
    // and candidates all filtered) — the oracle re-derives it from raw
    // text with the filter applied before tokenization.
    "filtered_bm25" ->
      s"""WITH ${bm25Ctes(10, " WHERE lang = 'en'")}
         |SELECT rank, doc_id, (round((s6 / 1000000.0) * 10000.0) / 10000.0) AS score
         |FROM bm ORDER BY rank""".stripMargin,

    // Filtered BATCH BM25: per-query scores over the lang = 'en'
    // sub-corpus (stats/df filtered), the union vocabulary pruning the
    // postings; raw exact-integer s6 like the batch kernel emits.
    "filtered_bm25_batch" ->
      s"""WITH qt AS (SELECT CAST(q_id AS BIGINT) AS q_id, term
         |  FROM (VALUES (1, 'spark'), (1, 'hash'), (2, 'join'), (2, 'window'),
         |               (3, 'vector'), (3, 'table')) AS v(q_id, term)),
         |t AS (SELECT doc_id, $toks AS toks FROM documents WHERE lang = 'en'),
         |st AS (SELECT count(*) AS n_corpus, CAST(sum(len(toks)) AS BIGINT) AS sum_dl FROM t),
         |p0 AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
         |p AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl FROM p0
         |      WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM p GROUP BY term),
         |contrib AS (SELECT p.term, p.doc_id,
         |    CAST(floor(ln((st.n_corpus - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |      * ((p.tf * (1.2 + 1.0)) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * (p.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_corpus)))))
         |      * 1000000.0 + 0.5) AS BIGINT) AS s6
         |  FROM p JOIN dfq USING (term) CROSS JOIN st),
         |qd AS (SELECT qt.q_id, c.doc_id, CAST(sum(c.s6) AS BIGINT) AS s6
         |       FROM contrib c JOIN qt ON qt.term = c.term GROUP BY 1, 2)
         |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY s6 DESC, doc_id) AS INT) AS rank,
         |       doc_id, s6
         |FROM qd QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // NotEqual + numeric range on the text filter leg — same contract:
    // ≡ BM25 over the sub-corpus with the predicates applied before
    // tokenization (stats, df and candidates all filtered).
    "filtered_bm25_ne" ->
      s"""WITH ${bm25Ctes(10, " WHERE lang <> 'de' AND n_chars BETWEEN 200 AND 1200")}
         |SELECT rank, doc_id, (round((s6 / 1000000.0) * 10000.0) / 10000.0) AS score
         |FROM bm ORDER BY rank""".stripMargin,

    // Filtered hybrid: hybrid_rrf's exact fusion tree with the lang
    // filter composed into BOTH legs (the probe doc is fetched
    // unfiltered — it is the query, not a candidate).
    "filtered_hybrid" ->
      s"""WITH ${bm25Ctes(50, " WHERE lang = 'en'")},
         |${ppmFeatCtes("f", " WHERE lang = 'en'")},
         |${ppmFeatCtes("probe", " WHERE doc_id = 7")},
         |fq AS (SELECT features AS qv FROM probe),
         |vd AS (SELECT f.doc_id, ${l2("f.features", "fq.qv")} AS score FROM f, fq),
         |vleg AS (SELECT CAST(row_number() OVER (ORDER BY score, doc_id) AS INT) AS rank, doc_id
         |         FROM vd ORDER BY score, doc_id LIMIT 50),
         |fuse AS (SELECT coalesce(v.doc_id, b.doc_id) AS doc_id, v.rank AS rank_vec, b.rank AS rank_text,
         |    coalesce(1.0 / (60 + v.rank), 0.0) + coalesce(1.0 / (60 + b.rank), 0.0) AS rrf
         |  FROM vleg v FULL OUTER JOIN bm b ON v.doc_id = b.doc_id)
         |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank, doc_id,
         |  (round((rrf) * 1000000.0) / 1000000.0) AS rrf, rank_vec, rank_text
         |FROM fuse ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // vector leg = the multimodal feature-sketch kNN (same CTEs as
    // multimodal_embed, top-50); text leg = BM25 top-50; RRF fuse with
    // c=60 — every fused score is a short sum of exact rationals of
    // integer ranks, so no rounding is needed until the display column.
    "hybrid_rrf" ->
      s"""WITH ${bm25Ctes(50)},
         |${ppmFeatCtes("f")},
         |vq AS (SELECT features AS qv FROM f WHERE doc_id = 7),
         |vd AS (SELECT f.doc_id, ${l2("f.features", "vq.qv")} AS score FROM f, vq),
         |vleg AS (SELECT CAST(row_number() OVER (ORDER BY score, doc_id) AS INT) AS rank, doc_id
         |         FROM vd ORDER BY score, doc_id LIMIT 50),
         |fuse AS (SELECT coalesce(v.doc_id, b.doc_id) AS doc_id, v.rank AS rank_vec, b.rank AS rank_text,
         |    coalesce(1.0 / (60 + v.rank), 0.0) + coalesce(1.0 / (60 + b.rank), 0.0) AS rrf
         |  FROM vleg v FULL OUTER JOIN bm b ON v.doc_id = b.doc_id)
         |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank, doc_id,
         |  (round((rrf) * 1000000.0) / 1000000.0) AS rrf, rank_vec, rank_text
         |FROM fuse ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // Weighted hybrid: same legs as hybrid_rrf, 1e-4-fixed scores,
    // min-max inside each 50-row leg, 0.6/0.4 blend — identical tree.
    "hybrid_weighted" ->
      s"""WITH ${bm25Ctes(50)},
         |${ppmFeatCtes("f")},
         |vq AS (SELECT features AS qv FROM f WHERE doc_id = 7),
         |vd AS (SELECT f.doc_id, ${l2("f.features", "vq.qv")} AS score FROM f, vq),
         |vleg AS (SELECT doc_id, CAST(round(score * 10000.0) AS BIGINT) AS v4
         |         FROM vd ORDER BY score, doc_id LIMIT 50),
         |va AS (SELECT doc_id, CASE WHEN mx = mn THEN 1.0
         |         ELSE CAST(mx - v4 AS DOUBLE) / CAST(mx - mn AS DOUBLE) END AS na
         |       FROM (SELECT doc_id, v4, max(v4) OVER () AS mx, min(v4) OVER () AS mn FROM vleg)),
         |tleg AS (SELECT doc_id, CAST(round((CAST(s6 AS DOUBLE) / 1000000.0) * 10000.0) AS BIGINT) AS s4 FROM bm),
         |tb AS (SELECT doc_id, CASE WHEN mx = mn THEN 1.0
         |         ELSE CAST(s4 - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE) END AS nb
         |       FROM (SELECT doc_id, s4, max(s4) OVER () AS mx, min(s4) OVER () AS mn FROM tleg)),
         |fuse AS (SELECT coalesce(va.doc_id, tb.doc_id) AS doc_id,
         |           0.6 * coalesce(na, 0.0) + 0.4 * coalesce(nb, 0.0) AS h
         |         FROM va FULL OUTER JOIN tb ON va.doc_id = tb.doc_id)
         |SELECT CAST(row_number() OVER (ORDER BY h DESC, doc_id) AS INT) AS rank, doc_id,
         |  (round((h) * 1000000.0) / 1000000.0) AS hybrid
         |FROM fuse ORDER BY h DESC, doc_id LIMIT 20""".stripMargin,

    // word-2/3-gram shingle strings hashed exactly like the minhash
    // oracle; per-doc fractions are single divisions of exact longs.
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |s2 AS (SELECT doc_id, CASE WHEN len(toks) < 2 THEN [] ELSE
         |         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END AS sh FROM t),
         |e2 AS (SELECT doc_id, unnest(list_transform(sh, s -> ${tokenHash60("s")})) AS g FROM s2),
         |c2 AS (SELECT doc_id, g, count(*) AS c FROM e2 GROUP BY doc_id, g),
         |a2 AS (SELECT doc_id, max(c) AS top2, CAST(sum(c) AS BIGINT) AS n2 FROM c2 GROUP BY doc_id),
         |s3 AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [] ELSE
         |         list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh FROM t),
         |e3 AS (SELECT doc_id, unnest(list_transform(sh, s -> ${tokenHash60("s")})) AS g FROM s3),
         |c3 AS (SELECT doc_id, g, count(*) AS c FROM e3 GROUP BY doc_id, g),
         |a3 AS (SELECT doc_id, count(*) AS d3, CAST(sum(c) AS BIGINT) AS n3 FROM c3 GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(a2.n2, 0) AS n_2grams,
         |  (round((CASE WHEN a2.n2 IS NULL THEN 0.0 ELSE CAST(a2.top2 AS DOUBLE) / CAST(a2.n2 AS DOUBLE) END) * 10000.0) / 10000.0) AS top_2gram_frac,
         |  (round((CASE WHEN a3.n3 IS NULL THEN 0.0 ELSE 1.0 - CAST(a3.d3 AS DOUBLE) / CAST(a3.n3 AS DOUBLE) END) * 10000.0) / 10000.0) AS dup_3gram_frac
         |FROM t LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    // ================= C2. corpus preparation =================

    // Efraimidis–Spirakis weighted sample: key = -ln(u)/w, deterministic
    // u from the doc-id hash, w = n_chars; ln and the divisions are
    // written identically on both sides so the double keys are
    // bit-identical and the top-50 cut cannot flap.
    "corpus_weighted_sample" ->
      s"""WITH k AS (SELECT doc_id, n_chars,
         |  -ln((${tokenHash60("'wsample:' || CAST(doc_id AS VARCHAR)")} + 1.0)
         |      / 1152921504606846976.0) / n_chars AS es_key
         |  FROM documents)
         |SELECT CAST(row_number() OVER (ORDER BY es_key, doc_id) AS INT) AS pick,
         |  doc_id, n_chars,
         |  (round((es_key) * 1000000000.0) / 1000000000.0) AS es_key
         |FROM k ORDER BY es_key, doc_id LIMIT 50""".stripMargin,

    // Equal-share domain mixing: the rates are integer basis points
    // derived from exact per-source char totals (budget = min source),
    // the keep set replays the same doc-id hash — every reported value
    // is an exact integer on both engines.
    "corpus_mix" ->
      s"""WITH t AS (SELECT source, count(*) AS docs_in,
         |      CAST(sum(n_chars) AS BIGINT) AS chars_in
         |    FROM documents GROUP BY source),
         |b AS (SELECT min(chars_in) AS budget FROM t),
         |r AS (SELECT source, docs_in, chars_in,
         |      (budget * 10000) // chars_in AS rate_bp FROM t, b),
         |k AS (SELECT d.source, count(*) AS docs_kept,
         |      CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
         |    FROM documents d JOIN r ON d.source = r.source
         |    WHERE ${tokenHash60("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000 < r.rate_bp
         |    GROUP BY d.source)
         |SELECT r.source, r.docs_in, r.chars_in, CAST(r.rate_bp AS BIGINT) AS rate_bp,
         |  CAST(coalesce(k.docs_kept, 0) AS BIGINT) AS docs_kept,
         |  CAST(coalesce(k.chars_kept, 0) AS BIGINT) AS chars_kept
         |FROM r LEFT JOIN k USING (source) ORDER BY source""".stripMargin,

    // doc-as-query BM25 (leave-self-out) scored against the exact
    // embedding top-10 as relevance truth: recall@10 = exact long / 10,
    // mrr = one division of the exact integer best rank.
    "retrieval_recall_eval" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |st AS (SELECT count(*) AS n_corpus, CAST(sum(len(toks)) AS BIGINT) AS sum_dl FROM t),
         |q AS (SELECT DISTINCT doc_id AS q_id, unnest(list_distinct(toks)) AS term
         |      FROM t WHERE doc_id IN (7, 107, 207, 307, 407)),
         |p0 AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
         |p AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl FROM p0
         |      WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM p GROUP BY term),
         |contrib AS (SELECT p.doc_id, p.term,
         |    CAST(floor(ln((st.n_corpus - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |      * ((p.tf * (1.2 + 1.0)) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * (p.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_corpus)))))
         |      * 1000000.0 + 0.5) AS BIGINT) AS s6
         |  FROM p JOIN dfq USING (term) CROSS JOIN st),
         |scored AS (SELECT q.q_id, c.doc_id, CAST(sum(c.s6) AS BIGINT) AS s6
         |  FROM contrib c JOIN q ON c.term = q.term
         |  WHERE c.doc_id <> q.q_id GROUP BY 1, 2),
         |bm AS (SELECT q_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY s6 DESC, doc_id) AS INT) AS rank
         |  FROM scored QUALIFY rank <= 10),
         |qv AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |       WHERE vec_id IN (7, 107, 207, 307, 407)),
         |tr AS (SELECT q_id, id FROM (
         |    SELECT qv.q_id, e.vec_id AS id,
         |      row_number() OVER (PARTITION BY qv.q_id
         |        ORDER BY ${l2("e.embedding", "qv.qv")}, e.vec_id) AS r
         |    FROM embeddings e, qv WHERE e.vec_id <> qv.q_id)
         |  WHERE r <= 10),
         |hit AS (SELECT b.q_id, count(*) AS n_hits, min(b.rank) AS best
         |        FROM bm b JOIN tr ON b.q_id = tr.q_id AND b.doc_id = tr.id GROUP BY 1)
         |SELECT g.q_id AS q_doc, coalesce(h.n_hits, 0) AS n_hits,
         |  coalesce(h.n_hits, 0) / 10.0 AS recall_at_10,
         |  coalesce(1.0 / h.best, 0.0) AS mrr
         |FROM (SELECT DISTINCT q_id FROM qv) g LEFT JOIN hit h ON g.q_id = h.q_id
         |ORDER BY q_doc""".stripMargin,

    // MMR diversified top-5: greedy steps unrolled (sel_k grows one
    // pick per step); sims fixed to 1e-6 integers so every argmax
    // compares exact longs — mirrors Knn.mmrDiversify bit-for-bit.
    "embedding_mmr" -> {
      val head =
        s"""WITH qv AS (SELECT vec_id AS q_id, embedding AS qvec FROM embeddings
           |       WHERE vec_id IN (7, 107, 207, 307, 407)),
           |sc AS (SELECT qv.q_id, e.vec_id AS c_id, e.embedding AS v,
           |         ${cosine("e.embedding", "qv.qvec")} AS cs
           |       FROM embeddings e, qv WHERE e.vec_id <> qv.q_id),
           |cand AS (SELECT q_id, c_id, v,
           |    CAST(floor(cs * 1000000.0 + 0.5) AS BIGINT) AS simq6
           |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, c_id) AS rn FROM sc)
           |  WHERE rn <= 20),
           |pair AS (SELECT a.q_id, a.c_id AS ai, b.c_id AS bi,
           |    CAST(floor(${cosine("a.v", "b.v")} * 1000000.0 + 0.5) AS BIGINT) AS p6
           |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.c_id <> b.c_id),
           |s1 AS (SELECT q_id, c_id, 7 * simq6 AS sc FROM cand
           |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY 7 * simq6 DESC, c_id) = 1),
           |sel1 AS (SELECT q_id, c_id FROM s1)""".stripMargin
      val steps = (2 to 5).map { k =>
        val selOut =
          if (k < 5)
            s""",
               |sel$k AS (SELECT q_id, c_id FROM sel${k - 1} UNION ALL SELECT q_id, c_id FROM s$k)""".stripMargin
          else ""
        s""",
           |m$k AS (SELECT p.q_id, p.ai AS c_id, max(p.p6) AS m6 FROM pair p
           |       JOIN sel${k - 1} s ON p.q_id = s.q_id AND p.bi = s.c_id GROUP BY 1, 2),
           |s$k AS (SELECT c.q_id, c.c_id, 7 * c.simq6 - 3 * m.m6 AS sc
           |  FROM cand c JOIN m$k m ON c.q_id = m.q_id AND c.c_id = m.c_id
           |  LEFT JOIN sel${k - 1} x ON c.q_id = x.q_id AND c.c_id = x.c_id
           |  WHERE x.c_id IS NULL
           |  QUALIFY row_number() OVER (PARTITION BY c.q_id
           |    ORDER BY 7 * c.simq6 - 3 * m.m6 DESC, c.c_id) = 1)$selOut""".stripMargin
      }.mkString
      val tail = (1 to 5).map { k =>
        s"SELECT q_id, $k AS pick, c_id AS vec_id, round(CAST(sc AS DOUBLE) / 10000000.0, 4) AS mmr FROM s$k"
      }.mkString("\n", "\nUNION ALL ", "\nORDER BY q_id, pick")
      head + steps + tail
    },

    // NDCG@10: literal integer milli-discounts (no log in either
    // engine), DCG an exact long sum, NDCG one division by the
    // constant ideal DCG 29966114 = Σ (11-i)·w_i.
    "retrieval_ndcg" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |st AS (SELECT count(*) AS n_corpus, CAST(sum(len(toks)) AS BIGINT) AS sum_dl FROM t),
         |q AS (SELECT DISTINCT doc_id AS q_id, unnest(list_distinct(toks)) AS term
         |      FROM t WHERE doc_id IN (7, 107, 207, 307, 407)),
         |p0 AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
         |p AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl FROM p0
         |      WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM p GROUP BY term),
         |contrib AS (SELECT p.doc_id, p.term,
         |    CAST(floor(ln((st.n_corpus - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |      * ((p.tf * (1.2 + 1.0)) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * (p.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_corpus)))))
         |      * 1000000.0 + 0.5) AS BIGINT) AS s6
         |  FROM p JOIN dfq USING (term) CROSS JOIN st),
         |scored AS (SELECT q.q_id, c.doc_id, CAST(sum(c.s6) AS BIGINT) AS s6
         |  FROM contrib c JOIN q ON c.term = q.term
         |  WHERE c.doc_id <> q.q_id GROUP BY 1, 2),
         |bm AS (SELECT q_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY s6 DESC, doc_id) AS INT) AS rank
         |  FROM scored QUALIFY rank <= 10),
         |qv AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |       WHERE vec_id IN (7, 107, 207, 307, 407)),
         |tr AS (SELECT q_id, id, r FROM (
         |    SELECT qv.q_id, e.vec_id AS id,
         |      row_number() OVER (PARTITION BY qv.q_id
         |        ORDER BY ${l2("e.embedding", "qv.qv")}, e.vec_id) AS r
         |    FROM embeddings e, qv WHERE e.vec_id <> qv.q_id)
         |  WHERE r <= 10),
         |j AS (SELECT b.q_id,
         |    CASE b.rank WHEN 1 THEN 1000000 WHEN 2 THEN 630930 WHEN 3 THEN 500000
         |      WHEN 4 THEN 430677 WHEN 5 THEN 386853 WHEN 6 THEN 356207
         |      WHEN 7 THEN 333333 WHEN 8 THEN 315465 WHEN 9 THEN 301030
         |      ELSE 289065 END AS w,
         |    coalesce(11 - tr.r, 0) AS rel
         |  FROM bm b LEFT JOIN tr ON b.q_id = tr.q_id AND b.doc_id = tr.id),
         |d AS (SELECT q_id, CAST(sum(rel * w) AS BIGINT) AS dcg FROM j GROUP BY 1)
         |SELECT g.q_id AS q_doc, coalesce(d.dcg, 0) AS dcg,
         |  round(CAST(coalesce(d.dcg, 0) AS DOUBLE) / 29966114.0, 4) AS ndcg
         |FROM (SELECT DISTINCT q_id FROM qv) g LEFT JOIN d ON g.q_id = d.q_id
         |ORDER BY q_doc""".stripMargin,

    // rates mirror Queries.sampleRates; the hash bucket reuses the
    // corpus_split construction with a distinct salt.
    "corpus_sample" ->
      s"""WITH h AS (SELECT doc_id, source,
         |  ${tokenHash60("'sample:' || CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents),
         |r AS (SELECT doc_id, source, CAST(b AS INT) AS bucket,
         |  CASE WHEN source = 'src0' THEN 10 WHEN source = 'src1' THEN 10
         |       WHEN source = 'src2' THEN 25 WHEN source = 'src3' THEN 50
         |       ELSE 80 END AS rate FROM h)
         |SELECT doc_id, source, bucket, rate FROM r WHERE bucket < rate ORDER BY doc_id""".stripMargin,

    "corpus_split" ->
      s"""WITH h AS (SELECT doc_id,
         |  ${tokenHash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents)
         |SELECT doc_id, CAST(b AS INT) AS bucket,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin,

    "corpus_vocab" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |w AS (SELECT doc_id, unnest(toks) AS word FROM t),
         |pd AS (SELECT word, doc_id, count(*) AS tf FROM w GROUP BY word, doc_id),
         |v AS (SELECT word, CAST(sum(tf) AS BIGINT) AS n, count(*) AS n_docs FROM pd GROUP BY word)
         |SELECT CAST(row_number() OVER (ORDER BY n DESC, word) AS INT) AS rank, word, n, n_docs
         |FROM v ORDER BY n DESC, word LIMIT 50""".stripMargin,

    // PII scrub: Java/RE2-common regex subset, global replace both
    // engines; digest keeps rows narrow.
    "text_pii_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '[0-9]{9,}')) AS n_longnums,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{9,}', '<NUM>', 'g')) AS scrubbed_digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    // shard plan: global token prefix-sum (two-level scan on the Spark
    // side; the oracle states the spec directly as one window).
    "corpus_shard_plan" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |        CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
         |      FROM t)
         |SELECT doc_id, n_tok AS n_tokens, start, start // 1000 AS shard
         |FROM c ORDER BY doc_id""".stripMargin,

    // readability profile: per-doc exact longs from in-row list ops,
    // sources-bounded rollup, three final double divisions.
    "text_readability" ->
      s"""WITH t AS (SELECT source, text, $toks AS toks FROM documents),
         |d AS (SELECT source, CAST(len(toks) AS BIGINT) AS n_words,
         |        CAST(coalesce(list_sum(list_transform(toks, w -> len(w))), 0) AS BIGINT) AS n_wc,
         |        CAST(len(list_filter(toks, w -> len(w) >= 7)) AS BIGINT) AS n_long,
         |        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_vg
         |      FROM t),
         |s AS (SELECT source, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_words,
         |        CAST(sum(n_wc) AS BIGINT) AS wc, CAST(sum(n_long) AS BIGINT) AS nl,
         |        CAST(sum(n_vg) AS BIGINT) AS nv FROM d GROUP BY 1)
         |SELECT source, n_docs, n_words,
         |  (round((CAST(wc AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000.0) / 10000.0) AS avg_word_len,
         |  (round((CAST(nl AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000.0) / 10000.0) AS long_word_share,
         |  (round((CAST(nv AS DOUBLE) / CAST(n_words AS DOUBLE)) * 10000.0) / 10000.0) AS syllables_per_word
         |FROM s ORDER BY source""".stripMargin,

    // entropy from the (source, word) count table: each ln c fixed to a
    // 1e-6 integer once, weighted sum in DECIMAL (18,0)×(18,0) products
    // keep both engines inside decimal width limits; the entropy
    // expression is the identical double tree.
    "corpus_entropy" ->
      s"""WITH t AS (SELECT source, $toks AS toks FROM documents),
         |w AS (SELECT source, unnest(toks) AS word FROM t),
         |c AS (SELECT source, word, count(*) AS c FROM w GROUP BY 1, 2),
         |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
         |        CAST(sum(CAST(c AS DECIMAL(18,0)) *
         |          CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS DECIMAL(18,0))) AS DOUBLE) AS s_fixed
         |      FROM c GROUP BY 1)
         |SELECT source, n_tokens, n_types,
         |  (round((ln(CAST(n_tokens AS DOUBLE)) - s_fixed / (CAST(n_tokens AS DOUBLE) * 1000000.0)) * 10000.0) / 10000.0) AS entropy_nats,
         |  (round((CAST(n_types AS DOUBLE) / n_tokens) * 10000.0) / 10000.0) AS type_token_ratio
         |FROM s ORDER BY source""".stripMargin,

    // first BPE merge iteration: pair explode over the DISTINCT-word
    // table only; weights are word counts.
    "corpus_bpe_step" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
         |w0 AS (SELECT unnest(toks) AS word FROM t),
         |wc AS (SELECT word, count(*) AS n_w FROM w0 GROUP BY 1),
         |p AS (SELECT word, n_w, unnest(range(1, length(word))) AS i
         |      FROM wc WHERE length(word) >= 2),
         |c AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(sum(n_w) AS BIGINT) AS n
         |      FROM p GROUP BY 1)
         |SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // lang CASE + rounded quality score + min-id canonical, composed —
    // each leg identical to its standalone oracle above.
    "corpus_clean" ->
      s"""WITH $langScoreCtes,
         |canon AS (SELECT doc_id FROM
         |  (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cid FROM documents)
         |  WHERE doc_id = cid)
         |SELECT l.doc_id, l.lang_pred, sc.score
         |FROM lang l JOIN sc USING (doc_id) JOIN canon USING (doc_id)
         |WHERE l.lang_pred = 'en' AND sc.score >= 0.5 ORDER BY doc_id""".stripMargin,

    // mean via exact integer sums: each 4-dp score re-rounds ×10⁴ to a
    // BIGINT before summing — order-independent, then ONE division.
    "corpus_stats" ->
      s"""WITH $langScoreCtes,
         |tk AS (SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe FROM documents)
         |SELECT l.lang_pred, count(*) AS n_docs, CAST(sum(tk.n_bpe) AS BIGINT) AS n_tokens,
         |  (round((CAST(sum(CAST(round(sc.score * 10000) AS BIGINT)) AS DOUBLE) / (count(*) * 10000)) * 10000.0) / 10000.0) AS mean_score
         |FROM lang l JOIN sc USING (doc_id) JOIN tk USING (doc_id)
         |GROUP BY l.lang_pred ORDER BY l.lang_pred""".stripMargin,

    // clean (lang ∧ quality ∧ canonical) → hash split → per-split
    // stats; every leg identical to its standalone oracle.
    "corpus_pipeline" ->
      s"""WITH $langScoreCtes,
         |canon AS (SELECT doc_id FROM
         |  (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cid FROM documents)
         |  WHERE doc_id = cid),
         |cleaned AS (SELECT l.doc_id, sc.score
         |  FROM lang l JOIN sc USING (doc_id) JOIN canon USING (doc_id)
         |  WHERE l.lang_pred = 'en' AND sc.score >= 0.5),
         |sp AS (SELECT doc_id,
         |  ${tokenHash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents),
         |tk AS (SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe FROM documents)
         |SELECT CASE WHEN sp.b < 80 THEN 'train' WHEN sp.b < 90 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs, CAST(sum(tk.n_bpe) AS BIGINT) AS n_tokens,
         |  (round((CAST(sum(CAST(round(c.score * 10000) AS BIGINT)) AS DOUBLE) / (count(*) * 10000)) * 10000.0) / 10000.0) AS mean_score
         |FROM cleaned c JOIN sp USING (doc_id) JOIN tk USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // bigram LM counts: MLE p = c12/c1 as one exact-long division;
    // 2-shingle spelling matches the minhash chain with n=2.
    "corpus_bigram_lm" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
         |sh AS (SELECT CASE WHEN len(toks) < 2 THEN [] ELSE
         |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END AS sh FROM t),
         |g AS (SELECT unnest(sh) AS gm FROM sh),
         |c2 AS (SELECT split_part(gm, ' ', 1) AS w1, split_part(gm, ' ', 2) AS w2, count(*) AS c12
         |       FROM g GROUP BY 1, 2),
         |sc AS (SELECT w1, w2, c12, CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
         |         CAST(row_number() OVER (PARTITION BY w1 ORDER BY c12 DESC, w2) AS INT) AS rank
         |       FROM c2)
         |SELECT w1, rank, w2, c12, c1, (round((c12 / c1) * 10000.0) / 10000.0) AS p
         |FROM sc WHERE rank <= 3 ORDER BY w1, rank""".stripMargin,

    // TextRank: the same three exact integer PageRank rounds unrolled —
    // every contribution is ⌊⌊pr·850/1000⌋·c12/c1⌋, so the trajectory
    // is engine-reproducible with no float anywhere.
    "corpus_textrank" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
         |sh AS (SELECT CASE WHEN len(toks) < 2 THEN [] ELSE
         |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END AS sh FROM t),
         |g AS (SELECT unnest(sh) AS gm FROM sh),
         |e0 AS (SELECT split_part(gm, ' ', 1) AS u, split_part(gm, ' ', 2) AS v, count(*) AS c12
         |       FROM g GROUP BY 1, 2),
         |c1t AS (SELECT u, CAST(sum(c12) AS BIGINT) AS c1 FROM e0 GROUP BY 1),
         |e AS (SELECT e0.u, e0.v, CAST(e0.c12 AS BIGINT) AS c12, c1t.c1 FROM e0 JOIN c1t USING (u)),
         |nodes AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
         |pr0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
         |m1 AS (SELECT e.v, CAST(sum((((p.pr * 850) // 1000) * e.c12) // e.c1) AS BIGINT) AS m
         |       FROM e JOIN pr0 p ON p.node = e.u GROUP BY e.v),
         |pr1 AS (SELECT node, CAST(150000000 + coalesce(m, 0) AS BIGINT) AS pr
         |        FROM nodes LEFT JOIN m1 ON m1.v = node),
         |m2 AS (SELECT e.v, CAST(sum((((p.pr * 850) // 1000) * e.c12) // e.c1) AS BIGINT) AS m
         |       FROM e JOIN pr1 p ON p.node = e.u GROUP BY e.v),
         |pr2 AS (SELECT node, CAST(150000000 + coalesce(m, 0) AS BIGINT) AS pr
         |        FROM nodes LEFT JOIN m2 ON m2.v = node),
         |m3 AS (SELECT e.v, CAST(sum((((p.pr * 850) // 1000) * e.c12) // e.c1) AS BIGINT) AS m
         |       FROM e JOIN pr2 p ON p.node = e.u GROUP BY e.v),
         |pr3 AS (SELECT node, CAST(150000000 + coalesce(m, 0) AS BIGINT) AS pr
         |        FROM nodes LEFT JOIN m3 ON m3.v = node)
         |SELECT CAST(row_number() OVER (ORDER BY pr DESC, node) AS INT) AS rank,
         |       node AS word, pr
         |FROM pr3 ORDER BY pr DESC, node LIMIT 20""".stripMargin,

    // bigram-LM doc scoring: the add-one model's per-bigram ln(p) fixed
    // once to 1e-6 integers; per-doc totals are exact integer sums.
    "corpus_lm_score" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |u AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(toks) AS w FROM t)),
         |sh AS (SELECT doc_id, CASE WHEN len(toks) < 2 THEN [] ELSE
         |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END AS sh FROM t),
         |g AS (SELECT doc_id, unnest(sh) AS gm FROM sh),
         |db AS (SELECT doc_id, split_part(gm, ' ', 1) AS w1, split_part(gm, ' ', 2) AS w2,
         |         count(*) AS nij
         |       FROM g GROUP BY 1, 2, 3),
         |c2 AS (SELECT w1, w2, CAST(sum(nij) AS BIGINT) AS c12 FROM db GROUP BY 1, 2),
         |c1t AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         |model AS (SELECT w1, w2,
         |            CAST(floor(ln((c12 + 1.0) / (c1 + v)) * 1000000.0 + 0.5) AS BIGINT) AS s6
         |          FROM c2 JOIN c1t USING (w1) CROSS JOIN u),
         |d AS (SELECT doc_id, CAST(sum(nij) AS BIGINT) AS n_bigrams,
         |        CAST(sum(nij * s6) AS BIGINT) AS ss
         |      FROM db JOIN model USING (w1, w2) GROUP BY 1)
         |SELECT doc_id, n_bigrams,
         |  (round((ss / (n_bigrams * 1000000.0)) * 10000.0) / 10000.0) AS lm_score
         |FROM d ORDER BY doc_id""".stripMargin,

    // tf·idf with exact-rational idf: (tf·N)/df is ONE double division
    // of exact longs — identical bits in both engines, so rank order
    // and the 4-dp score can't knife-edge.
    "corpus_tfidf" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |w AS (SELECT doc_id, unnest(toks) AS word FROM t),
         |pd AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
         |v AS (SELECT word, count(*) AS df FROM pd GROUP BY word),
         |nn AS (SELECT count(*) AS n FROM documents),
         |sc AS (SELECT pd.doc_id, pd.word, pd.tf, v.df,
         |        (pd.tf * (SELECT n FROM nn)) / v.df AS score_raw
         |       FROM pd JOIN v USING (word))
         |SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score_raw DESC, word) AS INT) AS rank,
         |  word, tf, df, (round((score_raw) * 10000.0) / 10000.0) AS score
         |FROM sc QUALIFY rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // train docs sharing a distinct word 5-gram with the hash-split
    // test slice; same split hash as corpus_split, same shingle-hash
    // spelling as the minhash chain (n=5 instead of 3).
    "corpus_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks,
         |  ${tokenHash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents),
         |sh AS (SELECT doc_id, b, CASE WHEN len(toks) < 5 THEN [] ELSE
         |  list_transform(range(1, len(toks) - 3),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]) END AS sh
         |  FROM t),
         |g AS (SELECT doc_id, b, unnest(list_distinct(list_transform(sh, s -> ${tokenHash60("s")}))) AS gram FROM sh),
         |ev AS (SELECT DISTINCT gram FROM g WHERE b >= 90)
         |SELECT g.doc_id, count(*) AS n_shared FROM g JOIN ev USING (gram)
         |WHERE g.b < 80 GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    // overlapping token chunks: start offsets 0, 48, 96 … < n_tok, tail
    // chunk short, digest = md5 of the space-joined chunk tokens.
    "corpus_chunk" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |c AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start_tok
         |      FROM t WHERE len(toks) > 0),
         |ch AS (SELECT doc_id,
         |         CAST(start_tok // 48 AS INT) AS chunk_idx,
         |         CAST(start_tok AS INT) AS start_tok,
         |         list_slice(toks, CAST(start_tok + 1 AS INT),
         |                    CAST(least(start_tok + 64, len(toks)) AS INT)) AS chunk
         |       FROM c)
         |SELECT doc_id, chunk_idx, start_tok,
         |  CAST(len(chunk) AS INT) AS n_toks,
         |  md5(array_to_string(chunk, ' ')) AS digest
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    // casefold + punctuation/whitespace collapse; the regex dialect
    // subset ([^a-z0-9]+) behaves identically in Java and DuckDB (same
    // construction as the tokenizer oracle).
    "corpus_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text,
        |  len(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // percentile_disc by rank selection: position ⌈q·n/100⌉ in exact
    // integer math under the deterministic (n_tok, doc_id) order.
    // rank selection over the value distribution (bounded-cardinality
    // window), mirroring Queries.corpusQuantiles.
    "corpus_quantiles" ->
      """WITH b AS (SELECT source,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_tok
        |  FROM documents),
        |c AS (SELECT source, n_tok, count(*) AS c FROM b GROUP BY 1, 2),
        |e AS (SELECT source, n_tok,
        |        sum(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum,
        |        sum(c) OVER (PARTITION BY source) AS n_docs
        |      FROM c)
        |SELECT source, CAST(max(n_docs) AS BIGINT) AS n_docs,
        |  min(CASE WHEN cum >= (n_docs * 50 + 99) // 100 THEN n_tok END) AS p50,
        |  min(CASE WHEN cum >= (n_docs * 90 + 99) // 100 THEN n_tok END) AS p90,
        |  min(CASE WHEN cum >= (n_docs * 99 + 99) // 100 THEN n_tok END) AS p99
        |FROM e GROUP BY source ORDER BY source""".stripMargin,

    // bin = floor(exclusive-running-sum / 512.0): 512 is a power of two,
    // so the double division is exact and floor agrees on both engines.
    // packing shards: window partitions capped at 1000 rows (see
    // Queries.packSequences — never a per-source full sort)
    "pack_sequences" ->
      """WITH n AS (SELECT doc_id, source || ':' || CAST(doc_id // 1000 AS VARCHAR) AS grp,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_tok
        |  FROM documents)
        |SELECT doc_id, grp, n_tok,
        |  CAST(floor(coalesce(sum(n_tok) OVER
        |    (PARTITION BY grp ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    / 512.0) AS BIGINT) AS bin
        |FROM n ORDER BY grp, doc_id""".stripMargin,

    // ================= D. multimodal =================
    // The payloads are REAL multi-frame P6/PPM streams synthesized
    // deterministically from the documents (spec v1, TESTDATA.md):
    // n = utf-8 bytes, w = h = 2 + n%3, fsz = 3·w², F = n div fsz + 1,
    // header "P6\n{w} {w}\n255\n" (11 bytes — w is single-digit),
    // pixels = consecutive text slices zero-padded in the last frame.
    // Spark PARSES the bytes; the oracle independently predicts what a
    // correct parse must yield from this arithmetic — a misread header,
    // a miscounted frame or a broken pixel walk goes hash-red.

    "multimodal_meta" ->
      s"""WITH ${ppmGeomCte("g")}
         |SELECT doc_id, CAST(nf * (11 + fsz) AS INT) AS n_bytes, md5(text) AS digest,
         |  CAST(w AS INT) AS width, CAST(w AS INT) AS height, CAST(nf AS INT) AS n_frames
         |FROM g ORDER BY doc_id""".stripMargin,

    // storage accounting: parsed payload byte lengths + frame counts,
    // sources-bounded agg, one final division.
    "multimodal_bitrate" ->
      s"""WITH ${ppmGeomCte("g")},
         |a AS (SELECT source, count(*) AS n_assets,
         |        CAST(sum(nf * (11 + fsz)) AS BIGINT) AS n_bytes,
         |        CAST(sum(nf) AS BIGINT) AS n_frames
         |      FROM g JOIN documents USING (doc_id) GROUP BY 1)
         |SELECT source, n_assets, n_bytes, n_frames,
         |  (round((CAST(n_bytes AS DOUBLE) / CAST(n_frames AS DOUBLE)) * 100.0) / 100.0) AS bytes_per_frame
         |FROM a ORDER BY source""".stripMargin,

    // scene cuts on the per-frame ink feature (non-space live pixel
    // bytes); lag window per doc. DuckDB can't substring BLOBs, so the
    // oracle slices the VARCHAR — documents.text is pure ASCII
    // (asserted: len == octet_length), so char offsets == byte offsets.
    "multimodal_scene_cuts" ->
      s"""WITH ${ppmGeomCte("g")},
         |f AS (SELECT doc_id, text, fsz, unnest(range(0, nf)) AS frame_idx FROM g),
         |ft AS (SELECT doc_id, frame_idx,
         |         length(replace(substr(text, CAST(frame_idx * fsz + 1 AS INT), CAST(fsz AS INT)), ' ', '')) AS feat
         |       FROM f),
         |w AS (SELECT doc_id, frame_idx, feat,
         |        lag(feat) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev FROM ft),
         |c AS (SELECT doc_id, frame_idx,
         |        CASE WHEN prev IS NOT NULL AND abs(feat - prev) >= 4 THEN 1 ELSE 0 END AS cut
         |      FROM w)
         |SELECT doc_id, count(*) AS n_frames,
         |  count(*) FILTER (WHERE cut = 1) AS n_cuts,
         |  CAST(min(CASE WHEN cut = 1 THEN frame_idx END) AS INT) AS first_cut
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // per-frame parse results predicted from the spec: pixel-stream
    // offset, raster size, live bytes (the final frame's slice is
    // shorter; its zero padding is never live — ASCII text has no 0x00),
    // md5 of the live slice.
    "multimodal_frames" ->
      s"""WITH ${ppmGeomCte("g")},
         |x AS (SELECT doc_id, text, n, fsz, CAST(unnest(range(0, nf)) AS INT) AS frame_idx FROM g)
         |SELECT doc_id, frame_idx,
         |  CAST(frame_idx * fsz AS BIGINT) AS frame_off,
         |  CAST(fsz AS INT) AS frame_len,
         |  CAST(least(fsz, n - frame_idx * fsz) AS INT) AS n_live,
         |  md5(substr(text, CAST(frame_idx * fsz + 1 AS INT), CAST(fsz AS INT))) AS frame_digest
         |FROM x ORDER BY doc_id, frame_idx""".stripMargin,

    // frame-fingerprint near-dup: the parsed frames' live-byte digests,
    // distinct per doc, df-capped posting join.
    "multimodal_neardup" ->
      s"""WITH ${ppmGeomCte("g")},
         |x AS (SELECT doc_id,
         |        md5(substr(text, CAST(r * fsz + 1 AS INT), CAST(fsz AS INT))) AS fd
         |      FROM (SELECT doc_id, text, fsz, unnest(range(0, nf)) AS r FROM g)),
         |fr AS (SELECT DISTINCT doc_id, fd FROM x),
         |kept AS (SELECT fd FROM fr GROUP BY fd HAVING count(*) >= 2 AND count(*) <= 20),
         |fk AS (SELECT fr.doc_id, fr.fd FROM fr JOIN kept USING (fd))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
         |FROM fk a JOIN fk b USING (fd) WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin,

    // the MIXED table (spec av-v1): even doc_ids are P6 rasters, odd are
    // RIFF/WAVE 8-bit PCM (44-byte canonical header + n sample bytes at
    // 8 kHz mono). The oracle predicts BOTH formats' parsed fields from
    // their spec arithmetic — P6 via the shared geometry CTE, WAV via
    // n_bytes = 44 + n, n_units = n samples, rate 8000 — so a misrouted
    // row or a misparsed little-endian chunk size goes hash-red.
    "multimodal_mixed_meta" ->
      s"""WITH ${ppmGeomCte("g")}
         |SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'wav' END AS format,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN nf * (11 + fsz) ELSE 44 + n END AS INT) AS n_bytes,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN nf ELSE n END AS INT) AS n_units,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN w ELSE 0 END AS INT) AS width,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN w ELSE 0 END AS INT) AS height,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 END AS INT) AS sample_rate
         |FROM g ORDER BY doc_id""".stripMargin,

    // cross-format kNN over the mixed table's unified features: raster
    // and audio rows in ONE ranking, probe = doc 7's (odd ⇒ WAV)
    // features.
    "multimodal_mixed_embed" ->
      s"""WITH ${avFeatCtes("f")},
         |q AS (SELECT features AS qv FROM f WHERE doc_id = 7),
         |d AS (SELECT f.doc_id AS id, ${l2("f.features", "q.qv")} AS score FROM f, q)
         |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
         |       (round((score) * 10000.0) / 10000.0) AS value
         |FROM d ORDER BY score, id LIMIT 10""".stripMargin,

    // decoder features re-derived independently: 8-bucket histogram of
    // the PIXEL bytes (text bytes via ascii(char) — pure ASCII — plus
    // the final frame's zero padding in bucket 0), normalized by the
    // total pixel count in FLOAT32 (DuckDB FLOAT/FLOAT division = JVM
    // float division, verified), then the standard exact-kNN shape.
    "multimodal_embed" ->
      s"""WITH ${ppmFeatCtes("f")},
         |q AS (SELECT features AS qv FROM f WHERE doc_id = 7),
         |d AS (SELECT f.doc_id AS id, ${l2("f.features", "q.qv")} AS score FROM f, q)
         |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
         |       (round((score) * 10000.0) / 10000.0) AS value
         |FROM d ORDER BY score, id LIMIT 10""".stripMargin,

    // ================= E. analytics / events =================

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  (round((sum(l_quantity)) * 100.0) / 100.0) AS sum_qty,
        |  (round((sum(l_extendedprice)) * 100.0) / 100.0) AS sum_base_price,
        |  (round((sum(l_extendedprice * (1.0 - l_discount))) * 100.0) / 100.0) AS sum_disc_price,
        |  (round((sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))) * 100.0) / 100.0) AS sum_charge,
        |  (round((avg(l_quantity)) * 10000.0) / 10000.0) AS avg_qty,
        |  (round((avg(l_extendedprice)) * 10000.0) / 10000.0) AS avg_price,
        |  (round((avg(l_discount)) * 10000.0) / 10000.0) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey,
        |  (round((sum(l_extendedprice * (1.0 - l_discount))) * 100.0) / 100.0) AS revenue,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
        |  o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_local" ->
      """SELECT n_name, (round((sum(l_extendedprice * (1.0 - l_discount))) * 100.0) / 100.0) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, (round((c_acctbal) * 100.0) / 100.0) AS c_acctbal, n_name,
        |  (round((sum(l_extendedprice * (1.0 - l_discount))) * 100.0) / 100.0) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // pure filter + single-row aggregate; the Spark side's value is the
    // pushed-down scan, which cannot show through in the result.
    // exact 1e-4-dollar integer units (cents × discount-hundredths),
    // integer half-up to cents — mirrors the Spark side term-for-term.
    "q6_forecast" ->
      """WITH s AS (SELECT sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |                     * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS u4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24)
        |SELECT CAST(((u4 + 50) // 100) / 100.0 AS DOUBLE) AS revenue FROM s""".stripMargin,

    // exact 1e-4-dollar integer units like q6; the pct is ONE double
    // division of the two exact long sums, identical to the Spark side.
    "q14_promo" ->
      """WITH a AS (SELECT
        |  sum(CASE WHEN p_type = 'ECONOMY'
        |        THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |             * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |        ELSE 0 END) AS promo_u4,
        |  sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS total_u4
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')
        |SELECT CAST(((promo_u4 + 50) // 100) / 100.0 AS DOUBLE) AS promo_revenue,
        |  CAST(((total_u4 + 50) // 100) / 100.0 AS DOUBLE) AS total_revenue,
        |  CAST(round((100.0 * promo_u4 / total_u4) * 10000.0) / 10000.0 AS DOUBLE) AS promo_pct
        |FROM a""".stripMargin,

    // user-journey Markov transitions: lag window + MLE n/n_from.
    "events_markov" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
        |l AS (SELECT event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_type
        |      FROM x),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT prev_type, next_type, n,
        |        sum(n) OVER (PARTITION BY prev_type) AS n_from FROM c)
        |SELECT prev_type, next_type, n, (round((n / n_from) * 10000.0) / 10000.0) AS p
        |FROM f ORDER BY prev_type, next_type""".stripMargin,

    // new vs returning: first-seen day per user, per-day conditional
    // counts on integer epoch days.
    "events_new_vs_returning" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1)
        |SELECT day,
        |  count(*) FILTER (WHERE day = first_day) AS n_new,
        |  count(*) FILTER (WHERE day <> first_day) AS n_returning
        |FROM ud JOIN f USING (user_id) GROUP BY day ORDER BY day""".stripMargin,

    // month-over-month growth: exact-long monthly revenue, lag over the
    // bounded month grid, one double division.
    "lineitem_monthly_growth" ->
      """WITH m AS (SELECT strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m') AS month,
        |        CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) *
        |          (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT) AS rev_u4
        |      FROM lineitem GROUP BY 1),
        |l AS (SELECT month, rev_u4, lag(rev_u4) OVER (ORDER BY month) AS prev_u4 FROM m)
        |SELECT month, ((rev_u4 + 50) // 100) / 100.0 AS revenue,
        |  CASE WHEN prev_u4 IS NOT NULL THEN
        |    (round((CAST(rev_u4 - prev_u4 AS DOUBLE) * 100.0 / prev_u4) * 10000.0) / 10000.0)
        |  END AS growth_pct
        |FROM l ORDER BY month""".stripMargin,

    // ABC/Pareto supplier revenue concentration: exact 1e-4-unit longs,
    // integer threshold comparisons, supplier-bounded window.
    "orders_pareto" ->
      """WITH r AS (SELECT l_suppkey,
        |        CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) *
        |          (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT) AS rev
        |      FROM lineitem GROUP BY 1),
        |w AS (SELECT l_suppkey, rev,
        |        CAST(sum(rev) OVER (ORDER BY rev DESC, l_suppkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(sum(rev) OVER () AS BIGINT) AS tot FROM r),
        |cl AS (SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
        |               WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc_class,
        |         rev, tot FROM w)
        |SELECT abc_class, count(*) AS n_suppliers,
        |  ((CAST(sum(rev) AS BIGINT) + 50) // 100) / 100.0 AS revenue,
        |  (round((CAST(sum(rev) AS DOUBLE) / max(tot)) * 10000.0) / 10000.0) AS share
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,

    // inter-event gap percentiles: rank selection over the (type, gap)
    // value distribution, the corpus_quantiles discipline.
    "events_gap_stats" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |l AS (SELECT event_type,
        |        (t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)) // 1000000 AS gap_s
        |      FROM x),
        |c AS (SELECT event_type, gap_s, count(*) AS c FROM l
        |      WHERE gap_s IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT event_type, gap_s,
        |        sum(c) OVER (PARTITION BY event_type ORDER BY gap_s) AS cum,
        |        sum(c) OVER (PARTITION BY event_type) AS n FROM c)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN gap_s END) AS p50_s,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN gap_s END) AS p90_s,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN gap_s END) AS p99_s
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // quality deciles: rank selection over the ≤ 10,001-value 4-dp
    // score distribution.
    "corpus_quality_deciles" ->
      s"""WITH $langScoreCtes,
         |sd AS (SELECT CAST(floor(score * 10000.0 + 0.5) AS BIGINT) AS s4 FROM sc),
         |cd AS (SELECT s4, count(*) AS c FROM sd GROUP BY 1),
         |td AS (SELECT s4, sum(c) OVER (ORDER BY s4) AS cum, sum(c) OVER () AS n FROM cd),
         |ds AS (SELECT unnest(range(1, 10)) AS decile),
         |b AS (SELECT decile, min(CASE WHEN cum >= (n * decile * 10 + 99) // 100 THEN s4 END) AS b4
         |      FROM td CROSS JOIN ds GROUP BY 1)
         |SELECT CAST(decile AS INT) AS decile,
         |  (round((CAST(b4 AS DOUBLE) / 10000.0) * 10000.0) / 10000.0) AS score_boundary
         |FROM b ORDER BY decile""".stripMargin,

    // repeat-purchase KPI: per-customer partial agg, two divisions.
    "orders_repeat_rate" ->
      """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |        CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
        |        CAST(sum(n) AS BIGINT) AS n_orders FROM c)
        |SELECT n_customers, n_repeat,
        |  (round((CAST(n_repeat AS DOUBLE) / CAST(n_customers AS DOUBLE)) * 10000.0) / 10000.0) AS repeat_rate,
        |  (round((CAST(n_orders AS DOUBLE) / CAST(n_customers AS DOUBLE)) * 10000.0) / 10000.0) AS orders_per_customer
        |FROM a""".stripMargin,

    // hapax share: counts-of-counts per source.
    "corpus_hapax_share" ->
      s"""WITH t AS (SELECT source, unnest($toks) AS word FROM documents),
         |c AS (SELECT source, word, count(*) AS c FROM t GROUP BY 1, 2),
         |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
         |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |      FROM c GROUP BY 1)
         |SELECT source, n_types, n_hapax,
         |  (round((CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE)) * 10000.0) / 10000.0) AS hapax_share
         |FROM a ORDER BY source""".stripMargin,

    // SRM gate: exact long counts, χ² one double expression, flag via
    // the integer cross-multiplied form.
    "events_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |c AS (SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |      FROM u)
        |SELECT n_a, n_b,
        |  (round((CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * 10000.0) / 10000.0) AS chi2,
        |  (100 * (n_a - n_b) * (n_a - n_b) > 384 * (n_a + n_b)) AS srm_flag
        |FROM c""".stripMargin,

    // dup-vs-quality: 4-dp scores fixed to exact longs, minhash member
    // set via a subquery-scoped WITH (shadowing per recall_eval
    // precedent), group means one division of exact sums.
    "corpus_quality_vs_dup" ->
      s"""WITH $langScoreCtes,
         |mp AS (SELECT a_id, b_id FROM
         |  (WITH $minhashCtes SELECT a_id, b_id FROM est WHERE e >= 0.5) z),
         |dup AS (SELECT a_id AS doc_id FROM mp UNION SELECT b_id FROM mp),
         |j AS (SELECT sc.doc_id, CAST(floor(sc.score * 10000.0 + 0.5) AS BIGINT) AS s4,
         |        CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
         |      FROM sc LEFT JOIN dup ON dup.doc_id = sc.doc_id)
         |SELECT CAST(is_dup AS INT) AS is_dup, CAST(count(*) AS BIGINT) AS n_docs,
         |  (round((CAST(sum(s4) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 10000.0)) * 10000.0) / 10000.0) AS mean_quality
         |FROM j GROUP BY 1 ORDER BY is_dup""".stripMargin,

    // fertility: stored char counts over the BPE-proxy regexp count.
    "corpus_tokenizer_fertility" ->
      """WITH t AS (SELECT lang, n_chars,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
        |  FROM documents),
        |a AS (SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |        CAST(sum(n_bpe) AS BIGINT) AS n_bpe FROM t GROUP BY 1)
        |SELECT lang, n_docs, n_chars, n_bpe,
        |  (round((CAST(n_chars AS DOUBLE) / CAST(n_bpe AS DOUBLE)) * 10000.0) / 10000.0) AS chars_per_token
        |FROM a ORDER BY lang""".stripMargin,

    // AQP evidence: deterministic 10% hash sample vs exact, ONE scan,
    // both sums conditional aggregates in the same rollup.
    "lineitem_sample_eval" ->
      s"""WITH li AS (SELECT strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m') AS month,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
         |    (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS u4,
         |    (${tokenHash60("'smp:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 10 = 0) AS s
         |  FROM lineitem),
         |a AS (SELECT month, CAST(sum(u4) AS BIGINT) AS exact_u4,
         |        CAST(sum(CASE WHEN s THEN u4 ELSE 0 END) AS BIGINT) AS smp_u4,
         |        CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |        CAST(count(*) AS BIGINT) AS n_rows
         |      FROM li GROUP BY 1)
         |SELECT month, n_rows, n_sampled,
         |  (round((CAST(exact_u4 AS DOUBLE) / 10000.0) * 100.0) / 100.0) AS exact_rev,
         |  (round((CAST(smp_u4 AS DOUBLE) * 10.0 / 10000.0) * 100.0) / 100.0) AS est_rev,
         |  (round((abs(CAST(smp_u4 AS DOUBLE) * 10.0 - CAST(exact_u4 AS DOUBLE)) / CAST(exact_u4 AS DOUBLE)) * 10000.0) / 10000.0) AS rel_err
         |FROM a ORDER BY month""".stripMargin,

    // pad-waste: all-integer per-doc bin arithmetic, 3 literal budgets.
    "corpus_pad_waste" ->
      s"""WITH t AS (SELECT CAST(len($toks) AS BIGINT) AS n FROM documents),
         |a AS (SELECT
         |  CAST(sum(((n + 127) // 128) * 128) AS BIGINT) AS s128,
         |  CAST(sum(((n + 255) // 256) * 256) AS BIGINT) AS s256,
         |  CAST(sum(((n + 511) // 512) * 512) AS BIGINT) AS s512,
         |  CAST(sum(n) AS BIGINT) AS toks FROM t)
         |SELECT budget, n_tokens, n_slots,
         |  (round((CAST(n_slots - n_tokens AS DOUBLE) / CAST(n_slots AS DOUBLE)) * 10000.0) / 10000.0) AS waste
         |FROM (
         |  SELECT 128 AS budget, toks AS n_tokens, s128 AS n_slots FROM a
         |  UNION ALL SELECT 256, toks, s256 FROM a
         |  UNION ALL SELECT 512, toks, s512 FROM a)
         |ORDER BY budget""".stripMargin,

    // decile mix: boundaries by rank selection over the count
    // distribution, decile = 1 + #bounds strictly below, bounded mix.
    "events_user_decile_mix" ->
      """WITH utc AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |             FROM events GROUP BY 1, 2),
        |pu AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM utc GROUP BY 1),
        |dist AS (SELECT n, count(*) AS cn FROM pu GROUP BY 1),
        |t AS (SELECT n, sum(cn) OVER (ORDER BY n) AS cum, sum(cn) OVER () AS tot FROM dist),
        |ds AS (SELECT unnest(range(1, 10)) AS d),
        |bounds AS (SELECT d, min(CASE WHEN cum >= (tot * d * 10 + 99) // 100 THEN n END) AS b
        |           FROM t CROSS JOIN ds GROUP BY d),
        |pd AS (SELECT pu.user_id,
        |         1 + CAST(sum(CASE WHEN pu.n > bounds.b THEN 1 ELSE 0 END) AS BIGINT) AS decile
        |       FROM pu CROSS JOIN bounds GROUP BY 1),
        |mix AS (SELECT pd.decile, utc.event_type, CAST(sum(utc.c) AS BIGINT) AS n_events
        |        FROM utc JOIN pd USING (user_id) GROUP BY 1, 2),
        |w AS (SELECT *, CAST(sum(n_events) OVER (PARTITION BY decile) AS BIGINT) AS t FROM mix)
        |SELECT CAST(decile AS INT) AS decile, event_type, n_events,
        |  (round((CAST(n_events AS DOUBLE) / CAST(t AS DOUBLE)) * 10000.0) / 10000.0) AS share
        |FROM w ORDER BY decile, event_type""".stripMargin,

    // daily KPI table: one narrow projection feeds three aggregation
    // trees; joins on the days-bounded key.
    "events_daily_kpis" ->
      """WITH b AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |r AS (SELECT day, CAST(count(*) AS BIGINT) AS n_events,
        |        (round((CAST(sum(cents) AS DOUBLE) / 100.0) * 100.0) / 100.0) AS revenue
        |      FROM b GROUP BY 1),
        |ud AS (SELECT DISTINCT day, user_id FROM b),
        |d AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |f AS (SELECT user_id, min(day) AS day FROM ud GROUP BY 1),
        |nu AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new_users FROM f GROUP BY 1)
        |SELECT r.day, n_events, dau,
        |  CAST(coalesce(nu.n_new_users, 0) AS BIGINT) AS n_new_users, revenue
        |FROM r JOIN d USING (day) LEFT JOIN nu USING (day) ORDER BY day""".stripMargin,

    // stabbing count: session bounds from the same cumsum chain, hour
    // buckets unnested per session, hours-bounded rollup.
    "events_concurrent" ->
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
        |b AS (
        |  SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > 1800000000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |s AS (
        |  SELECT user_id, t_us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM b),
        |iv AS (SELECT user_id, sid, min(t_us) AS lo, max(t_us) AS hi FROM s GROUP BY 1, 2),
        |g AS (SELECT unnest(range(lo // 3600000000, hi // 3600000000 + 1)) AS hb FROM iv)
        |SELECT hb * 3600000000 AS hour_us, CAST(count(*) AS BIGINT) AS n_active
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // nation HHI: exact HUGEINT rev moments, single-division ratios.
    "supplier_concentration" ->
      """WITH li AS (SELECT l_suppkey,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |    (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS u4 FROM lineitem),
        |ps AS (SELECT s.s_nationkey, li.l_suppkey, CAST(sum(u4) AS BIGINT) AS rev
        |       FROM li JOIN supplier s ON s.s_suppkey = li.l_suppkey GROUP BY 1, 2),
        |agg AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |          CAST(sum(CAST(rev AS HUGEINT)) AS HUGEINT) AS t,
        |          CAST(sum(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) AS HUGEINT) AS sq,
        |          CAST(max(rev) AS BIGINT) AS mx
        |        FROM ps GROUP BY 1)
        |SELECT n.n_name AS nation, n_suppliers,
        |  (round((CAST(t AS DOUBLE) / 10000.0) * 100.0) / 100.0) AS revenue,
        |  (round((CAST(sq AS DOUBLE) / CAST(t * t AS DOUBLE)) * 10000.0) / 10000.0) AS hhi,
        |  (round((CAST(mx AS DOUBLE) / CAST(t AS DOUBLE)) * 10000.0) / 10000.0) AS top_share
        |FROM agg JOIN nation n ON n.n_nationkey = agg.s_nationkey
        |ORDER BY nation""".stripMargin,

    // KMV sketch: 64 smallest md5-60 hashes per type, (k−1)·2⁶⁰/h_k,
    // exact fallback under 64 distinct values.
    "events_kmv" ->
      s"""WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT event_type, user_id,
         |        ${tokenHash60("'kmv:' || CAST(user_id AS VARCHAR)")} AS h FROM ut),
         |k AS (SELECT event_type, user_id, h FROM h
         |      QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h, user_id) <= 64),
         |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
         |        CAST(max(h) AS BIGINT) AS hmax FROM k GROUP BY 1),
         |x AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM ut GROUP BY 1),
         |e AS (SELECT x.event_type, n_exact, n_kept,
         |        CASE WHEN n_kept = 64 THEN 63.0 * 1152921504606846976.0 / CAST(hmax AS DOUBLE)
         |             ELSE CAST(n_kept AS DOUBLE) END AS est
         |      FROM x JOIN s USING (event_type))
         |SELECT event_type, n_exact, n_kept,
         |  (round((est) * 10.0) / 10.0) AS kmv_est,
         |  (round((abs(est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)) * 10000.0) / 10000.0) AS rel_err
         |FROM e ORDER BY event_type""".stripMargin,

    // rule audit: one aggregation per table, rules unpivoted to rows.
    "table_rule_audit" ->
      """WITH li AS (SELECT
        |  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS BIGINT) AS r_qty,
        |  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.10) THEN 1 ELSE 0 END) AS BIGINT) AS r_disc,
        |  CAST(sum(CASE WHEN NOT (l_tax >= 0.0) THEN 1 ELSE 0 END) AS BIGINT) AS r_tax,
        |  CAST(sum(CASE WHEN NOT (l_extendedprice > 0.0) THEN 1 ELSE 0 END) AS BIGINT) AS r_price,
        |  CAST(sum(CASE WHEN NOT (l_returnflag IN ('A', 'N', 'R')) THEN 1 ELSE 0 END) AS BIGINT) AS r_flag
        |  FROM lineitem),
        |o AS (SELECT
        |  CAST(sum(CASE WHEN NOT (o_totalprice > 0.0) THEN 1 ELSE 0 END) AS BIGINT) AS r_total,
        |  CAST(sum(CASE WHEN NOT (o_orderstatus IN ('F', 'O', 'P')) THEN 1 ELSE 0 END) AS BIGINT) AS r_status,
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_date
        |  FROM orders),
        |e AS (SELECT
        |  CAST(sum(CASE WHEN NOT (value >= 0.0) THEN 1 ELSE 0 END) AS BIGINT) AS r_val,
        |  CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS r_dup
        |  FROM events)
        |SELECT rule, n_violations FROM (
        |  SELECT 'lineitem_quantity_range' AS rule, r_qty AS n_violations FROM li
        |  UNION ALL SELECT 'lineitem_discount_range', r_disc FROM li
        |  UNION ALL SELECT 'lineitem_tax_nonneg', r_tax FROM li
        |  UNION ALL SELECT 'lineitem_price_positive', r_price FROM li
        |  UNION ALL SELECT 'lineitem_returnflag_domain', r_flag FROM li
        |  UNION ALL SELECT 'orders_totalprice_positive', r_total FROM o
        |  UNION ALL SELECT 'orders_status_domain', r_status FROM o
        |  UNION ALL SELECT 'orders_date_not_null', r_date FROM o
        |  UNION ALL SELECT 'events_value_nonneg', r_val FROM e
        |  UNION ALL SELECT 'events_id_duplicates', r_dup FROM e)
        |ORDER BY rule""".stripMargin,

    // exact value percentiles by rank selection over the (type, cents)
    // distribution — the gap_stats pattern on the money column.
    "events_value_quantiles" ->
      """WITH v AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |c AS (SELECT event_type, cents, count(*) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, cents,
        |        sum(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        |        sum(c) OVER (PARTITION BY event_type) AS n FROM c)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN cents END) AS p50_cents,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN cents END) AS p90_cents,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN cents END) AS p99_cents
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // lag-k autocorrelation over the dense hourly grid: HUGEINT
    // moments, doubles only in the final Pearson expression.
    "events_autocorr" -> {
      val lags = Seq(1, 2, 3, 6, 12, 24)
      val lagCols = lags.map(k => s"CAST(lag(c, $k) OVER w AS HUGEINT) AS c_$k").mkString(",\n|        ")
      val parts = lags.map(k =>
        s"SELECT $k AS lag_h, count(*) AS n, sum(c) AS sx, sum(c_$k) AS sy, " +
          s"sum(c * c) AS sxx, sum(c_$k * c_$k) AS syy, sum(c * c_$k) AS sxy " +
          s"FROM l WHERE c_$k IS NOT NULL").mkString("\n|      UNION ALL ")
      s"""WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h FROM events),
         |hc AS (SELECT h, count(*) AS c FROM e GROUP BY 1),
         |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
         |sp AS (SELECT unnest(generate_series(h0, h1)) AS h FROM b),
         |g AS (SELECT sp.h, coalesce(hc.c, 0) AS c FROM sp LEFT JOIN hc ON sp.h = hc.h),
         |l AS (SELECT h, CAST(c AS HUGEINT) AS c,
         |        $lagCols
         |      FROM g WINDOW w AS (ORDER BY h)),
         |m AS ($parts)
         |SELECT lag_h, n,
         |  (round((CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
         |    sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) *
         |         CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))) * 10000.0) / 10000.0) AS r
         |FROM m ORDER BY lag_h""".stripMargin
    },

    // k-anonymity report: QI-group sizes, small-group rollup.
    "customer_k_anonymity" ->
      """WITH qi AS (SELECT c_mktsegment, c_nationkey,
        |        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_k, count(*) AS g
        |      FROM customer GROUP BY 1, 2, 3)
        |SELECT count(*) AS n_groups,
        |  count(*) FILTER (WHERE g < 5) AS n_small_groups,
        |  CAST(sum(g) AS BIGINT) AS n_customers,
        |  CAST(sum(CASE WHEN g < 5 THEN g ELSE 0 END) AS BIGINT) AS n_at_risk,
        |  (round((CAST(sum(CASE WHEN g < 5 THEN g ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(g) AS BIGINT)) * 10000.0) / 10000.0) AS at_risk_frac
        |FROM qi""".stripMargin,

    // FK orphan audit: NOT IN anti-semantics over non-null keys.
    "table_fk_check" ->
      """SELECT * FROM (
        |  SELECT 'orders->customer' AS relationship, count(*) AS n_orphans
        |    FROM orders WHERE o_custkey IS NOT NULL
        |     AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
        |  UNION ALL SELECT 'lineitem->orders', count(*)
        |    FROM lineitem WHERE l_orderkey IS NOT NULL
        |     AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)
        |  UNION ALL SELECT 'lineitem->part', count(*)
        |    FROM lineitem WHERE l_partkey IS NOT NULL
        |     AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL)
        |  UNION ALL SELECT 'lineitem->supplier', count(*)
        |    FROM lineitem WHERE l_suppkey IS NOT NULL
        |     AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL)
        |) ORDER BY relationship""".stripMargin,

    // stationary distribution: the identical integer fixed-point
    // trajectory unrolled (⌊v·n / n_from⌋ per round, 3 rounds).
    "events_markov_steady" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
        |l AS (SELECT event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev
        |      FROM x),
        |c AS (SELECT prev, event_type AS next, count(*) AS n
        |      FROM l WHERE prev IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT prev, next, n, CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS n_from FROM c),
        |p0 AS (SELECT DISTINCT prev AS state, CAST(200000 AS BIGINT) AS v FROM c),
        |p1 AS (SELECT f.next AS state, CAST(sum(v * n // n_from) AS BIGINT) AS v
        |       FROM f JOIN p0 ON f.prev = p0.state GROUP BY 1),
        |p2 AS (SELECT f.next AS state, CAST(sum(v * n // n_from) AS BIGINT) AS v
        |       FROM f JOIN p1 ON f.prev = p1.state GROUP BY 1),
        |p3 AS (SELECT f.next AS state, CAST(sum(v * n // n_from) AS BIGINT) AS v
        |       FROM f JOIN p2 ON f.prev = p2.state GROUP BY 1)
        |SELECT state, v AS pi6,
        |  (round((CAST(v AS DOUBLE) / 1000000.0) * 10000.0) / 10000.0) AS p
        |FROM p3 ORDER BY state""".stripMargin,

    // HyperLogLog register state re-derived from the same md5 hash:
    // exact-integer register sum S = Σ 2^(60-Mj) in DECIMAL(38,0), one
    // double division at the end — identical expression tree to
    // Sketch.hllDistinct.
    "events_hll" ->
      s"""WITH e AS (SELECT event_type,
         |  CAST(user_id AS VARCHAR) || ':' || strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS item FROM events),
         |h AS (SELECT event_type, item, ${tokenHash60("item")} AS h FROM e),
         |r AS (SELECT event_type, h >> 52 AS reg, h & 4503599627370495 AS suffix FROM h),
         |rk AS (SELECT event_type, reg,
         |         max(CASE WHEN suffix = 0 THEN 53 ELSE 53 - len(bin(suffix)) END) AS mj
         |       FROM r GROUP BY 1, 2),
         |s AS (SELECT event_type, count(*) AS n_regs,
         |        sum(CAST(1::BIGINT << (60 - mj) AS DECIMAL(38,0))) AS sp FROM rk GROUP BY 1),
         |t AS (SELECT event_type, n_regs, 256 - n_regs AS v_zero,
         |        sp + CAST(256 - n_regs AS DECIMAL(38,0)) * CAST('1152921504606846976' AS DECIMAL(38,0)) AS s_total
         |      FROM s),
         |est AS (SELECT event_type, n_regs, v_zero,
         |          0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 1152921504606846976.0 / CAST(s_total AS DOUBLE) AS est_raw
         |        FROM t),
         |f AS (SELECT event_type, n_regs, v_zero,
         |        CASE WHEN est_raw <= 640.0 AND v_zero > 0
         |             THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE)) ELSE est_raw END AS est
         |      FROM est),
         |x AS (SELECT event_type, count(DISTINCT item) AS n_exact FROM e GROUP BY 1)
         |SELECT f.event_type, x.n_exact, f.n_regs, f.v_zero,
         |  (round((f.est) * 10000.0) / 10000.0) AS hll_est
         |FROM f JOIN x USING (event_type) ORDER BY event_type""".stripMargin,

    // Bloom bit positions re-derived from the same md5 hashes; positive
    // ⇔ every one of the probe's distinct positions is a set bit.
    // single-pass numeric profile: one agg row, unpivoted per column;
    // extrema in exact 1e-4 integer units.
    "table_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = cols.map { c =>
        s"""CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}__nulls,
           |  count(DISTINCT $c) AS ${c}__nd,
           |  min(CAST(floor($c * 10000.0 + 0.5) AS BIGINT)) AS ${c}__min,
           |  max(CAST(floor($c * 10000.0 + 0.5) AS BIGINT)) AS ${c}__max""".stripMargin
      }.mkString(",\n")
      val rows = cols.map { c =>
        s"SELECT '$c' AS column_name, n, ${c}__nulls AS n_null, ${c}__nd AS n_distinct, " +
          s"${c}__min AS min_fx, ${c}__max AS max_fx FROM a"
      }.mkString(" UNION ALL ")
      s"""WITH a AS (SELECT count(*) AS n, $aggs FROM lineitem)
         |$rows ORDER BY column_name""".stripMargin
    },

    // Count-Min Sketch: d=4 x w=256 integer counters, one-sided
    // frequency estimates for the deterministic 1% user sample — all
    // exact integers, re-derived end-to-end.
    "events_cms" ->
      s"""WITH b AS (SELECT user_id, r.i AS i,
         |    ${tokenHash60("'cms' || CAST(r.i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 256 AS bkt
         |  FROM events, range(0, 4) r(i)),
         |counters AS (SELECT i, bkt, count(*) AS c FROM b GROUP BY 1, 2),
         |pk AS (SELECT DISTINCT user_id FROM events WHERE user_id % 23 = 0),
         |pb AS (SELECT pk.user_id, r.i AS i,
         |    ${tokenHash60("'cms' || CAST(r.i AS VARCHAR) || ':' || CAST(pk.user_id AS VARCHAR)")} % 256 AS bkt
         |  FROM pk, range(0, 4) r(i)),
         |est AS (SELECT user_id, min(coalesce(c, 0)) AS cms_est
         |        FROM pb LEFT JOIN counters USING (i, bkt) GROUP BY 1),
         |exact AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1)
         |SELECT est.user_id, exact.n_exact, est.cms_est
         |FROM est JOIN exact USING (user_id) ORDER BY user_id""".stripMargin,

    "events_bloom" ->
      s"""WITH members AS (SELECT DISTINCT user_id FROM events
         |                 WHERE event_type = 'purchase' AND value > 200),
         |probes AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         |mpos AS (SELECT DISTINCT ${tokenHash60("'bloom' || CAST(r.range AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 4096 AS bit
         |         FROM members, range(0, 3) r),
         |ppos AS (SELECT DISTINCT user_id AS probe,
         |           ${tokenHash60("'bloom' || CAST(r.range AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 4096 AS bit
         |         FROM probes, range(0, 3) r),
         |verdict AS (SELECT probe,
         |              count(*) = sum(CASE WHEN bit IN (SELECT bit FROM mpos) THEN 1 ELSE 0 END) AS bloom_positive
         |            FROM ppos GROUP BY probe)
         |SELECT v.probe, v.bloom_positive, (m.user_id IS NOT NULL) AS is_member
         |FROM verdict v LEFT JOIN members m ON v.probe = m.user_id
         |ORDER BY v.probe""".stripMargin,

    "events_windowed" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start, event_type,
        |  count(*) AS n, (round((sum(value)) * 100.0) / 100.0) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // incremental-view merge must equal the plain full aggregation —
    // the oracle IS the recompute, proving merge(partials) ≡ full.
    "events_windowed_merge" ->
      """WITH x AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start, event_type,
        |             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4 FROM events)
        |SELECT hour_start, event_type, count(*) AS n, CAST(sum(v4) AS BIGINT) AS sum_v4
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // z-order interleave re-derived bit by bit in integer arithmetic.
    "layout_zorder" ->
      """WITH x AS (SELECT event_id, user_id,
        |             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_num
        |           FROM events)
        |SELECT event_id, user_id, day_num,
        |  CAST(list_sum(list_transform(range(0, 16), i ->
        |    (((user_id % 65536) >> i) & 1) * (1::BIGINT << (2 * i)) +
        |    (((day_num % 65536) >> i) & 1) * (1::BIGINT << (2 * i + 1)))) AS BIGINT) AS z
        |FROM x ORDER BY z, event_id""".stripMargin,

    // fixed-size stratified sample: deterministic hash rank per stratum.
    "events_stratified" ->
      s"""WITH h AS (SELECT event_type, event_id, user_id,
         |             ${tokenHash60("'strat:' || CAST(event_id AS VARCHAR)")} AS h FROM events)
         |SELECT event_type,
         |       CAST(row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS INT) AS pick,
         |       event_id, user_id
         |FROM h QUALIFY pick <= 50 ORDER BY event_type, pick""".stripMargin,

    // histogram sketch: exact integer bins of the 1e-4-fixed value,
    // midpoint estimate at the ⌈n/2⌉ cumulative bin, exact rank-selected
    // median alongside.
    "events_histogram" ->
      """WITH x AS (SELECT event_type, event_id,
        |             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4 FROM events),
        |b AS (SELECT event_type, v4 // 100000 AS bin, count(*) AS c FROM x GROUP BY 1, 2),
        |e AS (SELECT event_type, bin, c,
        |        sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |        sum(c) OVER (PARTITION BY event_type) AS n,
        |        count(*) OVER (PARTITION BY event_type) AS nb
        |      FROM b),
        |est AS (SELECT event_type, max(n) AS n_events, max(nb) AS n_bins, min(bin) AS p50_bin
        |        FROM e WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |r AS (SELECT event_type, event_id, v4,
        |        row_number() OVER (PARTITION BY event_type ORDER BY v4, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n FROM x),
        |ex AS (SELECT event_type, (round((v4 / 10000.0) * 10000.0) / 10000.0) AS p50_exact
        |       FROM r WHERE rn = (n + 1) // 2)
        |SELECT est.event_type, CAST(est.n_events AS BIGINT) AS n_events,
        |       est.n_bins, ex.p50_exact,
        |       CAST(est.p50_bin * 10.0 + 5.0 AS DOUBLE) AS p50_est
        |FROM est JOIN ex USING (event_type) ORDER BY est.event_type""".stripMargin,

    // 1-hour resample + forward fill: grid bounded by the time span;
    // per-slot close via lexicographic struct max — mirrors
    // Queries.eventsResample.
    "events_resample" ->
      """WITH x AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, event_id,
        |             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4 FROM events),
        |s AS (SELECT event_type, t_us, event_id, v4, t_us // 3600000000 AS slot FROM x),
        |obs AS (SELECT event_type, slot, count(*) AS n_obs,
        |          max({'t': t_us, 'e': event_id, 'v': v4}) AS m FROM s GROUP BY 1, 2),
        |b AS (SELECT min(slot) AS lo, max(slot) AS hi FROM s),
        |ty AS (SELECT DISTINCT event_type FROM s),
        |grid AS (SELECT ty.event_type, unnest(generate_series(b.lo, b.hi)) AS slot FROM ty, b),
        |j AS (SELECT grid.event_type, grid.slot, coalesce(obs.n_obs, 0) AS n_obs,
        |        struct_extract(obs.m, 'v') AS close_v4
        |      FROM grid LEFT JOIN obs USING (event_type, slot))
        |SELECT event_type, slot * 3600000000 AS win_start, CAST(n_obs AS BIGINT) AS n_obs,
        |  last_value(close_v4 IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY slot
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_v4
        |FROM j ORDER BY event_type, win_start""".stripMargin,

    // hopping windows: every event explodes into its 4 covering window
    // slots (1 h window / 15 min hop); exact long 1e-4-unit sums.
    "events_hopping" ->
      """WITH x AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
        |             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4 FROM events),
        |h AS (SELECT event_type, v4,
        |        ((t_us // 900000000) - r.range) * 900000000 AS win_start
        |      FROM x, range(0, 4) r)
        |SELECT win_start, event_type, count(*) AS n, CAST(sum(v4) AS BIGINT) AS sum_v4
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_topn" ->
      """SELECT event_type,
        |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS INT) AS rank,
        |  event_id, (round((value) * 10000.0) / 10000.0) AS value
        |FROM events QUALIFY rank <= 5 ORDER BY event_type, rank""".stripMargin,

    // aggregate-filtered semi-join: exact integer-valued quantity sums.
    "q18_large" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |             FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
        |  (round((o_totalprice) * 100.0) / 100.0) AS o_totalprice,
        |  (round((sum_qty) * 100.0) / 100.0) AS sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY (round((o_totalprice) * 100.0) / 100.0) DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    // EXISTS → left-semi join with the ship-lag residual (Q4 adapted:
    // this schema has no commit/receipt dates, so "late" = any line
    // shipped > 60 days after the order date).
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // bidirectional two-nation trade volume by ship year; exact 1e-4
    // integer units as in q6/q14.
    "q7_volume" ->
      """WITH f AS (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS u4
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT supp_nation, cust_nation, l_year,
        |  CAST(((sum(u4) + 50) // 100) / 100.0 AS DOUBLE) AS revenue
        |FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // market share = ONE double division of two exact long sums
    // (q14 promo_pct discipline).
    "q8_share" ->
      """WITH f AS (SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS u4
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE EXISTS (SELECT 1 FROM nation n2 JOIN region ON n2.n_regionkey = r_regionkey
        |                WHERE c_nationkey = n2.n_nationkey AND r_name = 'ASIA')),
        |a AS (SELECT o_year,
        |    sum(CASE WHEN supp_nation = 'NATION_3' THEN u4 ELSE 0 END) AS nation_u4,
        |    sum(u4) AS total_u4
        |  FROM f GROUP BY 1)
        |SELECT o_year,
        |  CAST(((nation_u4 + 50) // 100) / 100.0 AS DOUBLE) AS nation_revenue,
        |  CAST(((total_u4 + 50) // 100) / 100.0 AS DOUBLE) AS total_revenue,
        |  CAST(round((1.0 * nation_u4 / total_u4) * 10000.0) / 10000.0 AS DOUBLE) AS mkt_share
        |FROM a ORDER BY o_year""".stripMargin,

    // profit may be negative: unrounded double division of the exact
    // 1e-4-unit long (truncating div vs flooring // diverge below 0,
    // so no cents-rounding here). p_retailprice proxies the missing
    // partsupp supplycost.
    "q9_profit" ->
      """WITH f AS (SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |    - CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) * 100
        |      * CAST(l_quantity AS BIGINT) AS amount_u4
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey)
        |SELECT nation, o_year,
        |  CAST(CAST(sum(amount_u4) AS DOUBLE) / 10000.0 AS DOUBLE) AS profit
        |FROM f GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    // outer join preserves zero-order customers into the c_count=0
    // bucket; both aggregates are exact long counts.
    "q13_distribution" ->
      """WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // aggregate-then-argmax on exact-long equality; ties surface as
    // extra rows exactly like the reference SQL's = (SELECT max ...).
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS total_u4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(((total_u4 + 50) // 100) / 100.0 AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_u4 = (SELECT max(total_u4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    // correlated per-part average in exact integers:
    // 5·qty·cnt < sum_qty avoids any float threshold; avg_yearly is one
    // double division of an exact cents long by 700.
    "q17_small_qty" ->
      """WITH pq AS (SELECT l_partkey AS pq_partkey,
        |    sum(CAST(l_quantity AS BIGINT)) AS sum_q, count(*) AS cnt_q
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |  / 700.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#3'
        |JOIN pq ON l_partkey = pq_partkey
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt_q < sum_q""".stripMargin,

    // three disjunctive brand/size/quantity bands over the part join.
    "q19_disjunctive" ->
      """WITH f AS (SELECT
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS u4
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |     OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
        |SELECT CAST(((sum(u4) + 50) // 100) / 100.0 AS DOUBLE) AS revenue FROM f""".stripMargin,

    // anti join against recent orders; the above-average cut is exact
    // integer (bal_cents · cnt > sum_cents). Nation group stands in for
    // the missing phone country code.
    "q22_global" ->
      """WITH s AS (SELECT sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS sum_c,
        |    count(*) AS cnt_c
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey % 5 AS cntry_grp, count(*) AS numcust,
        |  CAST(CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS DOUBLE) AS totacctbal
        |FROM customer, s
        |WHERE CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) * cnt_c > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // RFM cube: quartile thresholds by integer rank selection over each
    // metric's value distribution, scores = 1 + (v > p25) + (v > p50)
    // + (v > p75), exact-cent monetary totals.
    "orders_rfm" ->
      """WITH o AS (SELECT o_custkey,
        |        epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
        |        CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents FROM orders),
        |cust AS (SELECT o_custkey, max(day) AS last_day, count(*) AS freq,
        |           CAST(sum(cents) AS BIGINT) AS cents FROM o GROUP BY 1),
        |g AS (SELECT max(last_day) AS gmax FROM cust),
        |m AS (SELECT o_custkey, gmax - last_day AS recency, freq, cents,
        |        cents // 10000 AS money_h FROM cust, g),
        |mt AS (SELECT 'r' AS metric, recency AS v FROM m
        |       UNION ALL SELECT 'f', freq FROM m
        |       UNION ALL SELECT 'm', money_h FROM m),
        |c AS (SELECT metric, v, count(*) AS c FROM mt GROUP BY 1, 2),
        |t AS (SELECT metric, v,
        |        sum(c) OVER (PARTITION BY metric ORDER BY v) AS cum,
        |        sum(c) OVER (PARTITION BY metric) AS n FROM c),
        |th AS (SELECT metric,
        |         min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN v END) AS p25,
        |         min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
        |         min(CASE WHEN cum >= (n * 75 + 99) // 100 THEN v END) AS p75
        |       FROM t GROUP BY 1),
        |thp AS (SELECT
        |    max(CASE WHEN metric = 'r' THEN p25 END) AS r25,
        |    max(CASE WHEN metric = 'r' THEN p50 END) AS r50,
        |    max(CASE WHEN metric = 'r' THEN p75 END) AS r75,
        |    max(CASE WHEN metric = 'f' THEN p25 END) AS f25,
        |    max(CASE WHEN metric = 'f' THEN p50 END) AS f50,
        |    max(CASE WHEN metric = 'f' THEN p75 END) AS f75,
        |    max(CASE WHEN metric = 'm' THEN p25 END) AS m25,
        |    max(CASE WHEN metric = 'm' THEN p50 END) AS m50,
        |    max(CASE WHEN metric = 'm' THEN p75 END) AS m75
        |  FROM th),
        |sc AS (SELECT m.cents,
        |    1 + CASE WHEN recency > r25 THEN 1 ELSE 0 END
        |      + CASE WHEN recency > r50 THEN 1 ELSE 0 END
        |      + CASE WHEN recency > r75 THEN 1 ELSE 0 END AS r_score,
        |    1 + CASE WHEN freq > f25 THEN 1 ELSE 0 END
        |      + CASE WHEN freq > f50 THEN 1 ELSE 0 END
        |      + CASE WHEN freq > f75 THEN 1 ELSE 0 END AS f_score,
        |    1 + CASE WHEN money_h > m25 THEN 1 ELSE 0 END
        |      + CASE WHEN money_h > m50 THEN 1 ELSE 0 END
        |      + CASE WHEN money_h > m75 THEN 1 ELSE 0 END AS m_score
        |  FROM m, thp)
        |SELECT r_score, f_score, m_score, count(*) AS n_customers,
        |  (round((CAST(sum(cents) AS DOUBLE) / 100.0) * 100.0) / 100.0) AS total_monetary
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // Q2 adapted: per-part argmin (s_acctbal, s_suppkey) among EUROPE
    // suppliers of STANDARD size-10..20 parts.
    "q2_min_supplier" ->
      """WITH supp AS (SELECT s_suppkey, s_name, s_acctbal
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |parts AS (SELECT p_partkey FROM part
        |          WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20),
        |rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |j AS (SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal,
        |        row_number() OVER (PARTITION BY p.p_partkey
        |                           ORDER BY s.s_acctbal, s.s_suppkey) AS rn
        |      FROM rel JOIN parts p ON l_partkey = p.p_partkey
        |      JOIN supp s ON l_suppkey = s.s_suppkey)
        |SELECT p_partkey, s_suppkey, s_name,
        |  (round((s_acctbal) * 100.0) / 100.0) AS s_acctbal
        |FROM j WHERE rn = 1 ORDER BY p_partkey""".stripMargin,

    // Q11 adapted: per-nation shipped value in exact integer units,
    // 1-row global total threshold in integers.
    "q11_important_stock" ->
      """WITH v AS (SELECT s_nationkey,
        |        CAST(CAST(l_quantity AS BIGINT) *
        |             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS HUGEINT) AS v
        |      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
        |bn AS (SELECT n_name, sum(v) AS v FROM v
        |       JOIN nation ON s_nationkey = n_nationkey GROUP BY 1),
        |t AS (SELECT sum(v) AS tot FROM bn)
        |SELECT n_name, CAST(v AS BIGINT) AS value_c2q
        |FROM bn, t WHERE v * 10 > tot
        |ORDER BY value_c2q DESC, n_name""".stripMargin,

    // Q12 adapted: ship-lag buckets (> 60 days = SLOW) × priority
    // counts, integer epoch-day math.
    "q12_ship_lag" ->
      """WITH li AS (SELECT l_orderkey,
        |        epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS ship_day
        |      FROM lineitem),
        |o AS (SELECT o_orderkey, o_orderpriority,
        |        epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS order_day
        |      FROM orders),
        |j AS (SELECT CASE WHEN ship_day - order_day > 60 THEN 'SLOW' ELSE 'FAST' END AS ship_mode,
        |        o_orderpriority FROM li JOIN o ON l_orderkey = o_orderkey)
        |SELECT ship_mode,
        |  count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
        |  count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // Q20 adapted: suppliers holding > 1/6 of a part's shipped
    // quantity, EUROPE only; integer 6·q_ps > q_p cut.
    "q20_excess_supp" ->
      """WITH li AS (SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS q FROM lineitem),
        |ps AS (SELECT l_partkey, l_suppkey, CAST(sum(q) AS BIGINT) AS q_ps FROM li GROUP BY 1, 2),
        |p AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS q_p FROM li GROUP BY 1),
        |supp AS (SELECT s_suppkey, s_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |d AS (SELECT ps.l_suppkey FROM ps JOIN p USING (l_partkey) WHERE ps.q_ps * 6 > p.q_p)
        |SELECT s.s_suppkey, s.s_name, count(*) AS n_dominated_parts
        |FROM d JOIN supp s ON d.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2 ORDER BY n_dominated_parts DESC, s_name LIMIT 20""".stripMargin,

    // Q16 adapted: part-supplier relationships from lineitem, the
    // complaint exclusion as the under-review supplier NOT IN.
    "q16_supplier_cnt" ->
      """WITH pr AS (SELECT p_partkey, p_brand, p_type, p_size FROM part
        |       WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)),
        |l AS (SELECT l_partkey, l_suppkey FROM lineitem
        |      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM l JOIN pr ON l_partkey = p_partkey
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20""".stripMargin,

    // Q21 adapted: sole-latest-shipper suppliers of multi-supplier
    // orders via two aggregate gates on the order key.
    "q21_waiting" ->
      """WITH po AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
        |        max(l_shipdate) AS max_ship FROM lineitem GROUP BY 1),
        |ls AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |       FROM lineitem l JOIN po USING (l_orderkey)
        |       WHERE po.n_supp >= 2 AND l.l_shipdate = po.max_ship),
        |solo AS (SELECT l_orderkey FROM ls GROUP BY 1 HAVING count(*) = 1),
        |b AS (SELECT ls.l_suppkey FROM ls JOIN solo USING (l_orderkey))
        |SELECT s_name, count(*) AS numwait
        |FROM b JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,

    // per-dimension vector profile: float32 fixed to exact 1e-6
    // integers, HUGEINT moments, doubles only in the final expressions.
    "vector_stats" ->
      """WITH e AS (SELECT embedding, unnest(range(1, len(embedding) + 1)) AS i FROM embeddings),
        |v AS (SELECT CAST(i - 1 AS INT) AS dim,
        |        CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT) AS xf
        |      FROM e),
        |m AS (SELECT dim, CAST(count(*) AS HUGEINT) AS n, sum(xf) AS s, sum(xf * xf) AS q,
        |        min(xf) AS mn, max(xf) AS mx FROM v GROUP BY 1)
        |SELECT dim, CAST(n AS BIGINT) AS n,
        |  (round((CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) * 1000000.0) / 1000000.0) AS mean,
        |  (round((sqrt(CAST(n * q - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1000000000000.0))) * 1000000.0) / 1000000.0) AS std,
        |  (round((CAST(mn AS DOUBLE) / 1000000.0) * 1000000.0) / 1000000.0) AS min_v,
        |  (round((CAST(mx AS DOUBLE) / 1000000.0) * 1000000.0) / 1000000.0) AS max_v
        |FROM m ORDER BY dim""".stripMargin,

    // distributed PCA: HUGEINT Gram/covariance re-derived from the
    // data, 3 power-iteration rounds unrolled in the identical
    // fixed-point integer arithmetic (trunc-toward-zero renorm).
    "embedding_pca_power" -> {
      def round(k: Int): String =
        s"""W$k AS (SELECT C.d, sum(C.c * V${k - 1}.v) AS w FROM C JOIN V${k - 1} ON C.e = V${k - 1}.d GROUP BY 1),
           |M$k AS (SELECT max(abs(w)) AS m FROM W$k),
           |V$k AS (SELECT d, CASE WHEN w >= 0 THEN (w * 1000000) // m
           |               ELSE -(((-w) * 1000000) // m) END AS v FROM W$k, M$k)""".stripMargin
      s"""WITH E1 AS (SELECT embedding, unnest(range(1, 65)) AS d FROM embeddings),
         |F AS (SELECT embedding, CAST(d - 1 AS INT) AS d,
         |        CAST(floor(CAST(embedding[CAST(d AS INT)] AS DOUBLE) * 10000.0 + 0.5) AS HUGEINT) AS fd
         |      FROM E1),
         |E2 AS (SELECT d, fd, embedding, unnest(range(1, 65)) AS e FROM F),
         |P AS (SELECT d, CAST(e - 1 AS INT) AS e,
         |        fd * CAST(floor(CAST(embedding[CAST(e AS INT)] AS DOUBLE) * 10000.0 + 0.5) AS HUGEINT) AS p
         |      FROM E2),
         |G AS (SELECT d, e, sum(p) AS g FROM P GROUP BY 1, 2),
         |S AS (SELECT d, sum(fd) AS s FROM F GROUP BY 1),
         |N AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
         |C AS (SELECT G.d, G.e, n * G.g - sa.s * sb.s AS c
         |      FROM G JOIN S sa ON G.d = sa.d JOIN S sb ON G.e = sb.d, N),
         |V0 AS (SELECT CAST(dd - 1 AS INT) AS d, CAST(1000000 AS HUGEINT) AS v
         |       FROM (SELECT unnest(range(1, 65)) AS dd)),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT d AS dim, CAST(v AS BIGINT) AS loading,
         |  (round((CAST(v AS DOUBLE) / 1000000.0) * 1000000.0) / 1000000.0) AS loading_frac
         |FROM V3 ORDER BY dim""".stripMargin
    },

    // pairwise Pearson correlations from exact HUGEINT moments of
    // integer-fixed units; double arithmetic only in the final
    // expression, written identically to the Spark side.
    "table_corr" ->
      """WITH x AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS p,
        |  CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d FROM lineitem),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |  CAST(sum(q) AS HUGEINT) AS sq, CAST(sum(p) AS HUGEINT) AS sp, CAST(sum(d) AS HUGEINT) AS sd,
        |  CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sqq,
        |  CAST(sum(CAST(p AS HUGEINT) * p) AS HUGEINT) AS spp,
        |  CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd,
        |  CAST(sum(CAST(q AS HUGEINT) * p) AS HUGEINT) AS sqp,
        |  CAST(sum(CAST(q AS HUGEINT) * d) AS HUGEINT) AS sqd,
        |  CAST(sum(CAST(p AS HUGEINT) * d) AS HUGEINT) AS spd FROM x)
        |SELECT CAST(n AS BIGINT) AS n,
        |  (round((CAST(n * sqp - sq * sp AS DOUBLE)
        |    / sqrt(CAST(n * sqq - sq * sq AS DOUBLE) * CAST(n * spp - sp * sp AS DOUBLE))) * 1000000.0) / 1000000.0) AS corr_qty_price,
        |  (round((CAST(n * sqd - sq * sd AS DOUBLE)
        |    / sqrt(CAST(n * sqq - sq * sq AS DOUBLE) * CAST(n * sdd - sd * sd AS DOUBLE))) * 1000000.0) / 1000000.0) AS corr_qty_disc,
        |  (round((CAST(n * spd - sp * sd AS DOUBLE)
        |    / sqrt(CAST(n * spp - sp * sp AS DOUBLE) * CAST(n * sdd - sd * sd AS DOUBLE))) * 1000000.0) / 1000000.0) AS corr_price_disc
        |FROM m""".stripMargin,

    // quality-percentile cut: threshold by exact rank selection over the
    // 4-dp-fixed score distribution (≤ 10001 distinct units), then an
    // integer comparison per doc.
    "corpus_quality_filter" ->
      s"""WITH $langScoreCtes,
         |s4t AS (SELECT doc_id, score, CAST(floor(score * 10000.0 + 0.5) AS BIGINT) AS s4 FROM sc),
         |cnt AS (SELECT s4, count(*) AS c FROM s4t GROUP BY 1),
         |cm AS (SELECT s4, sum(c) OVER (ORDER BY s4) AS cum, sum(c) OVER () AS n_docs FROM cnt),
         |th AS (SELECT min(CASE WHEN cum >= (n_docs * 75 + 99) // 100 THEN s4 END) AS s4_p75 FROM cm)
         |SELECT doc_id, score FROM s4t, th WHERE s4 >= s4_p75 ORDER BY doc_id""".stripMargin,

    // Bloom-pruned join: the oracle replays the same integer position
    // family (h = (key % P)² % P squared to decorrelate sequential ids,
    // then the (2i+1)·h + (i²+7) minhash-permutation spelling), so
    // candidate counts (bloom survivors, FPs included) AND the verified
    // join result are both checked exactly.
    "bloom_pruned_join" ->
      s"""WITH bo AS (SELECT o_orderkey FROM orders
         |  WHERE o_orderpriority = '1-URGENT'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'),
         |bits AS (SELECT DISTINCT ((2 * r.range + 1)
         |      * (((o_orderkey % 2147483647) * (o_orderkey % 2147483647)) % 2147483647)
         |      + (r.range * r.range + 7)) % 2147483647 % 4096 AS bit
         |    FROM bo, range(0, 3) r),
         |lh AS (SELECT l_orderkey, l_extendedprice, l_discount,
         |    ((l_orderkey % 2147483647) * (l_orderkey % 2147483647)) % 2147483647 AS h
         |  FROM lineitem),
         |cand AS (SELECT l_orderkey, l_extendedprice, l_discount FROM lh
         |  WHERE (1 * h + 7) % 2147483647 % 4096 IN (SELECT bit FROM bits)
         |    AND (3 * h + 8) % 2147483647 % 4096 IN (SELECT bit FROM bits)
         |    AND (5 * h + 11) % 2147483647 % 4096 IN (SELECT bit FROM bits)),
         |j AS (SELECT c.*, bo.o_orderkey FROM cand c LEFT JOIN bo ON c.l_orderkey = bo.o_orderkey)
         |SELECT count(*) AS n_candidates, count(o_orderkey) AS n_joined,
         |  CAST(((sum(CASE WHEN o_orderkey IS NOT NULL
         |        THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
         |             * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
         |        ELSE 0 END) + 50) // 100) / 100.0 AS DOUBLE) AS revenue
         |FROM j""".stripMargin,

    // salted replicated join must equal the plain join + aggregate.
    "events_salted_join" ->
      """WITH dim AS (SELECT user_id, min(event_id) AS first_event_id FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(e.event_id - d.first_event_id) AS BIGINT) AS delta_sum
        |FROM events e JOIN dim d USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // salted two-phase aggregation must equal the plain GROUP BY —
    // aggregates are order-exact longs, so salting cannot show through.
    "events_salted_agg" ->
      """SELECT event_type, count(event_id) AS n,
        |  min(event_id) AS min_event_id, max(event_id) AS max_event_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // skew profile: per-key counts replayed exactly; the argmax is the
    // deterministic struct-max (ties to the largest key), the ratio one
    // identical double division of exact longs.
    "events_skew_profile" ->
      """WITH kv AS (SELECT 'user_id' AS col_name, CAST(user_id AS VARCHAR) AS key FROM events
        |            UNION ALL SELECT 'event_type', event_type FROM events),
        |c AS (SELECT col_name, key, count(*) AS cnt FROM kv GROUP BY 1, 2),
        |p AS (SELECT col_name, count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |        max(cnt) AS max_cnt FROM c GROUP BY 1),
        |t AS (SELECT c.col_name, max(c.key) AS top_key FROM c JOIN p USING (col_name)
        |      WHERE c.cnt = p.max_cnt GROUP BY 1)
        |SELECT p.col_name, p.n_keys, p.n_rows, p.max_cnt, t.top_key,
        |  (round((CAST(p.max_cnt * p.n_keys AS DOUBLE) / p.n_rows) * 10000.0) / 10000.0) AS skew_ratio
        |FROM p JOIN t USING (col_name) ORDER BY p.col_name""".stripMargin,

    // the exact-integer k-sigma rule: int128 moment sums, squared-
    // deviation comparison — no float in the membership test.
    "events_anomaly" ->
      """WITH sc AS (SELECT event_type, event_id, value,
        |              CAST(floor(value * 10000.0 + 0.5) AS HUGEINT) AS x FROM events),
        |m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |        CAST(sum(x) AS HUGEINT) AS s, CAST(sum(x * x) AS HUGEINT) AS q
        |      FROM sc GROUP BY event_type)
        |SELECT sc.event_type, sc.event_id, (round((sc.value) * 10000.0) / 10000.0) AS value
        |FROM sc JOIN m USING (event_type)
        |WHERE (n * x - s) * (n * x - s) > 9 * (n * q - s * s)
        |ORDER BY sc.event_type, sc.event_id""".stripMargin,

    // ROLLUP grouping sets with exact 1e-4-unit long sums; 'ALL' marks
    // subtotal levels on both engines.
    "events_rollup" ->
      """WITH e AS (SELECT event_type,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4 FROM events)
        |SELECT coalesce(event_type, 'ALL') AS event_type, coalesce(day, 'ALL') AS day,
        |  count(*) AS n, CAST(sum(v4) AS BIGINT) AS sum_v4
        |FROM e GROUP BY ROLLUP(event_type, day)
        |ORDER BY 1, 2""".stripMargin,

    // trailing 5-row frame; exact long sum divided once.
    "events_moving_avg" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
        |             CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4 FROM events)
        |SELECT user_id, event_id, t_us,
        |  count(*) OVER w AS mov_n,
        |  (round((CAST(sum(v4) OVER w AS DOUBLE) / (count(*) OVER w * 10000)) * 10000.0) / 10000.0) AS mov_avg
        |FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
        |                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, t_us, event_id""".stripMargin,

    // SCD2 gaps-and-islands reconstruction of the json k attribute:
    // identical lag/cumsum/groupBy/lead chain on integer-μs time.
    "events_scd2" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
        |             CAST(json_extract(props, '$.k') AS INT) AS v FROM events),
        |b AS (SELECT *, CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v THEN 1 ELSE 0 END AS brk
        |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |r AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS INT) AS run FROM b),
        |runs AS (SELECT user_id, run, v, min(t_us) AS valid_from, count(*) AS n_events
        |         FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, run AS version, v, valid_from,
        |  lead(valid_from) OVER wv AS valid_to, n_events,
        |  (lead(valid_from) OVER wv IS NULL) AS is_current
        |FROM runs WINDOW wv AS (PARTITION BY user_id ORDER BY run)
        |ORDER BY user_id, version""".stripMargin,

    // point-in-time enrichment: the same SCD2 runs, then each purchase
    // picks max(run) among versions with valid_from <= t — provably the
    // containing version since versions partition the timeline.
    "events_scd2_enrich" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
        |             CAST(json_extract(props, '$.k') AS INT) AS v FROM events),
        |b AS (SELECT *, CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v THEN 1 ELSE 0 END AS brk
        |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |r AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS INT) AS run FROM b),
        |runs AS (SELECT user_id, run, v, min(t_us) AS valid_from FROM r GROUP BY 1, 2, 3),
        |p AS (SELECT user_id, t_us, event_id FROM x WHERE event_type = 'purchase'),
        |j AS (SELECT p.user_id, p.t_us, p.event_id, max(rr.run) AS version
        |      FROM p JOIN runs rr ON p.user_id = rr.user_id AND rr.valid_from <= p.t_us
        |      GROUP BY 1, 2, 3)
        |SELECT j.user_id, j.t_us, j.event_id, CAST(j.version AS INT) AS version, runs.v
        |FROM j JOIN runs ON runs.user_id = j.user_id AND runs.run = j.version
        |ORDER BY j.user_id, j.t_us, j.event_id""".stripMargin,

    // heavy hitters = count·(k+1) > n with k = ceil(d/1.2); the MG
    // candidate pass is a complete superset, so the plain GROUP BY /
    // HAVING is the exact same answer.
    "events_heavy_hitters" ->
      """WITH s AS (SELECT count(*) AS n, count(DISTINCT user_id) AS d FROM events)
        |SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
        |HAVING count(*) * (CAST(ceil((SELECT d FROM s) / 1.2) AS BIGINT) + 1) > (SELECT n FROM s)
        |ORDER BY cnt DESC, user_id""".stripMargin,

    // sessions over non-error events (the sessionize construction),
    // then plain containment join — the bucketized plan must produce
    // exactly the BETWEEN-join answer.
    "events_session_attr" ->
      """WITH x AS (SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
        |ne AS (SELECT * FROM x WHERE event_type <> 'error'),
        |b AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > 43200000000
        |                     THEN 1 ELSE 0 END AS brk
        |      FROM ne WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |s AS (SELECT user_id, t_us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM b),
        |iv AS (SELECT user_id, session_id, min(t_us) AS t_start, max(t_us) AS t_end
        |       FROM s GROUP BY 1, 2),
        |err AS (SELECT user_id, event_id, t_us FROM x WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id, e.t_us, CAST(iv.session_id AS BIGINT) AS session_id
        |FROM err e JOIN iv ON e.user_id = iv.user_id
        |  AND e.t_us >= iv.t_start AND e.t_us <= iv.t_end
        |ORDER BY e.user_id, e.event_id""".stripMargin,

    // as-of semantics spelled out as a correlated argmax: latest signup
    // with t <= purchase t, ties to the larger signup_id — exactly the
    // operator's (ts, side, tie) window order.
    "events_asof" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, event_id, event_type FROM events),
        |l AS (SELECT user_id, t_us, event_id FROM e WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, t_us, event_id AS signup_id FROM e WHERE event_type = 'signup')
        |SELECT l.user_id, l.t_us, l.event_id,
        |  (SELECT r.signup_id FROM r WHERE r.user_id = l.user_id AND r.t_us <= l.t_us
        |   ORDER BY r.t_us DESC, r.signup_id DESC LIMIT 1) AS signup_id
        |FROM l ORDER BY user_id, t_us, event_id""".stripMargin,

    // (user, active-day) dedup then cohort join; day arithmetic is
    // exact integer date subtraction on both engines.
    "events_retention" ->
      """WITH ad AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
        |coh AS (SELECT user_id, min(d) AS cd FROM ad GROUP BY user_id)
        |SELECT strftime(coh.cd, '%Y-%m-%d') AS cohort_day,
        |       CAST(ad.d - coh.cd AS INT) AS day_offset, count(*) AS n_users
        |FROM ad JOIN coh USING (user_id) WHERE ad.d - coh.cd <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // DAU/MAU stickiness: the 28-day rolling distinct replayed via the
    // same day-mirror (each user-day feeds its 28 target days); both
    // counts exact integers, stickiness one identical double division.
    "events_dau_mau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |      CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_num
        |    FROM events),
        |dau AS (SELECT day_num, count(*) AS dau FROM ud GROUP BY day_num),
        |sp AS (SELECT user_id, day_num + r.range AS t_day FROM ud, range(0, 28) r),
        |mau AS (SELECT t_day, count(DISTINCT user_id) AS mau FROM sp GROUP BY t_day)
        |SELECT d.day_num, CAST(d.dau AS BIGINT) AS dau, CAST(m.mau AS BIGINT) AS mau,
        |  (round((CAST(d.dau AS DOUBLE) / m.mau) * 10000.0) / 10000.0) AS stickiness
        |FROM dau d JOIN mau m ON d.day_num = m.t_day ORDER BY d.day_num""".stripMargin,

    // stage chain on integer microseconds: first view, first click
    // strictly after it, first purchase strictly after that.
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |v AS (SELECT user_id, min(t) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(t) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND t > t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(t) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND t > t_click GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view_users,
        |       (SELECT count(*) FROM c) AS n_click_users,
        |       (SELECT count(*) FROM p) AS n_purchase_users""".stripMargin,

    // ordered funnel with per-step 1 h timeout: two stacked running-min
    // windows over the SAME (user, time) order — identical frame
    // semantics to the Spark plan (prior rows only).
    "events_window_funnel" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN t END) OVER
        |         (PARTITION BY user_id ORDER BY t, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_view_min FROM x),
        |w2 AS (SELECT *, CASE WHEN event_type = 'click' AND t_view_min IS NOT NULL
        |                       AND t <= t_view_min + 3600000000 THEN t END AS t_click_ok FROM w1),
        |w3 AS (SELECT *, min(t_click_ok) OVER
        |         (PARTITION BY user_id ORDER BY t, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_click_min FROM w2),
        |u AS (SELECT user_id,
        |        max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
        |        max(CASE WHEN t_click_ok IS NOT NULL THEN 1 ELSE 0 END) AS s2,
        |        max(CASE WHEN event_type = 'purchase' AND t_click_min IS NOT NULL
        |                  AND t <= t_click_min + 3600000000 THEN 1 ELSE 0 END) AS s3
        |      FROM w3 GROUP BY user_id)
        |SELECT count(*) FILTER (WHERE s1 = 1) AS n_stage1,
        |       count(*) FILTER (WHERE s2 = 1) AS n_stage2,
        |       count(*) FILTER (WHERE s3 = 1) AS n_stage3 FROM u""".stripMargin,

    // funnel latency: the window-funnel qualification chain, first-view
    // to first-qualifying-purchase seconds, rank-selected percentiles
    // over the (≤ 7200-value) latency distribution.
    "events_funnel_latency" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN t END) OVER
        |         (PARTITION BY user_id ORDER BY t, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_view_min FROM x),
        |w2 AS (SELECT *, CASE WHEN event_type = 'click' AND t_view_min IS NOT NULL
        |                       AND t <= t_view_min + 3600000000 THEN t END AS t_click_ok FROM w1),
        |w3 AS (SELECT *, min(t_click_ok) OVER
        |         (PARTITION BY user_id ORDER BY t, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_click_min FROM w2),
        |u AS (SELECT user_id,
        |        min(CASE WHEN event_type = 'view' THEN t END) AS tv,
        |        min(CASE WHEN event_type = 'purchase' AND t_click_min IS NOT NULL
        |                  AND t <= t_click_min + 3600000000 THEN t END) AS tp
        |      FROM w3 GROUP BY user_id),
        |lat AS (SELECT (tp - tv) // 1000000 AS lat_s FROM u WHERE tp IS NOT NULL),
        |c AS (SELECT lat_s, count(*) AS c FROM lat GROUP BY 1),
        |t AS (SELECT lat_s, sum(c) OVER (ORDER BY lat_s) AS cum, sum(c) OVER () AS n FROM c)
        |SELECT CAST(max(n) AS BIGINT) AS n_completed,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN lat_s END) AS p50_s,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN lat_s END) AS p90_s,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN lat_s END) AS p99_s,
        |  max(lat_s) AS max_s
        |FROM t""".stripMargin,

    "events_path_topk" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |l AS (SELECT event_type,
        |        lag(event_type, 1) OVER w AS p1,
        |        lag(event_type, 2) OVER w AS p2
        |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |c AS (SELECT p2 || '>' || p1 || '>' || event_type AS path, count(*) AS n
        |      FROM l WHERE p2 IS NOT NULL GROUP BY 1)
        |SELECT path, n FROM c ORDER BY n DESC, path LIMIT 10""".stripMargin,

    // HLL set algebra: per-set registers from the same tokenHash60,
    // union = per-register max-merge, intersection by
    // inclusion-exclusion over the ROUNDED estimates (identical double
    // tree to the Spark side).
    "events_hll_setops" ->
      s"""WITH e AS (SELECT event_type AS s, CAST(user_id AS VARCHAR) AS item
         |           FROM events WHERE event_type IN ('view', 'purchase')),
         |h AS (SELECT s, ${tokenHash60("item")} AS h FROM e),
         |r AS (SELECT s, h >> 52 AS reg, h & 4503599627370495 AS suffix FROM h),
         |rk AS (SELECT s, reg,
         |         max(CASE WHEN suffix = 0 THEN 53 ELSE 53 - len(bin(suffix)) END) AS mj
         |       FROM r GROUP BY 1, 2),
         |au AS (SELECT 'union' AS s, reg, max(mj) AS mj FROM rk GROUP BY 2),
         |ar AS (SELECT * FROM rk UNION ALL SELECT * FROM au),
         |sm AS (SELECT s, count(*) AS n_regs,
         |         sum(CAST(1::BIGINT << (60 - mj) AS DECIMAL(38,0))) AS sp FROM ar GROUP BY 1),
         |t AS (SELECT s, n_regs, 256 - n_regs AS v_zero,
         |        sp + CAST(256 - n_regs AS DECIMAL(38,0)) * CAST('1152921504606846976' AS DECIMAL(38,0)) AS s_total
         |      FROM sm),
         |es AS (SELECT s, v_zero,
         |         0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 1152921504606846976.0 / CAST(s_total AS DOUBLE) AS est_raw
         |       FROM t),
         |f AS (SELECT s, CASE WHEN est_raw <= 640.0 AND v_zero > 0
         |             THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE)) ELSE est_raw END AS est
         |      FROM es),
         |p AS (SELECT
         |        max(CASE WHEN s = 'view' THEN (round(est * 10000.0) / 10000.0) END) AS est_view,
         |        max(CASE WHEN s = 'purchase' THEN (round(est * 10000.0) / 10000.0) END) AS est_purchase,
         |        max(CASE WHEN s = 'union' THEN (round(est * 10000.0) / 10000.0) END) AS est_union
         |      FROM f),
         |fl AS (SELECT user_id,
         |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
         |       FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
         |ex AS (SELECT count(*) FILTER (WHERE v = 1) AS n_view,
         |         count(*) FILTER (WHERE p = 1) AS n_purchase,
         |         count(*) AS n_union,
         |         count(*) FILTER (WHERE v = 1 AND p = 1) AS n_inter FROM fl)
         |SELECT ex.n_view, ex.n_purchase, ex.n_union, ex.n_inter,
         |  p.est_view, p.est_purchase, p.est_union,
         |  (round((p.est_view + p.est_purchase - p.est_union) * 10000.0) / 10000.0) AS est_inter
         |FROM ex, p""".stripMargin,

    "events_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > 1800000000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |s AS (
        |  SELECT user_id, event_id, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM b)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |  min(event_id) AS first_event_id, max(event_id) AS last_event_id,
        |  (round((sum(value)) * 100.0) / 100.0) AS sum_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // k-NN classification: eval slice vs the rest of the corpus (no
    // self match), top-10 by (l2, n_id) — the searchBatch heap order —
    // then label mode with smallest-label tie-break.
    "knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
         |d AS (SELECT q.q_id, e.vec_id AS n_id, ${l2("e.embedding", "q.qv")} AS score
         |      FROM embeddings e, q WHERE e.vec_id % 100 <> 0),
         |nn AS (SELECT q_id, n_id FROM d
         |       QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score, n_id) <= 10),
         |v AS (SELECT nn.q_id, e.label, count(*) AS votes
         |      FROM nn JOIN embeddings e ON e.vec_id = nn.n_id GROUP BY 1, 2),
         |p AS (SELECT q_id, label AS pred_label, votes FROM v
         |      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) = 1)
         |SELECT p.q_id, e.label AS true_label, p.pred_label, p.votes
         |FROM p JOIN embeddings e ON e.vec_id = p.q_id
         |ORDER BY p.q_id""".stripMargin,

    // Welch t from exact integer-cent moments; the only floating step
    // is the final identical double expression tree on both engines.
    "events_ttest" ->
      """WITH e AS (SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events),
        |m AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
        |             CAST(sum(c * c) AS BIGINT) AS q FROM e GROUP BY 1)
        |SELECT a.event_type AS type_a, b.event_type AS type_b, a.n AS n_a, b.n AS n_b,
        |  (round(((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
        |   / sqrt(((CAST(a.q AS DOUBLE) - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)) / (CAST(a.n AS DOUBLE) - 1.0)) / CAST(a.n AS DOUBLE)
        |        + ((CAST(b.q AS DOUBLE) - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) / (CAST(b.n AS DOUBLE) - 1.0)) / CAST(b.n AS DOUBLE))) * 10000.0) / 10000.0) AS t
        |FROM m a JOIN m b ON a.event_type < b.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    // day × type crosstab, exact integer cents, empty cells 0.
    "events_pivot" ->
      """WITH e AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, event_type,
        |             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events)
        |SELECT day,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN c END), 0) AS BIGINT) AS click,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN c END), 0) AS BIGINT) AS error,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN c END), 0) AS BIGINT) AS purchase,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN c END), 0) AS BIGINT) AS signup,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN c END), 0) AS BIGINT) AS view
        |FROM e GROUP BY day ORDER BY day""".stripMargin,

    // minhash clusters (the dedup_clusters chain) rolled up per source:
    // document/character savings of canonical-only retention.
    "dedup_savings" ->
      s"""WITH RECURSIVE $minhashCtes,
         |pairs AS (SELECT a_id, b_id FROM est WHERE e >= 0.5),
         |edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
         |canon AS (SELECT u AS id, least(u, min(v)) AS canonical FROM reach GROUP BY u),
         |lab AS (SELECT d.doc_id, d.source, d.n_chars,
         |               (coalesce(c.canonical, d.doc_id) <> d.doc_id) AS is_dup
         |        FROM documents d LEFT JOIN canon c ON c.id = d.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
         |  CAST(sum(CASE WHEN is_dup THEN n_chars ELSE 0 END) AS BIGINT) AS chars_dropped,
         |  (round((CAST(sum(CASE WHEN is_dup THEN n_chars ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(n_chars) AS DOUBLE)) * 10000.0) / 10000.0) AS pct_chars_dropped
         |FROM lab GROUP BY source ORDER BY source""".stripMargin,

    // within-order part-pair co-occurrence with lift; deterministic
    // top-20 cut by (pair_n DESC, part_a, part_b).
    "orders_basket_affinity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |no AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
        |cnt AS (SELECT pk, count(*) AS cnt FROM li GROUP BY pk),
        |pr AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS pair_n
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk)
        |SELECT part_a, part_b, pair_n,
        |  (round((CAST(pair_n * n_orders AS DOUBLE) / CAST(ca.cnt * cb.cnt AS DOUBLE)) * 10000.0) / 10000.0) AS lift
        |FROM pr JOIN cnt ca ON ca.pk = pr.part_a JOIN cnt cb ON cb.pk = pr.part_b CROSS JOIN no
        |ORDER BY pair_n DESC, part_a, part_b LIMIT 20""".stripMargin,

    // OLS slope of quantity on cent-fixed discount from exact integer
    // moments; doubles only in the final division (table_corr style).
    "lineitem_discount_elasticity" ->
      """WITH x AS (SELECT strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m') AS ship_month,
        |  CAST(l_quantity AS BIGINT) AS q,
        |  CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d FROM lineitem),
        |m AS (SELECT ship_month, CAST(count(*) AS HUGEINT) AS n,
        |  CAST(sum(d) AS HUGEINT) AS sd, CAST(sum(q) AS HUGEINT) AS sq,
        |  CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd,
        |  CAST(sum(CAST(d AS HUGEINT) * q) AS HUGEINT) AS sdq
        |  FROM x GROUP BY ship_month)
        |SELECT ship_month, CAST(n AS BIGINT) AS n,
        |  (round((CAST(n * sdq - sd * sq AS DOUBLE)
        |    / CAST(n * sdd - sd * sd AS DOUBLE)) * 1000000.0) / 1000000.0) AS slope_qty_disc,
        |  (round((CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) * 10000.0) / 10000.0) AS mean_qty
        |FROM m ORDER BY ship_month""".stripMargin,

    // hourly volume buckets that are 3σ outliers for their event type —
    // the all-integer sigma rule of events_anomaly on COUNTS.
    "events_burst" ->
      """WITH b AS (SELECT event_type,
        |  epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_us,
        |  CAST(count(*) AS HUGEINT) AS x FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS nb,
        |        CAST(sum(x) AS HUGEINT) AS s, CAST(sum(x * x) AS HUGEINT) AS q
        |      FROM b GROUP BY event_type)
        |SELECT b.event_type, b.bucket_us, CAST(b.x AS BIGINT) AS n
        |FROM b JOIN m USING (event_type)
        |WHERE (nb * x - s) * (nb * x - s) > 9 * (nb * q - s * s) AND (nb * x - s) > 0
        |ORDER BY b.event_type, b.bucket_us""".stripMargin,

    // lifecycle ledger: per-user first/lag/lead over distinct (user,
    // week), each activity row also emits its week+1 churn row, phantom
    // trailing week cut by the max activity week.
    "events_churn" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS w FROM events),
        |c AS (SELECT user_id, w, min(w) OVER (PARTITION BY user_id) AS fw,
        |        lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw,
        |        lead(w) OVER (PARTITION BY user_id ORDER BY w) AS nw
        |      FROM uw),
        |r AS (
        |  SELECT w AS week,
        |    CASE WHEN w = fw THEN 1 ELSE 0 END AS nn,
        |    CASE WHEN pw = w - 1 THEN 1 ELSE 0 END AS nr,
        |    CASE WHEN pw IS NOT NULL AND pw < w - 1 THEN 1 ELSE 0 END AS ns,
        |    0 AS nc
        |  FROM c
        |  UNION ALL
        |  SELECT w + 1, 0, 0, 0,
        |    CASE WHEN nw IS NULL OR nw > w + 1 THEN 1 ELSE 0 END FROM c),
        |a AS (SELECT week, CAST(sum(nn) AS BIGINT) AS n_new,
        |        CAST(sum(nr) AS BIGINT) AS n_retained,
        |        CAST(sum(ns) AS BIGINT) AS n_resurrected,
        |        CAST(sum(nc) AS BIGINT) AS n_churned
        |      FROM r GROUP BY 1),
        |m AS (SELECT *, max(CASE WHEN n_new + n_retained + n_resurrected > 0
        |        THEN week END) OVER () AS mx FROM a)
        |SELECT week, n_new, n_retained, n_resurrected, n_churned
        |FROM m WHERE week <= mx ORDER BY week""".stripMargin,

    // power-of-2 length histogram: integer bit-length bucket, shares as
    // windows over the bounded (source × bucket) table.
    "corpus_length_hist" ->
      s"""WITH t AS (SELECT source, CAST(len($toks) AS BIGINT) AS n_tok FROM documents),
         |b AS (SELECT source, CASE WHEN n_tok <= 0 THEN CAST(0 AS BIGINT)
         |        ELSE (1::BIGINT << (length(bin(n_tok)) - 1)) END AS bucket FROM t),
         |c AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs FROM b GROUP BY 1, 2),
         |w AS (SELECT *, CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS t FROM c)
         |SELECT source, bucket, n_docs,
         |  (round((CAST(n_docs AS DOUBLE) / CAST(t AS DOUBLE)) * 10000.0) / 10000.0) AS share
         |FROM w ORDER BY source, bucket""".stripMargin,

    // boilerplate report: in-row deduped word-3-grams, narrow df
    // rollup, TakeOrdered top-20.
    "corpus_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [] ELSE
         |  list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh FROM t),
         |g AS (SELECT doc_id, unnest(list_distinct(sh)) AS gram FROM sh),
         |c AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1),
         |top AS (SELECT gram, df FROM c ORDER BY df DESC, gram LIMIT 20)
         |SELECT gram, df,
         |  (round((CAST(df AS DOUBLE) / CAST((SELECT count(*) FROM documents) AS DOUBLE)) * 10000.0) / 10000.0) AS doc_share
         |FROM top ORDER BY df DESC, gram""".stripMargin,

    // distinctive keywords: idf fixed to 1e-6 integers once per word,
    // exact-long ranking, source-partitioned top-3 window.
    "corpus_keywords" ->
      s"""WITH t AS (SELECT source, unnest(list_distinct($toks)) AS word FROM documents),
         |sw AS (SELECT source, word, CAST(count(*) AS BIGINT) AS df_s FROM t GROUP BY 1, 2),
         |wd AS (SELECT word, CAST(sum(df_s) AS BIGINT) AS df FROM sw GROUP BY 1),
         |sc AS (SELECT source, word, df_s, df,
         |        df_s * CAST(floor(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df)
         |          * 1000000.0 + 0.5) AS BIGINT) AS sf
         |       FROM sw JOIN wd USING (word)),
         |r AS (SELECT source, word, df_s, df, sf,
         |        row_number() OVER (PARTITION BY source ORDER BY sf DESC, word) AS rank
         |      FROM sc)
         |SELECT source, CAST(rank AS INT) AS rank, word, df_s, df,
         |  (round((CAST(sf AS DOUBLE) / 1000000.0) * 10000.0) / 10000.0) AS score
         |FROM r WHERE rank <= 3 ORDER BY source, rank""".stripMargin,

    // bot-suspicion leaderboard: exact HUGEINT gap moments, cv from the
    // identical double tree, TakeOrdered on the 1e-9-fixed cv.
    "events_bot_score" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |g AS (SELECT user_id,
        |        (t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)) // 1000000 AS gap_s
        |      FROM o),
        |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_g, CAST(sum(gap_s) AS HUGEINT) AS s,
        |        CAST(sum(CAST(gap_s AS HUGEINT) * CAST(gap_s AS HUGEINT)) AS HUGEINT) AS q
        |      FROM g WHERE gap_s IS NOT NULL GROUP BY 1
        |      HAVING count(*) >= 8 AND sum(gap_s) > 0),
        |c AS (SELECT user_id, n_g + 1 AS n_events, n_g AS n_gaps,
        |        (round((CAST(s AS DOUBLE) / CAST(n_g AS DOUBLE)) * 100.0) / 100.0) AS mean_gap_s,
        |        sqrt(CAST(n_g * q - s * s AS DOUBLE)) / CAST(s AS DOUBLE) AS cv
        |      FROM s),
        |t AS (SELECT user_id, n_events, n_gaps, mean_gap_s,
        |        (round((cv) * 10000.0) / 10000.0) AS cv
        |      FROM c ORDER BY CAST(floor(cv * 1000000000.0 + 0.5) AS BIGINT), user_id LIMIT 20)
        |SELECT * FROM t ORDER BY cv, user_id""".stripMargin,

    // CUSUM changepoint: dev_k = H·cum_k − k·T exact BIGINT windows over
    // the (types × hours)-bounded bucket table, argmax |dev| with
    // earliest-bucket tie-break; doubles only in shift/means.
    "events_changepoint" ->
      """WITH b AS (SELECT event_type,
        |  epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_us,
        |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, bucket_us, n,
        |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket_us) AS BIGINT) AS k,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bucket_us) AS BIGINT) AS cum,
        |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS h,
        |  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS t
        |  FROM b),
        |d AS (SELECT *, h * cum - k * t AS dev FROM w)
        |SELECT event_type, bucket_us AS cut_us, dev,
        |  (round((CAST(abs(dev) AS DOUBLE) / (CAST(h AS DOUBLE) * CAST(t AS DOUBLE))) * 1000000.0) / 1000000.0) AS shift,
        |  (round((CAST(cum AS DOUBLE) / CAST(k AS DOUBLE)) * 10000.0) / 10000.0) AS mean_before,
        |  CASE WHEN h = k THEN NULL
        |       ELSE (round((CAST(t - cum AS DOUBLE) / CAST(h - k AS DOUBLE)) * 10000.0) / 10000.0) END AS mean_after
        |FROM d
        |QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY abs(dev) DESC, bucket_us) = 1
        |ORDER BY event_type""".stripMargin,

    // type co-usage: pair + marginal counts off the distinct (user,
    // type) table; jaccard one double division.
    "events_user_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        CAST(count(*) AS BIGINT) AS n_both
        |      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, ma.m AS n_a, mb.m AS n_b, n_both,
        |  (round((CAST(n_both AS DOUBLE) / CAST(ma.m + mb.m - n_both AS DOUBLE)) * 10000.0) / 10000.0) AS jaccard
        |FROM p JOIN m ma ON ma.event_type = type_a JOIN m mb ON mb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // Mix shift: integer midpoint split, share deltas single-division.
    "events_mix_shift" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM e),
        |c AS (SELECT event_type,
        |        CAST(sum(CASE WHEN us <= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
        |        CAST(sum(CASE WHEN us > mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |      FROM e, mid GROUP BY 1),
        |t AS (SELECT CAST(sum(n_early) AS BIGINT) AS t_early,
        |        CAST(sum(n_late) AS BIGINT) AS t_late FROM c)
        |SELECT event_type, n_early, n_late,
        |  round(CAST(n_early AS DOUBLE) / CAST(t_early AS DOUBLE), 4) AS share_early,
        |  round(CAST(n_late AS DOUBLE) / CAST(t_late AS DOUBLE), 4) AS share_late,
        |  round(abs(CAST(n_early AS DOUBLE) / CAST(t_early AS DOUBLE)
        |        - CAST(n_late AS DOUBLE) / CAST(t_late AS DOUBLE)), 4) AS delta
        |FROM c, t ORDER BY event_type""".stripMargin,

    // Langid confusion: declared lang × the langScoreCtes prediction.
    "text_language_confusion" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |c AS (SELECT doc_id, ${stopCount(stopEn)} AS n_en, ${stopCount(stopDe)} AS n_de,
         |        ${stopCount(stopFr)} AS n_fr, ${stopCount(stopEs)} AS n_es FROM t),
         |p AS (SELECT doc_id,
         |  CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0 THEN 'und'
         |       WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
         |       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
         |       WHEN n_fr >= n_es THEN 'fr'
         |       ELSE 'es' END AS lang_pred FROM c),
         |cells AS (SELECT d.lang, p.lang_pred, count(*) AS n
         |          FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY 1)
         |SELECT cells.lang, lang_pred, n,
         |  round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 4) AS share
         |FROM cells JOIN tot USING (lang)
         |ORDER BY cells.lang, lang_pred""".stripMargin,

    // EWMA: list_reduce replays the engine's sequential fold exactly
    // (same op order per step, first element as init) — no pow().
    "events_ewma_forecast" ->
      """WITH h AS (SELECT event_type,
        |        epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS b,
        |        count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_buckets,
        |  CAST(arg_max(n, b) AS BIGINT) AS last_n,
        |  (round((list_reduce(list(CAST(n AS DOUBLE) ORDER BY b),
        |     (a, x) -> 0.3 * x + 0.7 * a)) * 10000.0) / 10000.0) AS ewma_forecast
        |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Forecast backtest: fold over the prefix (last bucket held out),
    // same list_reduce replay; naive error is an exact integer.
    "events_forecast_eval" ->
      """WITH h AS (SELECT event_type,
        |        epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS b,
        |        count(*) AS n FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*) AS n_buckets,
        |        list(CAST(n AS DOUBLE) ORDER BY b) AS xs,
        |        CAST(arg_max(n, b) AS BIGINT) AS actual
        |      FROM h GROUP BY 1),
        |e AS (SELECT event_type, n_buckets, actual,
        |        CAST(xs[len(xs) - 1] AS BIGINT) AS naive_pred,
        |        list_reduce(list_slice(xs, 1, len(xs) - 1), (acc, x) -> 0.3 * x + 0.7 * acc) AS ewma_raw
        |      FROM a WHERE n_buckets >= 3)
        |SELECT event_type, n_buckets, actual,
        |  (round((ewma_raw) * 10000.0) / 10000.0) AS ewma_pred,
        |  (round((abs(CAST(actual AS DOUBLE) - ewma_raw)) * 10000.0) / 10000.0) AS ewma_abs_err,
        |  abs(actual - naive_pred) AS naive_abs_err
        |FROM e ORDER BY event_type""".stripMargin,

    // Embedding drift: vector_centroid_dist's exact cross-multiplied
    // numerator, applied early-half vs late-half within each label.
    "embedding_drift" ->
      """WITH nn AS (SELECT count(*) AS n_all FROM embeddings),
        |c AS (SELECT label, (vec_id * 2 < n_all) AS early, dd.range - 1 AS d, count(*) AS n,
        |        CAST(sum(CAST(floor(CAST(embedding[dd.range] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s6
        |      FROM embeddings CROSS JOIN range(1, 65) dd, nn GROUP BY 1, 2, 3),
        |p AS (SELECT a.label, max(a.n) AS n_early, max(b.n) AS n_late,
        |        sum(CAST(a.s6 * b.n - b.s6 * a.n AS HUGEINT) * CAST(a.s6 * b.n - b.s6 * a.n AS HUGEINT)) AS num
        |      FROM c a JOIN c b ON a.label = b.label AND a.d = b.d AND a.early AND NOT b.early
        |      GROUP BY 1)
        |SELECT label, n_early, n_late,
        |  (round((sqrt(CAST(num AS DOUBLE)) / (n_early * n_late * 1000000.0)) * 10000.0) / 10000.0) AS drift
        |FROM p ORDER BY label""".stripMargin,

    // CUPED: exact integer moments (HUGEINT mirrors decimal(38,0)),
    // theta/means the only doubles, identical expression trees.
    "events_abtest_cuped" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM e),
        |per AS (SELECT user_id,
        |        CAST(sum(CASE WHEN us <= mid_us THEN c ELSE 0 END) AS BIGINT) AS x,
        |        CAST(sum(CASE WHEN us > mid_us THEN c ELSE 0 END) AS BIGINT) AS y
        |      FROM e, mid GROUP BY user_id),
        |pooled AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |        sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |        sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy FROM per),
        |v AS (SELECT CAST(user_id % 2 AS INT) AS variant, count(*) AS n_users,
        |        sum(CAST(x AS HUGEINT)) AS vx, sum(CAST(y AS HUGEINT)) AS vy
        |      FROM per GROUP BY 1)
        |SELECT variant, n_users,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
        |  round(CAST(vy AS DOUBLE) / CAST(n_users AS DOUBLE), 4) AS mean_y,
        |  round(CAST(vy AS DOUBLE) / CAST(n_users AS DOUBLE)
        |    - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
        |      * (CAST(vx AS DOUBLE) / CAST(n_users AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 4)
        |    AS mean_y_cuped
        |FROM v, pooled ORDER BY variant""".stripMargin,

    // Epoch plan: all-integer allocation/rate/yield arithmetic.
    "corpus_epoch_plan" ->
      s"""WITH t AS (SELECT source, CAST(len($toks) AS BIGINT) AS n_tok FROM documents),
         |s AS (SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |      FROM t GROUP BY source),
         |p AS (SELECT source, n_docs, n_tokens,
         |        (1000000 * (CAST(substr(source, 4) AS BIGINT) + 1)) // 210 AS alloc_tokens
         |      FROM s)
         |SELECT source, n_docs, n_tokens, alloc_tokens,
         |  least(10000, (alloc_tokens * 10000) // n_tokens) AS rate_bp,
         |  (n_tokens * least(10000, (alloc_tokens * 10000) // n_tokens)) // 10000 AS expected_tokens
         |FROM p ORDER BY source""".stripMargin,

    // Seasonality grid: arithmetic dow from epoch days, exact counts,
    // shares/ratios single-division deterministic.
    "events_seasonality" ->
      """WITH c AS (SELECT event_type,
        |        CAST((CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) - DATE '1970-01-01' AS BIGINT) + 4) % 7 AS INT) AS dow,
        |        CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hod,
        |        count(*) AS n
        |      FROM events GROUP BY 1, 2, 3),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY 1)
        |SELECT c.event_type, dow, hod, n,
        |  round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 4) AS share,
        |  round(CAST(n AS DOUBLE) * 168.0 / CAST(t AS DOUBLE), 4) AS ratio_vs_uniform
        |FROM c JOIN t USING (event_type)
        |ORDER BY c.event_type, dow, hod""".stripMargin,

    // Cohort LTV: cents-fixed revenue (exact long sums), doubles only in
    // the two final divisions — same discipline as orders_rfm.
    "events_cohort_ltv" ->
      """WITH uw AS (SELECT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS w,
        |        count(*) AS n_ev,
        |        CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |      FROM events GROUP BY 1, 2),
        |c AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY 1)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |  CAST((uw.w - c.cw) // 7 AS INT) AS week_offset,
        |  count(*) AS n_users, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue,
        |  round(CAST(sum(cents) AS DOUBLE) / (count(*) * 100.0), 2) AS ltv_per_user
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Per-source novelty over normalized char-8-gram poly hashes (the
    // dedup_winnow normalization + the dedup_ngram_jaccard hash).
    "text_ngram_novelty" ->
      """WITH n AS (SELECT doc_id, source,
        |        trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s FROM documents),
        |g0 AS (SELECT doc_id, source,
        |  CASE WHEN len(s) < 8 THEN [] ELSE
        |    list_transform(range(1, len(s) - 6), i ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(0, 8), j -> CAST(ascii(substr(s, CAST(i + j AS INT), 1)) AS BIGINT))),
        |        (a, c) -> (a * 31 + c) % 1000000007)) END AS gh
        |  FROM n),
        |sh AS (SELECT doc_id, source, unnest(list_distinct(gh)) AS g FROM g0),
        |bg AS (SELECT g, count(*) AS df, min(source) AS source FROM sh GROUP BY g),
        |own AS (SELECT source, count(*) AS n_unique FROM bg WHERE df = 1 GROUP BY source),
        |tot AS (SELECT source, count(*) AS n_grams FROM (SELECT DISTINCT source, g FROM sh) GROUP BY source)
        |SELECT tot.source, n_grams, coalesce(n_unique, 0) AS n_unique,
        |  round(CAST(coalesce(n_unique, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) AS novelty
        |FROM tot LEFT JOIN own ON tot.source = own.source
        |ORDER BY tot.source""".stripMargin,

    // Drift: integer split point, integer bins, shares as single
    // divisions of exact longs — bit-identical across engines.
    "table_drift" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM e),
        |r AS (SELECT event_type, min(cents) AS lo, max(cents) AS hi FROM e GROUP BY 1),
        |b AS (SELECT e.event_type,
        |        CAST(least(19, ((e.cents - r.lo) * 20) // (r.hi - r.lo + 1)) AS INT) AS bin,
        |        CASE WHEN e.us <= mid.mid_us THEN 1 ELSE 0 END AS early
        |      FROM e JOIN r USING (event_type), mid),
        |cnt AS (SELECT event_type, bin,
        |          CAST(sum(early) AS BIGINT) AS n_early,
        |          CAST(sum(1 - early) AS BIGINT) AS n_late
        |        FROM b GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n_early) AS BIGINT) AS t_early,
        |        CAST(sum(n_late) AS BIGINT) AS t_late FROM cnt GROUP BY 1)
        |SELECT cnt.event_type, bin, n_early, n_late,
        |  round(CAST(n_early AS DOUBLE) / CAST(t_early AS DOUBLE), 4) AS share_early,
        |  round(CAST(n_late AS DOUBLE) / CAST(t_late AS DOUBLE), 4) AS share_late,
        |  round(abs(CAST(n_early AS DOUBLE) / CAST(t_early AS DOUBLE)
        |        - CAST(n_late AS DOUBLE) / CAST(t_late AS DOUBLE)), 4) AS delta
        |FROM cnt JOIN t USING (event_type)
        |ORDER BY cnt.event_type, bin""".stripMargin,

    // Per-label L2-norm profile: squared norm is an exact HUGEINT sum
    // of 1e-6-fixed components; the norm fixes through the
    // correctly-rounded IEEE sqrt, so label moments sum exact integers.
    "vector_norm_profile" ->
      """WITH v AS (SELECT label,
        |  CAST(floor(sqrt(CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT)
        |       * CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT))) AS DOUBLE)) + 0.5) AS BIGINT) AS nrm
        |  FROM embeddings),
        |m AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        |        CAST(sum(nrm) AS HUGEINT) AS s, min(nrm) AS mn, max(nrm) AS mx
        |      FROM v GROUP BY 1)
        |SELECT label, n_vectors,
        |  (round((CAST(s AS DOUBLE) / (CAST(n_vectors AS DOUBLE) * 1000000.0)) * 1000000.0) / 1000000.0) AS mean_norm,
        |  (round((CAST(mn AS DOUBLE) / 1000000.0) * 1000000.0) / 1000000.0) AS min_norm,
        |  (round((CAST(mx AS DOUBLE) / 1000000.0) * 1000000.0) / 1000000.0) AS max_norm
        |FROM m ORDER BY label""".stripMargin,

    // Grouped-data Gini: for a distinct count c with k users after s
    // cumulative, 2·Σ i·x_i contributes c·k·(2s+k+1) — exact HUGEINT;
    // Gini = T/(n·S) − (n+1)/n with the identical double tree.
    "events_gini" ->
      """WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |d AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM pu GROUP BY 1),
        |w AS (SELECT c, cnt, CAST(coalesce(sum(cnt) OVER (ORDER BY c
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
        |      FROM d),
        |g AS (SELECT CAST(c AS HUGEINT) * CAST(cnt AS HUGEINT)
        |        * (2 * CAST(s AS HUGEINT) + CAST(cnt AS HUGEINT) + 1) AS t2,
        |        CAST(c AS HUGEINT) * CAST(cnt AS HUGEINT) AS x, cnt FROM w)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_users, CAST(sum(x) AS BIGINT) AS n_events,
        |  (round((CAST(sum(t2) AS DOUBLE)
        |      / (CAST(sum(cnt) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
        |    - (CAST(sum(cnt) AS DOUBLE) + 1.0) / CAST(sum(cnt) AS DOUBLE)) * 1000000.0) / 1000000.0) AS gini
        |FROM g""".stripMargin,

    // PMI collocations: bigram table + its own left/right marginals,
    // PMI fixed to a 1e-6 integer for the exact top-20 cut.
    "corpus_collocations" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
         |sh AS (SELECT CASE WHEN len(toks) < 2 THEN [] ELSE
         |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END AS sh FROM t),
         |g AS (SELECT unnest(sh) AS gm FROM sh),
         |p AS (SELECT split_part(gm, ' ', 1) AS w1, split_part(gm, ' ', 2) AS w2,
         |        CAST(count(*) AS BIGINT) AS c12 FROM g GROUP BY 1, 2),
         |l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM p GROUP BY 1),
         |r AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM p GROUP BY 1),
         |n AS (SELECT CAST(sum(c12) AS DOUBLE) AS nn FROM p),
         |s AS (SELECT p.w1, p.w2, p.c12, l.c1, r.c2,
         |        CAST(floor(ln(CAST(p.c12 AS DOUBLE) * n.nn
         |          / (CAST(l.c1 AS DOUBLE) * CAST(r.c2 AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS pmif
         |      FROM p JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
         |      WHERE p.c12 >= 5),
         |k AS (SELECT * FROM s ORDER BY pmif DESC, w1, w2 LIMIT 20)
         |SELECT w1, w2, c12, c1, c2,
         |  (round((CAST(pmif AS DOUBLE) / 1000000.0) * 10000.0) / 10000.0) AS pmi
         |FROM k ORDER BY pmi DESC, w1, w2""".stripMargin,

    // MinHash calibration: estf = m·31250 exact (10⁶/32 integral),
    // jacf by floor division of exact set counts — no float until the
    // final per-bucket divide.
    "dedup_minhash_est_error" ->
      s"""WITH $minhashSigCtes,
         |gs AS (SELECT doc_id, list_distinct(hs) AS g FROM hs),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |mm AS (SELECT a_id, b_id,
         |        CAST(list_sum(list_transform(range(1, 33), i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS BIGINT) AS m
         |      FROM cand JOIN sig sa ON sa.doc_id = a_id JOIN sig sb ON sb.doc_id = b_id),
         |p AS (SELECT mm.m,
         |        CAST(len(list_intersect(ga.g, gb.g)) AS BIGINT) AS i,
         |        CAST(len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)) AS BIGINT) AS u
         |      FROM mm JOIN gs ga ON ga.doc_id = mm.a_id JOIN gs gb ON gb.doc_id = mm.b_id
         |      WHERE mm.m >= 16),
         |f AS (SELECT (m * 10) // 32 AS bucket, m * 31250 AS estf, (i * 1000000) // u AS jacf FROM p),
         |e AS (SELECT bucket, estf, jacf, abs(estf - jacf) AS errf FROM f)
         |SELECT CAST(bucket AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n_pairs,
         |  (round((CAST(sum(estf) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0)) * 1000000.0) / 1000000.0) AS mean_est,
         |  (round((CAST(sum(jacf) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0)) * 1000000.0) / 1000000.0) AS mean_jaccard,
         |  (round((CAST(sum(errf) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0)) * 1000000.0) / 1000000.0) AS mean_abs_err
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // Per-dimension p1/p50/p99 by rank selection over the 1e-6-fixed
    // value distribution — the eventsValueQuantiles shape per dim.
    "vector_quantile_clip" ->
      """WITH e AS (SELECT embedding, unnest(range(1, len(embedding) + 1)) AS i FROM embeddings),
        |v AS (SELECT CAST(i - 1 AS INT) AS dim,
        |        CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS xf
        |      FROM e),
        |c AS (SELECT dim, xf, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |w AS (SELECT dim, xf, CAST(sum(c) OVER (PARTITION BY dim ORDER BY xf) AS BIGINT) AS cum,
        |        CAST(sum(c) OVER (PARTITION BY dim) AS BIGINT) AS n FROM c),
        |q AS (SELECT dim, max(n) AS n,
        |        min(CASE WHEN cum >= (n * 1 + 99) // 100 THEN xf END) AS q01,
        |        min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN xf END) AS q50,
        |        min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN xf END) AS q99
        |      FROM w GROUP BY 1)
        |SELECT dim, n,
        |  (round((CAST(q01 AS DOUBLE) / 1000000.0) * 1000000.0) / 1000000.0) AS p01,
        |  (round((CAST(q50 AS DOUBLE) / 1000000.0) * 1000000.0) / 1000000.0) AS p50,
        |  (round((CAST(q99 AS DOUBLE) / 1000000.0) * 1000000.0) / 1000000.0) AS p99
        |FROM q ORDER BY dim""".stripMargin,

    // Cluster-size histogram over the SAME recursive-CC canonical
    // assignment as dedup_clusters.
    "dedup_cluster_hist" ->
      s"""WITH RECURSIVE $minhashCtes,
         |pairs AS (SELECT a_id, b_id FROM est WHERE e >= 0.5),
         |edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
         |canon AS (SELECT u AS id, least(u, min(v)) AS canonical FROM reach GROUP BY u),
         |asg AS (SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS canonical_id
         |        FROM documents d LEFT JOIN canon c ON c.id = d.doc_id),
         |cs AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS sz FROM asg GROUP BY 1),
         |h AS (SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters FROM cs GROUP BY 1),
         |tt AS (SELECT CAST(sum(sz * n_clusters) AS DOUBLE) AS tot FROM h)
         |SELECT sz AS cluster_size, n_clusters, CAST(sz * n_clusters AS BIGINT) AS n_docs,
         |  (round((CAST(sz * n_clusters AS DOUBLE) / tot) * 10000.0) / 10000.0) AS doc_share
         |FROM h, tt ORDER BY cluster_size""".stripMargin,

    // Markov row entropies: ln c fixed to a 1e-6 integer per distinct
    // transition count; H = ln n − Σc·ln c / n with the identical tree.
    "events_entropy_rate" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
        |l AS (SELECT event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_type
        |      FROM x),
        |c AS (SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS c
        |      FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |a AS (SELECT prev_type, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_next,
        |        CAST(sum(CAST(c AS HUGEINT)
        |          * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)) AS HUGEINT) AS sfx
        |      FROM c GROUP BY 1)
        |SELECT prev_type, n AS n_trans, n_next,
        |  (round((ln(CAST(n AS DOUBLE)) - CAST(sfx AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) * 10000.0) / 10000.0) AS entropy_nats
        |FROM a ORDER BY prev_type""".stripMargin,

    // CSN power-law MLE at xmin = 1: ln(2x) fixed per DISTINCT count,
    // α = 1 + n·10⁶ / Σ with the identical double tree.
    "events_power_law" ->
      """WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |d AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM pu GROUP BY 1),
        |a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, max(x) AS x_max,
        |        CAST(sum(CAST(cnt AS HUGEINT)
        |          * CAST(floor(ln(2.0 * CAST(x AS DOUBLE)) * 1000000.0 + 0.5) AS HUGEINT)) AS HUGEINT) AS s
        |      FROM d)
        |SELECT n AS n_users, x_max,
        |  (round((1.0 + CAST(n AS DOUBLE) * 1000000.0 / CAST(s AS DOUBLE)) * 10000.0) / 10000.0) AS alpha
        |FROM a""".stripMargin,

    // Band-bucket occupancy: bucket identity differs (md5 vs raw
    // slice) but group SIZES are identical, and only sizes are output.
    "dedup_lsh_bucket_profile" ->
      s"""WITH $minhashSigCtes,
         |sz AS (SELECT band, bucket, CAST(count(*) AS BIGINT) AS sz FROM bands GROUP BY 1, 2),
         |a AS (SELECT band, CAST(count(*) AS BIGINT) AS n_buckets, CAST(sum(sz) AS BIGINT) AS n_docs,
         |        max(sz) AS max_bucket, CAST(sum((sz * (sz - 1)) // 2) AS BIGINT) AS n_cand_pairs
         |      FROM sz GROUP BY 1)
         |SELECT CAST(band AS INT) AS band, n_buckets, n_docs, max_bucket, n_cand_pairs,
         |  (round((CAST(n_docs AS DOUBLE) / CAST(n_buckets AS DOUBLE)) * 10000.0) / 10000.0) AS mean_bucket
         |FROM a ORDER BY band""".stripMargin,

    // SLA percentiles by rank selection over the (priority × lag-days)
    // count table; lag in integer epoch days on both engines.
    "orders_ship_sla" ->
      """WITH j AS (SELECT o.o_orderpriority AS priority,
        |        (epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000
        |         - epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000000) AS lag_days
        |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |c AS (SELECT priority, lag_days, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
        |w AS (SELECT priority, lag_days,
        |        CAST(sum(c) OVER (PARTITION BY priority ORDER BY lag_days) AS BIGINT) AS cum,
        |        CAST(sum(c) OVER (PARTITION BY priority) AS BIGINT) AS n FROM c)
        |SELECT priority, max(n) AS n_lines,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN lag_days END) AS p50_days,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN lag_days END) AS p90_days,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN lag_days END) AS p99_days
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same stopword votes + tie-break chain as text_langid, rolled up
    // by source with shares over the bounded matrix.
    "corpus_language_mix" ->
      s"""WITH t AS (SELECT source, $toks AS toks FROM documents),
         |c AS (SELECT source, ${stopCount(stopEn)} AS n_en, ${stopCount(stopDe)} AS n_de,
         |        ${stopCount(stopFr)} AS n_fr, ${stopCount(stopEs)} AS n_es FROM t),
         |lang AS (SELECT source,
         |  CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0 THEN 'und'
         |       WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
         |       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
         |       WHEN n_fr >= n_es THEN 'fr'
         |       ELSE 'es' END AS lang_pred FROM c),
         |g AS (SELECT source, lang_pred, CAST(count(*) AS BIGINT) AS n_docs FROM lang GROUP BY 1, 2),
         |s AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS t FROM g GROUP BY 1)
         |SELECT g.source, g.lang_pred, g.n_docs,
         |  (round((CAST(n_docs AS DOUBLE) / CAST(t AS DOUBLE)) * 10000.0) / 10000.0) AS share
         |FROM g JOIN s USING (source) ORDER BY source, lang_pred""".stripMargin,

    // Exact-duplicate vectors: group by the 1e-6-fixed integer array
    // itself — bit-stable, no float equality.
    "vector_dedup_exact" ->
      """WITH f AS (SELECT list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS fa
        |  FROM embeddings),
        |g AS (SELECT fa, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY fa)
        |SELECT CAST(sum(n) AS BIGINT) AS n_vectors, CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_in_dup_groups,
        |  CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_removable,
        |  (round((CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS DOUBLE) / CAST(sum(n) AS DOUBLE)) * 1000000.0) / 1000000.0) AS dup_rate
        |FROM g""".stripMargin,

    // Session p50/p90/p99 by rank selection over the distinct-value
    // distributions of the same 30-min-gap sessions as
    // events_sessionize.
    "events_session_stats" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
        |b AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > 1800000000
        |               THEN 1 ELSE 0 END AS brk
        |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |s AS (SELECT user_id, t_us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM b),
        |g AS (SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS len,
        |        (max(t_us) - min(t_us)) // 1000000 AS dur FROM s GROUP BY 1, 2),
        |lc AS (SELECT len AS v, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1),
        |lw AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
        |         CAST(sum(c) OVER () AS BIGINT) AS n FROM lc),
        |la AS (SELECT 'n_events' AS metric, max(n) AS n_sessions,
        |        min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
        |        min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90,
        |        min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99 FROM lw),
        |dc AS (SELECT dur AS v, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1),
        |dw AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
        |         CAST(sum(c) OVER () AS BIGINT) AS n FROM dc),
        |da AS (SELECT 'duration_s' AS metric, max(n) AS n_sessions,
        |        min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
        |        min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90,
        |        min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99 FROM dw)
        |SELECT * FROM la UNION ALL SELECT * FROM da ORDER BY metric""".stripMargin,

    // P@k over the same BM25 + embedding-truth legs as
    // retrieval_recall_eval; macro-averaged over the 5 queries.
    "retrieval_precision_curve" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |st AS (SELECT count(*) AS n_corpus, CAST(sum(len(toks)) AS BIGINT) AS sum_dl FROM t),
         |q AS (SELECT DISTINCT doc_id AS q_id, unnest(list_distinct(toks)) AS term
         |      FROM t WHERE doc_id IN (7, 107, 207, 307, 407)),
         |p0 AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
         |p AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl FROM p0
         |      WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM p GROUP BY term),
         |contrib AS (SELECT p.doc_id, p.term,
         |    CAST(floor(ln((st.n_corpus - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |      * ((p.tf * (1.2 + 1.0)) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * (p.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_corpus)))))
         |      * 1000000.0 + 0.5) AS BIGINT) AS s6
         |  FROM p JOIN dfq USING (term) CROSS JOIN st),
         |scored AS (SELECT q.q_id, c.doc_id, CAST(sum(c.s6) AS BIGINT) AS s6
         |  FROM contrib c JOIN q ON c.term = q.term
         |  WHERE c.doc_id <> q.q_id GROUP BY 1, 2),
         |bm AS (SELECT q_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY s6 DESC, doc_id) AS INT) AS rank
         |  FROM scored QUALIFY rank <= 10),
         |qv AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |       WHERE vec_id IN (7, 107, 207, 307, 407)),
         |tr AS (SELECT q_id, id FROM (
         |    SELECT qv.q_id, e.vec_id AS id,
         |      row_number() OVER (PARTITION BY qv.q_id
         |        ORDER BY ${l2("e.embedding", "qv.qv")}, e.vec_id) AS r
         |    FROM embeddings e, qv WHERE e.vec_id <> qv.q_id)
         |  WHERE r <= 10),
         |hit AS (SELECT b.rank FROM bm b JOIN tr ON b.q_id = tr.q_id AND b.doc_id = tr.id),
         |ks AS (SELECT unnest([1, 3, 5, 10]) AS k),
         |perk AS (SELECT ks.k, CAST(count(hit.rank) AS BIGINT) AS n_hits
         |         FROM ks LEFT JOIN hit ON hit.rank <= ks.k GROUP BY ks.k)
         |SELECT CAST(k AS INT) AS k, CAST(5 AS BIGINT) AS n_queries, n_hits,
         |  (round((CAST(n_hits AS DOUBLE) / CAST(k * 5 AS DOUBLE)) * 10000.0) / 10000.0) AS p_at_k
         |FROM perk ORDER BY k""".stripMargin,

    // n deterministic hash-partnered pairs, L2 fixed to 1e-6 integers,
    // 20 data-derived integer bins (table_drift formula).
    "vector_pair_sample" ->
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         |p0 AS (SELECT e.vec_id AS a,
         |         ${tokenHash60("'pair:' || CAST(e.vec_id AS VARCHAR)")} % nn.n AS h, nn.n AS n
         |       FROM embeddings e, nn),
         |pr AS (SELECT a, CASE WHEN h = a THEN (h + 1) % n ELSE h END AS b FROM p0),
         |d AS (SELECT CAST(floor(${l2("ea.embedding", "eb.embedding")} * 1000000.0 + 0.5) AS BIGINT) AS df
         |      FROM pr JOIN embeddings ea ON ea.vec_id = pr.a JOIN embeddings eb ON eb.vec_id = pr.b),
         |r AS (SELECT min(df) AS lo, max(df) AS hi, CAST(count(*) AS BIGINT) AS np FROM d),
         |bb AS (SELECT least(19, ((d.df - r.lo) * 20) // (r.hi - r.lo + 1)) AS bin, r.np FROM d, r)
         |SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_pairs,
         |  (round((CAST(count(*) AS DOUBLE) / CAST(max(np) AS DOUBLE)) * 10000.0) / 10000.0) AS share
         |FROM bb GROUP BY bin ORDER BY bin""".stripMargin,

    // Same simhash sign/banding chain as dedup_simhash, histogrammed
    // over ALL candidates (no hamming cut).
    "dedup_simhash_hamming_hist" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |hs AS (SELECT doc_id, list_transform(toks, t -> ${tokenHash60("t")}) AS hs FROM t),
         |sg AS (SELECT doc_id, list_sum(list_transform(range(0, 60), j ->
         |         CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |              THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS sig
         |       FROM hs),
         |bands AS (SELECT doc_id, sig, r.range AS band, (sig >> (r.range * 15)) & 32767 AS band_key
         |          FROM sg, range(0, 4) r),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |hm AS (SELECT bit_count(xor(sa.sig, sb.sig)) AS hamming
         |       FROM cand JOIN sg sa ON sa.doc_id = a_id JOIN sg sb ON sb.doc_id = b_id),
         |h AS (SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs FROM hm GROUP BY 1),
         |tt AS (SELECT CAST(sum(n_pairs) AS DOUBLE) AS t FROM h)
         |SELECT hamming, n_pairs,
         |  (round((CAST(n_pairs AS DOUBLE) / t) * 10000.0) / 10000.0) AS share
         |FROM h, tt ORDER BY hamming""".stripMargin,

    // Radius knob: conditional counts against the same IEEE double
    // distance, one scan.
    "knn_range_count_curve" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 4),
         |d AS (SELECT ${l2("e.embedding", "q.qv")} AS d FROM embeddings e, q)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN d <= 0.75 THEN 1 ELSE 0 END) AS BIGINT) AS n_r075,
         |  CAST(sum(CASE WHEN d <= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_r100,
         |  CAST(sum(CASE WHEN d <= 1.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_r125,
         |  CAST(sum(CASE WHEN d <= 1.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_r150,
         |  CAST(sum(CASE WHEN d <= 1.75 THEN 1 ELSE 0 END) AS BIGINT) AS n_r175
         |FROM d""".stripMargin,

    // Second-order transitions: two lags in the same per-user window
    // pass; (types³)-bounded rollup and top-3 cut.
    "events_markov2" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
        |l AS (SELECT event_type,
        |        lag(event_type, 1) OVER w AS p1,
        |        lag(event_type, 2) OVER w AS p2
        |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |c AS (SELECT p2 AS prev2, p1 AS prev1, event_type AS next_type,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM l WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |f AS (SELECT prev2, prev1, next_type, n,
        |        CAST(sum(n) OVER (PARTITION BY prev2, prev1) AS BIGINT) AS n_ctx,
        |        CAST(row_number() OVER (PARTITION BY prev2, prev1 ORDER BY n DESC, next_type) AS INT) AS rank
        |      FROM c)
        |SELECT prev2, prev1, rank, next_type, n, n_ctx,
        |  (round((n / n_ctx) * 10000.0) / 10000.0) AS p
        |FROM f WHERE rank <= 3 ORDER BY prev2, prev1, rank""".stripMargin,

    // Detector agreement: the minhash est-pairs (>= 0.5) full-outer-
    // joined with the simhash hamming<=8 pairs; simhash CTEs renamed
    // *2 to avoid colliding with the minhash chain's names.
    "dedup_detector_overlap" ->
      s"""WITH $minhashCtes,
         |mp AS (SELECT a_id, b_id FROM est WHERE e >= 0.5),
         |t2 AS (SELECT doc_id, $toks AS toks FROM documents),
         |hs2 AS (SELECT doc_id, list_transform(toks, t -> ${tokenHash60("t")}) AS hs FROM t2),
         |sg2 AS (SELECT doc_id, list_sum(list_transform(range(0, 60), j ->
         |         CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |              THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS sig
         |       FROM hs2),
         |bands2 AS (SELECT doc_id, sig, r.range AS band, (sig >> (r.range * 15)) & 32767 AS band_key
         |           FROM sg2, range(0, 4) r),
         |cand2 AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |          FROM bands2 a JOIN bands2 b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |sp AS (SELECT a_id, b_id FROM (
         |         SELECT a_id, b_id, bit_count(xor(sa.sig, sb.sig)) AS hamming
         |         FROM cand2 JOIN sg2 sa ON sa.doc_id = a_id JOIN sg2 sb ON sb.doc_id = b_id)
         |       WHERE hamming <= 8),
         |f AS (SELECT CASE WHEN mp.a_id IS NOT NULL THEN 1 ELSE 0 END AS in_m,
         |             CASE WHEN sp.a_id IS NOT NULL THEN 1 ELSE 0 END AS in_s
         |      FROM mp FULL OUTER JOIN sp ON mp.a_id = sp.a_id AND mp.b_id = sp.b_id)
         |SELECT CAST(sum(in_m) AS BIGINT) AS n_minhash, CAST(sum(in_s) AS BIGINT) AS n_simhash,
         |  CAST(sum(in_m * in_s) AS BIGINT) AS n_both, CAST(count(*) AS BIGINT) AS n_union,
         |  (round((CAST(sum(in_m * in_s) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0) AS pair_jaccard
         |FROM f""".stripMargin,

    // Code-symbol density per char by integer division; same regex
    // char class on both engines.
    "text_code_detect" ->
      """WITH d AS (SELECT source, text FROM documents WHERE len(text) > 0),
        |r AS (SELECT source,
        |        (len(regexp_extract_all(text, '[{}();=<>]')) * 1000000) // len(text) AS rf
        |      FROM d),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(CASE WHEN rf >= 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_code_like,
        |        CAST(sum(CAST(rf AS HUGEINT)) AS HUGEINT) AS srf
        |      FROM r GROUP BY 1)
        |SELECT source, n_docs, n_code_like,
        |  (round((CAST(n_code_like AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 10000.0) / 10000.0) AS code_rate,
        |  (round((CAST(srf AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1000000.0)) * 1000000.0) / 1000000.0) AS mean_symbol_density
        |FROM a ORDER BY source""".stripMargin,

    // Heaps-law curve: each word counted once at its minimum decile;
    // dense doc_ids make the decile pure integer arithmetic.
    "corpus_vocab_growth" ->
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |w AS (SELECT doc_id, unnest(list_distinct($toks)) AS word FROM documents),
         |f AS (SELECT word, min(least(9, (doc_id * 10) // nn.n_docs)) AS decile FROM w, nn GROUP BY 1),
         |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_new_words FROM f GROUP BY 1),
         |sp AS (SELECT r.range AS decile FROM range(0, 10) r),
         |gg AS (SELECT sp.decile, CAST(coalesce(g.n_new_words, 0) AS BIGINT) AS n_new_words
         |       FROM sp LEFT JOIN g ON g.decile = sp.decile)
         |SELECT CAST(decile AS INT) AS decile, n_new_words,
         |  CAST(sum(n_new_words) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
         |FROM gg ORDER BY decile""".stripMargin,

    // Gaps-and-islands streaks: day − row_number groups runs; best
    // streak per user via rank (streak desc, start asc); top-20 cut on
    // exact integers.
    "events_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
        |r AS (SELECT user_id, day,
        |        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp FROM ud),
        |s AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak_days,
        |        min(day) AS start_day FROM r GROUP BY 1, 2),
        |b AS (SELECT user_id, streak_days, start_day,
        |        row_number() OVER (PARTITION BY user_id ORDER BY streak_days DESC, start_day) AS rn
        |      FROM s),
        |t AS (SELECT user_id, streak_days, start_day FROM b WHERE rn = 1
        |      ORDER BY streak_days DESC, user_id LIMIT 20)
        |SELECT * FROM t ORDER BY streak_days DESC, user_id""".stripMargin,

    // Pearson over the id-aligned docs∩embeddings slice: exact HUGEINT
    // moments, identical final double tree (tableCorr discipline).
    "corpus_norm_alignment" ->
      """WITH y AS (SELECT vec_id,
        |  CAST(floor(sqrt(CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT)
        |       * CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT))) AS DOUBLE)) + 0.5) AS BIGINT) AS y
        |  FROM embeddings),
        |j AS (SELECT CAST(d.n_chars AS HUGEINT) AS x, CAST(y.y AS HUGEINT) AS y
        |      FROM documents d JOIN y ON d.doc_id = y.vec_id),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        |  (round((CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))) * 10000.0) / 10000.0) AS r
        |FROM m""".stripMargin,

    // One-row data card: lang votes + rounded quality from the shared
    // CTE chain, scores fixed to 1e-4 integers before the exact mean.
    "corpus_report_card" ->
      s"""WITH $langScoreCtes,
         |met AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(CASE WHEN lang.lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         |          CAST(sum(CAST(floor(sc.score * 10000.0 + 0.5) AS HUGEINT)) AS HUGEINT) AS ss
         |        FROM lang JOIN sc USING (doc_id)),
         |tok AS (SELECT CAST(sum(len($toks)) AS BIGINT) AS n_tokens,
         |          CAST(sum(n_chars) AS BIGINT) AS n_chars FROM documents),
         |voc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab
         |        FROM (SELECT unnest(list_distinct($toks)) AS w FROM documents))
         |SELECT n_docs, n_chars, n_tokens, vocab,
         |  (round((CAST(n_en AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 10000.0) / 10000.0) AS en_share,
         |  (round((CAST(ss AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 10000.0)) * 10000.0) / 10000.0) AS mean_quality
         |FROM met, tok, voc""".stripMargin,

    // User-grain co-occurrence lift: distinct (user, type) marginals +
    // per-user pair explosion bounded by C(types, 2).
    "events_type_affinity" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
        |ct AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        CAST(count(*) AS BIGINT) AS n_both
        |      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.n_both, ca.cnt AS n_a, cb.cnt AS n_b,
        |  (round((CAST(p.n_both * nu.n_users AS DOUBLE) / CAST(ca.cnt * cb.cnt AS DOUBLE)) * 10000.0) / 10000.0) AS lift
        |FROM p JOIN ct ca ON ca.event_type = p.type_a
        |       JOIN ct cb ON cb.event_type = p.type_b, nu
        |ORDER BY p.type_a, p.type_b""".stripMargin,

    // Benford: exact-cents string-head digit, shares/expectations fixed
    // to 1e-4 ints so dev is an exact integer subtraction.
    "orders_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |           FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d
        |      WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_orders FROM g),
        |f AS (SELECT digit, n,
        |        CAST(floor(CAST(n AS DOUBLE) / CAST(n_orders AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS s4,
        |        CAST(floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT) AS e4
        |      FROM g, t)
        |SELECT digit, n, CAST(s4 AS DOUBLE) / 10000.0 AS share,
        |  CAST(e4 AS DOUBLE) / 10000.0 AS benford,
        |  CAST(s4 - e4 AS DOUBLE) / 10000.0 AS dev
        |FROM f ORDER BY digit""".stripMargin,

    // l-diversity over the k-anonymity QI groups; sensitive attribute =
    // last key digit. Histogram of per-group distinct counts.
    "customer_l_diversity" ->
      """WITH g AS (SELECT c_mktsegment, c_nationkey,
        |        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_k,
        |        CAST(count(*) AS BIGINT) AS g,
        |        CAST(count(DISTINCT c_custkey % 10) AS BIGINT) AS l
        |      FROM customer GROUP BY 1, 2, 3)
        |SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(g) AS BIGINT) AS n_customers
        |FROM g GROUP BY 1 ORDER BY l""".stripMargin,

    // PSI drift first-half vs second-half of the time range: integer
    // midpoint split, Laplace-smoothed shares, ln on one division of
    // exact cross-products fixed to 1e-6 ints (lm_score recipe).
    "events_psi" ->
      """WITH ev AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |mm AS (SELECT (min(t) + max(t)) // 2 AS mid FROM ev),
        |cnt AS (SELECT event_type,
        |          CAST(sum(CASE WHEN t <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |          CAST(sum(CASE WHEN t > mid THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |        FROM ev, mm GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS tot_a, CAST(sum(n_b) AS BIGINT) AS tot_b,
        |          CAST(count(*) AS BIGINT) AS n_types FROM cnt)
        |SELECT event_type, n_a, n_b,
        |  (round((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_types AS DOUBLE)) * 10000.0) / 10000.0) AS p_early,
        |  (round((CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + n_types AS DOUBLE)) * 10000.0) / 10000.0) AS p_late,
        |  (round(((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_types AS DOUBLE)
        |      - CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + n_types AS DOUBLE))
        |    * (CAST(CAST(floor(ln(CAST((n_a + 1) * (tot_b + n_types) AS DOUBLE)
        |        / CAST((n_b + 1) * (tot_a + n_types) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)
        |      / 1000000.0)) * 10000.0) / 10000.0) AS psi_contrib
        |FROM cnt, tot ORDER BY event_type""".stripMargin,

    // Canonical selection: minhash clusters (subquery-scoped recursive
    // closure, dedup_clusters spelling) × 1e-4-fixed quality; the
    // keeper is the row_number-1 member by (s4 DESC, doc_id).
    "dedup_canonical" ->
      s"""WITH $langScoreCtes,
         |cl AS (SELECT doc_id, canonical_id FROM
         |  (WITH RECURSIVE $minhashCtes,
         |   pairs AS (SELECT a_id, b_id FROM est WHERE e >= 0.5),
         |   edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs),
         |   reach(u, v) AS (
         |     SELECT u, v FROM edges
         |     UNION
         |     SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
         |   canon AS (SELECT u AS id, least(u, min(v)) AS canonical FROM reach GROUP BY u)
         |   SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS canonical_id
         |   FROM documents d LEFT JOIN canon c ON c.id = d.doc_id) z),
         |m AS (SELECT cl.canonical_id, cl.doc_id,
         |        CAST(floor(sc.score * 10000.0 + 0.5) AS BIGINT) AS s4
         |      FROM cl JOIN sc USING (doc_id)),
         |g AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS n_members,
         |        CAST(sum(s4) AS HUGEINT) AS ssum FROM m GROUP BY 1),
         |p AS (SELECT canonical_id, doc_id AS keep_doc_id, s4,
         |        row_number() OVER (PARTITION BY canonical_id ORDER BY s4 DESC, doc_id) AS rk
         |      FROM m)
         |SELECT g.canonical_id, p.keep_doc_id, g.n_members,
         |  CAST(p.s4 AS DOUBLE) / 10000.0 AS keep_score,
         |  (round((CAST(g.ssum AS DOUBLE) / (CAST(g.n_members AS DOUBLE) * 10000.0)) * 10000.0) / 10000.0) AS mean_score
         |FROM g JOIN p USING (canonical_id)
         |WHERE p.rk = 1 AND g.n_members >= 2
         |ORDER BY g.canonical_id""".stripMargin,

    // DSIR importance weights: hashed-bigram (256-bucket) LLR of the
    // high-quality slice vs the raw corpus, per-bucket ln fixed to 1e-6
    // ints on one division of exact cross-products, per-doc exact dot.
    "corpus_dsir" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, n_bigrams,
         |  (round((CAST(ss AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1000000.0)) * 10000.0) / 10000.0) AS dsir_llr
         |FROM d ORDER BY doc_id""".stripMargin,

    // DSIR resampling: Gumbel-log rank key ln(-ln u) - llr with the
    // keyed-hash u; identical double spelling on both sides so the
    // top-50 cut cannot flap.
    "corpus_dsir_sample" ->
      s"""WITH $dsirCtes,
         |k AS (SELECT doc_id, n_bigrams,
         |        CAST(ss AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1000000.0) AS llr_raw,
         |        ln(-ln((${tokenHash60("'dsirs:' || CAST(doc_id AS VARCHAR)")} + 1.0)
         |            / 1152921504606846976.0))
         |          - CAST(ss AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1000000.0) AS gkey
         |      FROM d)
         |SELECT CAST(row_number() OVER (ORDER BY gkey, doc_id) AS INT) AS pick,
         |  doc_id, n_bigrams,
         |  (round((llr_raw) * 10000.0) / 10000.0) AS dsir_llr,
         |  (round((gkey) * 1000000.0) / 1000000.0) AS gkey
         |FROM k ORDER BY gkey, doc_id LIMIT 50""".stripMargin,

    // Delete-1 neighborhood blocking + exact levenshtein verify; the
    // matches-per-record histogram with zero-match records kept.
    // position-tagged symmetric delete: substitution (same-pos variant
    // equality), equal-name, and indel (name = delete-1 variant) legs —
    // each PROVABLY ED <= 1, no verify step; posting blocks df-capped
    // at 256 — mirrors the Spark side exactly.
    "customer_id_linkage" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |v AS (SELECT id, k AS pos,
        |        CASE WHEN k = 0 THEN name
        |             ELSE substr(name, 1, k - 1) || substr(name, k + 1, len(name)) END AS v
        |      FROM c, unnest(range(0, len(name) + 1)) AS t(k)),
        |vk AS (SELECT v.id, v.pos, v.v FROM v
        |       JOIN (SELECT pos, v FROM v GROUP BY pos, v HAVING count(*) <= 256) ok
        |       USING (pos, v)),
        |subeq AS (SELECT a.id AS a_id, b.id AS b_id
        |          FROM vk a JOIN vk b ON a.pos = b.pos AND a.v = b.v AND a.id < b.id),
        |indel AS (SELECT least(n.id, d.id) AS a_id, greatest(n.id, d.id) AS b_id
        |          FROM vk n JOIN vk d ON n.v = d.v AND n.pos = 0 AND d.pos >= 1
        |          WHERE n.id <> d.id),
        |p AS (SELECT DISTINCT a_id, b_id FROM
        |      (SELECT * FROM subeq UNION ALL SELECT * FROM indel)),
        |m AS (SELECT id, CAST(count(*) AS BIGINT) AS n
        |      FROM (SELECT a_id AS id FROM p UNION ALL SELECT b_id FROM p) u GROUP BY 1),
        |j AS (SELECT c.id, coalesce(m.n, 0) AS n_matches FROM c LEFT JOIN m USING (id)),
        |cap AS (SELECT CAST(count(*) AS BIGINT) AS n_capped_blocks,
        |               CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_ids_in_capped
        |        FROM (SELECT pos, v, count(*) AS cnt FROM v GROUP BY pos, v HAVING count(*) > 256))
        |SELECT n_matches, CAST(count(*) AS BIGINT) AS n_customers,
        |       cap.n_capped_blocks, cap.n_ids_in_capped
        |FROM j CROSS JOIN cap GROUP BY 1, 3, 4 ORDER BY n_matches""".stripMargin,

    // MRL truncation curve: exact top-10 on list_slice prefixes vs the
    // full-dim exact answer; the d = 64 leg closes at recall 1.0.
    "ann_matryoshka_curve" -> matryoshkaSql(queryId = 4L, k = 10,
      dims = Seq(8, 16, 32, 64)),

    // CCNet bucketing: lm_score chain (corpus_lm_score spelling), per-
    // language tercile thresholds by rank selection over the (lang ×
    // 4-dp score) counts, bucketing by VALUE so ties are deterministic.
    "corpus_ccnet_buckets" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |u AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(toks) AS w FROM t)),
         |sh AS (SELECT doc_id, CASE WHEN len(toks) < 2 THEN [] ELSE
         |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END AS sh FROM t),
         |g AS (SELECT doc_id, unnest(sh) AS gm FROM sh),
         |db AS (SELECT doc_id, split_part(gm, ' ', 1) AS w1, split_part(gm, ' ', 2) AS w2,
         |         count(*) AS nij
         |       FROM g GROUP BY 1, 2, 3),
         |c2 AS (SELECT w1, w2, CAST(sum(nij) AS BIGINT) AS c12 FROM db GROUP BY 1, 2),
         |c1t AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         |model AS (SELECT w1, w2,
         |            CAST(floor(ln((c12 + 1.0) / (c1 + v)) * 1000000.0 + 0.5) AS BIGINT) AS s6
         |          FROM c2 JOIN c1t USING (w1) CROSS JOIN u),
         |dd AS (SELECT doc_id, CAST(sum(nij) AS BIGINT) AS n_bigrams,
         |        CAST(sum(nij * s6) AS BIGINT) AS ss
         |      FROM db JOIN model USING (w1, w2) GROUP BY 1),
         |lm AS (SELECT doc_id,
         |        (round((ss / (n_bigrams * 1000000.0)) * 10000.0) / 10000.0) AS lm_score FROM dd),
         |dl AS (SELECT d2.lang, CAST(floor(lm.lm_score * 10000.0 + 0.5) AS BIGINT) AS s4
         |       FROM lm JOIN documents d2 USING (doc_id)),
         |cd AS (SELECT lang, s4, count(*) AS c FROM dl GROUP BY 1, 2),
         |td AS (SELECT lang, s4, sum(c) OVER (PARTITION BY lang ORDER BY s4) AS cum,
         |         sum(c) OVER (PARTITION BY lang) AS n FROM cd),
         |th AS (SELECT lang, min(CASE WHEN cum >= (n + 2) // 3 THEN s4 END) AS t1,
         |         min(CASE WHEN cum >= (2 * n + 2) // 3 THEN s4 END) AS t2 FROM td GROUP BY 1),
         |b AS (SELECT dl.lang,
         |        CASE WHEN dl.s4 <= th.t1 THEN 'tail'
         |             WHEN dl.s4 <= th.t2 THEN 'middle'
         |             ELSE 'head' END AS bucket, dl.s4
         |      FROM dl JOIN th USING (lang))
         |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  (round((CAST(sum(s4) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 10000.0)) * 10000.0) / 10000.0) AS mean_lm
         |FROM b GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    // Blocklist audit: membership counts on the shared token spelling,
    // source-bounded rollup.
    "text_blocklist" ->
      s"""WITH h AS (SELECT source,
         |    CAST(len(list_filter($toks, t -> list_contains(['slow','hash','spam','junk'], t))) AS BIGINT) AS hits
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(hits) AS BIGINT) AS total_hits,
         |  (round((CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0) AS flag_rate
         |FROM h GROUP BY 1 ORDER BY source""".stripMargin,

    // Multi-touch attribution: journeys = prior-purchase running count,
    // first/last by row_number, linear fraction fixed to 1e-6 ints per
    // (journey, type) before the cross-journey sum.
    "events_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |j AS (SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY t, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
        |      FROM ev),
        |conv AS (SELECT user_id, jid FROM j WHERE event_type = 'purchase'),
        |tch AS (SELECT j.user_id, j.jid, j.event_id, j.event_type, j.t
        |        FROM j JOIN conv USING (user_id, jid) WHERE j.event_type <> 'purchase'),
        |perj AS (SELECT user_id, jid, CAST(count(*) AS BIGINT) AS n FROM tch GROUP BY 1, 2),
        |ftj AS (SELECT user_id, jid, event_type FROM tch
        |        QUALIFY row_number() OVER (PARTITION BY user_id, jid ORDER BY t, event_id) = 1),
        |ltj AS (SELECT user_id, jid, event_type FROM tch
        |        QUALIFY row_number() OVER (PARTITION BY user_id, jid ORDER BY t DESC, event_id DESC) = 1),
        |lin AS (SELECT tc.event_type, CAST(sum(tc.nt) AS BIGINT) AS n_touches,
        |          CAST(sum(CAST(floor(CAST(tc.nt AS DOUBLE) / CAST(perj.n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS lin6
        |        FROM (SELECT user_id, jid, event_type, CAST(count(*) AS BIGINT) AS nt
        |              FROM tch GROUP BY 1, 2, 3) tc
        |        JOIN perj USING (user_id, jid) GROUP BY 1),
        |ft AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ft_journeys FROM ftj GROUP BY 1),
        |lt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS lt_journeys FROM ltj GROUP BY 1)
        |SELECT lin.event_type, lin.n_touches,
        |  coalesce(ft.ft_journeys, 0) AS ft_journeys,
        |  coalesce(lt.lt_journeys, 0) AS lt_journeys,
        |  (round((CAST(lin.lin6 AS DOUBLE) / 1000000.0) * 10000.0) / 10000.0) AS linear_credit
        |FROM lin LEFT JOIN ft USING (event_type) LEFT JOIN lt USING (event_type)
        |ORDER BY lin.event_type""".stripMargin
  )
}
