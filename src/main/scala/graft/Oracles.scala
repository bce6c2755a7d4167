package graft

/** DuckDB oracle SQL, one entry per SQL-expressible key in
  * SparkEntry.queries. Column names, types, rounding and ORDER BY are
  * kept in lock-step with [[Queries]] — the driver sorts columns by name
  * and hash-compares values, so both sides must agree bit-for-bit after
  * `round(..., n)`.
  *
  * Vector math is spelled out element-by-element (sequential
  * left-to-right double accumulation) to match the codegen loops in
  * graft.functions.VectorExpressions exactly.
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

  /** Single-query exact k-NN: score ascending, deterministic id tie-break.
    * `valueExpr` maps the ascending score back to the reported metric.
    */
  private def knnSql(scoreExpr: String, valueOfScore: String, where: String, queryId: Long, k: Int): String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $queryId),
       |d AS (SELECT e.vec_id AS id, $scoreExpr AS score FROM embeddings e, q $where)
       |SELECT CAST(row_number() OVER (ORDER BY score, id) AS INT) AS rank, id,
       |       round($valueOfScore, 4) AS value
       |FROM d ORDER BY score, id LIMIT $k""".stripMargin

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
         |       n_id, round(score, 4) AS value
         |FROM d QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "filtered_knn_eq" -> knnSql(l2("e.embedding", "q.qv"), "score", "WHERE e.label = 3", 1, 10),

    "filtered_knn_ne" -> knnSql(l2("e.embedding", "q.qv"), "score", "WHERE e.label <> 3", 1, 10),

    "upsert" ->
      """WITH upd AS (
        |  SELECT vec_id, label + 100 AS label FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, -1 AS label FROM embeddings WHERE vec_id % 97 = 0)
        |SELECT vec_id, label FROM upd
        |UNION ALL
        |SELECT e.vec_id, e.label FROM embeddings e ANTI JOIN upd u ON e.vec_id = u.vec_id
        |ORDER BY vec_id""".stripMargin,

    "query_by_id" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = 42",

    "filter_index_build" ->
      """SELECT label AS value, count(*) AS cnt, min(vec_id) AS min_id,
        |       max(vec_id) AS max_id, CAST(sum(vec_id) AS BIGINT) AS id_sum
        |FROM embeddings GROUP BY label ORDER BY value""".stripMargin,

    "index_stats" ->
      s"""WITH x AS (SELECT CAST(len(embedding) AS INT) AS dim, ${norm("embedding")} AS nrm FROM embeddings)
         |SELECT dim, count(*) AS n, round(avg(nrm), 4) AS avg_norm,
         |       round(min(nrm), 4) AS min_norm, round(max(nrm), 4) AS max_norm
         |FROM x GROUP BY dim ORDER BY dim""".stripMargin,

    // ================= E. analytics / events =================

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
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
      """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
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

    "events_windowed" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_topn" ->
      """SELECT event_type,
        |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS INT) AS rank,
        |  event_id, round(value, 4) AS value
        |FROM events QUALIFY rank <= 5 ORDER BY event_type, rank""".stripMargin,

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
        |  round(sum(value), 2) AS sum_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
