package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew guards for shuffles whose key distribution is pathological.
  *
  * AQE's skew-join splitting (on by default in Spark 4) is the first
  * line of defense; these utilities cover the cases it can't touch —
  * a shuffle join where one side must be replicated, and hot-key
  * aggregation state (e.g. streaming or approximate-distinct buffers
  * that don't pre-combine).
  *
  * Salting is DETERMINISTIC here (hash of the row's own columns, not
  * rand()): task retries and speculative execution see the same salt,
  * so results stay exactly reproducible.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from the given columns. */
  def salt(n: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong)).cast("int")

  /** Skew-proof equi-join: the big (skewed) side gets a deterministic
    * per-row salt; the small side is replicated `numSalts` times so every
    * (key, salt) bucket finds its match. One shuffle each side on
    * (key, salt) — a hot key now spreads over `numSalts` reducers.
    * Inner join only (replication breaks outer-join null semantics).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, numSalts: Int): DataFrame = {
    require(numSalts >= 1)
    val saltedBig = big.withColumn("__salt",
      salt(numSalts, big.columns.map(col).toSeq: _*))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for re-associable aggregates
    * (sum/count/min/max): partial-aggregate on (key, salt) spreads a hot
    * key's combine state across `numSalts` reducers, then a tiny final
    * pass merges the partials. Values to aggregate are declared as
    * (alias → (column, "sum"|"count"|"min"|"max")).
    */
  def saltedAggregate(df: DataFrame, key: String, numSalts: Int,
                      aggs: Seq[(String, (Column, String))]): DataFrame = {
    require(numSalts >= 1)
    val phase1 = df
      .withColumn("__salt", salt(numSalts, df.columns.map(col).toSeq: _*))
      .groupBy(col(key), col("__salt"))
      .agg(
        aggs.head match { case (alias, (c, f)) => partial(f)(c).as(alias) },
        aggs.tail.map { case (alias, (c, f)) => partial(f)(c).as(alias) }: _*)
    phase1
      .groupBy(col(key))
      .agg(
        aggs.head match { case (alias, (_, f)) => merge(f)(col(alias)).as(alias) },
        aggs.tail.map { case (alias, (_, f)) => merge(f)(col(alias)).as(alias) }: _*)
  }

  private def partial(f: String): Column => Column = f match {
    case "sum"   => sum(_)
    case "count" => c => count(c)
    case "min"   => min(_)
    case "max"   => max(_)
    case other   => throw new IllegalArgumentException(s"non-reassociable aggregate $other")
  }

  /** Merging partials: count partials are SUMMED; the rest re-apply. */
  private def merge(f: String): Column => Column = f match {
    case "count" => sum(_)
    case other   => partial(other)
  }
}
