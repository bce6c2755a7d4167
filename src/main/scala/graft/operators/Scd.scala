package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture → slowly-changing-dimension reconstruction.
  * The reference stores only the latest scalar row per id
  * (vector_database.rs upsert semantics); a warehouse additionally
  * needs the HISTORY — SCD type-2 validity intervals recovered from the
  * raw change log.
  */
object Scd {

  /** Rebuild SCD type-2 intervals from an event/change log: per key,
    * collapse consecutive runs of an unchanged attribute value into one
    * row with [valid_from, valid_to) integer-microsecond validity,
    * `valid_to` = NULL ⇒ current version. Run detection is the classic
    * gaps-and-islands construction (lag ≠ value ⇒ new island, cumsum of
    * break flags numbers the islands) — all windows share ONE
    * key-partitioned ordering, so the whole reconstruction is a single
    * shuffle on the key at any scale, never a self-join.
    *
    * `ordCol` must be an exact (integer) ordering column; ties are
    * broken by `tieCol` so the reconstruction is deterministic under
    * equal timestamps.
    */
  def type2(log: DataFrame, keyCol: String, valueCol: Column,
            ordCol: String, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(ordCol), col(tieCol))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the groupBy and the version window key on supersets of `keyCol`,
    // so EnsureRequirements reuses the one key-hash exchange throughout
    val runs = log
      .select(col(keyCol), col(ordCol), col(tieCol), valueCol.as("v"))
      .withColumn("brk",
        when(lag(col("v"), 1).over(byKey).isNull ||
             lag(col("v"), 1).over(byKey) =!= col("v"), 1).otherwise(0))
      .withColumn("run", sum(col("brk")).over(cum).cast("int"))
      .groupBy(col(keyCol), col("run"), col("v"))
      .agg(min(col(ordCol)).as("valid_from"), count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(keyCol).orderBy(col("run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("run").as("version"), col("v"),
        col("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
      .orderBy(col(keyCol), col("version"))
  }
}
