package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins merge + tombstone delete — the batch twins of the
  * reference's mutation path (reference: src/db/vector_database.rs:24-83 —
  * upsert deletes the old vector, inserts the new one, overwrites the
  * scalar record; FaissIndex::remove_vectors is the delete primitive).
  *
  * Merge is update ∪ (base anti-join update): one shuffle on the key for
  * the anti join (broadcast when updates are small, which the optimizer
  * picks via AQE/size stats). At warehouse scale this is the MERGE INTO
  * pattern; there is no per-row driver loop anywhere.
  */
object Upsert {

  /** Latest-wins merge. When `updates` itself carries several rows for
    * one key, exactly one survives — ordered by `versionCol` descending
    * when given (the streaming twin's event-time semantics,
    * [[graft.streaming.EventStream.upsertLatest]]), else by the remaining
    * columns descending (a deterministic arbitrary winner, so duplicate
    * update batches can never fan out the key).
    */
  def merge(base: DataFrame, updates: DataFrame, key: String,
            versionCol: Option[String] = None): DataFrame = {
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols, "updates must share the base schema")
    val rest = cols.filterNot(_ == key)
    val order: Seq[Column] = versionCol match {
      case Some(v) => col(v).desc +: (if (rest.isEmpty) Nil else Seq(struct(rest.map(col): _*).desc))
      case None    => if (rest.isEmpty) Seq(lit(0)) else Seq(struct(rest.map(col): _*).desc)
    }
    val w = Window.partitionBy(key).orderBy(order: _*)
    val latest = updates
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    latest.unionAll(
      base.join(latest.select(col(key)), Seq(key), "left_anti").select(cols.map(col): _*))
      .select(cols.map(col): _*)
  }

  /** Tombstone delete: drop every base row whose key appears in `ids`
    * (reference: FaissIndex::remove_vectors, src/db/vector_database.rs:32-38
    * — the remove half of the reference's upsert, exposed standalone).
    * One anti join on the key; broadcast when the tombstone set is small.
    */
  def delete(base: DataFrame, ids: DataFrame, key: String): DataFrame =
    base.join(ids.select(col(key)), Seq(key), "left_anti")

  /** Apply a CDC batch — the generalized mutation log the reference's
    * three verbs (insert/upsert/delete) produce, folded into the state
    * in ONE pass: `changes` carries (key, `ordCol` version, `op` ∈
    * I/U/D, payload…); per key the HIGHEST version wins (ties broken by
    * op then payload, deterministically), a surviving D tombstones the
    * key, anything else replaces/creates it. Shape: one window over the
    * (small) change batch + one anti join on the key — the MERGE INTO
    * WHEN MATCHED/NOT MATCHED/DELETE pattern with no per-row loop.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, key: String, ordCol: String): DataFrame = {
    val cols = base.columns.toSeq
    require(changes.columns.toSeq == Seq(key, ordCol, "op") ++ cols.filterNot(_ == key),
      s"changes must be ($key, $ordCol, op, <payload>)")
    val rest = cols.filterNot(_ == key)
    val w = Window.partitionBy(key)
      .orderBy(col(ordCol).desc +: col("op").desc +:
        (if (rest.isEmpty) Nil else Seq(struct(rest.map(col): _*).desc)): _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", ordCol)
    val applied = latest.where(col("op") =!= "D").drop("op").select(cols.map(col): _*)
    base.join(latest.select(col(key)), Seq(key), "left_anti")
      .select(cols.map(col): _*)
      .unionAll(applied)
  }
}
