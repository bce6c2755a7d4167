package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins merge — the batch twin of the reference's upsert path
  * (reference: src/db/vector_database.rs:24-83 — delete old vector,
  * insert new one, overwrite the scalar record).
  *
  * Implemented as update ∪ (base anti-join update): one shuffle on the
  * key for the anti join (broadcast when updates are small, which the
  * optimizer picks via AQE/size stats). At warehouse scale this is the
  * MERGE INTO pattern; there is no per-row driver loop anywhere.
  */
object Upsert {
  def merge(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols, "updates must share the base schema")
    updates.unionAll(
      base.join(updates.select(col(key)), Seq(key), "left_anti").select(cols.map(col): _*))
      .select(cols.map(col): _*)
  }
}
