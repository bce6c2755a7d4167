package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) containment join: each point row picks the interval
  * rows of the same key that contain it (start ≤ t ≤ end) — the other
  * classic operator relational engines add for time-series work
  * (attributing events to sessions, trades to auction windows, reads to
  * compaction epochs).
  *
  * Spark-first shape: a bare `t BETWEEN start AND end` join is a
  * BroadcastNestedLoop/cartesian per key — O(|P|·|I|) pair rows before
  * the filter, the classic range-join explosion. Here intervals explode
  * into the coarse time buckets they span (few, when bucketWidth is
  * chosen near the typical interval length) and each point maps to
  * exactly ONE bucket, so the join is a narrow equi-join on
  * (key, bucket) with an exact containment filter after — candidate
  * volume is O(points + interval-bucket spans), never a cross product.
  * Correctness does not depend on bucketWidth (any containing interval
  * spans the point's bucket by construction); only candidate volume
  * does.
  */
object Interval {

  /** @param points    rows with `keyCol`, `tCol` (integer time); all
    *                  columns preserved on output
    * @param intervals rows with `keyCol`, `startCol`, `endCol` plus
    *                  `payload` columns to attach
    * @param bucketWidth coarse bucket width in `tCol` units
    */
  def joinContaining(points: DataFrame, intervals: DataFrame,
                     keyCol: String, tCol: String,
                     startCol: String, endCol: String,
                     payload: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val iv = intervals.select(
        Seq(col(keyCol), col(startCol), col(endCol)) ++ payload.map(col): _*)
      .withColumn("bkt",
        explode(sequence(expr(s"$startCol div $bucketWidth"), expr(s"$endCol div $bucketWidth"))))
    points
      .withColumn("bkt", expr(s"$tCol div $bucketWidth"))
      .join(iv, Seq(keyCol, "bkt"))
      .where(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("bkt")
  }
}
