package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located fact⋈fact joins — the piece of
  * the 100 TB design that broadcast can't cover: when BOTH join sides
  * are huge (orders ⋈ lineitem), pre-bucketing them on the join key
  * with matching bucket counts lets Spark plan the join with ZERO
  * exchanges — each task reads bucket i of both tables and joins
  * locally, so the O(data) shuffle disappears from every subsequent
  * join on that key. BucketedSpec asserts the exchange-free plan.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed table. Same `buckets` on
    * both sides of a future join is what removes the exchanges; sortBy
    * additionally removes the per-task sort for sort-merge joins.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def read(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
