package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._

/** The FROZEN coarse structure a maintained GRAPH artifact assigns
  * against (reference: index_factory.rs:86-107 — faiss's coarse-
  * quantizer practice at large K): a flat centroid literal at small K,
  * the two-level routed TABLE ([[RoutedQuantizer]]) above
  * [[RoutedQuantizer.kThreshold]], where the flat scheme's
  * K-proportional plan literal / driver array / k-means sample ceiling
  * all break.
  *
  * Why one interface: the mutation protocol ([[GraphMaintenance]]) only
  * ever needs TWO quantizer operations — assign the frozen `cluster` to
  * NEW rows (ingest) and map clusters to their centroid vectors (the
  * medoid re-seed heal). Everything else reads the `cluster` column the
  * data layout PERSISTS, so the verbs are quantizer-agnostic and a
  * 1-row mutation costs the same O(batch × touched clusters) on either
  * side of the threshold.
  */
sealed trait GraphQuantizer {
  def isEmpty: Boolean

  /** Frozen `cluster` assignment for new rows. */
  def withCluster(df: DataFrame, vecCol: String): DataFrame

  /** (cluster INT, cv ARRAY&lt;FLOAT&gt;) — the per-cluster centroid
    * table: a tiny broadcastable literal for flat, the fine TABLE for
    * routed (never a K-proportional driver array).
    */
  def clusterTable(spark: SparkSession): DataFrame

  /** Cluster count: free on the driver for flat (cents.length — no
    * Spark job), one narrow count of the fine table for routed.
    */
  def numClusters(spark: SparkSession): Long
}

final case class FlatQuantizer(cents: Array[Array[Float]]) extends GraphQuantizer {
  def isEmpty: Boolean = cents.isEmpty
  def withCluster(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("cluster", nearestCentroid(col(vecCol), cents))
  def clusterTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cluster", "cv")
  }
  def numClusters(spark: SparkSession): Long = cents.length.toLong
}

final case class RoutedGraphQuantizer(rq: RoutedQuantizer) extends GraphQuantizer {
  def isEmpty: Boolean = rq.isEmpty
  def withCluster(df: DataFrame, vecCol: String): DataFrame = rq.assign(df, vecCol)
  def clusterTable(spark: SparkSession): DataFrame =
    rq.fine.select(col("cluster").cast("int").as("cluster"), col("cv"))
  def numClusters(spark: SparkSession): Long = rq.fine.count()
}
