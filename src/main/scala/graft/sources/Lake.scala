package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.operators.IvfIndex

/** The partitioned-lake layout story as CODE: how this engine lays the
  * two big fact tables on disk so that every analytics/ANN query prunes
  * at FILE-LISTING time, before a single byte is read.
  *
  * - `events` → hive-partitioned by event DATE (the dominant predicate
  *   of every windowed/resample/retention query), files inside each
  *   date Z-ORDERED on (user_id, minute-of-day) — Morton interleaving
  *   keeps both user-range and time-range predicates clustered, so
  *   parquet row-group min/max stats prune on EITHER dimension (the
  *   layout_zorder operator's key, applied to the physical layout).
  * - `embeddings` → IVF-cluster-partitioned via
  *   [[graft.operators.IvfIndex.writePartitioned]] (the ANN serving
  *   layout: nprobe of K cluster directories per search).
  *
  * At 100 TB the same two writers emit the same directory shapes; only
  * the partition count grows. Nothing here is test-only scaffolding —
  * this is the write path a production deployment runs nightly.
  */
object Lake {

  /** Z-order key inside a date partition: user × minute-of-day Morton
    * interleave, 16 bits per dimension (the layout_zorder key).
    */
  private def zKey =
    interleaveBits(
      pmod(col("user_id"), lit(65536L)),
      pmod((hour(col("ts")) * 60 + minute(col("ts"))).cast("long"), lit(65536L)),
      16)

  /** Write events as a date-partitioned, Z-ordered lake.
    *
    * One output task per date keeps file counts = O(days × files-per-
    * day); `maxRecordsPerFile` splits each date into several Z-runs so
    * row-group stats stay tight (a single giant file would widen every
    * min/max envelope).
    */
  def writeEvents(events: DataFrame, path: String,
                  maxRecordsPerFile: Long = 1000000L): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .sortWithinPartitions(col("event_date"), zKey, col("event_id"))
      .write
      .partitionBy("event_date")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Read the events lake back with the Tables.events column set (the
    * `event_date` partition column rides along for free file-listing
    * pruning on any date predicate).
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write embeddings in the IVF serving layout: one directory per
    * coarse cluster (the searchPersisted / readPruned surface).
    */
  def writeEmbeddings(emb: DataFrame, vecCol: String,
                      centroids: Array[Array[Float]], path: String): Unit =
    IvfIndex.writePartitioned(emb, vecCol, centroids, path)

  /** Read only the given cluster partitions of an embeddings lake —
    * file-listing pruning, not row filtering.
    */
  def readEmbeddingClusters(spark: SparkSession, path: String,
                            clusters: Seq[Int]): DataFrame =
    IvfIndex.readPruned(spark, path, clusters, "vec_id")
}
