package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.sources.{Lake, Tables}

/** End-to-end partitioned-lake demo at sf0.1: write the date-partitioned
  * Z-ordered events layout and the IVF-clustered embeddings layout to
  * disk, then run ANALYTICS queries (not just the ANN facade) against
  * them and assert file-listing pruning — selectedPartitions, not row
  * filters — while every result stays identical to the flat-table
  * answer.
  */
class LakeSpec extends SparkSpec {

  private def sf01 = "/root/testdata/sf0.1"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getPath

  private def scansOf(df: DataFrame): Seq[FileSourceScanExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec    => Seq(f)
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec        => find(q.plan)
    }.flatten
    find(df.queryExecution.executedPlan)
  }

  // one lake per suite run, shared across the three query tests
  private lazy val eventsLake: String = {
    val path = tmp("graft-lake-events")
    // small files at test scale so dates hold >1 Z-run each
    Lake.writeEvents(Tables.events(spark, sf01), path, maxRecordsPerFile = 2000L)
    path
  }

  private lazy val embLake: (String, Array[Array[Float]]) = {
    val emb = Tables.embeddings(spark, sf01)
    val centroids = IvfIndex.fitCached(emb, "embedding", k = 16)
    val path = tmp("graft-lake-emb")
    Lake.writeEmbeddings(emb, "embedding", centroids, path)
    (path, centroids)
  }

  private def cmp(a: DataFrame, b: DataFrame): Unit =
    assert(a.collect().map(_.toSeq).toSeq === b.collect().map(_.toSeq).toSeq)

  test("events lake: 3-day windowed aggregation prunes to 3 date partitions") {
    val lake = Lake.readEvents(spark, eventsLake)
    val raw = Tables.events(spark, sf01)
    val d0 = raw.agg(min(to_date(col("ts")))).head.getDate(0).toLocalDate
    val from = java.sql.Date.valueOf(d0.plusDays(2))
    val to = java.sql.Date.valueOf(d0.plusDays(4)) // inclusive: 3 days

    // the lake leg filters on the PARTITION column (what a lake user
    // writes — only a partition-column predicate can prune the listing);
    // the raw leg derives the same date from ts
    def hourly(df: DataFrame, dateCol: org.apache.spark.sql.Column): DataFrame = df
      .where(dateCol.between(from, to))
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour_start", "event_type")

    cmp(hourly(lake, col("event_date")), hourly(raw, to_date(col("ts"))))

    val scan = scansOf(hourly(lake, col("event_date"))).head
    val total = scansOf(spark.read.parquet(eventsLake)).head
      .selectedPartitions.partitionCount
    assert(scan.partitionFilters.nonEmpty,
      "the date range must reach the FILE LISTING as a partition filter")
    assert(scan.selectedPartitions.partitionCount === 3,
      s"3-day range must touch exactly 3 of $total date partitions")
    assert(total > 3)
  }

  test("events lake: single-day top event types prunes to 1 partition; user filter pushes into the Z-sorted files") {
    val lake = Lake.readEvents(spark, eventsLake)
    val raw = Tables.events(spark, sf01)
    val d0 = raw.agg(min(to_date(col("ts")))).head.getDate(0).toLocalDate
    val day = java.sql.Date.valueOf(d0.plusDays(1))

    def topTypes(df: DataFrame, dateCol: org.apache.spark.sql.Column): DataFrame = df
      .where(dateCol === day && col("user_id") < 100L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("event_type"))

    cmp(topTypes(lake, col("event_date")), topTypes(raw, to_date(col("ts"))))

    val scan = scansOf(topTypes(lake, col("event_date"))).head
    assert(scan.selectedPartitions.partitionCount === 1,
      "a one-day predicate must list exactly one date directory")
    // the user_id predicate must ALSO push to the parquet reader, where
    // the Z-ordered files' row-group stats can act on it
    assert(scan.metadata.get("PushedFilters").exists(_.contains("user_id")),
      s"user_id filter must push down: ${scan.metadata.get("PushedFilters")}")
  }

  test("embeddings lake: per-cluster analytics agg AND ANN search both read only probed cluster dirs") {
    val (path, centroids) = embLake
    val emb = Tables.embeddings(spark, sf01)
    val q = emb.where(col("vec_id") === 4L).select("embedding")
      .first().getSeq[Float](0).toArray
    val probed = IvfIndex.probes(q, centroids, nprobe = 4)

    // analytics over the serving layout: per-cluster size + mean norm,
    // restricted to the probed clusters — the vector_centroids shape run
    // against the lake instead of a computed assignment column
    val perCluster = Lake.readEmbeddingClusters(spark, path, probed)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        round(avg(graft.functions.vecNorm(col("embedding"))), 4).as("mean_norm"))
      .orderBy("cluster")
    val rows = perCluster.collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted === probed.sorted)
    assert(rows.map(_.getLong(1)).sum > 0L)

    val aggScan = scansOf(perCluster).head
    assert(aggScan.partitionFilters.nonEmpty,
      "cluster IN (...) must prune the file listing, not filter rows")
    assert(aggScan.selectedPartitions.partitionCount === probed.length)
    val total = scansOf(spark.read.parquet(path)).head.selectedPartitions.partitionCount
    assert(probed.length < total)

    // and the ANN search over the same lake returns the live answer
    val live = IvfIndex.search(emb, "vec_id", "embedding", centroids, q,
      k = 10, nprobe = 4).collect().map(_.toSeq).toSeq
    val persisted = IvfIndex.searchPersisted(spark, path, "vec_id", "embedding",
      centroids, q, k = 10, nprobe = 4)
    assert(persisted.collect().map(_.toSeq).toSeq === live)
    assert(scansOf(persisted).exists(_.selectedPartitions.partitionCount === probed.length))
  }
}
