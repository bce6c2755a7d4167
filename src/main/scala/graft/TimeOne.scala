package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one `SparkEntry.queries` entry in isolation
  * (3 timed passes after a warm-up; the per-query half of [[Bench]]).
  * Usage: `sbt "runMain graft.TimeOne <query> <sfDir>"`.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val dir = args(1)
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count() // warm
    val times = (1 to 3).map { _ =>
      // same cold-cache regime as Bench: caches from the previous pass
      // must not flatter this one
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9
    }
    println(f"TIMED $name min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
