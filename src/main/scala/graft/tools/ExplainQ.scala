package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility: print the formatted physical plan of inventory queries.
  * Usage: runMain graft.tools.ExplainQ <sfDir> <query> [query ...]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .appName("graft-explain").master(s"local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args.tail) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(s"==== $q ====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
