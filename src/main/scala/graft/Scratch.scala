package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    SparkEntry.queries("dedup_ngram_jaccard")(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    time("ngram_jaccard warm")(SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count())
    spark.stop()
  }
}
