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
    val docs = sources.Tables.documents(spark, dir)
    time("dedup_minhash")(operators.Dedup.minhashPairs(docs, "doc_id", "text", 0.25).count())
    time("dedup_simhash")(operators.Dedup.simhashPairs(docs, "doc_id", "text", 8).count())
    time("dedup_ngram_jaccard")(operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 3, 0.65).count())
    spark.stop()
  }
}
