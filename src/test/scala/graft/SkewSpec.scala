package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  // 90% of rows share one hot key
  private lazy val skewed = {
    val s = spark; import s.implicits._
    (0 until 10000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 100}" else "hot"
      (k, i.toLong, i * 0.5)
    }.toDF("k", "v", "w")
  }

  private lazy val dim = {
    val s = spark; import s.implicits._
    (Seq("hot") ++ (0 until 100).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"name_$i") }.toDF("k", "name")
  }

  test("saltedJoin returns exactly the plain inner join") {
    val plain = skewed.join(dim, "k").agg(count(lit(1)), sum("v"), min("name"), max("name"))
      .collect().head.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", numSalts = 8)
      .agg(count(lit(1)), sum("v"), min("name"), max("name")).collect().head.toSeq
    assert(salted === plain)
  }

  test("saltedAggregate returns exactly the plain groupBy for sum/count/min/max") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"), min("w").as("mn"), max("w").as("mx"))
      .orderBy("k").collect().map(_.toSeq)
    val salted = Skew.saltedAggregate(skewed, "k", numSalts = 8, Seq(
        "sv" -> (col("v"), "sum"),
        "n" -> (lit(1), "count"),
        "mn" -> (col("w"), "min"),
        "mx" -> (col("w"), "max")))
      .orderBy("k").collect().map(_.toSeq)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salt is deterministic and within range") {
    val s = spark; import s.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"x$i")).toDF("a", "b")
    val salts = df.select(Skew.salt(8, col("a"), col("b")).as("s")).collect().map(_.getInt(0))
    assert(salts.forall(x => x >= 0 && x < 8))
    val again = df.select(Skew.salt(8, col("a"), col("b")).as("s")).collect().map(_.getInt(0))
    assert(salts.toSeq === again.toSeq)
  }
}
