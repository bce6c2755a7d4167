package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.sources.{Bucketed, Tables}

/** Co-located fact⋈fact joins: bucketed tables with matching bucket
  * counts join with NO exchange — the claim from SURVEY §3/§6, proven
  * against the physical plan and the unbucketed answer.
  */
class BucketedSpec extends SparkSpec {

  test("orders ⋈ lineitem on bucketed tables plans zero exchanges, same answer") {
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val orders = Tables.orders(spark, sf001).select("o_orderkey", "o_orderdate")
    val lineitem = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    Bucketed.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"), "k", 8, "orders_b")
    Bucketed.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "k", 8, "lineitem_b")

    // force the fact⋈fact (sort-merge) plan this layout exists for —
    // at real scale neither side broadcasts
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "orders_b").join(Bucketed.read(spark, "lineitem_b"), "k")
        .groupBy("k").agg(sum("l_quantity").as("qty"))
      val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join + agg on the bucket key must plan no shuffle:\n$p")
      assert(p.contains("SortMergeJoin"))

      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey").as("k")).agg(sum("l_quantity").as("qty"))
      assert(joined.orderBy("k").collect().map(_.toSeq).toSeq
        === plain.orderBy("k").collect().map(_.toSeq).toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
