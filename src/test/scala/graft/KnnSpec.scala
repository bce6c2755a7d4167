package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Upsert}
import graft.sources.Tables

class KnnSpec extends SparkSpec {

  test("batch k-NN agrees with per-query exact search on the real table") {
    val emb = Tables.embeddings(spark, sf001).cache()
    val queries = emb.where(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val batch = Knn.searchBatch(emb, "vec_id", "embedding", queries, "q_id", "q_vec",
        k = 5, metric = "l2")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq).toMap

    queries.collect().foreach { q =>
      val qv = q.getSeq[Float](1).toArray
      val single = Knn.searchExact(emb, "vec_id", "embedding", qv, 5, "l2")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(batch(q.getLong(0)) === single, s"query ${q.getLong(0)}")
    }
    emb.unpersist()
  }

  test("metrics order correctly: l2 ascending, ip/cosine by similarity descending") {
    val emb = Tables.embeddings(spark, sf001)
    val qv = emb.where(col("vec_id") === 5L).select("embedding").first().getSeq[Float](0).toArray
    val l2 = Knn.searchExact(emb, "vec_id", "embedding", qv, 10, "l2").collect().map(_.getDouble(2))
    assert(l2.toSeq === l2.sorted.toSeq)
    val ip = Knn.searchExact(emb, "vec_id", "embedding", qv, 10, "ip").collect().map(_.getDouble(2))
    assert(ip.toSeq === ip.sortBy(-_).toSeq)
    val cos = Knn.searchExact(emb, "vec_id", "embedding", qv, 10, "cosine").collect().map(_.getDouble(2))
    assert(cos.toSeq === cos.sortBy(-_).toSeq)
    assert(cos.head === 1.0) // self-similarity
  }

  test("upsert merge: updated keys replaced, new keys appended, others untouched") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val merged = Upsert.merge(base, updates, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged === Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "Z"))
  }

  test("upsert merge: duplicate-keyed updates collapse to one winner (latest-wins)") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "a", 0L)).toDF("k", "v", "ver")
    // two updates for the same key: versioned merge keeps the max version
    val updates = Seq((1L, "old", 5L), (1L, "new", 9L), (2L, "x", 1L)).toDF("k", "v", "ver")
    val versioned = Upsert.merge(base, updates, "k", versionCol = Some("ver")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(versioned === Map(1L -> ("new", 9L), 2L -> ("x", 1L)))
    // unversioned merge still never fans out the key (deterministic winner)
    val flat = Upsert.merge(base, updates, "k")
    assert(flat.groupBy("k").count().where(col("count") > 1).count() === 0L)
    assert(flat.count() === 2L)
  }

  test("delete drops matching keys and nothing else") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val ids = Seq(2L, 99L).toDF("k") // 99 not present: idempotent no-op
    val left = Upsert.delete(base, ids, "k").collect().map(_.getLong(0)).toSet
    assert(left === Set(1L, 3L))
  }

  test("applyCdc: highest version wins, D tombstones, I creates, base passes through") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val changes = Seq(
      (2L, 1L, "U", "b1"), (2L, 2L, "U", "b2"),   // two versions: v2 wins
      (3L, 1L, "U", "c1"), (3L, 2L, "D", "-"),    // update then delete: gone
      (4L, 2L, "D", "-"), (4L, 1L, "U", "d1"),    // delete is the later version
      (9L, 1L, "I", "z")                          // fresh insert
    ).toDF("k", "ver", "op", "v")
    val got = Upsert.applyCdc(base, changes, "k", "ver").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "b2", 9L -> "z"))
  }

  test("searchGrouped equals the window-ranked brute force per group") {
    val emb = Tables.embeddings(spark, sf001).cache()
    val qv = emb.where(col("vec_id") === 13L).select("embedding").first().getSeq[Float](0).toArray
    val got = Knn.searchGrouped(emb, "vec_id", "embedding", "label", qv, k = 2, metric = "l2")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy(col("score"), col("id"))
    val expected = emb.select(col("label"), col("vec_id").as("id"),
        graft.functions.vecL2(col("embedding"),
          org.apache.spark.sql.functions.typedLit(qv)).as("score"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 2)
      .select(col("label"), col("rank"), col("id"),
        graft.functions.roundTo(col("score"), 4).as("value"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
    emb.unpersist()
  }

  test("upsert merge rejects mismatched schemas") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val bad = Seq((1L, "a", 2.0)).toDF("k", "v", "w")
    intercept[IllegalArgumentException](Upsert.merge(base, bad, "k"))
  }

  test("text analysis handles empty and punctuation-only text") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, ""), (2L, "!!! ???"), (3L, "normal text here")).toDF("doc_id", "text")
    val q = graft.operators.TextAnalysis.quality(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(q(1L) === 0.0)
    assert(q(2L) === 0.0) // no tokens -> zero score
    assert(q(3L) > 0.0)
    val t = graft.operators.TextAnalysis.tokenCounts(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    assert(t === List((1L, 0, 0), (2L, 2, 6), (3L, 3, 3)))
  }

  test("knnJoinExact (salted all-pairs) equals the degenerate-single-cluster IVF join") {
    val emb = Tables.embeddings(spark, sf001)
    val a = Knn.knnJoinExact(emb, "vec_id", "embedding", k = 3, metric = "l2", salts = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Knn.knnJoinIvf(emb, "vec_id", "embedding", Array(Array.fill(64)(0f)),
        k = 3, metric = "l2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("knnClassify agrees with an independent window-ranked majority vote") {
    val got = Queries.knnClassify(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toList

    // independent path: rank by (l2, id) with a window, vote in Scala
    val emb = Tables.embeddings(spark, sf001).cache()
    val hold = col("vec_id") % 100 === 0
    val q = emb.where(hold)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("label").as("tl"))
    val ranked = emb.where(!hold).crossJoin(q)
      .select(col("q_id"), col("tl"), col("label"),
        graft.functions.vecL2(col("embedding"), col("q_vec")).as("d"), col("vec_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id").orderBy(col("d"), col("vec_id"))))
      .where(col("rk") <= 10)
      .collect().groupBy(_.getLong(0))
    val expected = ranked.map { case (qid, rows) =>
      val votes = rows.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
      val (lbl, n) = votes.toSeq.maxBy { case (l, n) => (n, -l) }
      (qid, rows.head.getInt(1), lbl, n.toLong)
    }.toList.sortBy(_._1)
    emb.unpersist()

    assert(got === expected)
    assert(got.forall { case (_, _, _, v) => v >= 1L && v <= 10L })
  }
}
