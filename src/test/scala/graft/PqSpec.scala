package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Knn, PqIndex}

/** Product-quantization properties: code/ADC mechanics the DuckDB gate
  * already hash-checks on the real table, plus the recall property on
  * clustered data (where PQ is actually meant to work) that SQL can't
  * express.
  */
class PqSpec extends SparkSpec {

  private val dim = 16

  private lazy val clustered: Seq[Emb] = {
    val rnd = new Random(11)
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 10.0))
    (0 until 1500).map { i =>
      val c = centers(i % 8)
      Emb(i.toLong, c.map(x => (x + rnd.nextGaussian()).toFloat))
    }
  }

  test("codes are m ids in [0, ksub) — 8 bytes of index per vector at m=8") {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val books = PqIndex.fit(df, "embedding", dim = dim, m = 4, ksub = 8, seed = 3L)
    assert(books.length === 4 && books.forall(_.length === 8) && books.forall(_.forall(_.length === dim / 4)))
    val codes = df.select(PqIndex.encode(col("embedding"), books).as("c"))
      .selectExpr("c[0] c0", "c[1] c1", "c[2] c2", "c[3] c3").collect()
    assert(codes.forall(r => (0 until 4).forall(i => r.getInt(i) >= 0 && r.getInt(i) < 8)))
  }

  test("ADC ranking with full re-rank budget recovers the exact top-k head") {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val books = PqIndex.fit(df, "embedding", dim = dim, m = 4, ksub = 16, seed = 3L)
    val q = clustered(77).embedding
    // rerank = n: stage 2 re-ranks everything exactly => identical to brute force
    val full = PqIndex.search(df, "vec_id", "embedding", books, q, k = 10, rerank = clustered.size)
      .collect().map(_.getAs[Long]("id")).toSeq
    val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2")
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(full === exact)
  }

  // rerank must exceed the expected cluster population (1500/8 ≈ 188
  // here): ADC sub-distances are noisy WITHIN a cluster (quantization
  // error ~ the intra-cluster noise), so the candidate list has to cover
  // the query's whole cluster for the exact re-rank to sort it out.
  test("persisted codes table is narrow (tinyint codes, no vectors) and serves the same answer") {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val books = PqIndex.fit(df, "embedding", dim = dim, m = 4, ksub = 16, seed = 3L)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-codes").toString
    PqIndex.writeCodes(df, "vec_id", "embedding", books, dir)
    val codes = s.read.parquet(dir)
    assert(codes.schema.fieldNames.toSet === Set("id", "codes"), "codes table must not carry vectors")
    assert(codes.schema("codes").dataType.simpleString === "array<tinyint>",
      "1 byte per sub-quantizer on disk")
    val q = clustered(9).embedding
    val persisted = PqIndex.searchPersisted(s, dir, df, "vec_id", "embedding", books, q,
      k = 10, rerank = 250).collect().map(_.toSeq).toSeq
    val mem = PqIndex.search(df, "vec_id", "embedding", books, q,
      k = 10, rerank = 250).collect().map(_.toSeq).toSeq
    assert(persisted === mem)
  }

  test("IVFPQ with nprobe=K and rerank=n degenerates to exact brute force") {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val cents = graft.operators.IvfIndex.fit(df, "embedding", k = 8, seed = 5L)
    val books = PqIndex.fit(df, "embedding", dim = dim, m = 4, ksub = 16, seed = 3L)
    val q = clustered(42).embedding
    val got = PqIndex.searchIvf(df, "vec_id", "embedding", cents, books, q,
      k = 10, nprobe = cents.length, rerank = clustered.size)
      .collect().map(_.getAs[Long]("id")).toSeq
    val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2")
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(got === exact)
  }

  test("SQ8: near-exact ranking at 8 bits/dim; constant dimensions reconstruct safely") {
    val s = spark; import s.implicits._
    import graft.operators.SqIndex
    val df = clustered.toDF()
    val (mins, maxs) = SqIndex.fitBounds(df, "embedding")
    assert(mins.length === dim && maxs.length === dim)
    val recalls = Seq(3, 303).map { qi =>
      val q = clustered(qi).embedding
      val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2")
        .collect().map(_.getAs[Long]("id")).toSet
      val sq = SqIndex.search(df, "vec_id", "embedding", mins, maxs, q, 10)
        .collect().map(_.getAs[Long]("id")).toSet
      exact.intersect(sq).size.toDouble / exact.size
    }
    assert(recalls.sum / recalls.size >= 0.8, s"recalls $recalls")
    // a constant dimension (mx == mn) must not divide by zero
    val const = (0 until 50).map(i => Emb(i.toLong, Array(1f, i.toFloat))).toDF()
    val (m2, x2) = SqIndex.fitBounds(const, "embedding")
    val top = SqIndex.search(const, "vec_id", "embedding", m2, x2, Array(1f, 25f), 3)
      .collect().map(_.getAs[Long]("id"))
    assert(top.head === 25L)
  }

  test("recall@10 >= 0.9 on clustered data with a cluster-sized re-rank") {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val books = PqIndex.fit(df, "embedding", dim = dim, m = 4, ksub = 16, seed = 3L)
    val recalls = Seq(5, 205, 1005).map { qi =>
      val q = clustered(qi).embedding
      val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2")
        .collect().map(_.getAs[Long]("id")).toSet
      val approx = PqIndex.search(df, "vec_id", "embedding", books, q, k = 10, rerank = 250)
        .collect().map(_.getAs[Long]("id")).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean (per-query: $recalls)")
  }
}
