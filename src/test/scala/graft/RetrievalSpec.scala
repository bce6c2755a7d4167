package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

case class RDoc(doc_id: Long, text: String)

/** Behavior properties for BM25 and RRF fusion (the DuckDB gate covers
  * exact scores on the real tables; these cover the ranking semantics on
  * constructed corpora where the right answer is obvious).
  */
class RetrievalSpec extends SparkSpec {

  private lazy val corpus = Seq(
    RDoc(1L, "spark shuffles data across the cluster"),
    RDoc(2L, "spark spark spark nothing else about spark"),
    RDoc(3L, "gardening tips for growing tomatoes and herbs"),
    RDoc(4L, "spark joins need a shuffle unless broadcast"),
    RDoc(5L, "a very long document about many different things entirely " +
      "unrelated words fill this text with spark mentioned once only here"))

  test("bm25: docs containing no query term never rank; rarer terms outweigh common ones") {
    val s = spark; import s.implicits._
    val res = Retrieval.bm25TopK(corpus.toDF(), "doc_id", "text",
      Seq("spark", "broadcast"), k = 5).collect()
    val ids = res.map(_.getAs[Long]("doc_id"))
    assert(!ids.contains(3L), "doc without any query term must not appear")
    // doc 4 holds the only "broadcast" (df=1, high idf) plus "spark" —
    // it must beat every doc that only repeats the ubiquitous "spark"
    assert(ids.head === 4L)
    // scores strictly descend with rank (ties broken by id upstream)
    val scores = res.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25: tf saturates — 4x term repetitions do not give 4x score") {
    val s = spark; import s.implicits._
    val df = Seq(
      RDoc(1L, "spark one two three four five"),
      RDoc(2L, "spark spark spark spark two three four five")).toDF()
    val res = Retrieval.bm25TopK(df, "doc_id", "text", Seq("spark"), k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(res(2L) > res(1L), "more occurrences still score higher")
    assert(res(2L) < res(1L) * 2.5, s"k1 saturation must cap the gain, got $res")
  }

  test("bm25 batch: per-query ranking equals the single-query operator; self-exclusion works") {
    val s = spark; import s.implicits._
    // query 1 = the literal terms of bm25TopK's test; query 2 = different terms
    val qterms = Seq((1L, "spark"), (1L, "broadcast"), (2L, "gardening"), (2L, "shuffle"))
      .toDF("q_id", "term")
    val batch = Retrieval.bm25TopKBatch(corpus.toDF(), "doc_id", "text", qterms, k = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("s6")))
    for (q <- Seq(1L, 2L)) {
      val single = Retrieval.bm25TopK(corpus.toDF(), "doc_id", "text",
          qterms.where(col("q_id") === q).select("term").collect().map(_.getString(0)).toSeq,
          k = 5)
        .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
      val got = batch.filter(_._1 == q).sortBy(_._2).map(t => (t._2, t._3))
      assert(got.toSeq === single.toSeq, s"batch ranking for query $q diverges")
    }
    // leave-self-out: doc 2's own tokens as its query must not return doc 2
    val selfTerms = Seq((2L, "spark"), (2L, "nothing"), (2L, "else"), (2L, "about"))
      .toDF("q_id", "term")
    val loo = Retrieval.bm25TopKBatch(corpus.toDF(), "doc_id", "text", selfTerms,
      k = 5, excludeQueryDoc = true).collect()
    assert(!loo.exists(r => r.getAs[Long]("doc_id") == 2L),
      "excludeQueryDoc must drop the query doc itself")
    assert(loo.nonEmpty, "other spark docs still rank")
  }

  test("weighted sample: an overwhelming weight always wins; equal weights reduce to hash order") {
    val s = spark; import s.implicits._
    // Efraimidis–Spirakis key = -ln(u)/w: w -> infinity drives the key
    // to ~0, so a doc with astronomically larger weight must be picked
    // first at any u. (The gate checks exact keys on the real corpus;
    // this checks the SEMANTICS of the race on constructed weights.)
    import graft.functions._
    def keyOf(weightCol: org.apache.spark.sql.Column) =
      -log((tokenHash60(concat(lit("wsample:"), col("id").cast("string")))
        .cast("double") + 1.0) / lit(1.152921504606846976e18)) / weightCol
    val docs = Seq.tabulate(100)(i => (i.toLong, if (i == 37) 1e12 else 1.0))
      .toDF("id", "w")
    val first = docs.select(col("id"), keyOf(col("w")).as("k"))
      .orderBy("k", "id").limit(1).collect().head.getLong(0)
    assert(first === 37L, "the heavy doc must win the exponential race")
    // equal weights: the ranking is exactly the ranking of -ln(u), i.e.
    // pure hash order — weights cancel
    val eq = docs.select(col("id"), keyOf(lit(1.0)).as("k")).orderBy("k", "id")
      .limit(10).collect().map(_.getLong(0)).toSeq
    val byHash = docs.select(col("id"),
        (-log((tokenHash60(concat(lit("wsample:"), col("id").cast("string")))
          .cast("double") + 1.0) / lit(1.152921504606846976e18))).as("k"))
      .orderBy("k", "id").limit(10).collect().map(_.getLong(0)).toSeq
    assert(eq === byHash)
  }

  test("rrf: a doc ranked well in both legs beats single-leg winners; missing legs contribute 0") {
    val s = spark; import s.implicits._
    val legA = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val legB = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val res = Retrieval.rrfFuse(legA, legB, k = 10).collect()
    assert(res.head.getAs[Long]("doc_id") === 20L) // present and high in both
    val byId = res.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    // single-leg docs: exactly 1/(60+rank) (0 from the missing leg)
    assert(math.abs(byId(10L) - 1.0 / 61) < 1e-6)
    assert(math.abs(byId(40L) - 1.0 / 62) < 1e-6)
    // rank_vec/rank_text surface the per-leg provenance
    val r40 = res.find(_.getAs[Long]("doc_id") == 40L).get
    assert(r40.isNullAt(r40.fieldIndex("rank_vec")) && r40.getAs[Int]("rank_text") == 2)
  }

  test("index-served BM25 equals the from-scratch operator, single and batch") {
    val s = spark; import s.implicits._
    val docs = corpus.toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-postings").toString
    Retrieval.buildPostings(docs, "doc_id", "text").write.parquet(s"$dir/p")
    Retrieval.buildDocLengths(docs, "doc_id", "text").write.parquet(s"$dir/l")
    val p = spark.read.parquet(s"$dir/p"); val l = spark.read.parquet(s"$dir/l")

    val scratch = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "broadcast"), k = 5).collect().map(_.toSeq).toSeq
    val served = Retrieval.bm25TopKFromIndex(p, l,
      Seq("spark", "broadcast"), k = 5).collect().map(_.toSeq).toSeq
    assert(served === scratch)

    val qterms = Seq((1L, "spark"), (1L, "shuffle"), (2L, "broadcast")).toDF("q_id", "term")
    val sb = Retrieval.bm25TopKBatch(docs, "doc_id", "text", qterms, k = 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val vb = Retrieval.bm25TopKBatchFromIndex(p, l, qterms, k = 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(vb === sb)
  }

  test("phrase search: only consecutive in-order occurrences match; tf counts repeats") {
    val s = spark; import s.implicits._
    val docs = Seq(
      RDoc(1L, "spark joins need a shuffle unless broadcast"),   // "a shuffle" once
      RDoc(2L, "shuffle a shuffle a shuffle"),                    // "a shuffle" twice
      RDoc(3L, "a big shuffle and shuffle a"),                    // reversed/gapped: no match
      RDoc(4L, "nothing relevant here at all"))
      .toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase").toString
    Retrieval.buildPostings(docs, "doc_id", "text").write.parquet(s"$dir/p")
    val p = spark.read.parquet(s"$dir/p")

    val hits = Retrieval.phraseSearchFromIndex(p, Seq("a", "shuffle"), k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("phrase_tf"))).toSeq
    assert(hits === Seq((2L, 2), (1L, 1)),
      "adjacency and order must both be required; tf must count repeats")

    // a 3-term phrase threads through the fold
    val tri = Retrieval.phraseSearchFromIndex(p, Seq("need", "a", "shuffle"), k = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(tri === Seq(1L))
    // duplicate-term phrase: positions of the SAME term intersect shifted
    val dup = Retrieval.phraseSearchFromIndex(p, Seq("shuffle", "a", "shuffle"), k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("phrase_tf"))).toSeq
    assert(dup === Seq((2L, 2)))
  }

  test("near search: ordered within-window pairs only; boundary exact; pair count multiplies") {
    val s = spark; import s.implicits._
    val docs = Seq(
      RDoc(1L, "alpha x beta"),                   // gap 2 ≤ 3: match
      RDoc(2L, "alpha x y z beta"),               // gap 4 > 3: no match
      RDoc(3L, "beta x alpha"),                   // reversed: no match
      RDoc(4L, "alpha beta alpha beta"),          // pairs: (1,2),(1,4),(3,4) = 3
      RDoc(5L, "alpha x y beta"))                 // gap 3 = window: match
      .toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-near").toString
    Retrieval.buildPostings(docs, "doc_id", "text").write.parquet(s"$dir/p")
    val p = spark.read.parquet(s"$dir/p")
    val hits = Retrieval.nearSearchFromIndex(p, "alpha", "beta", window = 3, k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_pairs"))).toSeq
    assert(hits === Seq((4L, 3), (1L, 1), (5L, 1)))
  }

  test("filtered BM25 from the shared index equals an index built on the filtered corpus") {
    val s = spark; import s.implicits._
    // metadata: odd doc_ids are 'en', even are 'de'
    val docs = corpus.toDF()
      .withColumn("lang", when(col("doc_id") % 2 === 1, "en").otherwise("de"))
    val dir = java.nio.file.Files.createTempDirectory("graft-filtered-bm25").toString
    Retrieval.buildPostings(docs, "doc_id", "text").write.parquet(s"$dir/p")
    Retrieval.buildDocLengthsWithMeta(docs, "doc_id", "text", "lang")
      .write.parquet(s"$dir/l")
    val p = spark.read.parquet(s"$dir/p"); val l = spark.read.parquet(s"$dir/l")

    val filtered = Retrieval.bm25TopKFromIndexFiltered(p, l,
      col("lang") === "en", Seq("spark", "broadcast"), k = 5)
      .collect().map(_.toSeq).toSeq
    // ground truth: the from-scratch operator over the pre-filtered
    // corpus — stats, df and candidates all see only the sub-corpus
    val subCorpus = Retrieval.bm25TopK(docs.where(col("lang") === "en"),
      "doc_id", "text", Seq("spark", "broadcast"), k = 5)
      .collect().map(_.toSeq).toSeq
    assert(filtered === subCorpus)
    // no excluded doc leaks into the filtered ranking
    assert(filtered.forall(r => r(1).asInstanceOf[Long] % 2 == 1))
  }

  test("filtered BM25: NotEqual + numeric range equal an index built on the filtered corpus") {
    val s = spark; import s.implicits._
    val docs = corpus.toDF()
      .withColumn("lang", when(col("doc_id") % 2 === 1, "en").otherwise("de"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-filtered-bm25-ne").toString
    Retrieval.buildPostings(docs, "doc_id", "text").write.parquet(s"$dir/p")
    Retrieval.buildDocLengthsWithMeta(docs, "doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/l")
    val p = spark.read.parquet(s"$dir/p"); val l = spark.read.parquet(s"$dir/l")

    val pred = col("lang") =!= "de" && col("n_chars").between(10, 200)
    val filtered = Retrieval.bm25TopKFromIndexFiltered(p, l,
      pred, Seq("spark", "broadcast"), k = 5)
      .collect().map(_.toSeq).toSeq
    val subCorpus = Retrieval.bm25TopK(docs.where(pred),
      "doc_id", "text", Seq("spark", "broadcast"), k = 5)
      .collect().map(_.toSeq).toSeq
    assert(filtered === subCorpus,
      "NotEqual + range filter must equal the index built on the filtered corpus")
    assert(filtered.nonEmpty)
  }

  test("filtered BATCH BM25 equals the looped filtered single-query operator per query") {
    val s = spark; import s.implicits._
    val docs = corpus.toDF()
      .withColumn("lang", when(col("doc_id") % 2 === 1, "en").otherwise("de"))
    val dir = java.nio.file.Files.createTempDirectory("graft-filtered-bm25-batch").toString
    Retrieval.buildPostings(docs, "doc_id", "text").write.parquet(s"$dir/p")
    Retrieval.buildDocLengthsWithMeta(docs, "doc_id", "text", "lang")
      .write.parquet(s"$dir/l")
    val p = spark.read.parquet(s"$dir/p"); val l = spark.read.parquet(s"$dir/l")

    val querySets = Map(1L -> Seq("spark", "broadcast"), 2L -> Seq("shuffle", "join"))
    val qt = querySets.toSeq.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("q_id", "term")
    val batch = Retrieval.bm25TopKBatchFromIndexFiltered(p, l,
        col("lang") === "en", qt, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val looped = querySets.toSeq.flatMap { case (q, ts) =>
      Retrieval.bm25TopKFromIndexFiltered(p, l, col("lang") === "en", ts, k = 5)
        .collect().map(r => (q, r.getInt(0), r.getLong(1),
          // the single path reports score = s6/1e6 rounded 4dp; recover
          // nothing — compare on (q, rank, doc) and check s6 sign below
          0L))
    }.toSet
    assert(batch.map { case (q, rk, d, _) => (q, rk, d) } ===
      looped.map { case (q, rk, d, _) => (q, rk, d) },
      "filtered batch ranking must equal the looped filtered single-query ranking")
    // every returned doc satisfies the filter
    assert(batch.forall { case (_, _, d, _) => d % 2 == 1 })
  }

  test("appendPostings maintains the index: post-ingest serving equals a full rebuild") {
    val s = spark; import s.implicits._
    val standing = corpus.take(3).toDF()
    val incoming = corpus.drop(3).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-postings-append").toString
    Retrieval.buildPostings(standing, "doc_id", "text").write.parquet(s"$dir/p")
    Retrieval.buildDocLengths(standing, "doc_id", "text").write.parquet(s"$dir/l")
    Retrieval.appendPostings(incoming, "doc_id", "text", s"$dir/p", s"$dir/l")

    val maintained = Retrieval.bm25TopKFromIndex(
      spark.read.parquet(s"$dir/p"), spark.read.parquet(s"$dir/l"),
      Seq("spark", "broadcast"), k = 5).collect().map(_.toSeq).toSeq
    val rebuilt = Retrieval.bm25TopK(corpus.toDF(), "doc_id", "text",
      Seq("spark", "broadcast"), k = 5).collect().map(_.toSeq).toSeq
    assert(maintained === rebuilt)
  }
}
