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

  // ---- generational in-place update (TextIndex.upsert) ----------------

  private def allQueries = Seq(
    Seq("spark"), Seq("spark", "broadcast"), Seq("gardening", "tomatoes"),
    Seq("replaced", "entirely"), Seq("shuffle"))

  private def assertServesLike(idx: graft.api.TextIndex,
                               truth: Seq[RDoc], clue: String): Unit = {
    val s = spark; import s.implicits._
    for (q <- allQueries) {
      val got = idx.search(q, 5).collect().map(_.toSeq).toSeq
      val want = Retrieval.bm25TopK(truth.toDF(), "doc_id", "text", q, k = 5)
        .collect().map(_.toSeq).toSeq
      assert(got === want, s"$clue: query $q diverged from the merged-corpus rebuild")
    }
  }

  test("TextIndex.upsert replaces a document in place: update ≡ rebuild on the merged corpus, BM25 exact") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-text-upsert").toString
    var idx = graft.api.TextIndex.build(corpus.toDF(), "doc_id", "text", dir)

    // replace doc 2 (the spark-spammer) with an unrelated text: its old
    // tf/df mass must vanish from every stat, the new terms must serve
    val v2 = RDoc(2L, "replaced entirely different content now")
    idx = idx.upsert(Seq(v2).toDF(), "doc_id", "text")
    assertServesLike(idx, corpus.filterNot(_.doc_id == 2L) :+ v2, "single upsert")

    // batch upsert mixing a changed doc, a re-changed doc and a NEW doc
    val v2b = RDoc(2L, "spark returns to this document")
    val v4 = RDoc(4L, "gardening replaced the shuffle talk")
    val v9 = RDoc(9L, "a brand new document about spark broadcast")
    idx = idx.upsert(Seq(v2b, v4, v9).toDF(), "doc_id", "text")
    val truth2 = corpus.filterNot(r => r.doc_id == 2L || r.doc_id == 4L) ++ Seq(v2b, v4, v9)
    assertServesLike(idx, truth2, "batch upsert")

    // phrase + near search see the LATEST positions only
    val ph = idx.searchPhrase(Seq("spark", "broadcast"), 3).collect().map(_.getLong(1))
    assert(ph.toSeq === Seq(9L), "phrase must match only the latest generation's positions")

    // a reload serves identically (the artifact itself was maintained)
    assertServesLike(graft.api.TextIndex.load(spark, dir), truth2, "reload")

    // stats surface the generation state
    val st = idx.stats.collect().head
    assert(st.getAs[Long]("generation") >= 2L)
    assert(st.getAs[String]("inflight") == null)
    assert(st.getAs[Long]("n_docs") === truth2.length.toLong)

    // the append guard is PRESERVED for live ids (upsert is the verb)
    val e = intercept[IllegalArgumentException] {
      idx.append(Seq(v4).toDF(), "doc_id", "text")
    }
    assert(e.getMessage.contains("new-docs-only"), e.getMessage)

    // update ≡ rebuild includes an upsert that empties a doc (dl -> 0):
    // it stays in N but serves no terms
    val v5 = RDoc(5L, "")
    idx = idx.upsert(Seq(v5).toDF(), "doc_id", "text")
    assertServesLike(idx, truth2.filterNot(_.doc_id == 5L) :+ v5, "emptying upsert")
  }

  test("TextIndex.upsert crash windows: reload serves latest-or-pre-batch, never neither, never mixed") {
    val s = spark; import s.implicits._
    import graft.operators.{GraphMaintenance, Retrieval => R, Tombstones}
    // window A: marker written, nothing landed — the upsert never
    // happened; reload clears the marker and serves pre-batch
    val dirA = java.nio.file.Files.createTempDirectory("graft-text-crashA").toString
    graft.api.TextIndex.build(corpus.toDF(), "doc_id", "text", dirA)
    val gA = Tombstones.nextGen(spark, dirA)
    GraphMaintenance.writeMarker(spark, dirA, "upsert", gA)
    val reA = graft.api.TextIndex.load(spark, dirA)
    assert(GraphMaintenance.inflight(spark, dirA).isEmpty, "load must settle the marker")
    assertServesLike(reA, corpus, "window A")

    // window B: doclen landed, postings lost — recovery rolls the
    // half-landed slice BACK (a mixed old-postings/new-doclen state
    // must never serve); pre-batch state holds
    val dirB = java.nio.file.Files.createTempDirectory("graft-text-crashB").toString
    graft.api.TextIndex.build(corpus.toDF(), "doc_id", "text", dirB)
    val gB = Tombstones.nextGen(spark, dirB)
    GraphMaintenance.writeMarker(spark, dirB, "upsert", gB)
    R.buildDocLengths(Seq(RDoc(2L, "replaced entirely different content now")).toDF(),
        "doc_id", "text")
      .withColumn("gen", lit(gB)).write.mode("append").parquet(s"$dirB/doclen")
    val reB = graft.api.TextIndex.load(spark, dirB)
    assert(GraphMaintenance.inflight(spark, dirB).isEmpty)
    assert(reB.docLengths.where(col("doc_id") === 2L).count() === 1L,
      "window B: exactly one doclen row must survive the rollback")
    assertServesLike(reB, corpus, "window B")

    // window C: both tables landed, tombstone publish lost — recovery
    // rolls FORWARD; the latest version serves exactly once
    val dirC = java.nio.file.Files.createTempDirectory("graft-text-crashC").toString
    graft.api.TextIndex.build(corpus.toDF(), "doc_id", "text", dirC)
    val v2 = RDoc(2L, "replaced entirely different content now")
    val gC = Tombstones.nextGen(spark, dirC)
    GraphMaintenance.writeMarker(spark, dirC, "upsert", gC)
    R.buildDocLengths(Seq(v2).toDF(), "doc_id", "text")
      .withColumn("gen", lit(gC)).write.mode("append").parquet(s"$dirC/doclen")
    R.buildPostings(Seq(v2).toDF(), "doc_id", "text")
      .withColumn("gen", lit(gC)).write.mode("append").parquet(s"$dirC/postings")
    val reC = graft.api.TextIndex.load(spark, dirC)
    assert(GraphMaintenance.inflight(spark, dirC).isEmpty)
    assert(reC.docLengths.where(col("doc_id") === 2L).count() === 1L)
    assertServesLike(reC, corpus.filterNot(_.doc_id == 2L) :+ v2, "window C")

    // window D: everything landed, only the marker clear was lost —
    // recovery is a no-op re-publish (idempotent), state unchanged
    val dirD = java.nio.file.Files.createTempDirectory("graft-text-crashD").toString
    var idxD = graft.api.TextIndex.build(corpus.toDF(), "doc_id", "text", dirD)
    idxD = idxD.upsert(Seq(v2).toDF(), "doc_id", "text")
    GraphMaintenance.writeMarker(spark, dirD, "upsert", Tombstones.currentGen(spark, dirD))
    val reD = graft.api.TextIndex.load(spark, dirD)
    assert(GraphMaintenance.inflight(spark, dirD).isEmpty)
    assert(reD.docLengths.where(col("doc_id") === 2L).count() === 1L)
    assertServesLike(reD, corpus.filterNot(_.doc_id == 2L) :+ v2, "window D")
  }

  test("TextIndex atomic publish: a reader at ANY kill point of an ingest sees pre-batch or post-batch answers, never mixed or duplicated") {
    val s = spark; import s.implicits._
    import graft.operators.{GraphMaintenance, Retrieval => R, Tombstones}
    val dir = java.nio.file.Files.createTempDirectory("graft-text-pub").toString
    graft.api.TextIndex.build(corpus.toDF(), "doc_id", "text", dir)
    val v2 = RDoc(2L, "replaced entirely different content now")
    // one long-lived reader handle: the gated reads re-resolve _pubgen
    // per query, so this models a concurrent reader racing the writer
    val reader = graft.api.TextIndex.load(spark, dir)

    def assertPreBatch(tag: String): Unit = {
      assertServesLike(reader, corpus, tag)
      // the duplicate-doclen detector: N/avgdl must never see a doc twice
      assert(reader.docLengths.groupBy("doc_id").count()
        .where(col("count") > 1).isEmpty, s"$tag: duplicate doclen rows visible")
    }

    // the writer's physical steps, in ingest order, a kill after each:
    val g = Tombstones.nextGen(spark, dir)
    GraphMaintenance.writeMarker(spark, dir, "upsert", g)
    assertPreBatch("marker written")
    R.buildDocLengths(Seq(v2).toDF(), "doc_id", "text")
      .withColumn("gen", lit(g)).write.mode("append").parquet(s"$dir/doclen")
    assertPreBatch("doclen landed (unpublished)") // pre-gate: duplicate doclen served here
    R.buildPostings(Seq(v2).toDF(), "doc_id", "text")
      .withColumn("gen", lit(g)).write.mode("append").parquet(s"$dir/postings")
    assertPreBatch("postings landed (unpublished)")
    Tombstones.appendUpto(spark, dir, Seq(2L).toDF("doc_id"), g - 1)
    assertPreBatch("tombstone appended (inert until published)")
    // THE publish: one rename flips the reader to exactly post-batch
    graft.api.TextIndex.writePublishedGen(spark, dir, g)
    assertServesLike(reader, corpus.filterNot(_.doc_id == 2L) :+ v2, "published")
    assert(reader.docLengths.where(col("doc_id") === 2L).count() === 1L)
    GraphMaintenance.clearMarker(spark, dir)
  }

  test("TextIndex atomic publish: a SECOND in-flight mutation of the same doc never masks its standing published tombstone") {
    val s = spark; import s.implicits._
    import graft.operators.{GraphMaintenance, Retrieval => R, Tombstones}
    val dir = java.nio.file.Files.createTempDirectory("graft-text-pub2").toString
    var idx = graft.api.TextIndex.build(corpus.toDF(), "doc_id", "text", dir)
    // first mutation lands COMPLETELY (published): doc 2 -> v2, its
    // gen-0 rows superseded by a PUBLISHED tombstone at upto = g1-1
    val v2 = RDoc(2L, "replaced entirely different content now")
    idx = idx.upsert(Seq(v2).toDF(), "doc_id", "text")
    val postV2 = corpus.filterNot(_.doc_id == 2L) :+ v2
    assertServesLike(idx, postV2, "after first upsert")
    // second mutation of the SAME doc is killed mid-window: data at g2
    // and its tombstone at upto = g2-1 both landed, publish lost. The
    // sidecar now folds doc 2 to max(g1-1, g2-1) = g2-1, which the
    // publish gate rejects — gating AFTER the fold would drop the
    // PUBLISHED g1-1 tombstone with it and resurrect the gen-0 rows
    // (duplicate doclen). The gate must apply to the raw rows.
    val v3 = RDoc(2L, "a third body for the same doc in flight")
    val g2 = Tombstones.nextGen(spark, dir)
    GraphMaintenance.writeMarker(spark, dir, "upsert", g2)
    R.buildDocLengths(Seq(v3).toDF(), "doc_id", "text")
      .withColumn("gen", lit(g2)).write.mode("append").parquet(s"$dir/doclen")
    R.buildPostings(Seq(v3).toDF(), "doc_id", "text")
      .withColumn("gen", lit(g2)).write.mode("append").parquet(s"$dir/postings")
    Tombstones.appendUpto(spark, dir, Seq(2L).toDF("doc_id"), g2 - 1)
    val reader = graft.api.TextIndex.load(spark, dir) // load recovers (rolls forward)...
    assert(GraphMaintenance.inflight(spark, dir).isEmpty)
    assertServesLike(reader, corpus.filterNot(_.doc_id == 2L) :+ v3, "recovered second upsert")
    assert(reader.docLengths.where(col("doc_id") === 2L).count() === 1L)
    // ...so replay the mid-window read directly through the gated view:
    // a reader between the g2 tombstone append and the publish must see
    // v2 EXACTLY ONCE (published gate = g1 = g2 - 1)
    val pg = g2 - 1
    val midDoclen = Tombstones.filterGenPublished(
      Tombstones.readWithGen(spark, s"$dir/doclen").where(col("gen") <= pg),
      dir, "doc_id", "gen", pg)
    assert(midDoclen.where(col("doc_id") === 2L).count() === 1L,
      "mid-window reader: the published tombstone's effect was lost (resurrected rows)")
  }
}
