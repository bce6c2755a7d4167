package graft

import graft.operators.Dedup

case class Doc(doc_id: Long, text: String, source: String)

class DedupSpec extends SparkSpec {

  private lazy val docs: Seq[Doc] = Seq(
    Doc(1, "the quick brown fox jumps over the lazy dog", "a"),
    Doc(2, "the quick brown fox jumps over the lazy dog", "a"), // exact dup of 1
    Doc(3, "the quick brown fox jumps over the lazy cat today", "a"), // near dup of 1
    Doc(4, "completely different content about spark engines and parquet files", "a"),
    Doc(5, "unrelated short text", "b"))

  test("exact dedup keeps min id per identical text") {
    val s = spark; import s.implicits._
    val out = Dedup.exact(docs.toDF(), "doc_id", "text").collect()
    assert(out.length === 4) // 5 docs, one exact-dup pair
    val dupRow = out.find(_.getLong(2) === 2L).get
    assert(dupRow.getLong(1) === 1L) // keep_id = min(1, 2)
  }

  test("minhash: identical docs pair with est_sim 1.0; near dups pair too") {
    val s = spark; import s.implicits._
    val pairs = Dedup.minhashPairs(docs.toDF(), "doc_id", "text", minEst = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.keySet.exists { case (a, b) => b == 4L && a <= 3L }) // unrelated never pairs
  }

  test("incremental minhash: batch pairs only against the corpus, never batch×batch or corpus×corpus") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // batch = ids 2, 3 (dup + near-dup of corpus doc 1); 1, 4, 5 = corpus
    val out = Dedup.minhashPairsIncremental(docs.toDF(), "doc_id", "text",
      isNew = col("doc_id").isin(2L, 3L), minEst = 0.2).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1L)), "exact dup of corpus doc must surface")
    assert(pairs.contains((3L, 1L)), "near dup of corpus doc must surface")
    assert(!pairs.exists { case (a, b) => Set(2L, 3L)(a) && Set(2L, 3L)(b) },
      "no batch-internal pairs")
    assert(pairs.forall { case (a, b) => Set(2L, 3L)(a) && !Set(2L, 3L)(b) },
      "every pair is (new, old)")
    val est = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((2L, 1L)) === 1.0)
  }

  test("simhash: identical docs have hamming 0") {
    val s = spark; import s.implicits._
    val pairs = Dedup.simhashPairs(docs.toDF(), "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0)
  }

  test("simhash banding envelope: complete for hamming <= 3, sound vs brute force") {
    val s = spark; import s.implicits._
    // 200 docs over a small vocabulary so near-identical token sets (and
    // thus close signatures) actually occur.
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val fuzzed = (1L to 200L).map { i =>
      val base = vocab.filter(_ => rnd.nextBoolean())
      val toks = if (rnd.nextBoolean() && base.nonEmpty) base
                 else base :+ vocab(rnd.nextInt(vocab.size))
      (i, toks.mkString(" "))
    }
    val df = fuzzed.toDF("doc_id", "text")

    val sigs = df.select($"doc_id",
        graft.functions.simHash60(
          graft.functions.wordShingleHash60(graft.functions.wordTokens($"text"), 1)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    val got = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

    val ids = fuzzed.map(_._1)
    for (a <- ids; b <- ids if a < b) {
      val h = hamming(sigs(a), sigs(b))
      // pigeonhole guarantee: <= 3 differing bits leave one of 4 bands intact
      if (h <= 3) assert(got.get((a, b)).contains(h), s"missed guaranteed pair ($a,$b) h=$h")
    }
    // soundness: every emitted pair's hamming is real and within the cap
    got.foreach { case ((a, b), h) =>
      assert(h === hamming(sigs(a), sigs(b)) && h <= 8)
    }
    assert(got.nonEmpty)
  }

  test("jaccardPrefixPairs == brute-force J >= 0.65 pairs (complete AND sound)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega")
    // base docs + perturbed near-copies (token dropped / substituted), so
    // the high-Jaccard regime actually occurs alongside unrelated docs
    val bases = (0 until 40).map(_ => Vector.fill(12 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
    val fuzzed = bases.zipWithIndex.flatMap { case (toks, i) =>
      val mutIdx = rnd.nextInt(toks.size)
      val dropped = toks.patch(mutIdx, Nil, 1)
      val substituted = toks.updated(mutIdx, vocab(rnd.nextInt(vocab.size)))
      Seq((i * 3L + 1, toks.mkString(" ")),
          (i * 3L + 2, dropped.mkString(" ")),
          (i * 3L + 3, substituted.mkString(" ")))
    }
    val docs = fuzzed.toDF("doc_id", "text")

    val sets = docs.select($"doc_id",
        org.apache.spark.sql.functions.array_distinct(
          graft.functions.wordShingleHash60(graft.functions.wordTokens($"text"), 3)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val ids = fuzzed.map(_._1)
    val want = ids.flatMap { a =>
      ids.filter(b => a < b && sets(a).nonEmpty && sets(b).nonEmpty).flatMap { b =>
        val inter = (sets(a) intersect sets(b)).size
        val j = inter.toDouble / (sets(a).size + sets(b).size - inter).toDouble
        if (j >= 0.65) Some((a, b)) else None
      }
    }.toSet

    val got = Dedup.jaccardPrefixPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want) // prefix filtering loses nothing and adds nothing
    assert(want.nonEmpty, "fuzz must actually produce qualifying pairs")
  }

  test("resolveClusters: empty pair graph leaves every doc its own canonical") {
    val s = spark; import s.implicits._
    val allDocs = (1L to 4L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val got = Dedup.resolveClusters(allDocs, "doc_id", noPairs).collect()
    assert(got.length === 4)
    got.foreach(r => assert(r.getLong(1) === r.getLong(0) && !r.getBoolean(2)))
  }

  test("resolveClusters: min-label propagation finds connected components") {
    val s = spark; import s.implicits._
    val allDocs = (1L to 8L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // components: {1,2,3,4} (chain), {6,7}, singletons 5 and 8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("a_id", "b_id")
    val got = Dedup.resolveClusters(allDocs, "doc_id", pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    assert(got === List(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, true), (4L, 1L, true),
      (5L, 5L, false), (6L, 6L, false), (7L, 6L, true), (8L, 8L, false)))
  }

  test("embedding LSH blocking: bucket-blocked pairs cover high-cosine pairs (recall >= 0.9)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    // 200 random base vectors + a perturbed near-dup of each (cosine ≥ ~0.98)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val dups = base.map { case (i, v) =>
      (i + 1000L, v.map(x => x + rnd.nextGaussian().toFloat * 0.08f))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val planes = graft.operators.LshIndex.bandPlanes(bands = 8, nBits = 4, dim = 64)
    val got = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", planes, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (i, i+1000) pair is a true near-dup; banding must find ≥ 90%
    val truePairs = base.map { case (i, _) => (i, i + 1000L) }.toSet
    val found = truePairs.count(got.contains)
    assert(found >= 180, s"recall ${found / 200.0} over planted near-dup pairs")
    // and everything reported really clears the cosine threshold (spot check shape)
    assert(got.forall { case (a, b) => a < b })
  }

  test("embedding LSH blocking: the bucket cap bounds pair volume and reports what it excluded") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    val emb = (0 until 300).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val planes = graft.operators.LshIndex.bandPlanes(bands = 8, nBits = 2, dim = 64)
    // nBits = 2 ⇒ 4 buckets/band over 300 vectors: ~75 ids per bucket,
    // so a cap of 40 must exclude most buckets — the fixed-plane
    // quadratic blowup scenario the round-11 certificate caught
    val full = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", planes,
      minCosine = -1.0, bucketCap = 1000).collect()
    val capped = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", planes,
      minCosine = -1.0, bucketCap = 40).collect()
    assert(capped.length < full.length,
      "the cap must actually exclude dense-bucket pairs")
    // the envelope rides every row and says what was dropped
    assert(capped.forall(r => r.getLong(r.fieldIndex("n_capped_buckets")) > 0))
    assert(capped.forall(r => r.getLong(r.fieldIndex("n_ids_in_capped")) > 0))
    assert(full.forall(r => r.getLong(r.fieldIndex("n_capped_buckets")) === 0))
    // capped pairs are a SUBSET of the uncapped candidates (the cap
    // only removes work, never invents pairs)
    val fullSet = full.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.forall(r => fullSet.contains((r.getLong(0), r.getLong(1)))))
  }

  test("ngram jaccard: pairs only form within a block") {
    val s = spark; import s.implicits._
    val pairs = Dedup.ngramJaccardPairs(docs.toDF(), "doc_id", "text",
      blockCol = "source", n = 3, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => b == 5L }) // doc 5 is alone in block "b"
    assert(pairs.contains((1L, 2L)))
  }

  test("rare-gram blocking: max block <= dfCap even on a templated corpus growing 3x") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // worst case for naive min-gram blocking: every doc shares a long
    // template (so ubiquitous grams dominate), only the tail differs;
    // corpus(3n) extends corpus(n)
    def corpus(n: Int): Seq[Doc] = {
      val rnd = new scala.util.Random(11)
      (1 to n).map(i =>
        Doc(i.toLong, "the quick brown fox jumps over the lazy dog again and again "
          + rnd.alphanumeric.take(12).mkString, "x"))
    }
    val dfCap = 8L
    def maxBlock(n: Int): Long = Dedup.withRareGramBlock(corpus(n).toDF(),
        "doc_id", "text", n = 3, dfCap = dfCap, out = "blk")
      .where(col("blk").isNotNull)
      .groupBy("blk").count().agg(max("count")).head().getLong(0)
    // |block| <= df(blocking gram) <= dfCap BY CONSTRUCTION, at both sizes
    assert(maxBlock(300) <= dfCap)
    assert(maxBlock(900) <= dfCap)
    // near-identical pairs still co-block: their rare suffix grams agree
    val nd = (1 to 40).map(i =>
      Doc(i.toLong, s"totally unique payload number $i with rare content xyzzy$i", "x")) ++
      Seq(Doc(100L, "totally unique payload number 7 with rare content xyzzy7!", "x"))
    val blks = Dedup.withRareGramBlock(nd.toDF(), "doc_id", "text", n = 3,
        dfCap = 8L, out = "blk")
      .collect().map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[java.lang.Long]("blk"))).toMap
    assert(blks(7L).isDefined && blks(7L) === blks(100L),
      "a near-duplicate pair must share its rare-gram block")
  }

  test("spanScrub: foreign span occurrences excised, owner untouched, order-exact splice") {
    val s = spark; import s.implicits._
    // doc 1 owns the 8-word span "a b c d e f g h"; doc 2 repeats it
    // (wrapped in z ... y); doc 3 is clean; doc 4 is too short to span
    val corpus = Seq(
      Doc(1L, "a b c d e f g h x", "s"),
      Doc(2L, "z a b c d e f g h y", "s"),
      Doc(3L, "totally separate words only here now fine ok", "s"),
      Doc(4L, "tiny doc", "s"))
    val out = Dedup.spanScrub(corpus.toDF(), "doc_id", "text", spanLen = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((9, 9L, "a b c d e f g h x")))  // owner keeps all
    assert(out(2L) === ((10, 2L, "z y")))               // 8-block excised, splice exact
    assert(out(3L) === ((8, 8L, "totally separate words only here now fine ok")))
    assert(out(4L) === ((2, 2L, "tiny doc")))           // sub-span doc untouched
  }

  test("semanticDrop: within-cluster near-dups dropped to min survivor; cross-cluster pairs out of reach") {
    val s = spark; import s.implicits._
    // two clusters on orthogonal axes; explicit centroids, no fitting
    val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),     // c0 anchor
      (2L, Seq(0.99f, 0.1f, 0f, 0f)), // c0, cos≈0.995 vs 1 → dropped
      (3L, Seq(0f, 1f, 0f, 0f)),     // c1 anchor
      (4L, Seq(1f, 0.05f, 0f, 0f)),  // c0, cos≈0.999 vs 1 → dropped, canonical min = 1
      (5L, Seq(0.6f, 0.8f, 0f, 0f))  // lands in c1; cos vs 3 = 0.8 < τ → kept
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDrop(emb, "vec_id", "embedding", cents, minCosine = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(2L, 4L))
    assert(out(2L)._1 === 1L && out(4L)._1 === 1L) // canonical = min in-cluster neighbor
    assert(out.values.forall { case (_, cl, c) => cl === 0 && c >= 0.9 })
    // 5 is a 0.8-cosine neighbor of 3 INSIDE c1 and near c0's members too,
    // but below τ / cross-cluster — SemDeDup's documented miss profile
    assert(!out.contains(5L) && !out.contains(3L) && !out.contains(1L))
  }

  test("dedup_savings accounting is consistent with resolveClusters at sf0.001") {
    val out = Queries.dedupSavings(spark, sf001).collect()
    assert(out.nonEmpty)
    val totalDropped = out.map(_.getLong(2)).sum
    out.foreach { r =>
      val (nDocs, nDropped, charsTotal, charsDropped, pct) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nDropped <= nDocs && charsDropped <= charsTotal)
      assert(pct >= 0.0 && pct <= 1.0)
    }
    val clusters = Queries.dedupClusters(spark, sf001)
    val expectDropped = clusters.where(org.apache.spark.sql.functions.col("is_dup")).count()
    assert(totalDropped === expectDropped)
  }
}
