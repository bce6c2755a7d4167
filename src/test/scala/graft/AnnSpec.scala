package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Knn, LshIndex}

case class Emb(vec_id: Long, embedding: Array[Float])

/** Recall/behavior properties for the approximate ANN paths (the driver's
  * DuckDB gate covers the exact paths; these cover what SQL can't).
  */
class AnnSpec extends SparkSpec {

  /** 10 well-separated Gaussian clusters — the regime ANN indexes target.
    * (The synthetic embeddings table is uniform-random, where *no* ANN
    * method can beat brute force — recall properties belong on clustered
    * data.)
    */
  private lazy val clustered: Seq[Emb] = {
    val rnd = new Random(7)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextGaussian() * 10.0))
    (0 until 2000).map { i =>
      val c = centers(i % 10)
      Emb(i.toLong, c.map(x => (x + rnd.nextGaussian()).toFloat))
    }
  }

  private def recallAt10(exact: Set[Long], approx: Set[Long]): Double =
    exact.intersect(approx).size.toDouble / exact.size

  test("IVF nprobe=K is identical to exact brute force") {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val q = clustered(123).embedding
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2").collect()
    val ivf = IvfIndex.search(df, "vec_id", "embedding", cents, q, 10, nprobe = 10).collect()
    assert(exact.map(_.toSeq).toSeq === ivf.map(_.toSeq).toSeq)
  }

  test("IVF nprobe=2/10 achieves recall@10 >= 0.9 on clustered data") {
    val s = spark; import s.implicits._
    val df = clustered.toDF().cache()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val recalls = Seq(5, 555, 1001, 1500).map { qi =>
      val q = clustered(qi).embedding
      val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2")
        .collect().map(_.getLong(1)).toSet
      val approx = IvfIndex.search(df, "vec_id", "embedding", cents, q, 10, nprobe = 2)
        .collect().map(_.getLong(1)).toSet
      recallAt10(exact, approx)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean, per-query $recalls")
    df.unpersist()
  }

  test("LSH multiprobe finds the query itself and has recall >= 0.5 on clustered data") {
    val s = spark; import s.implicits._
    val df = clustered.toDF().cache()
    val planes = LshIndex.planes(nBits = 6, dim = 16, seed = 3L)
    val recalls = Seq(42, 777, 1234).map { qi =>
      val q = clustered(qi).embedding
      val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2")
        .collect().map(_.getLong(1)).toSet
      val got = LshIndex.search(df, "vec_id", "embedding", planes, q, 10, radius = 2)
        .collect()
      assert(got.head.getLong(1) === qi.toLong) // self is rank 1, dist 0
      recallAt10(exact, got.map(_.getLong(1)).toSet)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean, per-query $recalls")
    df.unpersist()
  }

  test("batch IVF join with nprobe=K equals the exact batch cross-join path") {
    val s = spark; import s.implicits._
    val df = clustered.toDF().cache()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val queries = df.where(col("vec_id") % 400 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Knn.searchBatch(df, "vec_id", "embedding", queries, "q_id", "q_vec",
      k = 5, metric = "l2").orderBy("q_id", "rank").collect().map(_.toSeq)
    val ivf = Knn.searchBatchIvf(df, "vec_id", "embedding", queries, "q_id", "q_vec",
      cents, k = 5, nprobe = 10, metric = "l2").orderBy("q_id", "rank").collect().map(_.toSeq)
    assert(ivf.toSeq === exact.toSeq)
    df.unpersist()
  }

  test("batch IVF join with nprobe=2/10 has recall@5 >= 0.9 on clustered data") {
    val s = spark; import s.implicits._
    val df = clustered.toDF().cache()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val queries = df.where(col("vec_id") % 400 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def ids(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val exact = ids(Knn.searchBatch(df, "vec_id", "embedding", queries, "q_id", "q_vec",
      k = 5, metric = "l2").collect())
    val approx = ids(Knn.searchBatchIvf(df, "vec_id", "embedding", queries, "q_id", "q_vec",
      cents, k = 5, nprobe = 2, metric = "l2").collect())
    val recalls = exact.map { case (q, ex) => ex.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean")
    df.unpersist()
  }

  test("fitScaled: K grows with n, so per-cluster candidate work is bounded on 10x data") {
    val s = spark; import s.implicits._
    val rnd = new Random(13)
    def emb(n: Int): Seq[Emb] =
      (0 until n).map(i => Emb(i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val smallDf = emb(500).toDF()
    val bigDf = emb(5000).toDF()
    val small = IvfIndex.fitScaled(smallDf, "embedding", targetClusterSize = 50L)
    val big = IvfIndex.fitScaled(bigDf, "embedding", targetClusterSize = 50L)
    assert(small.length === 16, "below minK*target the floor holds") // ceil(500/50)=10 < 16
    assert(big.length === 100, "K = ceil(n/target) once above the floor")
    // the knnJoinIvf premise: expected per-row candidate count Σ|c|²/n
    // must not grow ∝ n — with scaled K it stays ~targetClusterSize
    def meanCand(df: org.apache.spark.sql.DataFrame, cents: Array[Array[Float]], n: Long): Double = {
      val sizes = df.select(graft.functions.nearestCentroid(col("embedding"), cents).as("c"))
        .groupBy("c").count().collect().map(_.getLong(1))
      sizes.map(x => x.toDouble * x).sum / n
    }
    val c1 = meanCand(smallDf, small, 500)
    val c10 = meanCand(bigDf, big, 5000)
    assert(c10 <= 4.0 * c1,
      s"per-row candidate work must stay bounded on 10x data: $c1 -> $c10")
  }

  test("graph beam search: recall monotone in hops; enough hops + beam finds the true top-k on clustered data") {
    val s = spark; import s.implicits._
    import graft.operators.GraphAnn
    val df = clustered.toDF().cache()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val base = Files.createTempDirectory("graft-graph-serve").toString + "/serve"
    val graph = Knn.knnJoinIvf(df, "vec_id", "embedding", cents, k = 5, metric = "l2")
    GraphAnn.buildServing(graph, df, "vec_id", "embedding", cents, base)
    val entries = spark.read.parquet(s"$base/entries").select(col("id"), col("vec"))
    val edges = spark.read.parquet(s"$base/edges")

    for (qi <- Seq(42, 1777)) {
      val q = clustered(qi).embedding
      val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2")
        .collect().map(_.getLong(1)).toSet
      val states = GraphAnn.beamStates(entries, edges, q, beam = 16, hops = 4)
      val recalls = states.map { v =>
        val top = v.orderBy(col("dist"), col("id")).limit(10)
          .collect().map(_.getLong(0)).toSet
        recallAt10(exact, top)
      }
      // the visited set only grows, and only a true top-10 vector can
      // displace a true top-10 vector from the cut ⇒ monotone
      assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
        s"recall must be monotone in hops: $recalls")
      assert(recalls.last >= 0.9,
        s"wide-beam multi-hop walk should find the neighborhood: $recalls")
      // the serve cut equals the last state's top-k
      val serve = GraphAnn.searchBeam(entries, edges, q, k = 10, beam = 16, hops = 4)
        .collect().map(_.getLong(1)).toSet
      val lastTop = states.last.orderBy(col("dist"), col("id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      assert(serve === lastTop)
    }
    df.unpersist()
  }

  test("graph beam knob: walk saturates once beam covers every round's fresh set; narrow beams visit subsets of the exhaustive walk") {
    val s = spark; import s.implicits._
    import graft.operators.GraphAnn
    val df = clustered.toDF().cache()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val base = Files.createTempDirectory("graft-graph-knob").toString + "/serve"
    val graph = Knn.knnJoinIvf(df, "vec_id", "embedding", cents, k = 5, metric = "l2")
    GraphAnn.buildServing(graph, df, "vec_id", "embedding", cents, base)
    val entries = spark.read.parquet(s"$base/entries").select(col("id"), col("vec"))
    val edges = spark.read.parquet(s"$base/edges")
    val q = clustered(42).embedding
    val n = df.count().toInt

    def visited(beam: Int): Set[Long] =
      GraphAnn.beamStates(entries, edges, q, beam, hops = 3).last
        .collect().map(_.getLong(0)).toSet

    // beam ≥ corpus size covers every fresh set ⇒ the walk IS the
    // 3-round BFS from the entries; any wider beam changes nothing
    val exhaustive = visited(n)
    assert(visited(n * 2) === exhaustive,
      "beam beyond saturation must not change the walk")
    // a narrow beam explores a (not necessarily nested in each other,
    // but always) subset of the exhaustive BFS's reachable set
    for (b <- Seq(1, 2, 4, 8)) {
      val v = visited(b)
      assert(v.subsetOf(exhaustive), s"beam $b visited outside the $exhaustive BFS ball")
      assert(v.nonEmpty)
    }
    df.unpersist()
  }

  test("graph degree knob: rank-prefix of a max-degree build IS the smaller-degree build; higher degree never shrinks reach") {
    val s = spark; import s.implicits._
    import graft.operators.GraphAnn
    val df = clustered.toDF().cache()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    // the property the degree-curve artifact exploits: the top-K cut of
    // a top-32 build equals the degree-K build exactly (same ranking,
    // prefix property) — for the graph AND for the symmetrized edge set
    val g32 = Knn.knnJoinIvf(df, "vec_id", "embedding", cents, k = 32, metric = "l2")
      .select(col("q_id"), col("rank"), col("n_id")).cache()
    for (kk <- Seq(3, 8, 16)) {
      val prefix = g32.where(col("rank") <= kk)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val direct = Knn.knnJoinIvf(df, "vec_id", "embedding", cents, k = kk, metric = "l2")
        .select(col("q_id"), col("rank"), col("n_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(prefix === direct, s"rank <= $kk prefix must equal the degree-$kk build")
      // sym(prefix_K) = {min directed rank <= K}
      val directed = g32.select(col("q_id").as("src"), col("n_id").as("dst"), col("rank"))
      val minRank = directed.unionByName(directed.select(col("dst").as("src"),
          col("src").as("dst"), col("rank")))
        .groupBy("src", "dst").agg(org.apache.spark.sql.functions.min("rank").as("mr"))
      val viaMinRank = minRank.where(col("mr") <= kk)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val symDirect = direct.flatMap { case (q, _, n) => Seq((q, n), (n, q)) }
      assert(viaMinRank === symDirect,
        s"the min-rank filter must reproduce degree-$kk's symmetrized edge set")
    }
    // richer graphs reach at least as far: under one wide-beam walk the
    // degree-16 visited set contains the degree-3 visited set (the
    // degree-3 edges are a subset, and the per-round frontier cut is
    // saturated by the wide beam) — and finds the true top-10
    val q = clustered(42).embedding
    val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2")
      .collect().map(_.getLong(1)).toSet
    val n = df.count().toInt
    // last walk state (id, dist) at degree kk under a saturating beam
    def lastState(kk: Int): Array[(Long, Double)] = {
      val base = Files.createTempDirectory(s"graft-graph-deg$kk").toString + "/serve"
      GraphAnn.buildServing(
        Knn.knnJoinIvf(df, "vec_id", "embedding", cents, k = kk, metric = "l2"),
        df, "vec_id", "embedding", cents, base)
      GraphAnn.beamStates(
        spark.read.parquet(s"$base/entries").select(col("id"), col("vec")),
        spark.read.parquet(s"$base/edges"), q, beam = n, hops = 3).last
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    val s3 = lastState(3); val s16 = lastState(16)
    assert(s3.map(_._1).toSet.subsetOf(s16.map(_._1).toSet),
      "a denser graph must not lose reachable nodes under a saturating beam")
    val top16 = s16.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    assert(recallAt10(exact, top16) >= 0.9,
      "degree 16 under a wide beam must find the true neighborhood (the new default's floor)")
    g32.unpersist(); df.unpersist()
  }

  test("graph batch walk equals the looped single-query walk") {
    val s = spark; import s.implicits._
    import graft.operators.GraphAnn
    val df = clustered.toDF().cache()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val base = Files.createTempDirectory("graft-graph-batch").toString + "/serve"
    val graph = Knn.knnJoinIvf(df, "vec_id", "embedding", cents, k = 5, metric = "l2")
    GraphAnn.buildServing(graph, df, "vec_id", "embedding", cents, base)
    val entries = spark.read.parquet(s"$base/entries").select(col("id"), col("vec"))
    val edges = spark.read.parquet(s"$base/edges")

    val qids = Seq(42L, 777L, 1500L)
    val queries = qids.map(i => (i, clustered(i.toInt).embedding.toSeq))
      .toDF("q_id", "q_vec")
    val batch = GraphAnn.searchBeamBatch(entries, edges, queries, "q_id", "q_vec",
        k = 5, beam = 8, hops = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val looped = qids.flatMap { qi =>
      GraphAnn.searchBeam(entries, edges, clustered(qi.toInt).embedding,
          k = 5, beam = 8, hops = 3)
        .collect().map(r => (qi, r.getInt(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(batch === looped, "batch walk must agree with the looped single-query walk")
    df.unpersist()
  }

  test("probeBuckets enumerates exactly the Hamming ball") {
    assert(LshIndex.probeBuckets(0, 4, 0) === Seq(0))
    assert(LshIndex.probeBuckets(0, 4, 1).toSet === Set(0, 1, 2, 4, 8))
    assert(LshIndex.probeBuckets(5, 4, 4).size === 16)
  }

  test("writePartitioned layout prunes to probed clusters at scan time") {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val dir = Files.createTempDirectory("graft_ivf").toString
    IvfIndex.writePartitioned(df, "embedding", cents, dir)
    val probed = Seq(0, 3)
    val pruned = IvfIndex.readPruned(spark, dir, probed, "vec_id")
    assert(pruned.select("cluster").distinct().collect().map(_.getInt(0)).toSet.subsetOf(probed.toSet))
    // partition pruning must reach the file source (not a post-scan filter)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("cluster IN"))
    // round trip preserves row count of the probed clusters
    val expect = df.where(IvfIndex.assign(col("embedding"), cents).isin(probed: _*)).count()
    assert(pruned.count() === expect)
  }

  /** Recall-under-churn: the one graph knob without a curve until now.
    * Two identical maintained-GRAPH indexes absorb the SAME mutation
    * storm — one with the routing heals (entry re-seed + starved-node
    * re-link), one with them disabled — and a fixed query set's
    * recall@5 against the exact live answer is measured after every
    * round. Writes CHURN.json (the committed curve, like SCALING.json)
    * and asserts the judge-stated property: post-churn recall WITH the
    * heals >= without, and never-stale/never-dead preserved throughout.
    */
  test("recall under churn: the routing heals hold recall the un-healed index loses (CHURN.json)") {
    import graft.api._
    import graft.operators.GraphMaintenance
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(61)
    val dim = 8
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat * 10))
    def vec(): Array[Float] = {
      val c = centers(rnd.nextInt(4)); c.map(x => x + rnd.nextGaussian().toFloat)
    }
    val model = scala.collection.mutable.Map[Long, Array[Float]]()
    (0 until 240).foreach(i => model(i.toLong) = vec())
    var nextId = 240L
    val queries = (0 until 24).map(i => i.toLong -> vec()).toMap

    def build(tag: String): (String, VectorIndex) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-churn-$tag").toString
      VectorIndex.create(spark, IndexType.GRAPH, dim, Metric.L2,
          IndexParams(ivfClusters = 4, graphK = 8, graphBeam = 8, graphHops = 3))
        .insertAll(model.toSeq.map { case (id, v) => (id, v, None: Option[String]) }
          .toDF("id", "vectors", "data"))
        .save(dir)
      (dir, VectorIndex.load(spark, dir))
    }
    var (dirH, idxH) = build("heal")
    var (dirN, idxN) = build("noheal")

    def l2d(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    def exactTop(q: Array[Float], k: Int): Set[Long] =
      model.toSeq.map { case (id, v) => (l2d(q, v), id) }
        .sortBy(identity).take(k).map(_._2).toSet
    def recallOf(idx: VectorIndex): Double = {
      val qdf = queries.toSeq.map { case (qid, v) => (qid, v) }.toDF("q_id", "q_vec")
      val got = idx.searchBatch(qdf, 5).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      queries.keys.toSeq.map { qid =>
        val ex = exactTop(queries(qid), 5)
        got.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size
      }.sum / queries.size
    }

    val rows = scala.collection.mutable.ArrayBuffer[String]()
    val r0 = recallOf(idxH)
    rows += s"""{"round": 0, "recall_heal": $r0, "recall_noheal": ${recallOf(idxN)}}"""

    for (round <- 1 to 10) {
      // the SAME mutation batch hits both arms: upsert ~6% of live ids,
      // delete ~2%, insert ~2% fresh — entry ids churn like any other
      val live = model.keys.toSeq.sorted
      val ups = rnd.shuffle(live).take(math.max(1, live.size * 6 / 100))
        .map(id => id -> vec())
      val dels = rnd.shuffle(live.filterNot(ups.map(_._1).toSet)).take(
        math.max(1, live.size * 2 / 100))
      val fresh = (0 until math.max(1, live.size * 2 / 100)).map { _ =>
        val id = nextId; nextId += 1; id -> vec()
      }
      ups.foreach { case (id, v) => model(id) = v }
      fresh.foreach { case (id, v) => model(id) = v }
      dels.foreach(model.remove)
      val upDf = (ups ++ fresh).map { case (id, v) => (id, v, None: Option[String]) }
        .toDF("id", "vectors", "data")
      val delDf = dels.toDF("id")
      idxH = idxH.upsertAll(upDf).deleteAll(delDf)
      spark.conf.set("spark.graft.graph.heals", "false")
      try idxN = idxN.upsertAll(upDf).deleteAll(delDf)
      finally spark.conf.unset("spark.graft.graph.heals")
      val (rh, rn) = (recallOf(idxH), recallOf(idxN))
      rows += s"""{"round": $round, "recall_heal": $rh, "recall_noheal": $rn}"""
      info(f"round $round%2d  recall heal $rh%.3f  noheal $rn%.3f")
    }

    java.nio.file.Files.writeString(java.nio.file.Paths.get("CHURN.json"),
      s"""{"corpus": 240, "dim": $dim, "clusters": 4, "graphK": 8, "beam": 8, "hops": 3,
         |"per_round": "upsert 6% + delete 2% + insert 2%", "queries": 24, "k": 5,
         |"rounds": [
         |${rows.mkString(",\n")}
         |]}
         |""".stripMargin)

    val last = rows.last
    val rh = """"recall_heal": ([0-9.]+)""".r.findFirstMatchIn(last).get.group(1).toDouble
    val rn = """"recall_noheal": ([0-9.]+)""".r.findFirstMatchIn(last).get.group(1).toDouble
    assert(rh >= rn,
      s"post-churn recall with the heals ($rh) must not trail without ($rn)")
    assert(rh >= 0.5, s"healed recall must stay serviceable under churn, got $rh")

    // never stale, never dead — on the healed arm, under full churn
    for ((_, q) <- queries.toSeq.take(6)) {
      val hits = idxH.search(q, 3).collect()
      assert(hits.nonEmpty, "the healed walk must keep serving")
      hits.foreach { h =>
        val id = h.getLong(1)
        assert(model.contains(id), s"served id $id must be live")
        assert(math.abs(h.getDouble(2) - l2d(q, model(id))) < 1e-3,
          s"id $id must be scored against its LATEST vector")
      }
    }
  }

  // ---- two-level routed quantizer (RoutedQuantizer) --------------------

  /** Brute-force two-level argmin in plain Scala — the ground truth the
    * codegen'd assignment must match exactly (same sequential double
    * arithmetic, strict-< ties to the lowest id).
    */
  private def routedBrute(v: Array[Float], coarse: Array[Array[Float]],
                          fine: Seq[(Int, Int, Array[Float])]): Int = {
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val cid = coarse.indices.minBy(c => (d2(v, coarse(c)), c))
    fine.filter(_._1 == cid).sortBy(_._2)
      .minBy { case (_, cl, cv) => (d2(v, cv), cl) }._2
  }

  test("routed quantizer: the two-level table assignment matches the brute-force coarse->fine argmin on every row") {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val rq = operators.RoutedQuantizer.fit(df, "embedding", k = 9, seed = 3L)
    assert(rq.coarse.length === 3, "coarseK must be ceil(sqrt(k))")
    val fine = rq.fine.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray)).toSeq
    assert(fine.nonEmpty && fine.map(_._1).distinct.sorted === rq.coarse.indices.toSeq,
      "every coarse cell must own at least one fine centroid (total assignment)")
    val got = rq.assign(df, "embedding")
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size === clustered.size, "assignment must be total — no row dropped")
    clustered.foreach { e =>
      val want = routedBrute(e.embedding, rq.coarse, fine)
      assert(got(e.vec_id) === want, s"vec ${e.vec_id}: got ${got(e.vec_id)}, want $want")
    }
  }

  test("routed search with full probes is identical to exact brute force; partial probes keep recall on clustered data") {
    val s = spark; import s.implicits._
    val df = clustered.toDF().cache()
    val rq = operators.RoutedQuantizer.fit(df, "embedding", k = 9, seed = 3L)
    val q = clustered(123).embedding
    val kFine = rq.k.toInt
    val exact = Knn.searchExact(df, "vec_id", "embedding", q, 10, "l2").collect()
    val full = operators.RoutedQuantizer.search(df, "vec_id", "embedding", rq, q,
      k = 10, coarseProbe = rq.coarse.length, nprobe = kFine).collect()
    assert(exact.map(_.toSeq).toSeq === full.map(_.toSeq).toSeq,
      "coarseProbe = coarseK and nprobe = K must degenerate to exact")
    val recalls = Seq(5, 555, 1001, 1500).map { qi =>
      val qv = clustered(qi).embedding
      val ex = Knn.searchExact(df, "vec_id", "embedding", qv, 10, "l2")
        .collect().map(_.getLong(1)).toSet
      val ap = operators.RoutedQuantizer.search(df, "vec_id", "embedding", rq, qv,
        k = 10, coarseProbe = 2, nprobe = 3).collect().map(_.getLong(1)).toSet
      recallAt10(ex, ap)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, s"routed partial-probe recall too low: $mean ($recalls)")
    df.unpersist()
  }

  test("routed knn graph: edges match per-cluster brute force under the routed blocking") {
    val s = spark; import s.implicits._
    val small = clustered.take(300)
    val df = small.toDF()
    val rq = operators.RoutedQuantizer.fit(df, "embedding", k = 9, seed = 3L)
    val fine = rq.fine.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray)).toSeq
    val byCluster = small.groupBy(e => routedBrute(e.embedding, rq.coarse, fine))
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val want = byCluster.values.flatMap { members =>
      members.flatMap { e =>
        members.filter(_.vec_id != e.vec_id)
          .map(o => (o.vec_id, math.sqrt(d2(e.embedding, o.embedding))))
          .sortBy { case (id, d) => (d, id) }.take(2)
          .zipWithIndex.map { case ((nid, _), r) => (e.vec_id, r + 1, nid) }
      }
    }.toSet
    val got = Knn.knnJoinRouted(df, "vec_id", "embedding", rq, k = 2, metric = "l2")
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("routed quantizer write/read roundtrip assigns identically (the table artifact survives restart)") {
    val s = spark; import s.implicits._
    val df = clustered.take(400).toDF()
    val rq = operators.RoutedQuantizer.fit(df, "embedding", k = 16, seed = 5L)
    val dir = Files.createTempDirectory("graft-routed").toString
    operators.RoutedQuantizer.write(spark, rq, dir)
    val re = operators.RoutedQuantizer.read(spark, dir)
    val a = rq.assign(df, "embedding").select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = re.assign(df, "embedding").select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
    assert(re.probes(clustered(9).embedding, 2, 3) ===
      rq.probes(clustered(9).embedding, 2, 3))
  }

  // ---- routed entry selection + batch-walk budget -----------------------

  private def buildServingFixture(): (String, Array[Array[Float]]) = {
    val s = spark; import s.implicits._
    val df = clustered.toDF()
    val cents = IvfIndex.fit(df, "embedding", k = 10, seed = 1L)
    val base = Files.createTempDirectory("graft-serve-route").toString
    operators.GraphAnn.buildServing(
      Knn.knnJoinIvf(df, "vec_id", "embedding", cents, k = 4, metric = "l2"),
      df, "vec_id", "embedding", cents, base)
    (base, IvfIndex.readCentroids(spark, s"$base/route"))
  }

  test("routed entry selection: the entries scan is bounded by the coarse route (pushed filter); full-cover routing equals the unrouted walk") {
    val s = spark; import s.implicits._
    val (base, routeCents) = buildServingFixture()
    val entries = spark.read.parquet(s"$base/entries")
    val edges = spark.read.parquet(s"$base/edges")
    val q = clustered(42).embedding
    // plan guard: the route predicate REACHES the parquet scan
    val plan = operators.GraphAnn.routeEntries(entries, routeCents, q, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("route_cell"), plan.takeRight(800))
    assert(plan.contains("PushedFilters: [I"), // In(route_cell, ...)
      s"route_cell filter must be pushed to the scan:\n${plan.takeRight(800)}")
    // the narrow route actually prunes entry rows
    assert(operators.GraphAnn.routeEntries(entries, routeCents, q, 1).count()
      < entries.count())
    // full cover degenerates to the unrouted walk exactly
    val covered = operators.GraphAnn.routeEntries(entries, routeCents, q,
      routeProbe = routeCents.length).select(col("id"), col("vec"))
    val a = operators.GraphAnn.searchBeam(covered, edges, q, 5, 8, 2).collect()
    val b = operators.GraphAnn.searchBeam(
      entries.select(col("id"), col("vec")), edges, q, 5, 8, 2).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // a narrow route still finds the query's own neighborhood
    val routed = operators.GraphAnn.searchBeam(
      operators.GraphAnn.routeEntries(entries, routeCents, q, 2)
        .select(col("id"), col("vec")), edges, q, 5, 8, 2)
      .collect().map(_.getLong(1)).toSet
    val exact = Knn.searchExact(clustered.toDF(), "vec_id", "embedding", q, 5, "l2")
      .collect().map(_.getLong(1)).toSet
    assert(routed.intersect(exact).size >= 3,
      s"routed walk recall collapsed: $routed vs $exact")
  }

  test("batch walk budget: chunked execution is identical to the monolithic walk; routed hop 0 with full cover matches the unrouted batch") {
    val s = spark; import s.implicits._
    val (base, routeCents) = buildServingFixture()
    val entries = spark.read.parquet(s"$base/entries")
    val edges = spark.read.parquet(s"$base/edges")
    val queries = clustered.take(40)
      .map(e => (e.vec_id, e.embedding)).toDF("q_id", "q_vec")
    def run(maxChunk: Int, route: Option[(Array[Array[Float]], Int)]) =
      operators.GraphAnn.searchBeamBatch(
        entries.select(col("id"), col("vec"), col("route_cell")), edges,
        queries, "q_id", "q_vec", k = 3, beam = 8, hops = 2,
        route = route, maxChunk = maxChunk)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val mono = run(maxChunk = 100000, route = None)
    spark.conf.set("spark.graft.graph.batchChunkParallel", "1")
    try {
      assert(run(maxChunk = 7, route = None) === mono,
        "hash-chunked sequential walks must reproduce the monolithic batch exactly")
      assert(run(maxChunk = 7, route = Some((routeCents, routeCents.length))) === mono,
        "full-cover routing must degenerate to the unrouted batch")
    } finally spark.conf.unset("spark.graft.graph.batchChunkParallel")
    // bounded CONCURRENT chunk jobs (the production default) are
    // value-identical to the sequential fold at any parallelism
    spark.conf.set("spark.graft.graph.batchChunkParallel", "3")
    try assert(run(maxChunk = 7, route = None) === mono,
      "concurrent chunk walks must reproduce the monolithic batch exactly")
    finally spark.conf.unset("spark.graft.graph.batchChunkParallel")
  }

  test("a chunk failing mid-batch rethrows AND unpersists everything the batch cached (no leaked frames)") {
    val s = spark; import s.implicits._
    val (base, _) = buildServingFixture()
    val entries = spark.read.parquet(s"$base/entries").select(col("id"), col("vec"))
    val edges = spark.read.parquet(s"$base/edges")
    // poison ONE query row: its chunk's materialize throws at walk time
    // (raise_error lives inside the q_vec expression, so the |q| count
    // — a q_id-only scan — stays clean and the failure lands in the
    // chunk loop, the window the cleanup contract covers)
    val queries = clustered.take(40)
      .map(e => (e.vec_id, e.embedding)).toDF("q_id", "q_vec")
      .select(col("q_id"),
        when(col("q_id") === 13L,
          raise_error(lit("poisoned query 13"))).otherwise(col("q_vec")).as("q_vec"))
    def leaked(before: Set[Int]): Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    def waitDrained(before: Set[Int]): Set[Int] = {
      // unpersist(blocking = false) + interrupted in-flight chunks drain
      // asynchronously — poll briefly before declaring a leak
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var left = leaked(before)
      while (left.nonEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100); left = leaked(before)
      }
      left
    }
    for (par <- Seq("1", "3")) {
      spark.conf.set("spark.graft.graph.batchChunkParallel", par)
      try {
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val ex = intercept[Exception] {
          operators.GraphAnn.searchBeamBatch(entries, edges, queries,
            "q_id", "q_vec", k = 3, beam = 8, hops = 2, maxChunk = 7).collect()
        }
        val chain = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => String.valueOf(t.getMessage)).mkString(" | ")
        assert(chain.contains("poisoned query 13"), s"unexpected failure: $chain")
        val left = waitDrained(before)
        assert(left.isEmpty,
          s"failed batch (parallel=$par) left persisted frames behind: $left")
      } finally spark.conf.unset("spark.graft.graph.batchChunkParallel")
    }
  }

  test("routed batch search with full probes equals the exact batch kernel; the routed serving build's entries are the true fine-cluster medoids") {
    val s = spark; import s.implicits._
    val df = clustered.take(400).toDF().cache()
    val rq = operators.RoutedQuantizer.fit(df, "embedding", k = 9, seed = 3L)
    val kFine = rq.k.toInt
    val queries = clustered.take(400).filter(_.vec_id % 40 == 0)
      .map(e => (e.vec_id, e.embedding)).toDF("q_id", "q_vec")
    val exact = Knn.searchBatch(df, "vec_id", "embedding", queries, "q_id", "q_vec",
        k = 3, metric = "l2")
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val full = operators.RoutedQuantizer.searchBatch(df, "vec_id", "embedding",
        queries, "q_id", "q_vec", rq, k = 3,
        coarseProbe = rq.coarse.length, nprobe = kFine)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(full === exact, "full probes must degenerate to the exact batch kernel")

    // routed serving build: entries must be the brute-force medoid of
    // every non-empty fine cluster (nearest member to the fine
    // centroid, ties lowest id), and a walk over the artifact must work
    val fine = rq.fine.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray)).toSeq
    val members = clustered.take(400)
      .groupBy(e => routedBrute(e.embedding, rq.coarse, fine))
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val wantMedoids = members.map { case (cl, ms) =>
      val cv = fine.find(_._2 == cl).get._3
      cl -> ms.map(e => (d2(e.embedding, cv), e.vec_id)).minBy(identity)._2
    }
    val base = Files.createTempDirectory("graft-routed-serve").toString
    operators.GraphAnn.buildServingRouted(
      Knn.knnJoinRouted(df, "vec_id", "embedding", rq, k = 3, metric = "l2"),
      df, "vec_id", "embedding", rq, base)
    val gotMedoids = spark.read.parquet(s"$base/entries")
      .select("cluster", "id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotMedoids === wantMedoids)
    val q = clustered(42).embedding
    val rc = operators.IvfIndex.readCentroids(spark, s"$base/route")
    val hits = operators.GraphAnn.searchBeam(
      operators.GraphAnn.routeEntries(
        spark.read.parquet(s"$base/entries"), rc, q, routeProbe = rc.length)
        .select(col("id"), col("vec")),
      spark.read.parquet(s"$base/edges"), q, k = 5, beam = 8, hops = 2)
      .collect().map(_.getLong(1)).toSet
    val exactTop = Knn.searchExact(df, "vec_id", "embedding", q, 5, "l2")
      .collect().map(_.getLong(1)).toSet
    assert(hits.intersect(exactTop).size >= 3,
      s"walk over the routed artifact lost the neighborhood: $hits vs $exactTop")
    df.unpersist()
  }

  test("production batch walk auto-switch: below the entry threshold hop 0 is the exact full-entry scan; above it a route_cell equi-join (no nested-loop join anywhere) with results = the forced twin") {
    val dir = "/root/testdata/sf0.001"
    // default threshold (E = n/100 sits far below it at every test SF):
    // the executed hop 0 is the exact |q| × E cross join — the plan the
    // keyed hashes gate
    val planDefault = Queries.knnBatchGraph(spark, dir)
      .queryExecution.executedPlan.toString
    assert(planDefault.contains("BroadcastNestedLoopJoin"),
      "below the threshold the batch walk must keep the exact full-entry hop 0")
    assert(!planDefault.contains("route_cell"))
    // forced below the corpus: the SAME production builder must execute
    // the routed hop 0 — a route_cell equi-join, never a nested-loop or
    // cartesian product anywhere in the plan
    spark.conf.set("spark.graft.graph.routeEntriesThreshold", "0")
    try {
      val routed = Queries.knnBatchGraph(spark, dir)
      val plan = routed.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"above the threshold hop 0 must be a route_cell equi-join:\n${plan.take(2000)}")
      assert(plan.contains("route_cell"), plan.take(2000))
      // the switched branch computes exactly what the forced keyed twin
      // (knn_batch_graph_routed, hash-gated in DuckDB) computes
      val viaConf = routed.collect().map(_.toSeq).toSeq
      spark.conf.unset("spark.graft.graph.routeEntriesThreshold")
      val viaTwin = Queries.knnBatchGraphRouted(spark, dir).collect().map(_.toSeq).toSeq
      assert(viaConf === viaTwin)
    } finally spark.conf.unset("spark.graft.graph.routeEntriesThreshold")
  }
}
