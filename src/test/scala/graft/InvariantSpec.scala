package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the round-5 operators — properties that
  * must hold on ANY data, checked on sf0.001 (the hash gate pins the
  * exact values; these pin the semantics).
  */
class InvariantSpec extends SparkSpec {

  test("orders_rfm: segment counts total the customer count; scores stay in 1..4") {
    val seg = Queries.ordersRfm(spark, sf001).collect()
    val nCust = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(seg.map(_.getLong(seg(0).fieldIndex("n_customers"))).sum == nCust)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val vs = seg.map(r => r.getInt(r.fieldIndex(c)))
      assert(vs.forall(v => v >= 1 && v <= 4), c)
    }
  }

  test("vector_silhouette: every point is counted once; means stay in [-1, 1]") {
    val rows = Queries.vectorSilhouette(spark, sf001).collect()
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n)
    assert(rows.forall { r =>
      val s = r.getDouble(2); s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9
    })
  }

  test("corpus_zipf_coverage: coverages are monotone and end at a full-vocab 1.0 bound") {
    val r = Queries.corpusZipfCoverage(spark, sf001).collect()(0)
    def c(name: String): Double = r.getDouble(r.fieldIndex(name))
    assert(c("cov_1") <= c("cov_10") + 1e-12)
    assert(c("cov_10") <= c("cov_100") + 1e-12)
    assert(c("cov_100") <= c("cov_1000") + 1e-12)
    assert(c("cov_1000") <= 1.0 + 1e-12)
    assert(c("cov_1") > 0.0)
    if (r.getLong(r.fieldIndex("n_vocab")) <= 1000)
      assert(math.abs(c("cov_1000") - 1.0) < 1e-9)
  }

  test("events_hll_setops: inclusion-exclusion holds exactly; union bounded by the parts") {
    val r = Queries.eventsHllSetops(spark, sf001).collect()(0)
    def l(name: String): Long = r.getLong(r.fieldIndex(name))
    assert(l("n_union") + l("n_inter") == l("n_view") + l("n_purchase"))
    def d(name: String): Double = r.getDouble(r.fieldIndex(name))
    assert(d("est_union") <= d("est_view") + d("est_purchase") + 1e-9)
    assert(math.abs(d("est_view") + d("est_purchase") - d("est_union") - d("est_inter")) < 1e-6)
  }

  test("events_markov_steady: mass stays within floor-loss of 1e6 and never grows") {
    val rows = Queries.eventsMarkovSteady(spark, sf001).collect()
    val mass = rows.map(_.getLong(1)).sum
    // each of 3 rounds loses < (#states × #targets) from the floors
    assert(mass <= 1000000L)
    assert(mass >= 1000000L - 3L * 25 * 1)
  }

  test("text_pii_scrub actually redacts synthetic PII and counts matches") {
    val s = spark; import s.implicits._
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val num = "[0-9]{9,}"
    val df = Seq(
      (1L, "contact me at alice.smith@example.com or bob@test.org today"),
      (2L, "card 1234567890123456 and ssn 123456789 leak"),
      (3L, "clean text with short 12345 number")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        regexp_count(col("text"), lit(email)).as("n_emails"),
        regexp_count(col("text"), lit(num)).as("n_longnums"),
        regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          num, "<NUM>").as("scrubbed"))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 2 && out(0).getString(3) ==
      "contact me at <EMAIL> or <EMAIL> today")
    assert(out(1).getInt(2) == 2 && out(1).getString(3) ==
      "card <NUM> and ssn <NUM> leak")
    assert(out(2).getInt(1) == 0 && out(2).getInt(2) == 0 &&
      out(2).getString(3) == "clean text with short 12345 number")
  }

  test("q12 buckets and q16/q20 outputs are internally consistent") {
    val q12 = Queries.q12ShipLag(spark, sf001).collect()
    val totalLines = spark.read.parquet(s"$sf001/lineitem.parquet").count()
    assert(q12.map(r => r.getLong(1) + r.getLong(2)).sum == totalLines)
    val q20 = Queries.q20ExcessSupp(spark, sf001).collect()
    assert(q20.forall(_.getLong(2) >= 1))
  }

  test("corpus_shard_plan: starts are the exact prefix sum; shards follow the 1000-token budget") {
    val rows = Queries.corpusShardPlan(spark, sf001).orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("start")) == cum, s"doc ${r.getLong(0)}")
      assert(r.getLong(r.fieldIndex("shard")) == cum / 1000L)
      cum += r.getLong(r.fieldIndex("n_tokens"))
    }
  }

  test("events_changepoint: the reported cut maximizes |H·cum − k·T| over a replayed series") {
    val got = Queries.eventsChangepoint(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val buckets = sources.Tables.events(spark, sf001)
      .select(col("event_type"), unix_micros(date_trunc("hour", col("ts"))).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = buckets.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, rows) =>
      val counts = rows.groupBy(_._2).map { case (b, g) => (b, g.size.toLong) }
        .toSeq.sortBy(_._1)
      val h = counts.size.toLong
      val total = counts.map(_._2).sum
      var cum = 0L
      val devs = counts.zipWithIndex.map { case ((b, n), i) =>
        cum += n; (b, h * cum - (i + 1) * total)
      }
      val best = devs.minBy { case (b, d) => (-math.abs(d), b) }
      assert(got(t) == best, s"type $t")
    }
  }

  test("events_user_overlap: jaccard consistent with counts; overlap bounded by marginals") {
    val rows = Queries.eventsUserOverlap(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, both) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both >= 1 && both <= math.min(na, nb))
      val j = both.toDouble / (na + nb - both)
      assert(math.abs(r.getDouble(5) - math.round(j * 1e4) / 1e4) < 1e-9)
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("text_readability: shares in [0,1], word length and syllable density positive") {
    val rows = Queries.textReadability(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("avg_word_len")) >= 1.0)
      val ls = r.getDouble(r.fieldIndex("long_word_share"))
      assert(ls >= 0.0 && ls <= 1.0)
      assert(r.getDouble(r.fieldIndex("syllables_per_word")) > 0.0)
    }
  }

  test("pq_code_entropy: entropy bounded by ln(ksub); utilization consistent with n_used") {
    val rows = Queries.pqCodeEntropy(spark, sf001).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val used = r.getLong(r.fieldIndex("n_used"))
      assert(used >= 1 && used <= 16)
      val h = r.getDouble(r.fieldIndex("entropy_nats"))
      assert(h >= -1e-9 && h <= math.log(16.0) + 1e-9)
      assert(math.abs(r.getDouble(r.fieldIndex("utilization")) - used / 16.0) < 1e-9)
    }
  }

  test("events_daily_kpis: new users sum to the user count; dau bounded by events") {
    val rows = Queries.eventsDailyKpis(spark, sf001).collect()
    val nUsers = spark.read.parquet(s"$sf001/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nUsers)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "dau cannot exceed events")
      assert(r.getLong(3) <= r.getLong(2), "new users are active users")
    }
  }

  test("supplier_concentration: HHI within [1/n, 1]; top share within [1/n, 1]") {
    val rows = Queries.supplierConcentration(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1).toDouble
      val hhi = r.getDouble(3)
      val top = r.getDouble(4)
      assert(hhi >= 1.0 / n - 1e-4 && hhi <= 1.0 + 1e-9, s"hhi $hhi n $n")
      assert(top >= 1.0 / n - 1e-4 && top <= 1.0 + 1e-9)
      assert(hhi <= top + 1e-9 || n == 1, "hhi cannot exceed the top share bound")
    }
  }

  test("events_kmv: estimate within 60% of exact at k=64; exact fallback is exact") {
    val rows = Queries.eventsKmv(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, kept, est) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      if (kept < 64) assert(est == exact.toDouble)
      else assert(math.abs(est - exact) / exact < 0.6, s"KMV est $est vs $exact")
    }
  }

  test("events_user_decile_mix: deciles partition all events; shares sum to 1 per decile") {
    val rows = Queries.eventsUserDecileMix(spark, sf001).collect()
    val total = spark.read.parquet(s"$sf001/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.groupBy(_.getInt(0)).foreach { case (d, g) =>
      val s = g.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-2, s"decile $d shares sum $s")
      assert(d >= 1 && d <= 10)
    }
  }

  test("corpus_pad_waste: waste grows with the budget; slots cover tokens") {
    val rows = Queries.corpusPadWaste(spark, sf001).orderBy("budget").collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    assert(rows(0).getDouble(3) <= rows(1).getDouble(3) + 1e-9)
    assert(rows(1).getDouble(3) <= rows(2).getDouble(3) + 1e-9)
  }

  test("lineitem_sample_eval: estimator is unbiased in aggregate (total est within 20% of exact)") {
    val rows = Queries.lineitemSampleEval(spark, sf001).collect()
    val exact = rows.map(_.getDouble(3)).sum
    val est = rows.map(_.getDouble(4)).sum
    assert(math.abs(est - exact) / exact < 0.2, s"est $est vs exact $exact")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("events_concurrent: hourly active sessions bounded by users; hours within the data span") {
    val rows = Queries.eventsConcurrent(spark, sf001).collect()
    assert(rows.nonEmpty)
    val nUsers = spark.read.parquet(s"$sf001/events.parquet")
      .select("user_id").distinct().count()
    rows.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= nUsers))
  }

  test("events_churn: per-week lifecycle counts reconcile with the retained+new+resurrected identity") {
    val rows = Queries.eventsChurn(spark, sf001).orderBy("week").collect()
    assert(rows.nonEmpty)
    // active(w) = new + retained + resurrected; churned(w+1) <= active(w)
    val active = rows.map(r => r.getLong(0) ->
      (r.getLong(1) + r.getLong(2) + r.getLong(3))).toMap
    rows.foreach { r =>
      val w = r.getLong(0)
      val churned = r.getLong(4)
      active.get(w - 1).foreach(prev => assert(churned <= prev, s"week $w"))
    }
  }

  test("ann_cost_model: probed counts bounded by the corpus; code scans cost n + rerank") {
    val rows = Queries.annCostModel(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows("flat")._1 == n && rows("flat")._2 == 1.0)
    assert(rows("pq_adc")._1 == n + 100 && rows("binary")._1 == n + 100)
    for (k <- Seq("ivf_nprobe4", "lsh_r1")) {
      val (scanned, frac) = rows(k)
      assert(scanned >= 1 && scanned <= n, s"$k scanned $scanned")
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("events_ab_srm: variant counts partition the users; flag agrees with the exact statistic") {
    val r = Queries.eventsAbSrm(spark, sf001).collect()(0)
    val nUsers = spark.read.parquet(s"$sf001/events.parquet")
      .select("user_id").distinct().count()
    val (a, b) = (r.getLong(0), r.getLong(1))
    assert(a + b == nUsers)
    assert(r.getDouble(2) >= 0.0)
    assert(r.getBoolean(3) == (100L * (a - b) * (a - b) > 384L * (a + b)))
  }

  test("corpus_tokenizer_fertility: at least one char per token, every language present") {
    val rows = Queries.corpusTokenizerFertility(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 1.0, s"${r.getString(0)} fertility ${r.getDouble(4)}")
      assert(r.getLong(3) >= 1)
    }
  }

  test("corpus_quality_vs_dup: the two groups partition the corpus") {
    val rows = Queries.corpusQualityVsDup(spark, sf001).collect()
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val q = r.getDouble(2)
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("corpus_length_hist: buckets are powers of two; per-source shares sum to 1") {
    val rows = Queries.corpusLengthHist(spark, sf001).collect()
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b == 0 || (b & (b - 1)) == 0, s"bucket $b not a power of two")
    }
    rows.groupBy(_.getString(0)).foreach { case (s, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-2, s"source $s")
    }
  }

  test("corpus_keywords: at most three ranked keywords per source, ranks contiguous") {
    val rows = Queries.corpusKeywords(spark, sf001).collect()
    rows.groupBy(_.getString(0)).foreach { case (s, g) =>
      val ranks = g.map(_.getInt(1)).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1 to ranks.length), s"source $s")
    }
  }

  test("corpus_boilerplate: doc frequencies bounded by the corpus and ordered descending") {
    val rows = Queries.corpusBoilerplate(spark, sf001).collect()
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= nDocs))
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x.getLong(1) >= y.getLong(1))
      case _           => ()
    }
  }

  test("embedding_outliers: flagged rows are rare and strictly above their cluster mean distance") {
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    val rows = Queries.embeddingOutliers(spark, sf001).collect()
    assert(rows.length < n / 10, "2-sigma high-side flags must be a small tail")
    // recompute per-cluster mean distance from the same fitted centroids
    val emb = sources.Tables.embeddings(spark, sf001)
    val cents = operators.IvfIndex.fitCached(emb, "embedding", k = 16)
    val d = emb.select(col("vec_id"), col("embedding"),
        functions.nearestCentroid(col("embedding"), cents).as("cluster"))
      .withColumn("d", functions.vecL2(col("embedding"),
        element_at(typedLit(cents), col("cluster") + 1)))
      .select("vec_id", "cluster", "d")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val mean = d.groupBy(_._2).map { case (c, g) => c -> g.map(_._3).sum / g.size }
    val byId = d.map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { r =>
      val (c, dist) = byId(r.getLong(0))
      assert(c == r.getInt(1))
      assert(dist > mean(c), s"vec ${r.getLong(0)} not above cluster mean")
    }
  }

  test("vector_norm_profile: label moments cover every vector; min <= mean <= max") {
    val rows = Queries.vectorNormProfile(spark, sf001).collect()
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      val (mean, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9)
      assert(mn >= 0.0)
    }
  }

  test("vector_quantile_clip: one row per dimension with ordered bounds") {
    val rows = Queries.vectorQuantileClip(spark, sf001).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9) // p01 <= p50
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9) // p50 <= p99
    }
  }

  test("events_gini: one row, gini in [0, 1), totals match the events table") {
    val r = Queries.eventsGini(spark, sf001).collect()(0)
    val ev = spark.read.parquet(s"$sf001/events.parquet")
    assert(r.getLong(0) == ev.select("user_id").distinct().count())
    assert(r.getLong(1) == ev.count())
    val g = r.getDouble(2)
    assert(g >= 0.0 && g < 1.0)
  }

  test("events_gini: hand-checked on a 4-user split 1/1/1/7") {
    // sorted x = (1,1,1,7): G = 2*(1+2+3+7*4)/(4*10) - 5/4 = 68/40 - 50/40 = 0.45
    import spark.implicits._
    val ev = Seq.tabulate(10)(i => (if (i < 3) i.toLong else 3L, i))
      .toDF("user_id", "e")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val dist = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("cnt"))
    val byC = org.apache.spark.sql.expressions.Window.orderBy("c")
    val got = dist
      .withColumn("s", coalesce(sum("cnt").over(
        byC.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .select((dec(col("c")) * dec(col("cnt")) *
          (lit(2) * dec(col("s")) + dec(col("cnt")) + lit(1))).as("t2"),
        (dec(col("c")) * dec(col("cnt"))).as("x"), col("cnt"))
      .agg(sum("t2").as("t2"), sum("x").as("sx"), sum("cnt").as("n"))
      .select((col("t2").cast("double") / (col("n").cast("double") * col("sx").cast("double"))
        - (col("n").cast("double") + lit(1.0)) / col("n").cast("double")).as("g"))
      .collect()(0).getDouble(0)
    assert(math.abs(got - 0.45) < 1e-12, s"got $got")
  }

  test("corpus_collocations: at most 20 rows, counts consistent, pmi non-increasing") {
    val rows = Queries.corpusCollocations(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5)                    // c12 >= 5
      assert(r.getLong(2) <= r.getLong(3))         // c12 <= c1
      assert(r.getLong(2) <= r.getLong(4))         // c12 <= c2
    }
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x.getDouble(5) >= y.getDouble(5) - 1e-12)
      case _           => ()
    }
  }

  test("dedup_minhash_est_error: buckets in 5..10, means in [0,1], est inside its decile") {
    val rows = Queries.dedupMinhashEstError(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getInt(0)
      assert(b >= 5 && b <= 10)
      val (est, jac, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(est >= b / 10.0 - 1e-9 && est <= (b + 1) / 10.0 + 1e-9)
      assert(jac >= 0.0 && jac <= 1.0 + 1e-9)
      assert(err >= 0.0 && err <= 1.0 + 1e-9)
    }
  }

  test("dedup_cluster_hist: doc mass sums to the corpus; shares sum to 1") {
    val rows = Queries.dedupClusterHist(spark, sf001).collect()
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-2)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
  }

  test("events_entropy_rate: H in [0, ln n_next] per row") {
    val rows = Queries.eventsEntropyRate(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(3)
      assert(h >= -1e-9, s"negative entropy $h")
      assert(h <= math.log(r.getLong(2).toDouble) + 1e-6,
        s"H $h above ln(${r.getLong(2)})")
    }
  }

  test("events_power_law: alpha > 1 and user count matches") {
    val r = Queries.eventsPowerLaw(spark, sf001).collect()(0)
    val nUsers = spark.read.parquet(s"$sf001/events.parquet")
      .select("user_id").distinct().count()
    assert(r.getLong(0) == nUsers)
    assert(r.getDouble(2) > 1.0)
  }

  test("dedup_lsh_bucket_profile: 8 bands, every signed doc in every band, pair volume consistent") {
    val rows = Queries.dedupLshBucketProfile(spark, sf001).collect()
    assert(rows.length == 8)
    val docsPerBand = rows.map(_.getLong(2)).distinct
    assert(docsPerBand.length == 1, "every band sees the same signed docs")
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))           // buckets <= docs
      assert(r.getLong(3) <= r.getLong(2))           // max bucket <= docs
      val mx = r.getLong(3)
      assert(r.getLong(4) >= mx * (mx - 1) / 2)      // pairs >= biggest bucket's pairs
    }
  }

  test("ann_tradeoff_table: monotone in nprobe, ends at full scan + perfect recall") {
    val rows = Queries.annTradeoffTable(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8, 16))
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    rows.sliding(2).foreach {
      case Array(x, y) =>
        assert(x.getLong(1) <= y.getLong(1), "scanned rows monotone")
        assert(x.getLong(3) <= y.getLong(3), "hits monotone")
      case _ => ()
    }
    assert(rows.last.getLong(1) == n, "nprobe=K scans everything")
    assert(rows.last.getDouble(4) == 1.0, "nprobe=K is exact")
  }

  test("events_streaks: streaks positive and bounded by the calendar span") {
    val rows = Queries.eventsStreaks(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val span = spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("max(unix_micros(cast(ts as timestamp)) div 86400000000) - " +
        "min(unix_micros(cast(ts as timestamp)) div 86400000000) + 1")
      .collect()(0).getLong(0)
    rows.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= span))
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x.getLong(1) >= y.getLong(1))
      case _           => ()
    }
  }

  test("corpus_norm_alignment: r in [-1,1] over the aligned slice") {
    val r = Queries.corpusNormAlignment(spark, sf001).collect()(0)
    assert(r.getLong(0) > 0)
    assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
  }

  test("dedup_detector_overlap: set identities hold and match the standalone detectors") {
    val r = Queries.dedupDetectorOverlap(spark, sf001).collect()(0)
    val (nm, ns, nb, nu) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nu == nm + ns - nb, "inclusion-exclusion")
    assert(nb <= math.min(nm, ns))
    assert(nm == Queries.dedupMinhash(spark, sf001).where(col("est_sim") >= 0.5).count())
    assert(ns == Queries.dedupSimhash(spark, sf001).count())
  }

  test("text_code_detect: rates in [0,1], flagged docs bounded by totals") {
    val rows = Queries.textCodeDetect(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("corpus_vocab_growth: 10 deciles, cum matches running sum and ends at full vocab") {
    val rows = Queries.corpusVocabGrowth(spark, sf001).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 10))
    var run = 0L
    rows.foreach { r => run += r.getLong(1); assert(r.getLong(2) == run) }
    val vocab = sources.Tables.documents(spark, sf001)
      .select(explode(array_distinct(functions.wordTokens(col("text")))).as("w"))
      .agg(countDistinct("w")).collect()(0).getLong(0)
    assert(rows.last.getLong(2) == vocab, "curve must end at the full vocabulary size")
  }

  test("dedup_simhash_hamming_hist: shares sum to 1 and the <=8 mass bounds dedup_simhash") {
    val rows = Queries.dedupSimhashHammingHist(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-2)
    val nLe8 = rows.filter(_.getInt(0) <= 8).map(_.getLong(1)).sum
    val nPairs = Queries.dedupSimhash(spark, sf001).count()
    assert(nLe8 == nPairs, "histogram mass at <=8 must equal the simhash pair count")
  }

  test("knn_range_count_curve: counts monotone in radius and bounded by n") {
    val r = Queries.knnRangeCountCurve(spark, sf001).collect()(0)
    val cs = (1 to 5).map(r.getLong)
    assert(cs.sliding(2).forall(p => p(0) <= p(1)), "monotone in radius")
    assert(cs.last <= r.getLong(0))
    assert(r.getLong(3) == Queries.knnRange(spark, sf001).count(), "r=1.25 matches knn_range")
  }

  test("events_markov2: per-context probabilities bounded and ranks dense") {
    val rows = Queries.eventsMarkov2(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 3)
      assert(r.getLong(4) <= r.getLong(5))
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("events_session_stats: two metric rows, identical session counts, ordered percentiles") {
    val rows = Queries.eventsSessionStats(spark, sf001).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(1)).distinct.length == 1, "both metrics over the same sessions")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("retrieval_precision_curve: four cuts, hit counts monotone in k, p_at_k in [0,1]") {
    val rows = Queries.retrievalPrecisionCurve(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3, 5, 10))
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x.getLong(2) <= y.getLong(2), "hits monotone in k")
      case _           => ()
    }
    rows.foreach { r =>
      val p = r.getDouble(3)
      assert(p >= 0.0 && p <= 1.0 + 1e-9)
      assert(r.getLong(2) <= r.getInt(0).toLong * r.getLong(1)) // hits <= k * queries
    }
  }

  test("vector_pair_sample: exactly n pairs, bins within 0..19, shares sum to 1") {
    val rows = Queries.vectorPairSample(spark, sf001).collect()
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) <= 19))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-2)
  }

  test("orders_ship_sla: percentiles ordered, line counts total the join size") {
    val rows = Queries.ordersShipSla(spark, sf001).collect()
    val nLines = spark.read.parquet(s"$sf001/lineitem.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nLines)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("corpus_language_mix: doc counts total the corpus; shares sum to 1 per source") {
    val rows = Queries.corpusLanguageMix(spark, sf001).collect()
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.groupBy(_.getString(0)).foreach { case (src, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-2, src)
    }
  }

  test("vector_dedup_exact: identities between the four counts hold") {
    val r = Queries.vectorDedupExact(spark, sf001).collect()(0)
    val (nv, nd, dupG, rem) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nv == spark.read.parquet(s"$sf001/embeddings.parquet").count())
    assert(nd <= nv)
    assert(rem == nv - nd)
    assert(dupG >= rem) // each dup group keeps one survivor
  }

  test("knn_mutual: mutual pairs bound the directed edge count; reciprocity in [0,1]") {
    val r = Queries.knnMutual(spark, sf001).collect()(0)
    val (nodes, edges, mutual) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nodes > 0 && edges > 0)
    assert(mutual * 2 <= edges)
    val rec = r.getDouble(3)
    assert(rec >= 0.0 && rec <= 1.0 + 1e-9)
  }

  test("rerank curves: recall is MONOTONE in rerank and the rerank = n leg closes at 1.0") {
    // provable: with candidate sets S1 ⊆ S2, any exact-top-k member
    // surviving the S1 cut also survives the S2 cut (at most k−1
    // globally-better vectors exist), so hits never decrease; and at
    // rerank = n every candidate survives ⇒ the search IS brute force.
    for (q <- Seq(Queries.annSq8RerankCurve _, Queries.annBinaryRerankCurve _)) {
      val rows = q(spark, sf001).collect()
      val recalls = rows.map(_.getAs[Double]("recall"))
      assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"recall must not decrease with rerank: ${recalls.mkString(",")}")
      assert(recalls.last === 1.0, "the rerank = n leg must be exact")
    }
  }

  test("knn_components: component sizes account for every vector exactly once") {
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    val rows = Queries.knnComponents(spark, sf001).collect()
    val covered = rows.map(r => r.getAs[Long]("sz") * r.getAs[Long]("n_components")).sum
    assert(covered === n, s"Σ sz·n_components must equal n_vectors ($covered vs $n)")
    assert(rows.forall(_.getAs[Long]("n_components") > 0))
  }
}
