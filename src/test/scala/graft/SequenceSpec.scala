package graft

import org.apache.spark.sql.functions._

/** Independent brute-force verification of the round-5 sequence
  * operators: the DuckDB oracles mirror the window formulation, so
  * these specs re-derive the semantics a THIRD way (driver-side
  * imperative scans) to pin the intended meaning, not the shared SQL.
  */
class SequenceSpec extends SparkSpec {

  private val W = 3600L * 1000000L

  test("events_window_funnel matches an imperative per-user scan at sf0.001") {
    val ev = sources.Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

    var s1 = 0L; var s2 = 0L; var s3 = 0L
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      var minView = Long.MaxValue
      var minClickOk = Long.MaxValue
      var hasView = false; var hasClick = false; var hasPurchase = false
      ordered.foreach { case (_, _, typ, t) =>
        // decide from PRIOR rows only, then fold this row into the state
        if (typ == "view") hasView = true
        if (typ == "click" && minView != Long.MaxValue && t <= minView + W) {
          hasClick = true
          if (t < minClickOk) minClickOk = t
        }
        if (typ == "purchase" && minClickOk != Long.MaxValue && t <= minClickOk + W)
          hasPurchase = true
        if (typ == "view" && t < minView) minView = t
      }
      if (hasView) s1 += 1; if (hasClick) s2 += 1; if (hasPurchase) s3 += 1
    }

    val got = Queries.eventsWindowFunnel(spark, sf001).collect()(0)
    assert(got.getLong(got.fieldIndex("n_stage1")) == s1)
    assert(got.getLong(got.fieldIndex("n_stage2")) == s2)
    assert(got.getLong(got.fieldIndex("n_stage3")) == s3)
  }

  test("multimodal_scene_cuts matches an imperative frame scan at sf0.001") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    // the PPM spec's frame tiling (Multimodal spec v1): live slice per
    // frame, ink = non-space live bytes — recomputed imperatively from
    // the text, independent of the parser under test
    val expect = docs.map { case (id, text) =>
      val n = text.getBytes("UTF-8").length
      val w = 2 + n % 3
      val fsz = 3 * w * w
      val nFrames = n / fsz + 1
      val feats = (0 until nFrames).map { i =>
        val from = math.min(i * fsz, n)
        val until = math.min(from + fsz, n)
        text.substring(from, until).count(_ != ' ')
      }
      val cuts = feats.zip(feats.drop(1)).zipWithIndex.collect {
        case ((prev, cur), i) if math.abs(cur - prev) >= 4 => i + 1
      }
      (id, nFrames.toLong, cuts.size.toLong,
        if (cuts.isEmpty) null else java.lang.Integer.valueOf(cuts.min))
    }.sortBy(_._1)

    val got = Queries.multimodalSceneCuts(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Integer.valueOf(r.getInt(3))))
    assert(got.toSeq == expect.toSeq)
  }

  test("window funnel timeout actually gates: a click 2h after the view never counts") {
    // synthetic: one user views at t0, clicks at t0 + 2h, purchases later
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "view", 0L),
      (1L, 2L, "click", 2 * W),
      (1L, 3L, "purchase", 2 * W + 10)
    ).toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_micros(col("t")).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = Queries.eventsWindowFunnel(spark, dir).collect()(0)
    assert(row.getLong(row.fieldIndex("n_stage1")) == 1)
    assert(row.getLong(row.fieldIndex("n_stage2")) == 0)
    assert(row.getLong(row.fieldIndex("n_stage3")) == 0)
  }
}
