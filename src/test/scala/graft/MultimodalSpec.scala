package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  private def media = Tables.documents(spark, sf001)
    .select(col("doc_id"), Multimodal.ppmPayload(col("text")).as("payload"))

  test("in-plan PPM synthesis equals the driver-side encoder byte for byte") {
    val planBytes = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val texts = Tables.documents(spark, sf001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && texts.length === planBytes.size)
    texts.foreach { case (id, t) =>
      val expect = Multimodal.ppmPayloadBytes(t.getBytes("UTF-8"))
      assert(java.util.Arrays.equals(planBytes(id), expect),
        s"doc $id: the codegen'd payload must equal the Scala encoder's")
    }
  }

  test("the codec PARSES the bytes: metadata matches the payload spec, features normalized") {
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length === 500)
    val lens = Tables.documents(spark, sf001)
      .select(col("doc_id"), octet_length(encode(col("text"), "utf-8")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    decoded.foreach { d =>
      val n = lens(d.doc_id)
      val w = 2 + n % 3
      val fsz = 3 * w * w
      val nf = n / fsz + 1
      assert(d.width === w && d.height === w, s"doc ${d.doc_id}: parsed dims")
      assert(d.n_frames === nf, s"doc ${d.doc_id}: parsed frame count")
      assert(d.n_bytes === nf * (11 + fsz), s"doc ${d.doc_id}: payload length")
      assert(d.features.length === 8)
      assert(math.abs(d.features.sum - 1f) < 1e-3) // histogram normalized
      assert(d.thumb_w === w && d.thumb_h === w)   // tiny frames: no downscale
    }
  }

  test("frame decode: offsets/live bytes/digests walk the stream correctly") {
    val frames = Multimodal.decodeFrames(media).collect()
    val texts = Tables.documents(spark, sf001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.keySet === texts.keySet)
    byDoc.foreach { case (id, fs) =>
      val t = texts(id).getBytes("UTF-8")
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.frame_idx).toSeq === sorted.indices.toSeq)
      sorted.foreach { f =>
        assert(f.frame_off === f.frame_idx.toLong * f.frame_len)
        val live = math.max(0, math.min(f.frame_len, t.length - f.frame_idx * f.frame_len))
        assert(f.n_live === live, s"doc $id frame ${f.frame_idx}")
        val slice = java.util.Arrays.copyOfRange(t,
          math.min(f.frame_idx * f.frame_len, t.length),
          math.min(f.frame_idx * f.frame_len + live, t.length))
        val md = java.security.MessageDigest.getInstance("MD5")
        val expect = md.digest(slice).map("%02x".format(_)).mkString
        assert(f.frame_digest === expect)
        assert(f.ink === slice.count(_ != ' '.toByte))
      }
      // the frames tile the text: live bytes sum to the byte count
      assert(sorted.map(_.n_live).sum === t.length)
    }
  }

  test("the parser is a real one: multi-digit dims, general whitespace, loud failures") {
    // a 12x10 frame the synthesizer never emits — multi-digit header
    val pixels = Array.tabulate(12 * 10 * 3)(i => (i % 251).toByte)
    val payload = "P6\n12 10\n255\n".getBytes("US-ASCII") ++ pixels
    val d = Multimodal.decodePpm(1L, payload ++ payload)
    assert(d.width === 12 && d.height === 10 && d.n_frames === 2)
    assert(d.thumb_w === 12 && d.thumb_h === 10)
    // spec-legal whitespace variations parse too
    val ws = Multimodal.decodePpm(2L, "P6 12\t10 255\n".getBytes("US-ASCII") ++ pixels)
    assert(ws.width === 12 && ws.n_frames === 1)
    // corrupt bytes fail loudly, never guess
    intercept[IllegalArgumentException](Multimodal.decodePpm(3L, "P5\n2 2\n255\n".getBytes ++ new Array[Byte](12)))
    intercept[IllegalArgumentException](Multimodal.decodePpm(4L, "P6\n2 2\n65535\n".getBytes ++ new Array[Byte](12)))
    intercept[IllegalArgumentException](Multimodal.decodePpm(5L, "P6\n2 2\n255\n".getBytes ++ new Array[Byte](5)))
  }

  test("fitWithin preserves aspect and bounds") {
    assert(Multimodal.fitWithin(640, 480, 64) === ((64, 48)))
    assert(Multimodal.fitWithin(480, 640, 64) === ((48, 64)))
    assert(Multimodal.fitWithin(32, 20, 64) === ((32, 20))) // no upscale
    assert(Multimodal.fitWithin(0, 100, 64) === ((0, 0)))
    assert(Multimodal.fitWithin(10000, 1, 64) === ((64, 1)))
  }

  test("decode is deterministic (codec is pure)") {
    val m = media.limit(50)
    val a = Multimodal.decode(m).collect().sortBy(_.doc_id).map(d => (d.doc_id, d.features.toSeq))
    val b = Multimodal.decode(m).collect().sortBy(_.doc_id).map(d => (d.doc_id, d.features.toSeq))
    assert(a.toSeq === b.toSeq)
  }

  // ---- the second codec (WAV RIFF/PCM) + per-row format routing --------

  test("in-plan WAV synthesis equals the driver-side encoder byte for byte") {
    val planBytes = Tables.documents(spark, sf001)
      .select(col("doc_id"), Multimodal.wavPayload(col("text")).as("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val texts = Tables.documents(spark, sf001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && texts.length === planBytes.size)
    texts.foreach { case (id, t) =>
      val expect = Multimodal.wavPayloadBytes(t.getBytes("UTF-8"))
      assert(java.util.Arrays.equals(planBytes(id), expect),
        s"doc $id: the codegen'd WAV payload must equal the Scala encoder's")
    }
  }

  test("the WAV codec PARSES the little-endian chunks: fields match the spec, loud failures") {
    val text = "hello media lake".getBytes("UTF-8")
    val good = Multimodal.wavPayloadBytes(text)
    val d = Multimodal.decodeWav(1L, good)
    assert(d.format === "wav" && d.n_bytes === 44 + text.length)
    assert(d.n_units === text.length && d.sample_rate === 8000)
    assert(d.width === 0 && d.height === 0)
    assert(math.abs(d.features.sum - 1f) < 1e-3)
    // loud failures, one per gated field — never guess
    def corrupt(pos: Int, b: Byte): Array[Byte] = {
      val c = good.clone(); c(pos) = b; c
    }
    intercept[IllegalArgumentException](Multimodal.decodeWav(2L, corrupt(0, 'X'))) // magic
    intercept[IllegalArgumentException](Multimodal.decodeWav(3L, corrupt(4, 99)))  // riff size
    intercept[IllegalArgumentException](Multimodal.decodeWav(4L, corrupt(20, 3))) // non-PCM
    intercept[IllegalArgumentException](Multimodal.decodeWav(5L, corrupt(22, 2))) // stereo
    intercept[IllegalArgumentException](Multimodal.decodeWav(6L, corrupt(34, 16))) // 16-bit
    intercept[IllegalArgumentException](Multimodal.decodeWav(7L, corrupt(40, 99))) // data size
    intercept[IllegalArgumentException](Multimodal.decodeWav(8L, good.dropRight(3))) // truncated
  }

  test("mixed-format decode routes each row by its own magic bytes") {
    val s = spark; import s.implicits._
    val texts = Tables.documents(spark, sf001).select("doc_id", "text").limit(60)
    val mixed = texts.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, Multimodal.ppmPayload(col("text")))
        .otherwise(Multimodal.wavPayload(col("text"))).as("payload"))
    val rows = Multimodal.decodeAuto(mixed).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.doc_id % 2 == 0) {
        assert(r.format === "ppm" && r.sample_rate === 0 && r.width >= 2,
          s"doc ${r.doc_id} must route to the raster codec")
      } else {
        assert(r.format === "wav" && r.sample_rate === 8000 && r.width === 0,
          s"doc ${r.doc_id} must route to the audio codec")
      }
      assert(math.abs(r.features.sum - 1f) < 1e-3,
        "both codecs emit the same normalized 8-bin histogram space")
    }
    // an unknown magic is a loud failure, not a guessed format
    val junk = Seq((9L, Array[Byte](0x42, 0x4d, 1, 2, 3))).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAuto(junk).collect()
    }
    assert(e.getCause != null || e.getMessage.contains("unrecognized magic"))
  }

  test("wav features are the source bytes' top-3-bit histogram, normalized") {
    val t = "some sample bytes 0123".getBytes("UTF-8")
    val w = Multimodal.decodeAny(1L, Multimodal.wavPayloadBytes(t))
    val expect = new Array[Float](8)
    t.foreach(b => expect((b & 0xff) >> 5) += 1f)
    (0 until 8).foreach(j => expect(j) /= t.length.toFloat)
    assert(w.features.toSeq === expect.toSeq,
      "the audio codec shares the raster codec's 8-bin feature space")
  }
}
