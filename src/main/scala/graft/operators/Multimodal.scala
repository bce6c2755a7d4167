package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Media decode / feature-extraction plumbing for opaque binary columns,
  * with a REAL (if deliberately small) codec: binary NetPBM P6 ("PPM"),
  * the simplest published raster format — magic, ASCII header tokens,
  * raw RGB planes — extended to multi-frame streams by plain
  * concatenation (the uncompressed-video shape: think y4m without the
  * per-stream header). The container ships no image/audio libraries, so
  * the test corpus's payloads are SYNTHESIZED (deterministically, from
  * the documents table — [[ppmPayload]], an in-plan codegen'd
  * expression, no UDF), but everything downstream of the bytes is a
  * genuine decoder: [[decodePpm]] parses magic/width/height/maxval per
  * frame, walks the frame stream to EOF, histograms actual pixel bytes.
  * A production codec (JNI ffmpeg / javax.imageio) drops in by
  * replacing [[decodePpm]] only — the mapPartitions seam, schema and
  * batch shape stay as they are.
  *
  * Payload format (spec v1, also documented in TESTDATA.md):
  * for a document with n utf-8 bytes, w = h = 2 + (n mod 3),
  * frame pixel size fsz = 3·w², frame count F = n div fsz + 1;
  * the payload is F concatenated P6 frames `P6\n{w} {w}\n255\n` +
  * fsz pixel bytes, whose pixel planes carry the document's bytes in
  * order, zero-padded in the final frame. Pure-ASCII text (asserted by
  * the oracle suite) means pixel bytes are never 0x00 except padding.
  *
  * Binary payloads flow through `mapPartitions` — the Scala analog of
  * Python's `mapInPandas` batch-UDF path — so per-partition codec init
  * (model load, JNI handles) amortizes across the partition's rows
  * exactly like a pandas-batch UDF would.
  */
object Multimodal {

  /** What the decoder returns per payload: typed media metadata (parsed
    * from the bytes, not trusted from any sidecar) + a fixed small
    * feature vector (8-bin pixel-byte histogram — the perceptual-hash /
    * embedding-head stand-in).
    */
  case class Decoded(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                     n_frames: Int, thumb_w: Int, thumb_h: Int, features: Array[Float])

  /** One parsed frame: its index, its offset in the DECODED pixel
    * stream (frame_idx · fsz — where its pixels sit in the logical
    * media), its pixel byte count, the count of live (non-padding)
    * bytes, the md5 fingerprint of those live bytes, and the "ink"
    * feature (pixel bytes that are neither padding nor 0x20 space —
    * the 1-D luminance stand-in the scene-cut detector differences).
    */
  case class Frame(doc_id: Long, frame_idx: Int, frame_off: Long,
                   frame_len: Int, n_live: Int, frame_digest: String, ink: Int)

  /** Aspect-preserving fit of (w, h) into a maxSide×maxSide box — the
    * resize arithmetic a real thumbnailer applies.
    */
  def fitWithin(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    if (w <= 0 || h <= 0) (0, 0)
    else if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toDouble * maxSide / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxSide / h).toInt), maxSide)
  }

  /** The multi-frame P6 payload as an IN-PLAN column over utf-8 text —
    * codegen'd catalyst expressions end to end (aggregate over the
    * frame sequence, binary concat, byte-substring, zero rpad): the
    * synthesis side of the codec seam, no UDF, no driver loop.
    */
  def ppmPayload(textCol: Column): Column = {
    val tb = encode(textCol, "utf-8")
    val n = octet_length(tb)
    val w = lit(2) + pmod(n, lit(3))
    val fsz = lit(3) * w * w
    val nf = expr("1").cast("int") + (n.cast("long") / fsz.cast("long")).cast("int")
    val header = encode(
      concat(lit("P6\n"), w.cast("string"), lit(" "), w.cast("string"), lit("\n255\n")),
      "utf-8")
    // frame i = header ++ rpad(text[i·fsz, fsz), fsz, 0x00); payload =
    // fold over 0..F-1 (aggregate keeps it one codegen'd expression)
    aggregate(
      sequence(lit(0), nf - 1),
      lit(Array.emptyByteArray),
      (acc, i) => concat(acc, header,
        call_function("rpad",
          call_function("substring", tb, (i * fsz + 1).cast("int"), fsz),
          fsz, lit(Array[Byte](0)))))
  }

  /** Driver-side twin of [[ppmPayload]] (request-path encoding, e.g.
    * the probe document of a serving flow). MultimodalSpec asserts the
    * two produce identical bytes for every corpus document.
    */
  def ppmPayloadBytes(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val w = 2 + n % 3
    val fsz = 3 * w * w
    val nf = n / fsz + 1
    val header = s"P6\n$w $w\n255\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream((header.length + fsz) * nf)
    var i = 0
    while (i < nf) {
      out.write(header)
      val from = i * fsz
      val live = math.max(0, math.min(fsz, n - from))
      out.write(text, from, live)
      var p = live
      while (p < fsz) { out.write(0); p += 1 }
      i += 1
    }
    out.toByteArray
  }

  /** Unified row for MIXED-format media (the per-row routing seam): the
    * fields a raster decode fills (width/height, n_units = frames) and
    * an audio decode fills (sample_rate, n_units = samples) coexist,
    * each format zeroing the other's; features are the SAME 8-bin
    * top-3-bits byte histogram for both, so downstream similarity ops
    * work across formats unchanged.
    */
  case class DecodedAv(doc_id: Long, format: String, n_bytes: Int, n_units: Int,
                       width: Int, height: Int, sample_rate: Int,
                       features: Array[Float])

  // ---- the second codec: WAV (RIFF little-endian PCM) ------------------
  // Prove the decode seam is codec-agnostic, not P6-shaped: WAV's header
  // is BINARY little-endian chunk structure (magic + sized chunks +
  // packed fmt fields), a wholly different parsing discipline from P6's
  // whitespace-separated ASCII tokens.
  //
  // Payload format (spec wav-v1, also in TESTDATA.md): the document's n
  // utf-8 bytes as 8-bit unsigned mono PCM at 8 kHz behind the 44-byte
  // canonical header — "RIFF" le32(36+n) "WAVE" "fmt " le32(16)
  // le16(1 = PCM) le16(1 ch) le32(8000 rate) le32(8000 byte-rate)
  // le16(1 block-align) le16(8 bits) "data" le32(n).

  private val WavSampleRate = 8000

  private def hexByteCol(b: Column): Column =
    lpad(hex(b.cast("int")), 2, "0")

  /** `width`-byte little-endian binary of an int column — unhex over
    * per-byte hex pairs, codegen'd end to end (no UDF).
    */
  private def leBytes(v: Column, width: Int): Column =
    unhex(concat((0 until width).map(i =>
      hexByteCol(pmod(shiftright(v.cast("long"), 8 * i), lit(256L)))): _*))

  /** The WAV payload as an IN-PLAN column over utf-8 text — the audio
    * twin of [[ppmPayload]], same no-UDF discipline.
    */
  def wavPayload(textCol: Column): Column = {
    val tb = encode(textCol, "utf-8")
    val n = octet_length(tb)
    concat(
      encode(lit("RIFF"), "utf-8"), leBytes(n + 36, 4),
      encode(lit("WAVEfmt "), "utf-8"), leBytes(lit(16), 4),
      leBytes(lit(1), 2), leBytes(lit(1), 2),
      leBytes(lit(WavSampleRate), 4), leBytes(lit(WavSampleRate), 4),
      leBytes(lit(1), 2), leBytes(lit(8), 2),
      encode(lit("data"), "utf-8"), leBytes(n, 4),
      tb)
  }

  /** Driver-side twin of [[wavPayload]] (request-path encoding).
    * MultimodalSpec asserts byte equality against the in-plan column.
    */
  def wavPayloadBytes(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val out = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
    out.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1).putShort(1).putInt(WavSampleRate).putInt(WavSampleRate)
    out.putShort(1).putShort(8)
    out.put("data".getBytes("US-ASCII")).putInt(n)
    out.put(text)
    out.array()
  }

  private def le(payload: Array[Byte], pos: Int, width: Int, what: String): Int = {
    require(pos + width <= payload.length, s"WAV parse: truncated $what at byte $pos")
    var v = 0
    var i = width - 1
    while (i >= 0) { v = (v << 8) | (payload(pos + i) & 0xff); i -= 1 }
    v
  }

  private def requireMagic(payload: Array[Byte], pos: Int, magic: String): Unit = {
    val m = magic.getBytes("US-ASCII")
    require(pos + m.length <= payload.length
        && m.indices.forall(i => payload(pos + i) == m(i)),
      s"WAV parse: expected '$magic' at byte $pos")
  }

  /** REAL RIFF/WAVE parse: magic chain, chunk sizes cross-checked
    * against the physical length, fmt fields gated (PCM, mono, 8-bit —
    * the maxval-255 analog), then the sample bytes histogram. Malformed
    * bytes fail loudly, like [[decodePpm]].
    */
  def decodeWav(id: Long, payload: Array[Byte]): DecodedAv = {
    requireMagic(payload, 0, "RIFF")
    val riffLen = le(payload, 4, 4, "RIFF size")
    require(riffLen + 8 == payload.length,
      s"WAV parse: RIFF size $riffLen + 8 != physical ${payload.length}")
    requireMagic(payload, 8, "WAVE")
    requireMagic(payload, 12, "fmt ")
    val fmtLen = le(payload, 16, 4, "fmt size")
    require(fmtLen == 16, s"WAV parse: unsupported fmt chunk size $fmtLen")
    val audioFormat = le(payload, 20, 2, "audio format")
    require(audioFormat == 1, s"WAV parse: unsupported audio format $audioFormat (PCM only)")
    val channels = le(payload, 22, 2, "channels")
    require(channels == 1, s"WAV parse: unsupported channel count $channels (mono only)")
    val rate = le(payload, 24, 4, "sample rate")
    val bits = le(payload, 34, 2, "bits per sample")
    require(bits == 8, s"WAV parse: unsupported bit depth $bits (8-bit only)")
    requireMagic(payload, 36, "data")
    val dataLen = le(payload, 40, 4, "data size")
    require(44 + dataLen == payload.length,
      s"WAV parse: data size $dataLen leaves ${payload.length - 44} physical sample bytes")
    val hist = new Array[Float](8)
    var p = 44
    while (p < payload.length) { hist((payload(p) & 0xff) >> 5) += 1f; p += 1 }
    if (dataLen > 0) {
      var j = 0
      while (j < 8) { hist(j) /= dataLen.toFloat; j += 1 }
    }
    DecodedAv(id, "wav", payload.length, n_units = dataLen,
      width = 0, height = 0, sample_rate = rate, features = hist)
  }

  /** Route ONE payload by its own bytes (never a trusted sidecar
    * column): P6 magic → the raster codec, RIFF magic → the audio
    * codec, anything else a loud failure.
    */
  def decodeAny(id: Long, payload: Array[Byte]): DecodedAv =
    if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6') {
      val d = decodePpm(id, payload)
      DecodedAv(id, "ppm", d.n_bytes, n_units = d.n_frames,
        width = d.width, height = d.height, sample_rate = 0, features = d.features)
    } else if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I'
               && payload(2) == 'F' && payload(3) == 'F') {
      decodeWav(id, payload)
    } else throw new IllegalArgumentException(
      s"media decode: unrecognized magic for doc $id " +
        s"(${payload.take(4).map(b => f"${b & 0xff}%02x").mkString(" ")})")

  /** MIXED-format partition-wise decode — the per-row routing seam: one
    * pass, each row dispatched by its own magic bytes to its codec,
    * unified [[DecodedAv]] rows out. A third format is one more magic
    * branch; the mapPartitions seam, schema and batch shape never move.
    */
  def decodeAuto(media: DataFrame): Dataset[DecodedAv] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => decodeAny(id, bytes) })
  }

  // ---- the decoder ----------------------------------------------------

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'

  /** Parse one ASCII unsigned int token at `pos` (after skipping
    * whitespace); returns (value, next position).
    */
  private def parseInt(payload: Array[Byte], pos0: Int, what: String): (Int, Int) = {
    var pos = pos0
    while (pos < payload.length && isWs(payload(pos))) pos += 1
    val start = pos
    var v = 0
    while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
      v = v * 10 + (payload(pos) - '0'); pos += 1
    }
    require(pos > start, s"PPM parse: expected $what at byte $start")
    (v, pos)
  }

  /** REAL P6 parse of one frame starting at `pos`: magic, width,
    * height, maxval (must be 255), the single whitespace the spec
    * mandates before the raster, then w·h·3 raw bytes. Returns
    * (w, h, pixelStart, nextFrameStart).
    */
  private def parseFrameHeader(payload: Array[Byte], pos: Int): (Int, Int, Int, Int) = {
    require(pos + 2 <= payload.length && payload(pos) == 'P' && payload(pos + 1) == '6',
      s"PPM parse: bad magic at byte $pos")
    val (w, p1) = parseInt(payload, pos + 2, "width")
    val (h, p2) = parseInt(payload, p1, "height")
    val (maxval, p3) = parseInt(payload, p2, "maxval")
    require(maxval == 255, s"PPM parse: unsupported maxval $maxval (8-bit only)")
    require(p3 < payload.length && isWs(payload(p3)),
      s"PPM parse: expected single whitespace before raster at byte $p3")
    val pixelStart = p3 + 1
    val fsz = 3 * w * h
    require(pixelStart + fsz <= payload.length,
      s"PPM parse: truncated raster (need $fsz bytes at $pixelStart of ${payload.length})")
    (w, h, pixelStart, pixelStart + fsz)
  }

  /** Decode a full multi-frame P6 payload: parse every frame header,
    * histogram all pixel bytes (8 bins on the top 3 bits, normalized to
    * FLOAT — the feature sketch), thumbnail arithmetic from the PARSED
    * dimensions. Malformed bytes fail loudly — a codec that guesses is
    * worse than none.
    */
  def decodePpm(id: Long, payload: Array[Byte]): Decoded = {
    val hist = new Array[Float](8)
    var pos = 0
    var frames = 0
    var w0 = 0
    var h0 = 0
    var npix = 0L
    while (pos < payload.length) {
      val (w, h, pixelStart, next) = parseFrameHeader(payload, pos)
      require(frames == 0 || (w == w0 && h == h0),
        s"PPM parse: frame $frames changed dimensions ($w0 x $h0 -> $w x $h)")
      w0 = w; h0 = h
      var p = pixelStart
      while (p < next) { hist((payload(p) & 0xff) >> 5) += 1f; p += 1 }
      npix += next - pixelStart
      frames += 1
      pos = next
    }
    if (npix > 0) {
      var j = 0
      while (j < 8) { hist(j) /= npix.toFloat; j += 1 }
    }
    val (tw, th) = fitWithin(w0, h0, 64)
    Decoded(id, payload.length, width = w0, height = h0,
      n_frames = frames, thumb_w = tw, thumb_h = th, features = hist)
  }

  /** Per-frame decode of one payload: live bytes = the raster minus its
    * zero padding (pixel bytes are never 0x00 outside padding — ASCII
    * sources; a real sensor codec would carry an explicit length),
    * fingerprint = md5 of the live bytes, ink = non-space live bytes.
    */
  def decodePpmFrames(id: Long, payload: Array[Byte]): Seq[Frame] = {
    val out = Seq.newBuilder[Frame]
    var pos = 0
    var idx = 0
    var off = 0L
    while (pos < payload.length) {
      val (w, h, pixelStart, next) = parseFrameHeader(payload, pos)
      val fsz = 3 * w * h
      var live = fsz
      while (live > 0 && payload(pixelStart + live - 1) == 0) live -= 1
      var ink = 0
      var p = pixelStart
      while (p < pixelStart + live) {
        if (payload(p) != ' '.toByte) ink += 1
        p += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(payload, pixelStart, live)
      val digest = md.digest().map("%02x".format(_)).mkString
      out += Frame(id, idx, off, fsz, live, digest, ink)
      idx += 1
      off += fsz
      pos = next
    }
    out.result()
  }

  /** Decode a (doc_id, payload) table partition-wise. One decoder
    * instance per partition, streamed over its rows — no per-row setup,
    * no driver collection.
    */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    // NOTE: decode parallelism comes from the media table's FILE LAYOUT
    // (the artifact is written in parallelism-many files — guide §6),
    // never from a repartition here: the scaling certificate's contract
    // is that decode is map-side with shuffle NOT growing in the corpus
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (amortized, like
        // mapInPandas' per-batch state)
        it.map { case (id, bytes) => decodePpm(id, bytes) }
      }
  }

  /** Frame-level decode of a (doc_id, payload) table — the explode
    * shape of a video pipeline, frames-per-asset bounded by the max
    * payload size, never a driver loop.
    */
  def decodeFrames(media: DataFrame): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) => decodePpmFrames(id, bytes) })
  }
}
