package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Media decode / feature-extraction plumbing for opaque binary columns.
  *
  * The decode itself is a deterministic STUB (this environment ships no
  * image/audio codecs); everything around it is the real distributed
  * shape: binary payloads flow through `mapPartitions` — the Scala
  * analog of Python's `mapInPandas` batch-UDF path — so a real codec
  * drops in by replacing [[decodeStub]] only. Per-partition iterator
  * processing amortizes codec init (model load, JNI handles) across the
  * partition's rows exactly like a pandas-batch UDF would.
  */
object Multimodal {

  /** What a decoder returns per payload: typed media metadata + a fixed
    * small feature vector (e.g. a perceptual hash / embedding head).
    */
  case class Decoded(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                     n_frames: Int, thumb_w: Int, thumb_h: Int, features: Array[Float])

  /** Aspect-preserving fit of (w, h) into a maxSide×maxSide box — the
    * resize arithmetic a real thumbnailer applies (the pixel work is the
    * codec stub's concern).
    */
  def fitWithin(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    if (w <= 0 || h <= 0) (0, 0)
    else if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toDouble * maxSide / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxSide / h).toInt), maxSide)
  }

  /** Deterministic fake codec: "dimensions" derived from payload length,
    * "features" a 8-dim byte-histogram sketch. Replace with a real codec
    * (JNI ffmpeg / javax.imageio) for production — signature unchanged.
    */
  def decodeStub(id: Long, payload: Array[Byte]): Decoded = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < 8) { hist(j) /= payload.length.toFloat; j += 1 }
    }
    val w = payload.length % 640
    val h = payload.length % 480
    val (tw, th) = fitWithin(w, h, 64)
    Decoded(id, payload.length, width = w, height = h,
      n_frames = payload.length % 16 + 1, thumb_w = tw, thumb_h = th, features = hist)
  }

  /** Decode a (id, payload) table partition-wise. Input columns:
    * (doc_id LONG, payload BINARY). One decoder instance per partition,
    * streamed over its rows — no per-row setup, no driver collection.
    */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (amortized, like
        // mapInPandas' per-batch state)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}
