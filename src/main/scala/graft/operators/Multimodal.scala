package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode/feature-extract
  * plumbing.
  *
  * The actual codec step is STUBBED (this environment ships no
  * image/audio libraries): `decodeStub` produces a deterministic fake
  * feature vector from the bytes. The Spark-side contract — schema,
  * per-partition batching, feature shape — is real and tested; a
  * production deployment swaps `decodeStub` for a JNI/codec call with
  * the same signature.
  *
  * Scale design: decode runs inside `mapPartitions`, so each task
  * amortizes (real-world) codec initialization across its whole
  * partition and nothing is ever collected to the driver.
  */
object Multimodal {

  val FeatureDim = 4

  case class MediaRecord(media_id: Long, payload: Array[Byte])
  /** n_bytes is None (NULL) for a NULL payload; features is null for
    * a NULL or EMPTY payload — a histogram RATIO over zero bytes is
    * undefined, and the engines would otherwise disagree on how to
    * spell that (0.0 vs NaN vs NULL). Contract pinned by the
    * adversarial fixture's empty/null rows. */
  case class MediaFeatures(
      media_id: Long,
      n_bytes: Option[Long],
      features: Array[Double])

  /** STUB decoder: a real implementation would hand `bytes` to an image
    * or audio codec and emit model features; this deterministic fake
    * buckets byte values into a normalized 4-bin histogram so the
    * pipeline around it is fully testable. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) / (256 / FeatureDim)) += 1.0
      i += 1
    }
    if (bytes.length > 0) {
      var b = 0
      while (b < FeatureDim) { hist(b) /= bytes.length; b += 1 }
    }
    hist
  }

  /** Batch feature extraction: binary payloads -> fixed-size feature
    * vectors, one codec session per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // real impl: initialize the codec once here, per partition
      records.map { r =>
        if (r.payload == null) MediaFeatures(r.media_id, None, null)
        else if (r.payload.isEmpty)
          MediaFeatures(r.media_id, Some(0L), null)
        else MediaFeatures(r.media_id, Some(r.payload.length.toLong),
          decodeStub(r.payload))
      }
    }
  }

  /** "Resize" stub over a binary payload with (w, h) metadata: halving
    * both dimensions keeps a quarter of the byte budget, and the stub
    * keeps the FIRST new_w x new_h bytes (deterministic,
    * shape-correct). A real implementation decodes, scales, and
    * re-encodes inside the same column contract; everything around
    * the codec — dimension arithmetic, byte budget, content id — is
    * real and oracle-checked (q143). */
  def resizeStub(payload: Column, newW: Column, newH: Column): Column =
    payload.substr(lit(1), (newW * newH).cast(IntegerType))

  /** "Frame sampling" stub over a binary payload: evenly spaced slices,
    * the plumbing a video pipeline needs (offsets/lengths are real,
    * frame decode is not). */
  def sampleFrames(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    val len = octet_length(col(payloadCol))
    val idx = sequence(lit(0), lit(n - 1))
    df.withColumn("frame_offsets",
        transform(idx, i => (i * len / n).cast(LongType)))
      .withColumn("frames",
        transform(idx, i =>
          col(payloadCol).substr((i * len / n).cast(IntegerType) + 1, lit(8))))
  }
}
