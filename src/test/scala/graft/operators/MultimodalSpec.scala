package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decodeStub: deterministic normalized histogram") {
    val bytes = Array[Byte](0, 1, 64, 127, -128, -1) // buckets 0,0,1,1,2,3
    val f = Multimodal.decodeStub(bytes)
    assert(f.length == Multimodal.FeatureDim)
    assert(math.abs(f.sum - 1.0) < 1e-9)
    assert(f.toSeq == Multimodal.decodeStub(bytes).toSeq) // deterministic
    assert(Multimodal.decodeStub(Array.empty[Byte]).toSeq ==
      Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("extractFeatures: schema, row preservation, feature shape") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "hello world".getBytes("UTF-8")),
      Multimodal.MediaRecord(2L, Array.empty[Byte]),
      Multimodal.MediaRecord(3L, Array.fill[Byte](1000)(42))).toDS()
    val out = Multimodal.extractFeatures(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(out.size == 3)
    assert(out(1L).n_bytes == 11)
    // byte 42 -> bucket 42/64 = 0, so the whole mass is in bin 0
    assert(out(3L).features.toSeq == Seq(1.0, 0.0, 0.0, 0.0))
    assert(out.values.forall(_.features.length == Multimodal.FeatureDim))
  }

  test("sampleFrames: n evenly spaced offsets within payload") {
    import spark.implicits._
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("id", "payload")
    val out = Multimodal.sampleFrames(df, "payload", 4)
      .select(col("frame_offsets"), col("frames")).head()
    val offsets = out.getSeq[Long](0)
    assert(offsets == Seq(0L, 6L, 13L, 19L))
    val frames = out.getSeq[String](1)
    assert(frames.length == 4)
    assert(frames.head.startsWith("abcdefgh"))
  }
}
