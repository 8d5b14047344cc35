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
    assert(out(1L).n_bytes.contains(11L))
    // byte 42 -> bucket 42/64 = 0, so the whole mass is in bin 0
    assert(out(3L).features.toSeq == Seq(1.0, 0.0, 0.0, 0.0))
    // empty payload: byte count 0, features NULL (a ratio over zero
    // bytes is undefined — the round-12 contract)
    assert(out(2L).n_bytes.contains(0L) && out(2L).features == null)
    assert(out.values.filter(_.features != null)
      .forall(_.features.length == Multimodal.FeatureDim))
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

  test("q234 planted pairs: identical images flag as cross-modal dups, re-imaged captions do not") {
    import spark.implicits._
    // three identical captions (ids 1,2,3; canonical = 1) + one unique;
    // image space: vec 2 IS vec 1 (true duplicate sample), vec 3 is
    // orthogonal (same caption RE-IMAGED — a distinct sample to keep)
    val dim = 64
    val vA = Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val vB = Array.tabulate(dim)(i => if (i == 1) 1.0f else 0.0f)
    val tmp = java.nio.file.Files.createTempDirectory("q234corpus").toString
    Seq(
      (1L, "the cat sat", "en", "s1", 0L),
      (2L, "the cat sat", "en", "s1", 0L),
      (3L, "the cat sat", "en", "s1", 0L),
      (4L, "entirely different words", "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    Seq((1L, vA.toSeq, 0), (2L, vA.toSeq, 0), (3L, vB.toSeq, 0),
      (4L, vB.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.Queries.registry
      .find(_.name == "q234_cross_modal_dedup").get
      .build(spark, tmp).collect()
      .map(r => (r.getAs[Long]("canon_id"), r.getAs[Long]("dup_id")) ->
        ((r.getAs[Double]("img_sim"), r.getAs[Long]("cross_modal_dup"))))
      .toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L)),
      s"unexpected pair set: ${got.keySet}")
    assert(got((1L, 2L)) == ((1.0, 1L)), "identical image must flag")
    val (sim13, flag13) = got((1L, 3L))
    assert(sim13 == 0.0 && flag13 == 0L,
      "orthogonal re-imaged caption must NOT flag")
  }
}
