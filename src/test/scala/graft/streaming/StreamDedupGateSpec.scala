package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming near-dup gate (q251's streaming form): the
  * DedupGateProcessor over MinHash band signatures must (a) flag a
  * later-batch duplicate against its earlier-batch owner, (b) NOT flag
  * same-batch peers (state commits at batch boundaries — the
  * batch-replay semantics q251's oracle checks), (c) carry state
  * across a checkpointed restart, and (d) agree exactly with a
  * brute-force replay of the batch-replay rule over the same band
  * table.
  */
class StreamDedupGateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Band rows through the SHARED q51/q251 kernel — never a spec-local
    * reimplementation of the banding. */
  private def bandRows(docs: Seq[(Long, String)]): Seq[(String, Long)] = {
    import spark.implicits._
    val c = docs.toDF("doc_id", "text")
      .withColumn("sh", graft.functions.TextOps.shingleSet(
        graft.functions.TextOps.words(col("text")), 5))
    graft.operators.DedupQueries.minhashBandTable(c, "doc_id")
      .filter(col("bh").isNotNull)
      .collect()
      .map(r => (s"${r.getAs[Int]("band_idx")}:${r.getAs[String]("bh")}",
        r.getAs[Long]("doc_id"))).toSeq
  }

  test("gate flags cross-batch dups only, survives restart, equals batch replay") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val textA = "alpha beta gamma delta epsilon zeta eta"
      val textB = "one two three four five six seven"
      val textD = "red green blue cyan magenta yellow black"
      val batches: Seq[Seq[(Long, String)]] = Seq(
        Seq(1L -> textA, 2L -> textB),
        Seq(3L -> textA, 4L -> textD, 5L -> textD), // 3 dups 1; 5 dups 4 SAME batch
        Seq(6L -> textB)) // dups 2, two restarts later
      val dir = graft.TestTmp.dir("graft_gate_")
      val ckpt = graft.TestTmp.dir("graft_gate_ck_")
      // one parquet file per micro-batch; each run() consumes the new
      // file as one batch from the same checkpoint (restart per batch)
      def run(): Seq[(Long, Long)] = {
        val seen = java.util.Collections.synchronizedList(
          new java.util.ArrayList[(Long, Long)]())
        val src = spark.readStream
          .schema("band_key STRING, doc_id LONG")
          .parquet(dir)
          .as[(String, Long)]
        val out = src.groupByKey(_._1)
          .transformWithState(new DedupGateProcessor,
            TimeMode.None(), OutputMode.Update())
        val q = out.toDF("doc_id", "first_seen")
          .writeStream
          .outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            batch.collect().foreach(r =>
              seen.add((r.getLong(0), r.getLong(1)))): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        seen.asScala.toSeq
      }
      val emissions = batches.map { b =>
        bandRows(b).toDF("band_key", "doc_id")
          .coalesce(1).write.mode("append").parquet(dir)
        run()
      }
      // batch 1: nothing precedes it
      assert(emissions(0).isEmpty, s"batch-1 flags: ${emissions(0)}")
      // batch 2: doc 3 flagged on all 4 bands against owner 1; the
      // same-batch pair (4, 5) must NOT flag each other
      assert(emissions(1).count(_ == (3L, 1L)) == 4,
        s"doc 3 should hit owner 1 on all 4 bands: ${emissions(1)}")
      assert(!emissions(1).exists(e => e._1 == 4L || e._1 == 5L),
        s"same-batch dup leaked through the gate: ${emissions(1)}")
      // batch 3 (after two checkpointed restarts): doc 6 vs owner 2
      assert(emissions(2).count(_ == (6L, 2L)) == 4,
        s"state lost across restart: ${emissions(2)}")
      // (d) exact equality with the brute-force batch replay over the
      // same shared band table
      val bandTab = batches.zipWithIndex.flatMap { case (b, i) =>
        bandRows(b).map { case (k, d) => (k, d, i) }
      }
      val expected = for {
        (k, d, i) <- bandTab
        earlier = bandTab.filter(t => t._1 == k && t._3 < i)
        if earlier.nonEmpty
      } yield (d, earlier.map(_._2).min)
      assert(emissions.flatten.sorted == expected.sorted,
        "processor emissions diverge from the batch replay")
    } finally {
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
