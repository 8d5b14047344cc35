package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming token-quota gate (q261's streaming form): the
  * TokenQuotaProcessor must (a) admit in doc_id order within a batch
  * and close the gate mid-batch when the budget line is crossed,
  * (b) carry the running total across a checkpointed restart so a
  * later batch is rejected on arrival, (c) agree exactly with the
  * batch-replay rule q261's oracle computes (running cumsum over all
  * arrivals, admitted iff cum ≤ budget), with token counts from the
  * SHARED TextOps tokenizer — never a spec-local recount.
  */
class StreamTokenQuotaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (source, doc_id, n_tok) rows through the SHARED tokenizer. */
  private def tokRows(docs: Seq[(String, Long, String)]): Seq[(String, Long, Long)] = {
    import spark.implicits._
    docs.toDF("source", "doc_id", "text")
      .select(col("source"), col("doc_id"),
        size(graft.functions.TextOps.words(col("text")))
          .cast("long").as("n_tok"))
      .as[(String, Long, Long)].collect().toSeq
  }

  test("quota gate closes mid-batch, survives restart, equals batch replay") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val Budget = 10L
      // 4-token texts: budget 10 admits exactly the first two per source
      val four = "alpha beta gamma delta"
      val batches: Seq[Seq[(String, Long, String)]] = Seq(
        Seq(("s1", 1L, four), ("s1", 2L, four), ("s2", 3L, four)),
        // doc 4 (cum 12) must be rejected while 5 (s2 cum 8) is admitted;
        // 6 arrives after the s2 line is crossed IN THE SAME batch
        Seq(("s1", 4L, four), ("s2", 5L, four), ("s2", 6L, four)),
        // after a checkpointed restart: both sources stay closed
        Seq(("s1", 7L, four), ("s2", 8L, four)))
      val dir = java.nio.file.Files.createTempDirectory("graft_quota_").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_quota_ck_").toString
      def run(): Seq[(Long, Boolean)] = {
        val seen = java.util.Collections.synchronizedList(
          new java.util.ArrayList[(Long, Boolean)]())
        val src = spark.readStream
          .schema("source STRING, doc_id LONG, n_tok LONG")
          .parquet(dir)
          .as[(String, Long, Long)]
        val out = src.groupByKey(_._1)
          .transformWithState(new TokenQuotaProcessor(Budget),
            TimeMode.None(), OutputMode.Update())
        val q = out.toDF("doc_id", "admitted")
          .writeStream
          .outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            batch.collect().foreach(r =>
              seen.add((r.getLong(0), r.getBoolean(1)))): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        seen.asScala.toSeq
      }
      val emissions = batches.map { b =>
        tokRows(b).toDF("source", "doc_id", "n_tok")
          .coalesce(1).write.mode("append").parquet(dir)
        run()
      }
      val byDoc = emissions.flatten.toMap
      assert(emissions.flatten.length == 8, "one emission per document")
      // batch 1: everything fits
      assert(Seq(1L, 2L, 3L).forall(byDoc(_)), s"batch-1: $byDoc")
      // batch 2: s1 already at 8 -> 4 rejected; s2 at 4 -> 5 admitted
      // (cum 8) and 6 rejected mid-batch (cum 12)
      assert(!byDoc(4L) && byDoc(5L) && !byDoc(6L), s"batch-2: $byDoc")
      // batch 3, after two restarts: both gates stay closed
      assert(!byDoc(7L) && !byDoc(8L), s"restart lost quota state: $byDoc")
      // exact equality with the batch replay of the q261 rule
      val all = batches.zipWithIndex.flatMap { case (b, i) =>
        tokRows(b).map { case (s, d, n) => (s, d, n, i) }
      }
      val expected = all.groupBy(_._1).values.flatMap { rows =>
        var cum = 0L
        rows.sortBy(r => (r._4, r._2)).map { case (_, d, n, _) =>
          cum += n; (d, cum <= Budget)
        }
      }.toMap
      assert(byDoc == expected, "processor diverges from batch replay")
    } finally {
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
