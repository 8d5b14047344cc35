package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming CDC upsert apply (q279's streaming form): the
  * CdcApplyProcessor must (a) apply first sightings and in-order
  * changes, (b) tag stale (below the pre-batch high-water mark)
  * changes without letting same-batch changes shadow each other,
  * (c) carry the mark across a checkpointed restart, and (d) agree
  * exactly with the batch-replay rule q279's registry entry (and its
  * oracle) computes.
  */
class CdcApplySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("apply tags stale vs applied per batch, survives restart, equals batch replay") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // (k, seq) change batches, deliberately out of order across
      // batches: k1's seq-10 arrives AFTER its seq-30, k2's seq-5
      // after its seq-10; a same-seq redelivery (k2, 10) must apply
      // (stale is STRICTLY below the mark); k3 first-sights late
      val batches: Seq[Seq[(Long, Long)]] = Seq(
        Seq(1L -> 30L, 2L -> 10L),
        Seq(1L -> 10L, 1L -> 40L, 2L -> 5L),
        Seq(2L -> 10L, 3L -> 1L))
      val dir = graft.TestTmp.dir("graft_cdcapply_")
      val ckpt = graft.TestTmp.dir("graft_cdcapply_ck_")
      def run(): Seq[(Long, Boolean)] = {
        val seen = java.util.Collections.synchronizedList(
          new java.util.ArrayList[(Long, Boolean)]())
        val src = spark.readStream
          .schema("k LONG, seq LONG")
          .parquet(dir)
          .as[(Long, Long)]
        val out = src.groupByKey(_._1)
          .transformWithState(new CdcApplyProcessor,
            TimeMode.None(), OutputMode.Update())
        val q = out.toDF("seq", "stale")
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
        b.toDF("k", "seq").coalesce(1).write.mode("append").parquet(dir)
        run()
      }
      // batch 0: both first sightings apply
      assert(emissions(0).toSet == Set(30L -> false, 10L -> false))
      // batch 1: k1's 10 is stale vs mark 30; k1's 40 applies (compared
      // against the PRE-batch mark 30, not shadowed by same-batch 10);
      // k2's 5 is stale vs mark 10
      assert(emissions(1).toSet ==
        Set(10L -> true, 40L -> false, 5L -> true),
        s"batch-1 emissions: ${emissions(1)}")
      // batch 2 (after two checkpointed restarts): k2's redelivered 10
      // is NOT below its mark 10 → applies; k3's 1 first-sights
      assert(emissions(2).toSet == Set(10L -> false, 1L -> false),
        s"state lost across restart: ${emissions(2)}")
      // (d) exact equality with the batch-replay rule over the same log
      val log = batches.zipWithIndex.flatMap { case (b, i) =>
        b.map { case (k, seq) => (k, seq, i.toLong) }
      }
      val expected = log.map { case (k, seq, b) =>
        val hwm = log.collect {
          case (k2, s2, b2) if k2 == k && b2 < b => s2
        }
        (seq, hwm.nonEmpty && seq < hwm.max)
      }
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
