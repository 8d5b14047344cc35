package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

case class Ev(user_id: Long, ts: Timestamp, value: Double)
case class UserMax(user_id: Long, max_value: Double)

/** Streaming semantics the DuckDB oracle cannot check: count-batched
  * file sink (reference: batch_writer_consumer.py:8,63-83), session
  * windows, watermark late-data handling, and custom state via
  * mapGroupsWithState (SURVEY §2.7).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("count-batched csv writer: 2000-row files incl. final partial flush") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Long]
    ms.addData(1L to 4500L: _*)
    val out = java.nio.file.Files.createTempDirectory("graft_bw_").toString
    val q = BatchWriter.writeCountBatches(
      ms.toDF().withColumnRenamed("value", "event_id"), out)
    q.awaitTermination()
    // the reference's running message counter (batch_writer_consumer.py:
    // 43-44) -> StreamingQueryProgress.numInputRows
    assert(q.recentProgress.map(_.numInputRows).sum == 4500)
    def csvFiles() = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .map(_.toFile).filter(_.getName.endsWith(".csv")).toSeq
    }
    // 4500 rows at <=2000/file = 2000 + 2000 + 500, mirroring the
    // reference's batch_0.csv/batch_1.csv/final partial batch
    assert(csvFiles().length == 3)
    val counts = csvFiles().map { f =>
      val src = scala.io.Source.fromFile(f)
      try src.getLines().size - 1 finally src.close() // minus header
    }.sorted
    assert(counts == Seq(500, 2000, 2000))
    def readAll() = spark.read
      .option("header", "true").option("recursiveFileLookup", "true").csv(out)
    assert(readAll().count() == 4500)

    // exactly-once leg 1: re-running against the same checkpoint must
    // not duplicate output (offsets already committed; this is what
    // replaces the reference's consumer-group offset commits)
    val q2 = BatchWriter.writeCountBatches(
      ms.toDF().withColumnRenamed("value", "event_id"), out)
    q2.awaitTermination()
    assert(readAll().count() == 4500)

    // exactly-once leg 2: a batch retried after a mid-write crash (files
    // on disk, checkpoint commit missing) overwrites its own batch=<id>
    // directory instead of appending — simulate by deleting the commit
    // marker for the last batch and re-running
    val commitDir = new java.io.File(s"$out/_checkpoint/commits")
    val commits = commitDir.listFiles
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    // remove the Hadoop checksum shadow too, else the re-created commit
    // trips ChecksumFileSystem's create(overwrite=false)
    new java.io.File(commitDir, s".${commits.last.getName}.crc").delete()
    commits.last.delete()
    val q3 = BatchWriter.writeCountBatches(
      ms.toDF().withColumnRenamed("value", "event_id"), out)
    q3.awaitTermination()
    assert(readAll().count() == 4500)
  }

  test("session_window merges events within the gap, splits across it") {
    import spark.implicits._
    val df = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 1.0),
      Ev(1, ts("2024-01-01 00:05:00"), 2.0), // same session (gap 5m < 10m)
      Ev(1, ts("2024-01-01 01:00:00"), 3.0), // new session
      Ev(2, ts("2024-01-01 00:00:00"), 4.0)).toDF()
    val sessions = df
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("user_id"), col("n"), col("v"))
      .as[(Long, Long, Double)].collect().toSet
    assert(sessions == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }

  test("watermark drops late data in append-mode windowed aggregation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val agg = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("user_id"), col("n"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("wm_test")
      .start()
    // batch 1: two on-time events + one far ahead that pushes the
    // watermark to 00:50
    ms.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 1.0),
      Ev(1, ts("2024-01-01 00:05:00"), 1.0),
      Ev(1, ts("2024-01-01 01:00:00"), 1.0))
    q.processAllAvailable()
    // batch 2: a late event (00:01 < watermark 00:50) must be dropped;
    // 02:00 advances the watermark so the 01:00 window finalizes
    ms.addData(
      Ev(1, ts("2024-01-01 00:01:00"), 1.0),
      Ev(1, ts("2024-01-01 02:00:00"), 1.0))
    q.processAllAvailable()
    // one more batch so closed windows flush
    ms.addData(Ev(1, ts("2024-01-01 03:00:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val emitted: Map[(String, Long), Long] = spark.table("wm_test")
      .as[(Timestamp, Long, Long)].collect()
      .map { case (w, u, n) => (w.toString, u) -> n }.toMap
    // the 00:00 window holds exactly the 2 on-time events — the late
    // 00:01 arrival did not reopen it
    assert(emitted.get(("2024-01-01 00:00:00.0", 1L)).contains(2L))
    assert(emitted.get(("2024-01-01 01:00:00.0", 1L)).contains(1L))
  }

  test("stream-stream inner join within event-time bounds") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val errors = MemoryStream[Ev]
    val c = clicks.toDF().withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val e = errors.toDF().withWatermark("ts", "1 hour")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    // error joined to clicks at most 30 minutes before it
    val joined = e.join(c,
      col("e_user") === col("c_user") &&
        col("c_ts") <= col("e_ts") &&
        col("c_ts") >= col("e_ts") - expr("INTERVAL 30 minutes"))
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_test")
      .start()
    clicks.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1.0),
      Ev(1, ts("2024-01-01 09:00:00"), 1.0), // too old for the error
      Ev(2, ts("2024-01-01 10:10:00"), 1.0))
    errors.addData(Ev(1, ts("2024-01-01 10:20:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_test")
      .select(col("e_user"), col("c_ts")).as[(Long, Timestamp)].collect()
    // only the 10:00 click of user 1 is within [09:50, 10:20]
    assert(rows.toSeq == Seq((1L, ts("2024-01-01 10:00:00"))))
  }

  test("streaming dedup with dropDuplicatesWithinWatermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val deduped = ms.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id")
    val q = deduped.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_test")
      .start()
    ms.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1.0),
      Ev(1, ts("2024-01-01 10:05:00"), 2.0), // dup within watermark
      Ev(2, ts("2024-01-01 10:00:00"), 3.0))
    q.processAllAvailable()
    ms.addData(Ev(1, ts("2024-01-01 10:10:00"), 4.0)) // still within
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_test").as[Ev].collect()
    assert(out.map(_.user_id).sorted.toSeq == Seq(1L, 2L))
    assert(out.find(_.user_id == 1).get.value == 1.0) // first kept
  }


  test("full cross-batch redelivery reduces to the exact unique answer") {
    // the q117 semantics: an at-least-once transport redelivers a whole
    // earlier batch within the watermark horizon; dedup state must
    // absorb the replay and pass through only genuinely new events
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val deduped = ms.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id")
    val q = deduped.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("redeliver_test")
      .start()
    ms.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1.0),
      Ev(2, ts("2024-01-01 10:05:00"), 2.0))
    q.processAllAvailable()
    ms.addData( // batch 2: full replay of batch 1 + one new event
      Ev(1, ts("2024-01-01 10:00:00"), 1.0),
      Ev(2, ts("2024-01-01 10:05:00"), 2.0),
      Ev(3, ts("2024-01-01 10:30:00"), 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("redeliver_test").as[Ev].collect()
    assert(out.map(_.user_id).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("mapGroupsWithState keeps running per-user max across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val updateFn: (Long, Iterator[Ev], GroupState[Double]) => UserMax =
      (user, evs, state) => {
        val prev = state.getOption.getOrElse(Double.MinValue)
        val mx = (Iterator.single(prev) ++ evs.map(_.value)).max
        state.update(mx)
        UserMax(user, mx)
      }
    val result = ms.toDS()
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateFn)
    val q = result.writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("state_test")
      .start()
    ms.addData(Ev(1, ts("2024-01-01 00:00:00"), 5.0),
      Ev(2, ts("2024-01-01 00:00:00"), 7.0))
    q.processAllAvailable()
    ms.addData(Ev(1, ts("2024-01-01 00:01:00"), 9.0),
      Ev(2, ts("2024-01-01 00:01:00"), 3.0))
    q.processAllAvailable()
    q.stop()
    // the running max is monotonic, so the per-user max over all
    // emitted updates equals the final state
    val finalMax = spark.table("state_test").as[UserMax].collect()
      .groupBy(_.user_id)
      .map { case (u, rows) => u -> rows.map(_.max_value).max }
    assert(finalMax == Map(1L -> 9.0, 2L -> 7.0))
  }

  test("transformWithState state survives a checkpointed restart") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_tws_").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
      def writeFile(n: Int, rows: Seq[(Long, Long)]): Unit =
        rows.toDF("user_id", "cents").coalesce(1)
          .write.mode("append").parquet(dir)
      // the memory sink refuses checkpoint recovery, so observe the
      // restarted query through foreachBatch (which supports it)
      def run(): Map[Long, (Long, Long)] = {
        val seen = new java.util.concurrent.ConcurrentHashMap[
          Long, (Long, Long)]()
        val src = spark.readStream
          .schema("user_id LONG, cents LONG")
          .parquet(dir)
          .as[(Long, Long)]
        val out = src.groupByKey(_._1)
          .transformWithState(new UserSpendProcessor,
            TimeMode.None(), OutputMode.Update())
        val q = out.toDF("user_id", "n_events", "spend_cents")
          .writeStream
          .outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            batch.collect().foreach(r =>
              seen.put(r.getLong(0), (r.getLong(1), r.getLong(2))))
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        seen.asScala.toMap
      }
      writeFile(1, Seq((1L, 100L), (1L, 50L), (2L, 10L)))
      val first = run()
      assert(first == Map(1L -> (2L, 150L), 2L -> (1L, 10L)))
      // restart from the SAME checkpoint with one more file: only the
      // new file is processed, and the counters continue from state
      writeFile(2, Seq((1L, 1L), (3L, 7L)))
      val second = run()
      // the restarted query's update-mode output only holds the keys
      // touched by the new batch — with state carried over
      assert(second == Map(1L -> (3L, 151L), 3L -> (1L, 7L)),
        s"state did not carry across restart: $second")
    } finally {
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  /** Run `body` with the RocksDB state-store provider (required by
    * transformWithState), restoring the previous provider after. */
  private def withRocksDB[A](body: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally {
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("ListState buffer survives a checkpointed restart") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import spark.implicits._
    withRocksDB {
      val dir = java.nio.file.Files.createTempDirectory("graft_tws_ls_").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_ls_").toString
      def writeFile(rows: Seq[(Long, Long, Long)]): Unit =
        rows.toDF("user_id", "ts_us", "event_id").coalesce(1)
          .write.mode("append").parquet(dir)
      // run one AvailableNow leg; returns (user, rnk) -> (event_id, ts_us)
      // for every row emitted during THIS leg only
      def run(): Map[(Long, Long), (Long, Long)] = {
        val seen = new java.util.concurrent.ConcurrentHashMap[
          (Long, Long), (Long, Long)]()
        val src = spark.readStream
          .schema("user_id LONG, ts_us LONG, event_id LONG")
          .parquet(dir)
          .as[(Long, Long, Long)]
        val out = src.groupByKey(_._1)
          .transformWithState(new LastEventsProcessor,
            TimeMode.None(), OutputMode.Update())
        val q = out.toDF("user_id", "rnk", "event_id", "ts_us")
          .writeStream
          .outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            batch.collect().foreach(r =>
              seen.put((r.getLong(0), r.getLong(1)),
                (r.getLong(2), r.getLong(3))))
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        seen.asScala.toMap
      }
      writeFile(Seq((1L, 400L, 4L), (1L, 300L, 3L), (1L, 200L, 2L),
        (1L, 100L, 1L)))
      val first = run()
      assert(first == Map((1L, 1L) -> (4L, 400L), (1L, 2L) -> (3L, 300L),
        (1L, 3L) -> (2L, 200L)))
      // restart against the SAME checkpoint: the new events must merge
      // into the buffer carried in ListState — a lost buffer would rank
      // (350,5) first and surface (50,6), never (400,4)/(300,3)
      writeFile(Seq((1L, 350L, 5L), (1L, 50L, 6L)))
      val second = run()
      assert(second == Map((1L, 1L) -> (4L, 400L), (1L, 2L) -> (5L, 350L),
        (1L, 3L) -> (3L, 300L)),
        s"ListState buffer did not carry across restart: $second")
    }
  }

  test("event-time timers and their state survive a checkpointed restart") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import spark.implicits._
    withRocksDB {
      val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val prevNd = spark.conf.get(ndKey)
      // timers fire in the terminal no-data batch (watermark advance)
      spark.conf.set(ndKey, "true")
      try {
        val dir = java.nio.file.Files.createTempDirectory("graft_tws_tm_").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_tm_").toString
        val T0 = 1000000000000L // fixed epoch ms; determinism per the no-wall-clock rule
        val Gap = 30L * 60 * 1000
        def writeFile(rows: Seq[(Long, Long)]): Unit =
          rows.toDF("user_id", "ms")
            .select(col("user_id"), timestamp_millis(col("ms")).as("ets"))
            .coalesce(1).write.mode("append").parquet(dir)
        def run(): Map[Long, (Long, Long)] = {
          val seen = new java.util.concurrent.ConcurrentHashMap[
            Long, (Long, Long)]()
          val src = spark.readStream
            .schema("user_id LONG, ets TIMESTAMP")
            .parquet(dir)
            .withWatermark("ets", "1 second")
            .select(col("user_id"), unix_millis(col("ets")).as("ms"))
            .as[(Long, Long)]
          val out = src.groupByKey(_._1)
            .transformWithState(new InactivityTimerProcessor,
              TimeMode.EventTime(), OutputMode.Update())
          val q = out.toDF("user_id", "last_ms", "expiry_ms")
            .writeStream
            .outputMode("update")
            .foreachBatch { (batch: org.apache.spark.sql.Dataset[
                org.apache.spark.sql.Row], _: Long) =>
              batch.collect().foreach(r =>
                seen.put(r.getLong(0), (r.getLong(1), r.getLong(2))))
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          import scala.jdk.CollectionConverters._
          seen.asScala.toMap
        }
        // leg 1: user 1 at T0 registers a timer at T0+30min; the leg's
        // terminal watermark is T0-1s, so nothing fires yet
        writeFile(Seq((1L, T0)))
        val first = run()
        assert(first.isEmpty, s"timer fired before its expiry: $first")
        // leg 2 restart: user 2 at T0+40min pushes the watermark past
        // user 1's pending timer — the timer AND the last_seen value it
        // emits from must both have survived the restart
        writeFile(Seq((2L, T0 + 40 * 60 * 1000)))
        val second = run()
        assert(second == Map(1L -> (T0, T0 + Gap)),
          s"timer/state did not carry across restart: $second")
      } finally spark.conf.set(ndKey, prevNd)
    }
  }

  test("q197 transformWithState equals batch agg; provider conf restored") {
    val dir = "/root/testdata/sf0.001"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    val got = graft.Queries.queries("q197_transform_with_state")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(spark.conf.getOption(providerKey) == before,
      "state-store provider conf leaked out of q197")
    import org.apache.spark.sql.functions._
    val batch = graft.Tables.load(graft.Tables.tuned(spark), dir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("c"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == batch)
  }
}
