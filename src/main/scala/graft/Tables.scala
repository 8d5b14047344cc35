package graft

import org.apache.spark.sql.{functions, types, DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata layout
  * (TESTDATA.md / FIXTURES.md §B): one parquet file per table under an
  * sf directory (`region nation customer supplier part orders lineitem
  * events documents embeddings`).
  *
  * The reference engine reads its one table as a multi-file CSV directory
  * scan with an explicit schema (reference: pyspark_app/
  * spark_model_trainer.py:183-197); here every scan is a parquet scan so
  * Catalyst gets column pruning + predicate pushdown for free.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  private val rowCountMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Row count of a fixture table, for sizing shuffles from the
    * MEASURED input (ShufflePlan.dedupParts). DataFrame.count() on a
    * bare parquet scan is cheap — an empty-projection scan answered
    * from row-group counts — but it is still a real Spark job, and it
    * would otherwise re-run at every plan build of every query that
    * sizes itself this way. Memoized per (path, part-file
    * length+mtime signature): a regenerated fixture changes the
    * signature and recounts; a stable one counts once per JVM. */
  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    // The settle-window discipline from BpeQueries.fingerprint
    // (round-16 advice): a part modified within the last few seconds
    // can be rewritten in place at the same length inside the
    // filesystem's mtime granularity, so a fresh fixture never enters
    // the memo — and a FAILED probe must not memoize at all (a sticky
    // "unknown" key would pin a stale count across a regeneration).
    val mtimeSettleMs = 5000L
    val sig = try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      val parts =
        if (st.isDirectory) fs.listStatus(p).toSeq.filter(_.isFile)
        else Seq(st)
      val settled = parts.forall(f =>
        System.currentTimeMillis() - f.getModificationTime >= mtimeSettleMs)
      if (settled)
        Some(parts.map(f =>
            s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
          .sorted.mkString(","))
      else None
    } catch { case _: Throwable => None }
    sig match {
      case Some(k) => rowCountMemo.getOrElseUpdate(s"$p|$k",
        load(spark, dir, name).count())
      case None => load(spark, dir, name).count()
    }
  }

  /** Normalize an event-time `ts` column to TimestampType whatever the
    * fixture's physical parquet encoding. The generator has shipped
    * three encodings across rounds — TIMESTAMP(NANOS) (arrives as
    * LongType nanos under `nanosAsLong`), plain `timestamp[us]` without
    * the UTC flag (arrives as TIMESTAMP_NTZ), and UTC-adjusted
    * timestamps — so the loader branches on the OBSERVED dataType
    * instead of assuming a unit. Every consumer (batch and streaming)
    * goes through here; sessions pin spark.sql.session.timeZone=UTC so
    * the NTZ cast is wall-clock-preserving.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(types.LongType) =>
        // nanos → micros by integer division: `/` would be double
        // division and lose precision above 2^53 (epoch-nanos ~1.7e18)
        df.withColumn("ts",
          functions.timestamp_micros(functions.expr("ts div 1000")))
      case Some(types.TimestampNTZType) =>
        df.withColumn("ts", functions.col("ts").cast(types.TimestampType))
      case _ => df
    }

  /** Session tuning applied at query-build time (idempotent).
    *
    * ANSI off restores the permissive cast semantics the reference's
    * coercion layers rely on (unparseable string -> null -> filled
    * default, reference: producer.py:79-87, batch_writer_consumer.py:
    * 50-58); AQE handles runtime partition coalescing and skew joins,
    * which is the 100 TB-scale answer to hand-tuned shuffle counts.
    */
  def tuned(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // NOTE: spark.sql.cteRecursionRowLimit is left at its 1M default
    // here — the one recursive query that can legitimately exceed it
    // (q167, data-linear walk output) raises it LOCALLY, sized from
    // its own input, and restores it (TemporalGraphQueries.q167), so
    // the runaway-recursion valve stays armed for the rest of the
    // session.
    spark
  }
}
