package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's ingest pipeline (stages 1-2) re-expressed as one
  * Structured Streaming query.
  *
  * Reference shape: a Kafka consumer buffers 2,000 JSON messages in a
  * Python list and flushes each buffer as `batch_<n>.csv`, with the final
  * partial batch flushed on a 90 s idle timeout
  * (batch_writer_consumer.py:8,40-88). Spark-natively that is:
  * source -> writeStream.foreachBatch(csv writer with
  * maxRecordsPerFile=2000) with Trigger.AvailableNow (drain-everything-
  * then-stop — the idiomatic equivalent of "consume until idle"), and
  * exactly-once file commits via the checkpoint instead of consumer-group
  * offset commits.
  *
  * The Kafka wiring (S2/S3) is behind options because CI has no broker;
  * `MemoryStream`/file sources drive the same pipeline in tests.
  */
object BatchWriter {

  /** Count-batched CSV sink: every micro-batch is written as header'd
    * CSV files of at most `batchSize` rows (reference:
    * batch_writer_consumer.py:63-69 enforced 2,000-row files).
    *
    * Each micro-batch lands in its own `batch=<id>` subdirectory with
    * mode=overwrite, so a batch retried after a mid-write crash replaces
    * its own partial output instead of appending duplicates — that plus
    * the checkpoint's offset tracking gives end-to-end exactly-once
    * (an append-mode write here would only be at-least-once). Readers
    * see one table via a recursive/glob directory read, same as the
    * reference's `data/batches/` scan (spark_model_trainer.py:190). */
  def writeCountBatches(
      source: DataFrame,
      outDir: String,
      batchSize: Int = 2000): StreamingQuery = {
    val writeBatch: (Dataset[Row], Long) => Unit = (batch, batchId) =>
      batch.coalesce(1).write
        .mode("overwrite")
        .option("header", "true")
        .option("maxRecordsPerFile", batchSize)
        .csv(s"$outDir/batch=$batchId")
    source.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Kafka JSON source (reference: batch_writer_consumer.py:26-33 —
    * subscribe, earliest offsets, JSON-deserialize values). Requires a
    * live broker; parse with `from_json(value, schema)` downstream. */
  def kafkaJsonSource(
      spark: SparkSession,
      servers: String,
      topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("value").cast("string").as("json"),
        col("timestamp").as("kafka_ts"))

  /** Kafka JSON sink (reference: producer.py:26-31,89-94 — dict -> JSON
    * bytes with linger_ms=10, batch_size=32768). */
  def kafkaJsonSink(
      df: DataFrame,
      servers: String,
      topic: String,
      checkpoint: String): StreamingQuery =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("kafka.linger.ms", "10")
      .option("kafka.batch.size", "32768")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
