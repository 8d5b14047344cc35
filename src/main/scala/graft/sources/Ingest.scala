package graft.sources

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch ingest helpers (SURVEY §2.1 S5): the reference reads its batch
  * directory with an explicit schema and retries with schema inference
  * if that read fails (pyspark_app/spark_model_trainer.py:183-197).
  */
object Ingest {

  /** Multi-file CSV directory scan with explicit schema; falls back to
    * header-based schema inference when the schema'd read cannot
    * produce rows (the reference's Try/retry at
    * spark_model_trainer.py:192-194). */
  def readCsvWithFallback(
      spark: SparkSession,
      dir: String,
      schema: StructType): DataFrame = {
    val attempt = Try {
      val df = spark.read
        .option("header", "true")
        .schema(schema)
        .csv(dir)
      df.take(1) // force the scan so schema mismatch surfaces here
      df
    }
    attempt match {
      case Success(df) => df
      case Failure(_) =>
        spark.read
          .option("header", "true")
          .option("inferSchema", "true")
          .csv(dir)
    }
  }
}
