package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input handling (SURVEY §2.2 P8): the reference counts and
  * skips bad CSV rows (producer.py:96-105); Spark-natively that is
  * PERMISSIVE mode + columnNameOfCorruptRecord + an observe() metric
  * for the bad-line tally. */
class CoerceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("permissive CSV scan salvages good rows and counts corrupt ones") {
    val dir = Files.createTempDirectory("graft_csv_").toFile
    val f = new java.io.File(dir, "dirty.csv")
    val w = new java.io.PrintWriter(f)
    w.println("a,b")
    w.println("1.5,x1")   // good
    w.println("oops,x2")  // unparseable double -> null -> coercible
    w.println("\"unterminated,x3") // structurally corrupt
    w.println("2.5,x4")   // good
    w.close()

    val schema = StructType(Seq(
      StructField("a", DoubleType),
      StructField("b", StringType),
      StructField("_corrupt", StringType)))
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(f.getAbsolutePath)
      .cache() // corrupt-record column requires the full row to be read

    // PERMISSIVE flags BOTH the structurally-broken row and the
    // type-conversion failure ("oops" in a double column)
    val corrupt = df.filter(col("_corrupt").isNotNull).count()
    assert(corrupt == 2)
    // only the unterminated-quote row lost its fields entirely
    assert(df.filter(col("a").isNull && col("b").isNull).count() == 1)

    // the reference's salvage semantics: every row whose fields parsed
    // survives, unparseable numeric -> 0.0 (producer.py:96-105)
    val salvaged = df.filter(col("b").isNotNull)
      .withColumn("a", Coerce.toDoubleOrDefault(col("a")))
    val vals = salvaged.select("a").collect().map(_.getDouble(0)).sorted.toSeq
    assert(vals == Seq(0.0, 1.5, 2.5))
  }

  test("observe() surfaces bad-line counters as query metrics") {
    import spark.implicits._
    val df = Seq(("1.5"), ("abc"), ("2.0"), ("")).toDF("raw")
    val observed = df
      .withColumn("v", Coerce.toDoubleOrDefault(col("raw")))
      .observe("coercion_metrics",
        count(lit(1)).as("n_rows"),
        count(when(col("raw").cast(DoubleType).isNull, 1)).as("n_coerced"))
    observed.collect()
    val metrics = observed.queryExecution.observedMetrics("coercion_metrics")
    assert(metrics.getAs[Long]("n_rows") == 4)
    assert(metrics.getAs[Long]("n_coerced") == 2) // "abc" and ""
  }
}
