package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("graft_dot matches the built-in aggregate/zip_with fold bit-for-bit") {
    import spark.implicits._
    // enough rows to go through the codegen'd path
    val df = (1 to 1000).map { i =>
      (Array.tabulate(64)(j => (i * j % 97) / 7.0),
        Array.tabulate(64)(j => ((i + j) % 89) / 11.0))
    }.toDF("a", "b")
    val out = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
    assert(out.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq(
      (Option.empty[Array[Double]], Some(Array(1.0)))).toDF("a", "b")
    val rows = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
  }

  test("length mismatch raises (DuckDB list_dot_product strictness)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0, 99.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c =>
        String.valueOf(c.getMessage).contains("length mismatch")))
  }

  test("registered SQL function form works") {
    VectorFunctions.register(spark)
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
  }
}
