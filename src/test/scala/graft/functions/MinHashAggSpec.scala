package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("aggregator signature equals the expression-level minhash") {
    import spark.implicits._
    val shingles = Seq("a b c", "b c d", "c d e", "x y z")
    val viaAgg = shingles.toDS()
      .groupByKey(_ => 1)
      .agg(new MinHashSignature(4).toColumn.name("sig"))
      .collect().head._2.toSeq
    val viaExpr = spark.sql(
      s"""SELECT ${(0 until 4).map(i =>
        s"min(md5(concat('$i|', s)))").mkString(", ")}
          FROM VALUES ${shingles.map(s => s"('$s')").mkString(",")} AS t(s)""")
      .collect().head.toSeq
    assert(viaAgg == viaExpr)
  }

  test("signature is partition-merge invariant") {
    import spark.implicits._
    val data = (1 to 500).map(i => s"shingle $i word")
    def sig(parts: Int): Seq[String] = data.toDS().repartition(parts)
      .groupByKey(_ => 1)
      .agg(new MinHashSignature(8).toColumn.name("sig"))
      .collect().head._2.toSeq
    assert(sig(1) == sig(8)) // associative + commutative merge
  }

  test("ingest fallback: schema'd read, inference on mismatch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ing_").toFile
    val f = new java.io.PrintWriter(new java.io.File(dir, "x.csv"))
    f.println("a,b"); f.println("1,foo"); f.println("2,bar"); f.close()
    val good = graft.sources.Ingest.readCsvWithFallback(spark,
      dir.toString, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.StringType))))
    assert(good.count() == 2)
    assert(good.schema.fieldNames.toSeq == Seq("a", "b"))
  }
}
