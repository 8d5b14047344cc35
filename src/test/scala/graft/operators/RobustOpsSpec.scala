package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the robust-statistics / layout operators
  * (q158-q160): clipping direction, Pareto dominance, and bin
  * conservation.
  */
class RobustOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def df(name: String) = graft.Queries.queries(name)(spark, dir)

  test("q158_winsorized_agg: trimmed subset, means ordered sanely") {
    df("q158_winsorized_agg").collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n"))
      // ~90% of rows survive a [p05, p95] trim
      assert(r.getAs[Long]("n_kept") >= (r.getAs[Long]("n") * 8) / 10)
      assert(r.getAs[Double]("winsorized_mean") > 0.0)
      assert(r.getAs[Double]("trimmed_mean") > 0.0)
    }
  }

  test("q159_skyline: no frontier point dominates another") {
    val pts = df("q159_skyline").collect()
      .map(r => (r.getAs[Double]("price"), r.getAs[Long]("size")))
    assert(pts.nonEmpty)
    for (a <- pts; b <- pts if a != b) {
      val dominates = a._1 <= b._1 && a._2 >= b._2 &&
        (a._1 < b._1 || a._2 > b._2)
      assert(!dominates, s"$a dominates $b inside the frontier")
    }
    // and the frontier is jointly monotone: sort by price asc -> size
    // strictly increasing
    val sorted = pts.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(lo, hi) => assert(hi._2 > lo._2)
      case _ =>
    }
  }

  test("q160_compaction_bins conserves files and bytes per lang") {
    import org.apache.spark.sql.functions.col
    val rows = df("q160_compaction_bins").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("lang"))
      .agg(org.apache.spark.sql.functions.count(col("doc_id")).as("n"),
        org.apache.spark.sql.functions.sum(col("n_chars")).as("bytes"))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n"), r.getAs[Long]("bytes"))).toMap
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, bRows) =>
      assert(bRows.map(_.getAs[Long]("n_files")).sum == docs(lang)._1)
      assert(bRows.map(_.getAs[Long]("bin_bytes")).sum == docs(lang)._2)
      // bins are contiguous 0..max
      val bins = bRows.map(_.getAs[Long]("bin")).sorted.toList
      assert(bins == List.range(0L, bins.length.toLong))
    }
  }
}
