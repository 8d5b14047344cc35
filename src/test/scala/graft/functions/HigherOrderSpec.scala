package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Higher-order array/map function semantics (SURVEY §2.8 extension
  * surface): transform/filter/exists/forall/aggregate/zip_with over
  * arrays, and the map-column family the fixture tables don't exercise.
  */
class HigherOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("array higher-order functions") {
    import spark.implicits._
    val df = Seq((Seq(1.0, -2.0, 3.0, -4.0))).toDF("xs")
    val row = df.select(
      transform(col("xs"), x => x * 2).as("doubled"),
      filter(col("xs"), _ > 0).as("pos"),
      exists(col("xs"), _ > 2.5).as("any_big"),
      forall(col("xs"), _ > -10).as("all_ok"),
      aggregate(col("xs"), lit(0.0), (acc, x) => acc + abs(x)).as("l1"),
      zip_with(col("xs"), col("xs"), (a, b) => a * b).as("sq")).head()
    assert(row.getSeq[Double](0) == Seq(2.0, -4.0, 6.0, -8.0))
    assert(row.getSeq[Double](1) == Seq(1.0, 3.0))
    assert(row.getBoolean(2))
    assert(row.getBoolean(3))
    assert(row.getDouble(4) == 10.0)
    assert(row.getSeq[Double](5) == Seq(1.0, 4.0, 9.0, 16.0))
  }

  test("map column family") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), Seq(1, 2))).toDF("ks", "vs")
      .select(map_from_arrays(col("ks"), col("vs")).as("m"))
    val row = df.select(
      map_keys(col("m")).as("keys"),
      element_at(col("m"), "b").as("b"),
      transform_values(col("m"), (_, v) => v * 10).as("scaled"),
      map_filter(col("m"), (k, _) => k === "a").as("only_a"),
      map_concat(col("m"), map(lit("c"), lit(3))).as("merged")).head()
    assert(row.getSeq[String](0).sorted == Seq("a", "b"))
    assert(row.getInt(1) == 2)
    assert(row.getMap[String, Int](2) == Map("a" -> 10, "b" -> 20))
    assert(row.getMap[String, Int](3) == Map("a" -> 1))
    assert(row.getMap[String, Int](4) == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }
}
