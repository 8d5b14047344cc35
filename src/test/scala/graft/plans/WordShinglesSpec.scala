package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps

class WordShinglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The reference HOF formulation the native expression replaces. */
  private def hofShingles(w: org.apache.spark.sql.Column, n: Int) =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - lit(n)),
        i => array_join(slice(w, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  test("native shingles match the transform/sequence/slice formulation") {
    import spark.implicits._
    val df = (1 to 500).map { i =>
      (0 until (i % 12)).map(j => s"w${(i + j) % 7}").mkString(" ")
    }.toDF("text")
    val w = TextOps.words(col("text"))
    val out = df.select(
      TextOps.shingles(w, 3).as("native"),
      hofShingles(w, 3).as("hof"))
    assert(out.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("distinct variant equals array_distinct of the plain variant") {
    import spark.implicits._
    val df = Seq("a b a b a b a b", "x y z x y z", "one two").toDF("text")
    val w = TextOps.words(col("text"))
    val out = df.select(
      TextOps.shingleSet(w, 2).as("set"),
      array_distinct(TextOps.shingles(w, 2)).as("ad"))
    assert(out.filter(not(col("set") <=> col("ad"))).count() == 0)
  }

  test("short and null docs") {
    import spark.implicits._
    val df = Seq(Some("one two"), Some(""), None).toDF("text")
    val rows = df.select(TextOps.shingles(split(col("text"), " "), 3)).collect()
    assert(rows(0).getSeq[String](0) == Seq.empty)
    assert(rows(1).getSeq[String](0) == Seq.empty)
    assert(rows(2).isNullAt(0))
  }
}

class MinHashSigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("native signature matches the per-component HOF minhash") {
    import spark.implicits._
    val df = (1 to 300).map { i =>
      (1 to (i % 9) + 1).map(j => s"sh ${(i * j) % 23} gram").toArray
    }.toDF("sh")
    val hof = (0 until 4).map(i => TextOps.minhash(col("sh"), i))
    val out = df.select(
      graft.plans.MinHashSig.minhashSig(col("sh"), 4).as("native"),
      array(hof: _*).as("hof"))
    assert(out.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("empty shingle array yields null components") {
    import spark.implicits._
    val df = Seq(Array.empty[String]).toDF("sh")
    val row = df.select(
      graft.plans.MinHashSig.minhashSig(col("sh"), 3)).head()
    assert(row.getSeq[String](0) == Seq(null, null, null))
  }
}
