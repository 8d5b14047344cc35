package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential proof that the two-phase PrefixPass primitives are
  * value-identical to the single-partition Window formulations they
  * replace (q178 cumsum, q182 row_number/NTILE, q159 prev-max) — on
  * adversarial inputs: duplicate sort keys broken by a tiebreaker,
  * nulls in the value column, more partitions than rows, and an empty
  * input. The whole point of the rewrite is that ONLY the physical
  * shape changes; these tests pin that contract independently of the
  * registry oracles.
  */
class PrefixPassSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7") // deliberately odd
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def sampleDec = {
    // 100 rows, duplicate v values (ties), decimal(18,2)
    (1 to 100).map(i => (i.toLong, BigDecimal((i % 7) + 0.25).setScale(2)))
      .toDF("id", "v")
      .withColumn("v", col("v").cast(DecimalType(18, 2)))
  }

  test("cumSumDecimal equals the window running sum, and total") {
    val df = sampleDec
    val w = Window.orderBy(col("v").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("v")).over(w))
      .select(col("id"), col("cum").cast("string")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (got, tot) = PrefixPass.cumSumDecimal(df,
      Seq(col("v").desc, col("id").asc), "v", "cum")
    val gotMap = got.select(col("id"), col("cum").cast("string")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotMap == expected)
    val expTot = df.agg(sum(col("v"))).collect().head.getDecimal(0)
    assert(tot.compareTo(expTot) == 0)
  }

  test("cumSumDecimal: window null semantics (null until first value)") {
    val df = Seq(
      (1L, None), (2L, None), (3L, Some(BigDecimal("5.00"))),
      (4L, None), (5L, Some(BigDecimal("2.00"))))
      .toDF("id", "v")
      .withColumn("v", col("v").cast(DecimalType(18, 2)))
    val w = Window.orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("v")).over(w))
      .select(col("id"), col("cum").cast("string")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val (got, _) = PrefixPass.cumSumDecimal(df,
      Seq(col("id").asc), "v", "cum")
    val gotMap = got.select(col("id"), col("cum").cast("string")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(gotMap == expected)
  }

  test("withRowNumber equals row_number and returns the exact count") {
    val df = sampleDec
    val expected = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v").asc, col("id").desc)))
      .select(col("id"), col("rn").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val (got, n) = PrefixPass.withRowNumber(df,
      Seq(col("v").asc, col("id").desc), "rn")
    val gotMap = got.select(col("id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotMap == expected)
    assert(n == 100L)
  }

  test("withPrevMaxLong equals the strict-preceding running max") {
    val df = (1 to 60).map(i => (i.toLong, ((i * 37) % 11).toLong))
      .toDF("id", "s")
    val w = Window.orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.withColumn("pm", max(col("s")).over(w))
      .select(col("id"), col("pm")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val got = PrefixPass.withPrevMaxLong(df,
        Seq(col("id").asc), "s", "pm")
      .select(col("id"), col("pm")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == expected)
  }

  test("fewer rows than partitions, and empty input") {
    val tiny = Seq((1L, BigDecimal("1.00")), (2L, BigDecimal("2.00")))
      .toDF("id", "v").withColumn("v", col("v").cast(DecimalType(18, 2)))
    val (t2, tot2) = PrefixPass.cumSumDecimal(tiny,
      Seq(col("id").asc), "v", "cum")
    assert(t2.count() == 2 && tot2.toString == "3.00")
    val empty = tiny.filter(col("id") > 100)
    val (e, totE) = PrefixPass.cumSumDecimal(empty,
      Seq(col("id").asc), "v", "cum")
    assert(e.count() == 0 && totE.signum == 0)
    val (er, nE) = PrefixPass.withRowNumber(empty, Seq(col("id").asc), "rn")
    assert(er.count() == 0 && nE == 0L)
  }

  test("withRowNumberByGroup + ntileExpr equals the partitioned window") {
    val df = (1 to 97).map { i =>
      (i.toLong, s"seg${i % 5}", ((i * 31) % 13).toLong)
    }.toDF("id", "seg", "bal")
    val w = Window.partitionBy(col("seg"))
      .orderBy(col("bal").asc, col("id").asc)
    val expected = df
      .withColumn("rn", row_number().over(w))
      .withColumn("q", ntile(4).over(w))
      .select(col("id"), col("rn").cast("long"), col("q").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ranked = PrefixPass.withRowNumberByGroup(df, Seq("seg"),
      Seq(col("seg").asc, col("bal").asc, col("id").asc), "rn", "n_seg")
    val got = ranked
      .withColumn("q", PrefixPass.ntileExpr("rn", "n_seg", 4))
      .select(col("id"), col("rn"), col("q").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    // per-group totals are the true group sizes
    val sizes = ranked.groupBy(col("seg"))
      .agg(max(col("n_seg")).as("n"), count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(sizes.forall { case (n, c) => n == c })
  }

  test("property: random data with ties, nulls, and skewed groups " +
      "matches the window formulations") {
    def sample[A](g: Gen[A]): A =
      g.apply(Gen.Parameters.default, Seed(7L)).get
    // heavy ties in v (10 distinct values), nullable amounts, groups
    // with wildly different sizes (g0 dominates via the mod bias)
    val rows = sample(Gen.listOfN(400, Gen.zip(
      Gen.choose(0L, 9L),
      Gen.option(Gen.choose(-99999L, 99999L)),
      Gen.choose(0, 99))))
      .zipWithIndex.map { case ((v, amt, gsel), i) =>
        (i.toLong, v, amt.map(c => BigDecimal(c) / 100),
          if (gsel < 60) "g0" else s"g${gsel % 7}")
      }
    val df = rows.toDF("id", "v", "amt", "grp")
      .withColumn("amt", col("amt").cast(DecimalType(18, 2)))
    val order = Seq(col("v").desc, col("id").asc)
    val w = Window.orderBy(order: _*)
    val expCum = df.withColumn("cum", sum(col("amt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum").cast("string")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val (gotCumDf, _) = PrefixPass.cumSumDecimal(df, order, "amt", "cum")
    val gotCum = gotCumDf.select(col("id"), col("cum").cast("string"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(gotCum == expCum)
    val expRn = df.withColumn("rn", row_number().over(w))
      .select(col("id"), col("rn").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val (gotRnDf, n) = PrefixPass.withRowNumber(df, order, "rn")
    val gotRn = gotRnDf.select(col("id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotRn == expRn && n == 400L)
    val gw = Window.partitionBy(col("grp"))
      .orderBy(col("v").desc, col("id").asc)
    val expGrp = df.withColumn("rn", row_number().over(gw))
      .withColumn("q", ntile(3).over(gw))
      .select(col("id"), col("rn").cast("long"), col("q").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val ranked = PrefixPass.withRowNumberByGroup(df, Seq("grp"),
      col("grp").asc +: order, "rn", "ng")
    val gotGrp = ranked.withColumn("q", PrefixPass.ntileExpr("rn", "ng", 3))
      .select(col("id"), col("rn"), col("q").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(gotGrp == expGrp)
  }

  test("q182's NTILE formula matches ntile() for n mod k != 0") {
    // 23 rows, 5 buckets: sizes 5,5,5,4,4 — the uneven case
    val df = (1 to 23).map(i => (i.toLong, (i * 13 % 23).toLong))
      .toDF("id", "score")
    val expected = df.withColumn("b",
        ntile(5).over(Window.orderBy(col("score").asc, col("id").asc)))
      .select(col("id"), col("b").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val (rn, n) = PrefixPass.withRowNumber(df,
      Seq(col("score").asc, col("id").asc), "rn")
    val k = 5L; val q = n / k; val rem = n % k; val cut = rem * (q + 1)
    val got = rn.withColumn("b",
        expr(s"CASE WHEN rn <= ${cut}L THEN (rn - 1L) div ${q + 1}L + 1L " +
          s"ELSE ${rem}L + (rn - ${cut}L - 1L) div ${math.max(q, 1L)}L" +
          " + 1L END"))
      .select(col("id"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }
}
