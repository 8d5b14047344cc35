package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the sketch/maintenance/projection wave (q190-q192):
  * HLL register mergeability and estimate accuracy, the 4-term join
  * maintenance identity against a directly computed join, and JL
  * distortion concentration.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def df(name: String) = graft.Queries.queries(name)(spark, dir)

  private def table(name: String) =
    graft.Tables.load(graft.Tables.tuned(spark), dir, name)

  test("q190_hll_sketch: estimate within HLL error; registers <= 256") {
    val rows = df("q190_hll_sketch").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nreg = r.getAs[Long]("n_registers")
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_distinct")
      assert(nreg >= 1 && nreg <= 256)
      // m=256 -> standard error ~1.04/sqrt(256) = 6.5%; allow 4 sigma
      assert(math.abs(est - exact) <= 0.26 * exact + 2,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("q190: registers merge by max (sketch of union = max of sketches)") {
    import graft.functions.Exprs.md5Int32
    val ev = table("events").filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"),
        md5Int32(col("user_id").cast("string")).as("h"))
      .select(col("event_type"),
        expr("shiftright(h, 24)").as("bucket"),
        col("h").bitwiseAND(lit(16777215L)).as("w"),
        col("user_id"))
      .withColumn("r", when(col("w") === 0, lit(25))
        .otherwise(lit(25) - length(bin(col("w")))))
    def regs(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("event_type"), col("bucket")).agg(max(col("r")).as("r"))
        .collect()
        .map(x => ((x.getString(0), x.getLong(1)), x.getInt(2))).toMap
    val whole = regs(ev)
    val partA = regs(ev.filter(col("user_id") % 2 === 0))
    val partB = regs(ev.filter(col("user_id") % 2 =!= 0))
    val merged = (partA.keySet ++ partB.keySet).map { k =>
      k -> math.max(partA.getOrElse(k, 0), partB.getOrElse(k, 0))
    }.toMap
    assert(merged == whole)
  }

  test("q191_incremental_join: 4-term decomposition equals direct join") {
    import graft.functions.Exprs.dec2
    val direct = table("orders")
      .join(table("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("l_extendedprice")) *
          (lit(1) - dec2(col("l_discount")))).cast("double").as("rev"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val got = df("q191_incremental_join").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == direct)
  }

  test("q194_stream_hll: streaming maintenance lands on the batch sketch") {
    val batch = df("q190_hll_sketch").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_registers"),
        r.getAs[Double]("hll_estimate"))).toMap
    val stream = df("q194_stream_hll").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_registers"),
        r.getAs[Double]("hll_estimate"))).toMap
    assert(stream == batch)
  }

  test("q195_bloom_join: prefiltered join equals the plain join") {
    import graft.functions.Exprs.dec2
    val plain = table("lineitem")
      .join(table("orders").filter(col("o_orderdate") >= "1998-01-01"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("l_extendedprice")) *
          (lit(1) - dec2(col("l_discount")))).cast("double").as("rev"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val got = df("q195_bloom_join").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == plain && got.nonEmpty)
  }

  test("q196_trigram_join: matches driver-side dictionary brute force") {
    val nameCnt = table("part").groupBy(col("p_name")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def grams(s: String): Set[String] =
      (1 to s.length - 2).map(i => s.substring(i - 1, i + 2)).toSet
    val names = nameCnt.keys.toSeq.sorted
    val buckets = scala.collection.mutable.Map.empty[Double, Long]
    for {
      i <- names.indices; k <- i + 1 until names.length
      (a, b) = (names(i), names(k))
      ga = grams(a); gb = grams(b)
      sh = (ga & gb).size if sh > 0
      j = sh.toDouble / (ga.size + gb.size - sh) if j >= 0.4
    } {
      val key = BigDecimal(j).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      buckets.updateWith(key)(c => Some(c.getOrElse(0L) + nameCnt(a) * nameCnt(b)))
    }
    for ((_, c) <- nameCnt if c > 1)
      buckets.updateWith(1.0)(x => Some(x.getOrElse(0L) + c * (c - 1) / 2))
    val got = df("q196_trigram_join").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == buckets.toMap)
  }

  test("q192_random_projection: distortion concentrates around 1") {
    val rows = df("q192_random_projection").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_distortion")
      val mn = r.getAs[Double]("min_distortion")
      val mx = r.getAs[Double]("max_distortion")
      assert(mn > 0 && mn <= avg && avg <= mx)
      assert(avg > 0.5 && avg < 1.5, s"label ${r.get(0)}: avg=$avg")
    }
  }

  test("q228_kmv_sketch: estimates match brute-force sets; jaccard/union are honest") {
    import org.apache.spark.sql.functions.col
    val rows = df("q228_kmv_sketch").collect()
    assert(rows.nonEmpty)
    // brute-force the per-type distinct user sets
    val pairs = table("events").select(col("event_type"), col("user_id"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = pairs.groupBy(_._1).map { case (t, g) => t -> g.map(_._2).toSet }
    def md5i32(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
    }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b)
      val (sa, sb) = (sets(a), sets(b))
      val union = sa ++ sb
      val ku = r.getAs[Long]("union_sketch_size")
      assert(ku <= 64L && ku <= union.size.toLong)
      // recompute the union sketch and shared count from raw hashes
      val hA = sa.map(u => md5i32(u.toString))
      val hB = sb.map(u => md5i32(u.toString))
      val kU = (hA ++ hB).toSeq.sorted.take(64)
      assert(ku == kU.length.toLong)
      val shared = kU.count(h => hA(h) && hB(h)).toLong
      assert(r.getAs[Long]("shared_in_union") == shared)
      val estU = r.getAs[Double]("est_union")
      if (union.size < 64) assert(estU == union.size.toDouble)
      else {
        // KMV standard error ~ 1/sqrt(k-1) ~ 12.6%; allow 4 sigma
        assert(math.abs(estU - union.size) / union.size < 0.5,
          s"($a,$b): est_union $estU vs ${union.size}")
      }
      val trueJ = (sa & sb).size.toDouble / union.size
      assert(math.abs(r.getAs[Double]("est_jaccard") - trueJ) <= 0.5)
    }
  }
}
