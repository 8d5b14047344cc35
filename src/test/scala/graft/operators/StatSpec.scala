package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the stats/tokenizer/subquery wave (q176-q184) beyond
  * the oracle hash: brute-force recomputation of the BPE pair counts,
  * weighted median, and sole-late-supplier logic on driver-side
  * collections; partition identities (ABC classes and RFM segments must
  * tile their dimension exactly); and share-of-parent sums.
  */
class StatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def df(name: String) = graft.Queries.queries(name)(spark, dir)

  private def table(name: String) =
    graft.Tables.load(graft.Tables.tuned(spark), dir, name)

  test("q176_bpe_pairs: matches a driver-side brute-force recount") {
    val texts = table("documents").select(col("text")).collect()
      .map(_.getString(0))
    val wc = scala.collection.mutable.Map.empty[String, Long]
    for {
      t <- texts
      w <- t.replaceAll("[^A-Za-z ]+", " ").split(" ", -1)
      if w.length >= 2
    } wc.updateWith(w.toLowerCase(java.util.Locale.ROOT)) {
      c => Some(c.getOrElse(0L) + 1L)
    }
    val pairs = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wc; i <- 0 until w.length - 1)
      pairs.updateWith(w.substring(i, i + 2)) {
        p => Some(p.getOrElse(0L) + c)
      }
    val expect = pairs.toSeq.sortBy { case (p, f) => (-f, p) }.take(20)
    val got = df("q176_bpe_pairs").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("q177_event_streaks: islands tile the distinct (user, day) set") {
    val rows = df("q177_event_streaks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalDays = table("events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(rows.map { case (len, n, _) => len * n }.sum == totalDays)
    rows.foreach { case (len, n, users) =>
      assert(len >= 1 && users >= 1 && users <= n)
    }
  }

  test("q178_abc_classes: matches driver-side cumulative classification") {
    val rows = df("q178_abc_classes").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val perPart = table("lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .collect()
      .map(r => (r.getLong(0), r.getDecimal(1)))
      .sortBy { case (k, r) => (r.negate, k) }
    val tot = perPart.map(_._2.doubleValue).sum
    var cum = 0.0
    val expect = perPart.map { case (_, r) =>
      cum += r.doubleValue
      // ties at the exact 80%/95% cut are decided in decimal space by
      // the query; double cum is fine here because the synthetic revenue
      // never lands exactly on a boundary
      if (cum <= 0.80 * tot) "A" else if (cum <= 0.95 * tot) "B" else "C"
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows == expect)
  }

  test("q179_chisq_contingency: dof/chi2 sanity") {
    val r = df("q179_chisq_contingency").collect().head
    val chi2 = r.getDouble(0); val dof = r.getLong(1); val n = r.getLong(2)
    assert(chi2 >= 0.0)
    val types = table("events").select(col("event_type")).distinct().count()
    val days = table("events")
      .select(dayofmonth(col("ts"))).distinct().count()
    assert(dof == (types - 1) * (days - 1))
    assert(n <= types * days)
  }

  test("q180_weighted_median: matches driver-side brute force") {
    val li = table("lineitem")
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = li.groupBy(_._1).view.mapValues { g =>
      val byPrice = g.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byPrice.map(_._2).sum
      var cum = 0L
      byPrice.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
    }.toMap
    val got = df("q180_weighted_median").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("q181_share_of_parent: shares sum to 1 within each region") {
    val rows = df("q181_share_of_parent").collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (region, g) =>
      val s = g.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-9, s"region $region shares sum to $s")
    }
  }

  test("q182_rfm_segments: segments tile the customer-with-orders set") {
    val rows = df("q182_rfm_segments").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nCust = table("orders").select(col("o_custkey")).distinct().count()
    assert(rows.map(_._2).sum == nCust)
    rows.foreach { case (seg, _) =>
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '5'), seg)
    }
  }

  test("q183_multi_exists: matches driver-side sole-late-supplier logic") {
    val li = table("lineitem").join(table("orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 60))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val sName = table("supplier").select(col("s_suppkey"), col("s_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byOrder = li.groupBy(_._1)
    val waits = scala.collection.mutable.Map.empty[String, Long]
    for {
      (_, lines) <- byOrder
      (_, supp, late) <- lines if late
      others = lines.filter(_._2 != supp)
      if others.nonEmpty && !others.exists(_._3)
    } waits.updateWith(sName(supp))(c => Some(c.getOrElse(0L) + 1L))
    val expect = waits.toSeq.sortBy { case (n, w) => (-w, n) }.take(10)
    val got = df("q183_multi_exists").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("q193_set_ops_all: bag-semantics multiplicities are exact") {
    val li = table("lineitem")
      .select(col("l_partkey"), col("l_quantity")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val nA = li.filter(_._2 > 25.0).groupBy(_._1).view.mapValues(_.length.toLong)
    val nB = li.filter(_._2 <= 25.0).groupBy(_._1).view.mapValues(_.length.toLong)
    val keys = nA.keySet ++ nB.keySet
    val expect = keys.flatMap { k =>
      val a = nA.getOrElse(k, 0L); val b = nB.getOrElse(k, 0L)
      Seq(("except_all", k, math.max(a - b, 0L)),
        ("intersect_all", k, math.min(a, b))).filter(_._3 > 0)
    }.toSet
    val got = df("q193_set_ops_all").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("q184_notin_distinct: blocklisted suppliers never counted") {
    val blocked = table("supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val li = table("lineitem").join(table("part"),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") =!= "Brand#13" &&
        col("p_size").isin(1, 7, 14, 23, 36, 45))
      .select(col("p_brand"), col("p_size"), col("l_suppkey"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
    val expect = li.filter(p => !blocked(p._2)).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    val got = df("q184_notin_distinct").collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
    got.foreach { case (k, n) => assert(expect(k) == n, s"group $k") }
    // top-25 completeness: nothing larger was left out
    val cut = got.map(_._2).min
    assert(expect.count(_._2 > cut) <= got.count(_._2 > cut))
  }
}
