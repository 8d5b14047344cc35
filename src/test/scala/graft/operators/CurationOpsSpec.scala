package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-14 wave (q256 MMR, q257 nprobe sweep,
  * q258 separability, q259 MinHash calibration, q260 lexical stats,
  * q261 token quota). The oracle loop proves engine parity; these pin
  * the SEMANTICS: the greedy MMR recurrence against a Scala mirror,
  * recall monotonicity in nprobe, a brute-force within-class scatter,
  * the calibration table's bucket arithmetic and its exact tie-out to
  * q51's threshold, per-source conservation laws, and the quota
  * gate's budget bound.
  */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  /** Index-ordered left fold — the same accumulation order as the
    * native DotProduct expression. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private lazy val vecs: Map[Long, Array[Double]] =
    graft.Tables.load(graft.Tables.tuned(spark), dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  test("q256 equals a brute-force greedy MMR mirror") {
    val pv = vecs(0L)
    val cand = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cos(v, pv)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(20)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    val expected = (1 to 5).map { k =>
      val best = cand.filter(c => !picked.exists(_._1 == c._1))
        .map { case (id, v, rel) =>
          val mx = if (picked.isEmpty) 0.0
            else picked.map(p => cos(v, p._2)).max
          (id, v, rel, 0.7 * rel - 0.3 * mx)
        }
        .minBy { case (id, _, _, score) => (-score, id) }
      picked += ((best._1, best._2))
      (k.toLong, best._1)
    }
    val got = run("q256_mmr_diversification")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == expected.sorted, s"got $got expected $expected")
  }

  test("q257 recall and candidate count are monotone in nprobe") {
    val rows = run("q257_ivf_nprobe_sweep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3
    }, s"monotonicity violated: ${rows.toSeq}")
    assert(rows.last._3 >= 1, "nprobe=8 should recover at least one true neighbour")
  }

  test("q258 within-class scatter matches a brute-force mirror") {
    val labels = graft.Tables.load(graft.Tables.tuned(spark), dir, "embeddings")
      .select(col("label").cast("long"), col("vec_id"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val got = run("q258_class_separability")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(3)))
      .toMap
    for ((lab, (within, between)) <- got) {
      val members = vecs.filter { case (id, _) => labels(id) == lab }.values.toSeq
      val n = members.size
      val cent = (0 until 64).map(d => members.map(_(d)).sum / n).toArray
      val msd = members.map(v => dot(v, v) - 2 * dot(v, cent) + dot(cent, cent))
        .sum / n
      assert(math.abs(within - msd) < 1e-4,
        s"label $lab within $within vs brute $msd")
      assert(within > 0 && between > 0)
    }
    // nearest-centroid symmetry sanity: every nearest_label is a label
    val labs = got.keySet
    run("q258_class_separability").collect()
      .foreach(r => assert(labs.contains(r.getLong(2))))
  }

  test("q259 bucket arithmetic is exact and ties out to q51's threshold") {
    val rows = run("q259_minhash_calibration")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((bucket, _, meanJac) <- rows) {
      assert(bucket >= 0 && bucket <= 9)
      val hi = if (bucket == 9) 1000000L else (bucket + 1) * 100000L
      assert(meanJac >= bucket * 100000L && meanJac <= hi,
        s"bucket $bucket mean_jac_u $meanJac out of range")
    }
    // buckets >= 5 are exactly jaccard >= 0.5 — q51's verify
    // threshold; the group-grain census is exact, so its high-bucket
    // doc-pair mass must equal q51's pair count exactly
    val nHigh = rows.filter(_._1 >= 5).map(_._2).sum
    val q51n = run("q51_minhash_lsh").count()
    assert(nHigh == q51n,
      s"calibration high-bucket mass $nHigh != q51 pair count $q51n")
  }

  test("q260 conserves tokens and reports sane lexicon shapes") {
    val docs = graft.Tables.load(graft.Tables.tuned(spark), dir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(graft.functions.TextOps.words(col("text")))).as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("q260_lexical_stats").collect()
    assert(rows.length == docs.size)
    for (r <- rows) {
      val (src, nTok, nTypes, hapax) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTok == docs(src), s"$src token conservation")
      assert(hapax <= nTypes && nTypes <= nTok)
      assert(r.getLong(4) > 0 && r.getLong(4) <= 1000000L) // ttr_u
      assert(r.getLong(6) <= 1000000L)                     // top10_cov_u
      assert(r.getDouble(7) < 0.0, s"$src Zipf slope must be negative")
    }
  }

  test("q262 spends the sample budget exactly, within each cell's quota") {
    val rows = run("q262_cluster_quota_sample").collect()
    assert(rows.length == 50, "budget must be spent exactly")
    assert(rows.map(_.getLong(1)).distinct.length == 50, "distinct members")
    val perBucket = rows.groupBy(_.getLong(0))
    for ((b, rs) <- perBucket) {
      val quota = rs.map(_.getLong(3)).distinct
      assert(quota.length == 1 && rs.length == quota.head,
        s"bucket $b selected ${rs.length} != quota $quota")
      assert(rs.head.getLong(2) >= rs.length, s"bucket $b over-sampled")
    }
  }

  test("q263 ranking-quality numbers are bounded and consistent") {
    val rows = run("q263_ann_ranking_quality").collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val (nc, ndcg, rr) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(nc >= 10, "multiprobe candidates should cover a top-10")
      // a single probe CAN score 0 at tiny SF (none of its 9 buckets
      // holds an exact-top-10 member) — bound, don't require signal
      // per probe
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg $ndcg out of range")
      assert(rr == 0L || (rr >= 100000L && rr <= 1000000L),
        s"rr_u $rr is not a reciprocal of a 1..10 position")
    }
    assert(rows.exists(_.getDouble(2) > 0.0),
      "the index should rank SOMETHING correctly across 5 probes")
  }

  test("q264 conserves each tau's budget and orders head-source weight by tau") {
    val rows = run("q264_temperature_sweep").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val taus = rows.map(_._1).distinct.sorted
    assert(taus.toSeq == Seq(25L, 50L, 75L, 100L))
    for (tau <- taus)
      assert(rows.filter(_._1 == tau).map(_._4).sum == 1000000L,
        s"tau $tau allocation must sum to the budget")
    // τ→1 concentrates weight on the biggest source, flattens the rest
    val biggest = rows.filter(_._1 == 25).maxBy(r => (r._3, r._2))._2
    val wByTau = taus.map(t =>
      rows.find(r => r._1 == t && r._2 == biggest).get._5)
    assert(wByTau.sliding(2).forall(w => w(1) >= w(0) - 1e-9),
      s"head-source weight should be non-decreasing in tau: $wByTau")
  }

  test("q265 conserves the corpus across history and shard") {
    val rows = run("q265_ivf_shard_maintenance").collect()
    val total = graft.Tables.load(graft.Tables.tuned(spark), dir, "embeddings")
      .count()
    assert(rows.map(_.getLong(1)).sum + rows.map(_.getLong(2)).sum == total,
      "every vector must be assigned exactly once")
    for (r <- rows) {
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1),
        s"cell ${r.getLong(0)} growth accounting")
      assert((r.getLong(2) == 0L) == r.isNullAt(4),
        s"cell ${r.getLong(0)} mean_new_csim contract")
    }
  }

  test("q266 reports only cross-source pairs with sane aggregates") {
    val rows = run("q266_cross_source_audit").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1), "unordered pair canonical form")
      assert(r.getLong(2) >= 1)
      assert(r.getLong(4) <= r.getLong(3),
        "mean jaccard cannot exceed max jaccard")
      assert(r.getLong(3) <= 1000000L)
    }
  }

  test("q267 sample quantiles track the exact percentiles") {
    val rows = run("q267_sample_quantile_sketch").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(25L, 50L, 75L, 90L))
    val prices = graft.Tables.load(graft.Tables.tuned(spark), dir, "lineitem")
      .agg(min(col("l_extendedprice")), max(col("l_extendedprice")))
      .collect().head
    for (r <- rows) {
      val (exact, est, err) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(est >= prices.getDouble(0) - 0.01 &&
        est <= prices.getDouble(1) + 0.01,
        "sample quantile must be an observed value")
      assert(err == BigDecimal(math.abs(exact - est))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // 256-point uniform sample: generous 25% relative-error envelope
      assert(err / exact <= 0.25, s"p${r.getLong(0)} err $err vs $exact")
    }
    // sample quantiles are monotone in p (order statistics of one array)
    val ests = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(ests.sliding(2).forall(w => w(1) >= w(0)))
  }

  test("q268 returns one best chunk per distinct document, ranked") {
    val rows = run("q268_chunk_retrieval").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).distinct.length == 5,
      "document-level dedup must leave distinct doc_ids")
    val scores = rows.map(_.getDouble(2))
    assert(scores.sliding(2).forall(w => w(1) <= w(0)),
      "results must be ranked by score")
    assert(scores.head > 0.0, "the fixture matches the query terms")
  }

  test("q269 banding configs are nested and the permissive config defines recall") {
    val rows = run("q269_banding_sweep").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    assert(rows.keySet == Set("8x1", "4x2", "2x4", "1x8"))
    // an (b,r) band matches only if all r components match, so each
    // stricter config's candidate AND true sets are SUBSETS
    val order = Seq("8x1", "4x2", "2x4", "1x8")
    val cands = order.map(rows(_)._1)
    val trues = order.map(rows(_)._2)
    assert(cands.sliding(2).forall(w => w(1) <= w(0)), s"cand not nested: $cands")
    assert(trues.sliding(2).forall(w => w(1) <= w(0)), s"true not nested: $trues")
    assert(rows("8x1")._3 == 1000000L, "8x1 defines recall = 1")
  }

  test("q270 lattice partitions the corpus with conserved shares") {
    val rows = run("q270_gate_ablation").collect()
    val total = graft.Tables.load(graft.Tables.tuned(spark), dir, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.map(_.getLong(3)).sum == total,
      "lattice cells must partition the corpus")
    val shares = rows.map(_.getLong(5)).sum
    assert(shares <= 1000000L && shares >= 1000000L - 8,
      s"floored shares must sum to ~1e6: $shares")
  }

  test("q261 conserves documents and never exceeds the budget") {
    val perSrc = graft.Tables.load(graft.Tables.tuned(spark), dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("q261_stream_token_quota").collect()
    for (r <- rows) {
      val src = r.getString(0)
      val (adm, rej, tok) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(adm + rej == perSrc(src), s"$src doc conservation")
      assert(tok <= 1000L, s"$src admitted tokens $tok exceed budget")
      assert(r.getLong(5) == tok * 1000000L / 1000L, s"$src utilization")
      assert((rej == 0) == r.isNullAt(4), s"$src first_rejected contract")
    }
  }

  test("q295/q296: drift decision, live occupancy, and movement mass match a brute-force generation mirror") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isNew(id: Long): Boolean =
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 10 == 0
    def cents(ids: Iterable[Long]): Seq[Long] =
      ids.toSeq.sortBy(id => (md5hex(id.toString), id)).take(32)
    // max cosine, min cid tiebreak — the engine's struct-max order
    def assign(c: Seq[Long]): Map[Long, (Long, Double)] =
      vecs.map { case (id, v) =>
        val (cid, s) = c.map(cid => (cid, cos(v, vecs(cid))))
          .minBy { case (cid2, s2) => (-s2, cid2) }
        id -> ((cid, s))
      }
    val c0 = cents(vecs.keys.filterNot(isNew))
    val c1 = cents(vecs.keys)
    val (a0, a1) = (assign(c0), assign(c1))
    def occ(a: Map[Long, (Long, Double)]): Map[Long, Long] =
      a.groupBy(_._2._1).map { case (c, m) => c -> m.size.toLong }
    val occ0 = occ(a0)
    val skewU = occ0.values.max * 32L * 1000000L / vecs.size
    val retrained = skewU >= 1500000L
    // --- q295: the decision columns are constant and the occupancy
    // rows are the LIVE generation's ---
    val rows295 = run("q295_ivf_drift_retrain").collect()
    assert(rows295.forall(_.getLong(3) == skewU), "skew_before_u")
    assert(rows295.forall(_.getBoolean(4) == retrained), "retrained")
    assert(rows295.forall(_.getLong(0) == (if (retrained) 1L else 0L)))
    val expectedOcc = occ(if (retrained) a1 else a0)
    assert(rows295.map(r => r.getLong(1) -> r.getLong(2)).toMap
      == expectedOcc, "live occupancy")
    // --- q296: movement counts and exact micro-unit gain mass ---
    def u(x: Double): Long =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLongExact
    val expected = vecs.keys.toSeq
      .map(id => ((a0(id)._1, a1(id)._1), u(a1(id)._2) - u(a0(id)._2)))
      .groupBy(_._1)
      .map { case (k, g) => k -> ((g.size.toLong, g.map(_._2).sum)) }
    val rows296 = run("q296_ivf_retrain_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows296 == expected,
      s"movement matrix diff: ${
        (rows296.toSet.diff(expected.toSet) ++
          expected.toSet.diff(rows296.toSet)).take(4)}")
    // the matrix conserves the corpus
    assert(rows296.values.map(_._1).sum == vecs.size.toLong)
  }
}
