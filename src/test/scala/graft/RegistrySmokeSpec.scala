package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every relational query in the registry runs at sf0.001 and returns
  * rows (the ML/streaming entries are exercised by their own specs and
  * are skipped here to keep the suite fast). Catches schema drift,
  * bad column references, and accidentally-empty results before the
  * driver's gate does.
  */
class RegistrySmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val slow = Set(
    "q60_ml_kmeans", "q61_ml_gbt_regression", "q62_ml_gbt_classifier",
    "q63_ml_cumulative_train", "q43_stream_tumbling",
    "q44_stream_batchwriter")

  // Global (unpartitioned) windows plan as a SinglePartition exchange +
  // one task sorting the ENTIRE input — admissible ONLY over inputs
  // whose row count is constant-bounded (does not grow with SF). Every
  // entry here must state the bound; anything else must use the
  // two-phase PrefixPass shape (q178/q182/q159).
  private val constantBoundedGlobalWindow = Set(
    "q179_chisq_contingency", // |event_type| x |day-of-month| cells (~155)
    "q218_temperature_mixing", // |sources| rows (~20; a production
    // source registry is thousands at most — dimension-bounded, the
    // corpus-scale work is the one group-count feeding it)
    "q249_fertility_reweighting", // same |sources| bound as q218: the
    // corpus-scale work is the q243 token pass + one group-count;
    // everything windowed is per-source algebra
    "q257_ivf_nprobe_sweep", // the ranked frame is the PROBE's 32
    // centroid-similarity rows (one per centroid, a fixed index
    // parameter) — the corpus-scale work is the broadcast-centroid
    // scoring pass, which is never windowed
    "q262_cluster_quota_sample", // apportionment windows run on the
    // ≤256-row cell-count aggregate (2^8 LSH cells, an algorithm
    // constant); per-cell member selection is the mergeable TopK
    // aggregate, not a window
    "q271_rrf_fusion", // the three rank windows order post-LIMIT
    // shortlists: the two K=20 TakeOrdered outputs and their ≤40-row
    // full outer join — all bounded by the shortlist constant K; the
    // corpus-scale work is the two scans FEEDING the TakeOrdereds,
    // which are per-partition heaps, never windowed
    "q275_ltr_rerank", // q271's same three shortlist windows plus ONE
    // rerank window over the fused candidate set — all frames bounded
    // by 2·K = 40 rows by construction; the corpus-scale work (two
    // ranker scans + one feature scan) feeds TakeOrdereds and a
    // broadcast hash join, never a window
    "q280_bm25_index_maintain", // one rank window over the K=20
    // TakeOrdered shortlist (the q271 lex-arm bound); corpus-scale
    // work is the single tf scan, stats come off the vocab artifact
    "q283_shard_rebalance", // cumulative-flow windows order the
    // per-shard load frame: exactly S = 8 rows (shard count is
    // deployment config, never data); the only corpus-scale work is
    // the one tokens-per-shard aggregate feeding it
    "q288_repeat_budget", // every window (cumulative caps, lead,
    // totals) orders the per-source config frame: |sources| rows
    // (20 here; a production source registry is thousands at most —
    // the q218/q249 bound). The only corpus-scale work is the one
    // tokenize + per-source sum feeding it, which is a map-side-
    // combinable hash aggregate, never windowed
    "q291_bm25_index_delete", // q280's exact bound: one rank window
    // over the K=20 TakeOrdered shortlist; the corpus-scale work is
    // the surviving-docs tf scan, df/meta come off the repaired
    // (subtracted) artifact stats
    "q292_ltr_kfold", // q286's exact window bound, rotated three
    // ways: the fold loop re-filters the SAME constant-bounded
    // feature frame (≤ 3·2K rows) and each fold's rerank window
    // orders one query's ≤2K-row shortlist; the two fat scans are
    // shared with q286's features() and never windowed
    "q286_ltr_heldout" // q275's bound, three queries wide: per query,
    // two rank windows order the K=20 TakeOrdered shortlists and one
    // fusion window orders their ≤2K-row outer join; the held-out
    // rerank window orders ONE query's ≤2K-row shortlist. All frames
    // ≤ 2·K = 40 rows by construction. The corpus-scale work — one
    // 9-term tokenize pass and one 3-probe embeddings pass — feeds
    // slim checkpoints and TakeOrdereds, never a window
  )

  Queries.registry.filterNot(q => slow(q.name)).foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.build(spark, dir)
      // plan audit: an accidental cartesian product would "work" at
      // sf0.001 and detonate at scale — fail it here
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      val globalWindows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty ||
          constantBoundedGlobalWindow(q.name),
        s"${q.name} plans an unpartitioned Window (single-partition " +
          "sort of the whole input at scale) — use the two-phase " +
          "PrefixPass shape or whitelist with a constant-bound proof")
      assert(df.count() > 0)
    }
  }

  // ------------------------------------------------------------------
  // Golden plan gates: the heavy hitters must keep the physical-plan
  // features they were designed around — a regression here "works" at
  // test scale and detonates at 100x. (BucketingSpec pins the
  // zero-Exchange bucketed join; SkewSpec pins AQE skew handling.)
  // Every broadcast( call site in src/main is classified
  // constant-bounded vs fact-scaled in PLANS.md "Broadcast audit" —
  // a new broadcast hint must add itself there, and a fact-scaled
  // side must go through operators.GatedBroadcast (see the q135/q163
  // shuffle-path tests for the off-gate equality pattern).
  // ------------------------------------------------------------------

  private def planOf(name: String): String =
    Queries.registry.find(_.name == name)
      .getOrElse(fail(s"unknown query $name"))
      .build(spark, dir).queryExecution.executedPlan.toString

  test("golden plans: filters reach the parquet scans") {
    val pushed = """PushedFilters: \[[^\]]""".r
    Seq("q01_pricing_summary", "q09_point_lookup", "q53_cosine_knn")
      .foreach { n =>
        assert(pushed.findFirstIn(planOf(n)).nonEmpty,
          s"$n has no non-empty PushedFilters in its scan")
      }
  }

  test("golden plans: dimension/probe sides broadcast") {
    Seq("q13_join_revenue_by_nation", "q28_shipping_priority",
      "q96_contamination", "q59_ivf_ann", "q113_bloom_decontamination",
      "q109_bm25_ranking", "q116_robust_outliers",
      "q131_quantile_filter", "q134_pq_adc",
      "q207_corpus_drift_tv", "q208_oov_quality").foreach { n =>
      // (q135's broadcasts sit inside its per-round checkpoints and are
      // invisible in the final executedPlan — covered by its invariant
      // test below instead)
      assert(planOf(n).contains("BroadcastExchange"),
        s"$n no longer broadcasts its small side")
    }
  }

  test("golden plans: global top-k plans as TakeOrderedAndProject") {
    Seq("q20_topk_orders", "q28_shipping_priority", "q53_cosine_knn",
      "q59_ivf_ann", "q176_bpe_pairs", "q208_oov_quality").foreach { n =>
      assert(planOf(n).contains("TakeOrderedAndProject"),
        s"$n's top-k degraded to a full global sort")
    }
  }

  test("golden plans: subqueries decorrelate to semi/anti joins") {
    val p183 = planOf("q183_multi_exists")
    assert(p183.contains("LeftSemi"),
      "q183's EXISTS no longer plans as a semi join")
    assert(p183.contains("LeftAnti"),
      "q183's NOT EXISTS no longer plans as an anti join")
    assert(planOf("q187_large_volume").contains("LeftSemi"),
      "q187's IN-subquery no longer plans as a semi join")
    assert(planOf("q184_notin_distinct").contains("LeftAnti"),
      "q184's NOT IN no longer plans as an anti join")
    // decorrelated scalar subqueries must not re-execute per row: the
    // plan has a constant number of aggregates, no per-row subquery node
    assert(!planOf("q185_min_cost_supplier").contains("Subquery"),
      "q185's correlated scalar subquery did not decorrelate")
  }

  test("golden plans: bloom-join bitmap broadcasts to the fact scan") {
    assert(planOf("q195_bloom_join").contains("BroadcastExchange"),
      "q195's bloom bitmap no longer broadcasts")
  }

  test("golden plans: per-group top-k keeps map-side WindowGroupLimit") {
    // rank/row_number <= k over a partitioned window is scale-safe
    // ONLY because Spark plans a partial WindowGroupLimit before the
    // shuffle (k rows per group per partition move, not the fact
    // table); losing the pattern (e.g. a projection between window
    // and filter) silently reverts to a full per-group sort
    for (n <- Seq("q95_balanced_downsample", "q54_knn_multiprobe",
        "q146_hard_negatives", "q104_string_agg")) {
      assert(planOf(n).contains("WindowGroupLimit"),
        s"$n's rank filter no longer plans a map-side WindowGroupLimit")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // ------------------------------------------------------------------
  // Operator invariants the oracle equality can't express on its own
  // (it checks both engines agree; these check the MATH is right).
  // ------------------------------------------------------------------

  private def rowsOf(name: String) =
    Queries.registry.find(_.name == name)
      .getOrElse(fail(s"unknown query $name"))
      .build(spark, dir).collect()

  test("q123 count-min estimates dominate exact counts") {
    val rows = rowsOf("q123_countmin_topk")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val over = r.getAs[Long]("overcount")
      assert(over >= 0L, s"CMS under-counted ${r.getAs[String]("word")}")
      assert(r.getAs[Long]("est") ===
        r.getAs[Long]("n_exact") + over)
    }
  }

  test("q124 cosine is bounded and finds the planted exact copies") {
    val rows = rowsOf("q124_tfidf_cosine")
    rows.foreach { r =>
      val cos = r.getAs[Double]("cos")
      assert(cos >= 0.3 - 1e-9 && cos <= 1.0 + 1e-9,
        s"cos out of range: $cos")
    }
    // corpus() plants byte-identical copies at doc_id+200000: identical
    // TF vectors must score exactly 1 regardless of the df cap
    val exactPairs = rows.collect {
      case r if r.getAs[Long]("d2") == r.getAs[Long]("d1") + 200000L =>
        r.getAs[Double]("cos")
    }
    assert(exactPairs.nonEmpty, "no planted exact-copy pair surfaced")
    exactPairs.foreach(c => assert(c >= 0.9999, s"exact copy scored $c"))
  }

  test("q125 entropy lies in [0, ln n_tokens]") {
    rowsOf("q125_entropy_quality").foreach { r =>
      val h = r.getAs[Double]("entropy")
      val n = r.getAs[Long]("n_tokens")
      assert(h >= -1e-9, s"negative entropy $h")
      // the emitted entropy is round(.,4), which can exceed the exact
      // ln(n) bound by up to half an ulp of the 4th decimal
      assert(h <= math.log(n.toDouble) + 5.1e-5,
        s"entropy $h exceeds ln($n)")
    }
  }

  test("q130 novelty is a fraction and docs seen count never exceeds total") {
    rowsOf("q130_novelty_score").foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= -1e-9 && nov <= 1.0 + 1e-9, s"novelty $nov")
      assert(r.getAs[Long]("n_seen") <= r.getAs[Long]("n_sh"))
    }
  }

  test("q133 finds every planted duplicate class") {
    val r = rowsOf("q133_incremental_dedup").head
    // 20 exact + 10 near + 15 reversed planted; band verification may
    // reclassify a boundary doc but every class must be non-empty and
    // the partition must account for the whole shard
    assert(r.getAs[Long]("n_incoming") === 45L)
    assert(r.getAs[Long]("n_exact") >= 20L)
    assert(r.getAs[Long]("n_near") > 0L)
    assert(r.getAs[Long]("n_new") > 0L)
  }

  test("q134 exact re-ranking never lowers recall") {
    val r = rowsOf("q134_pq_adc").head
    // the reranked top-10 comes from an ADC top-100 superset of the
    // ADC top-10, scored exactly — it can only match or beat ADC
    assert(r.getAs[Double]("recall_rerank") >=
      r.getAs[Double]("recall_adc"))
    assert(r.getAs[Long]("bytes_pq") * 64 === r.getAs[Long]("bytes_raw"))
  }

  test("q135 ranks are positive and sum to ~1 (stochastic fixpoint)") {
    val rows = rowsOf("q135_copurchase_pagerank")
    assert(rows.length === 20)
    rows.foreach(r => assert(r.getAs[Double]("pr") > 0.0))
    // top-20 of a probability vector can't exceed 1
    assert(rows.map(_.getAs[Double]("pr")).sum <= 1.0 + 1e-6)
  }

  test("q135 shuffle path: gated broadcast off, same ranks bit-exact") {
    val expected = rowsOf("q135_copurchase_pagerank")
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val oldAbt = spark.conf.get(abtKey)
    spark.conf.set(graft.operators.GatedBroadcast.ConfKey, "0")
    spark.conf.set(abtKey, "-1")
    try {
      // with the hint gated off AND auto-broadcast disabled, every
      // PageRank iteration genuinely plans a shuffled rank⋈edge join —
      // the path a dimension-sized rank table takes at 100x. DECIMAL
      // round-to-12dp contribution sums make the ranks bit-identical
      // across join strategies and partitionings.
      val got = rowsOf("q135_copurchase_pagerank")
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expected && got.nonEmpty)
    } finally {
      spark.conf.unset(graft.operators.GatedBroadcast.ConfKey)
      spark.conf.set(abtKey, oldAbt)
    }
  }

  test("golden plans: telemetry/span queries keep their scale shapes") {
    // q233/q237: canonical gram ownership must stay ONE map-side-
    // combinable min(struct) aggregate — a Window PARTITIONED ON THE
    // GRAM would pin a 10^8-occurrence boilerplate gram's rows to a
    // single partition (the shape the q233 design note forbids).
    // Windows keyed on doc_id are fine: a partition is one document,
    // bounded by doc length, however often its grams repeat corpus-
    // wide (the island-merge step uses exactly such a window).
    for (n <- Seq("q233_dup_span_removal", "q237_dup_span_cleanse")) {
      val wins = Queries.registry.find(_.name == n).get.build(spark, dir)
        .queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        }
      wins.foreach { w =>
        val keys = w.partitionSpec.flatMap(_.references.map(_.name))
        assert(keys.exists(_.startsWith("doc_id")) &&
            !keys.exists(_.startsWith("g")),
          s"$n plans a Window keyed on the gram stream: $keys")
      }
    }
    // q235/q236/q241: the TopK samples must route through the
    // mergeable ObjectHashAggregate (<= K rows per partition per key
    // reach the shuffle); a SortAggregate fallback buffers and sorts
    // whole groups — the hot 160k-doc signature group at x100.
    // q235/q241 localCheckpoint right after their sample stage, which
    // hides the aggregate from the registry-built plan — inspect the
    // package-private stage builders directly on the real table.
    import org.apache.spark.sql.functions.{col, md5, xxhash64}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stagePlans = Seq(
      "q235.sigSamples" -> operators.DedupQueries.sigSamples(
        docs.select(xxhash64(col("text")).as("sh"), col("doc_id"))),
      "q241.groupSamples" -> operators.DedupQueries.groupSamples(
        docs.select(md5(col("text").cast("binary")).as("g"),
          col("doc_id"))))
      .map { case (n, df) =>
        n -> df.queryExecution.executedPlan.toString }
    (stagePlans :+ ("q236_stratified_sample" ->
        planOf("q236_stratified_sample"))).foreach { case (n, p) =>
      assert(p.contains("ObjectHashAggregate"),
        s"$n's TopK aggregation lost ObjectHashAggregate")
      assert(!p.contains("SortAggregate"),
        s"$n fell back to a sort-based aggregate")
    }
    // q238: corpus-scale ranks come from the two-phase PrefixPass;
    // the only admissible SinglePartition work is one-row scalars.
    // Its per-doc output aggregate is doc_id-keyed, so the plan must
    // have NO single-partition exchange at all; q239 reduces to ONE
    // global-counts row, whose final aggregate legitimately gathers
    // one pre-aggregated row per partition — assert the partial
    // aggregate runs BEFORE the exchange (map-side combine), which is
    // what makes that gather constant-size.
    assert(!planOf("q238_rank_surprisal").contains("SinglePartition"),
      "q238 plans a single-partition exchange")
    val q239Plan = planOf("q239_split_leakage")
    if (q239Plan.contains("SinglePartition")) {
      val firstExchange = q239Plan.indexOf("Exchange SinglePartition")
      val firstPartial = q239Plan.indexOf("HashAggregate")
      assert(firstPartial >= 0 && q239Plan.lastIndexOf(
          "HashAggregate") > firstExchange,
        "q239's global aggregate lost its map-side partial")
    }
  }

  test("q217 packing manifest: every pack except the last holds exactly 2048 tokens") {
    val rows = rowsOf("q217_pack_boundary_manifest")
      .map(r => (r.getAs[Long]("pack_id"), r.getAs[Long]("n_tokens")))
      .sortBy(_._1)
    // integer-exact boundary splits mean interior packs are FULL by
    // construction; the last pack holds the corpus-size remainder
    assert(rows.nonEmpty)
    rows.init.foreach { case (p, n) =>
      assert(n == 2048L, s"pack $p holds $n tokens, expected 2048")
    }
    assert(rows.last._2 <= 2048L)
    // pack ids are contiguous from 0 (no empty interior pack possible)
    assert(rows.map(_._1).toSeq == (0L until rows.length.toLong).toSeq)
  }

  test("PrefixPass naive-window and two-phase shapes agree bit-for-bit") {
    // the SCALE.md crossover table compares the two shapes' timings;
    // this pins that they compute the SAME relation, so the comparison
    // is apples-to-apples (and the naive toggle can't rot silently)
    Seq("q94_ntile_buckets", "q159_skyline", "q178_abc_classes",
      "q182_rfm_segments").foreach { n =>
      val q = Queries.registry.find(_.name == n)
        .getOrElse(fail(s"unknown query $n"))
      // schema equality FIRST: toString renderings can stringify
      // distinct types identically (Int vs Long, boxed vs primitive),
      // so type drift must be caught structurally, not textually
      val tpDf = q.build(spark, dir)
      spark.conf.set(graft.operators.PrefixPass.NaiveConfKey, "true")
      val (nvDf, naiveRows) =
        try { val d = q.build(spark, dir); (d, d.collect()) }
        finally spark.conf.unset(graft.operators.PrefixPass.NaiveConfKey)
      assert(tpDf.schema == nvDf.schema,
        s"$n schemas diverge:\n  two-phase ${tpDf.schema.simpleString}" +
          s"\n  naive     ${nvDf.schema.simpleString}")
      val twoPhase = tpDf.collect().map(_.toString).sorted
      val naive = naiveRows.map(_.toString).sorted
      val diffs = twoPhase.zipAll(naive, "<missing>", "<missing>")
        .filter { case (a, b) => a != b }.take(3)
      assert(diffs.isEmpty,
        s"$n shapes diverge (${twoPhase.length} vs ${naive.length} rows); " +
          s"first differing rows:\n" +
          diffs.map { case (a, b) => s"  two-phase $a\n  naive     $b" }
            .mkString("\n"))
    }
  }

  // ------------------------------------------------------------------
  // Fixture contract: events.ts must arrive as TimestampType with
  // plausible epoch values through BOTH load paths. The fixture's
  // physical ts encoding changed between rounds (TIMESTAMP(NANOS) →
  // timestamp[us] NTZ) and the old hard-coded unit produced
  // 1000×-compressed windows that only the oracle caught — these pin
  // the contract loudly so a future unit slip fails here instead.
  // ------------------------------------------------------------------

  private val epoch1990 = 631152000L
  private val epoch2100 = 4102444800L

  test("fixture contract: every table's loaded schema matches the registry's expectations") {
    // the full post-normalizeTs signature of all ten tables. A
    // generator-side rename/retype (like round 8's ts re-encoding)
    // fails HERE with a readable diff at round start, instead of as a
    // scatter of per-query analysis errors. o_orderdate/l_shipdate
    // are deliberately timestamp_ntz: every consumer (year(),
    // date_format, range predicates) is NTZ-safe, so they load
    // unconverted; events.ts is normalized to session-zoned timestamp
    // because event-time operators need unix_millis/watermarks.
    val expected = Map(
      "region" -> "r_regionkey:int, r_name:string",
      "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
        "c_acctbal:double, c_mktsegment:string"),
      "supplier" -> ("s_suppkey:bigint, s_name:string, s_nationkey:int, " +
        "s_acctbal:double"),
      "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, " +
        "p_type:string, p_size:int, p_retailprice:double"),
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, " +
        "o_orderstatus:string, o_totalprice:double, " +
        "o_orderdate:timestamp_ntz, o_orderpriority:string"),
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, " +
        "l_suppkey:bigint, l_linenumber:int, l_quantity:double, " +
        "l_extendedprice:double, l_discount:double, l_tax:double, " +
        "l_returnflag:string, l_linestatus:string, " +
        "l_shipdate:timestamp_ntz"),
      "events" -> ("event_id:bigint, ts:timestamp, user_id:bigint, " +
        "event_type:string, value:double, props:string"),
      "documents" -> ("doc_id:bigint, text:string, lang:string, " +
        "source:string, n_chars:bigint"),
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")
    Tables.all.foreach { t =>
      val got = Tables.load(Tables.tuned(spark), dir, t).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got == expected(t),
        s"$t loaded schema drifted:\n  got      $got\n  expected ${expected(t)}")
    }
  }

  test("fixture contract: batch loader yields TimestampType ts in 1990-2100") {
    import org.apache.spark.sql.functions.{col, max, min}
    val ev = Tables.load(Tables.tuned(spark), dir, "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"events.ts loaded as ${ev.schema("ts").dataType}")
    val r = ev.agg(min(col("ts")).cast("long"), max(col("ts")).cast("long")).head
    assert(r.getLong(0) >= epoch1990 && r.getLong(1) <= epoch2100,
      s"events.ts epoch range [${r.getLong(0)}, ${r.getLong(1)}] outside " +
        "1990-2100 — physical-encoding unit slip?")
  }

  test("fixture contract: streaming source yields TimestampType ts in 1990-2100") {
    import org.apache.spark.sql.functions.{col, max, min}
    Tables.tuned(spark)
    val src = graft.streaming.StreamQueries.eventsStream(spark, dir)
    assert(src.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"streamed events.ts arrives as ${src.schema("ts").dataType}")
    val name = "graft_fixture_contract"
    val q = src.agg(min(col("ts")).cast("long"), max(col("ts")).cast("long"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val r = spark.table(name).head
    assert(r.getLong(0) >= epoch1990 && r.getLong(1) <= epoch2100,
      s"streamed events.ts epoch range [${r.getLong(0)}, ${r.getLong(1)}] " +
        "outside 1990-2100 — physical-encoding unit slip?")
    spark.catalog.dropTempView(name)
  }
}
