package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.Exprs.{asLong, dec2, md5Int32}

/** Mergeable-sketch and incremental-maintenance operators (round 6).
  *
  * q190 is a deterministic HyperLogLog built from first principles on
  * md5-derived hashes: every engine computes the identical 256 register
  * values, so even the ESTIMATE is oracle-hash-checkable — the usual
  * "approx results can't be differentially tested" objection disappears
  * when the randomness is a seeded hash. q191 states the incremental
  * view-maintenance identity for joins as a differential test: the
  * engine computes the 4-term delta decomposition, the ORACLE computes
  * the plain join — a hash match proves the maintenance algebra.
  */
object SketchQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** 2^-r lookup for register ranks 1..25 as exact decimal strings —
    * 2^-r has exactly r decimal digits (5^r·10^-r), so DECIMAL(38,30)
    * holds every entry exactly and the register sum is
    * partition-order-independent on both engines (a raw double sum of
    * mixed-magnitude 2^-r terms would not be). */
  private[graft] val Pow2Lut: Seq[String] =
    (1 to 25).map(r => (BigDecimal(1) / BigDecimal(2).pow(r))
      .bigDecimal.toPlainString)

  private val Pow2LutDuck: String =
    Pow2Lut.map(s => s"'$s'").mkString("[", ", ", "]")

  /** events → (event_type, bucket, r) HLL register rows; shared by the
    * batch (q190) and streaming (q194) sketches. */
  private[graft] def hllRegisterRows(
      ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        md5Int32(col("user_id").cast(StringType)).as("h"))
      .select(col("event_type"),
        expr("shiftright(h, 24)").as("bucket"),
        col("h").bitwiseAND(lit(16777215L)).as("w"))
      .select(col("event_type"), col("bucket"),
        when(col("w") === 0, lit(25))
          .otherwise(lit(25) - length(bin(col("w")))).as("r"))

  /** (event_type, bucket, r)-register table → per-type HLL estimate
    * (exact-decimal LUT sum; linear-counting small-range branch). */
  private[graft] def hllEstimate(
      reg: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ps = reg
      .groupBy(col("event_type"))
      .agg(
        sum(element_at(typedlit(Pow2Lut), col("r").cast(IntegerType))
          .cast(DecimalType(38, 30))).as("sp"),
        count(lit(1)).as("nreg"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val rawE = alpha * lit(65536.0) /
      (col("sp") + (lit(256) - col("nreg"))).cast(DoubleType)
    val zeros = lit(256) - col("nreg")
    val est = when(rawE <= lit(640.0) && zeros > 0,
      lit(256.0) * log(lit(256.0) / zeros.cast(DoubleType)))
      .otherwise(rawE)
    ps.select(
      col("event_type"),
      asLong(col("nreg")).as("n_registers"),
      round(est, 4).as("hll_estimate"))
  }

  /** Deterministic HyperLogLog distinct-user estimate per event type,
    * next to the exact count. m=256 registers; hash = md5-derived
    * 32-bit int (engine-reproducible); bucket = top 8 bits; rank =
    * leading-zero position in the low 24 bits via length(bin(w)) —
    * integer-exact on both engines. The register table is the scale
    * story: 256 rows per group REGARDLESS of fact size, built by a
    * map-side-combining max aggregation, and mergeable across shards/
    * days by the same max (SketchSpec pins sketch(A∪B) = max-merge).
    * The raw estimate alpha·m²/Σ2^-r uses the exact decimal LUT sum
    * cast to double; below 2.5m with empty registers it switches to
    * linear counting m·ln(m/V) (the standard small-range correction —
    * the testdata exercises BOTH branches: linear counting at
    * sf≤0.01, raw HLL at sf0.1). The branch condition compares
    * identical doubles on both engines; ln() may differ in the last
    * ulp across libm implementations, so the estimate rounds to 4dp
    * (the q109/q129 ln-ulp discipline).
    */
  private val q190 = Q(
    "q190_hll_sketch",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val reg = hllRegisterRows(ev)
        .groupBy(col("event_type"), col("bucket"))
        .agg(max(col("r")).as("r"))
      val exact = ev.filter(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(asLong(countDistinct(col("user_id"))).as("exact_distinct"))
      hllEstimate(reg).join(exact, "event_type")
        .select(col("event_type"), col("n_registers"),
          col("hll_estimate"), col("exact_distinct"))
    },
    Some(s"""
      WITH ev AS (
        SELECT event_type, user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL),
      rk AS (
        SELECT event_type, h >> 24 AS bucket,
               MAX(CASE WHEN (h & 16777215) = 0 THEN 25
                        ELSE 25 - length(bin(h & 16777215)) END) AS r
        FROM ev GROUP BY 1, 2),
      ps AS (
        SELECT event_type,
               SUM(CAST(list_extract($Pow2LutDuck, r) AS DECIMAL(38,30)))
                 AS sp,
               COUNT(*) AS nreg
        FROM rk GROUP BY 1),
      ex AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
        FROM ev GROUP BY 1),
      est AS (
        SELECT event_type, nreg,
               (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 /
                 CAST(sp + (256 - nreg) AS DOUBLE) AS raw_e,
               256 - nreg AS zeros
        FROM ps)
      SELECT event_type,
             CAST(nreg AS BIGINT) AS n_registers,
             ROUND(CASE WHEN raw_e <= 640.0 AND zeros > 0
                        THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
                        ELSE raw_e END, 4) AS hll_estimate,
             CAST(exact_distinct AS BIGINT) AS exact_distinct
      FROM est JOIN ex USING (event_type)
    """))

  /** Incremental join-view maintenance: the revenue-by-priority join
    * view recomputed as the 4-term delta decomposition
    * (A∪ΔA)⋈(B∪ΔB) = A⋈B ∪ A⋈ΔB ∪ ΔA⋈B ∪ ΔA⋈ΔB, where ΔA = new
    * orders (1998+) and ΔB = newly shipped lines (mid-1997+). The
    * ORACLE computes the plain full join — the hash match IS the proof
    * that the maintenance algebra loses and duplicates nothing. At
    * 100 TB this is the nightly-refresh pattern: the three delta terms
    * touch only delta-sized inputs on one side (the ΔA⋈B term prunes
    * the big side by the join keys present in ΔA — here expressed
    * directly; a production refresh would semi-join-prune first).
    */
  private val q191 = Q(
    "q191_incremental_join",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"),
          (dec2(col("l_extendedprice")) *
            (lit(1) - dec2(col("l_discount")))).as("rev"))
      val oOld = o.filter(col("o_orderdate") < "1998-01-01")
      val oNew = o.filter(col("o_orderdate") >= "1998-01-01")
      val lOld = l.filter(col("l_shipdate") < "1997-07-01")
      val lNew = l.filter(col("l_shipdate") >= "1997-07-01")
      def term(a: org.apache.spark.sql.DataFrame,
               b: org.apache.spark.sql.DataFrame) =
        a.join(b, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderpriority"), col("rev"))
      term(oOld, lOld)
        .unionAll(term(oOld, lNew))
        .unionAll(term(oNew, lOld))
        .unionAll(term(oNew, lNew))
        .groupBy(col("o_orderpriority"))
        .agg(
          asLong(count(lit(1))).as("n_lines"),
          sum(col("rev")).cast(DoubleType).as("revenue"))
    },
    Some("""
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1
    """))

  /** Bloom-prefiltered join — the explicit runtime-filter pattern: a
    * 16 KB bloom bitmap (131072 bits as 63-bit-packed longs, k=2
    * salted-md5 probes, same construction as q113) built from the
    * DELTA orders' keys broadcasts to the lineitem scan, which drops
    * non-matching rows BEFORE the join shuffle. Blooms have no false
    * negatives and the exact join removes false positives, so the
    * prefilter is semantically transparent — which is precisely what
    * the oracle proves by computing the PLAIN join (same differential
    * structure as q191). At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling the ~selectivity
    * fraction that can possibly match.
    */
  private val q195 = Q(
    "q195_bloom_join",
    (s, dir) => {
      val m = 131072L
      def positions(c: org.apache.spark.sql.Column) = (0 until 2).map(i =>
        md5Int32(concat(lit(s"$i|"), c.cast(StringType))) % m)
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1998-01-01")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val bitmap = o
        .select(explode(array(positions(col("o_orderkey")): _*)).as("pos"))
        .select(expr("pos div 63").as("word_idx"),
          expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))")
            .as("bit"))
        .groupBy(col("word_idx"))
        .agg(expr("bit_or(bit)").as("bits"))
        // the ~16 KB bitmap broadcasts twice (one copy per hash
        // function) — materialize it or each broadcast re-scans the
        // build side to rebuild it (round-6 plan audit)
        .localCheckpoint()
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"),
        (dec2(col("l_extendedprice")) *
          (lit(1) - dec2(col("l_discount")))).as("rev"))
      val Seq(p0, p1) = positions(col("l_orderkey"))
      val survivors = li
        .withColumn("w0", p0.cast(LongType))
        .withColumn("w1", p1.cast(LongType))
        .join(broadcast(bitmap.select(col("word_idx").as("i0"),
          col("bits").as("b0"))), expr("w0 div 63") === col("i0"), "left")
        .join(broadcast(bitmap.select(col("word_idx").as("i1"),
          col("bits").as("b1"))), expr("w1 div 63") === col("i1"), "left")
        .filter(
          coalesce(expr(
            "(b0 & shiftleft(cast(1 as bigint), cast(w0 % 63 as int))) != 0"),
            lit(false)) &&
          coalesce(expr(
            "(b1 & shiftleft(cast(1 as bigint), cast(w1 % 63 as int))) != 0"),
            lit(false)))
        .select(col("l_orderkey"), col("rev"))
      survivors
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          asLong(count(lit(1))).as("n_lines"),
          sum(col("rev")).cast(DoubleType).as("revenue"))
    },
    Some("""
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      GROUP BY 1
    """))

  /** KMV (k-minimum-values) distinct sketch with SET-OPERATION algebra
    * — the capability q190's HLL lacks: max-merged HLL registers give
    * union estimates only, while two KMV sketches support union AND
    * intersection/Jaccard estimation from the sketches alone
    * (Beyer et al., "On Synopses for Distinct-Value Estimation Under
    * Multiset Operations", SIGMOD'07). For every event-type pair
    * (a < b): K_A/K_B are each type's k=64 smallest md5-derived
    * 32-bit user hashes; K_U = the k smallest of K_A ∪ K_B (a valid
    * KMV of the union by the k-min property); ρ = |{h ∈ K_U : h ∈ K_A
    * ∧ h ∈ K_B}| / |K_U| estimates Jaccard; est_union = (k−1)·2³²/t_k
    * (t_k = K_U's largest member) when the union carries ≥ k distinct
    * hashes, the EXACT distinct count below that (small-range branch,
    * like q190's linear counting; the sf ladder exercises both).
    *
    * Deterministic end to end: md5 hashing, integer thresholds, and
    * divisions of integers both engines computed identically — the
    * approximate estimates are hash-compared, not bounded. Scale: one
    * distinct-(type,user) aggregation of the fact table; everything
    * after runs on ≤ k·|types| rows of sketch state (320 here —
    * constant in fact volume, the point of a sketch).
    */
  private val q228 = {
    val K = 64
    Q(
      "q228_kmv_sketch",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val kmv = t(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
          .select(col("event_type"),
            md5Int32(col("user_id").cast(StringType)).as("h"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("h").asc)))
          .filter(col("rk") <= K)
          .select(col("event_type"), col("h"))
        // sketch state from here on: ≤ k·|types| rows. Pair grid and
        // union sketches are dimension-table algebra (the OR-join is a
        // broadcast nested loop over ≤ 25 pairs × 320 sketch rows).
        val types = kmv.select(col("event_type")).distinct()
        // explicit broadcast so the inequality self-join of the TYPE
        // DIMENSION (≤ |event types| rows, enum-bounded) plans as a
        // BroadcastNestedLoopJoin, never a CartesianProduct
        val pairs = types.select(col("event_type").as("type_a"))
          .join(broadcast(types.select(col("event_type").as("type_b"))),
            col("type_a") < col("type_b"))
        val unionK = kmv
          .join(broadcast(pairs), col("event_type") === col("type_a") ||
            col("event_type") === col("type_b"))
          .select(col("type_a"), col("type_b"), col("h"))
          .distinct()
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("type_a"), col("type_b"))
              .orderBy(col("h").asc)))
          .filter(col("rk") <= K)
        val a = kmv.select(col("event_type").as("type_a"),
          col("h"), lit(1).as("in_a"))
        val b = kmv.select(col("event_type").as("type_b"),
          col("h"), lit(1).as("in_b"))
        val flagged = unionK
          .join(a, Seq("type_a", "h"), "left")
          .join(b, Seq("type_b", "h"), "left")
        flagged.groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("ku"),
            sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
              .otherwise(0L)).as("shared"),
            max(col("h")).as("tk"))
          .select(col("type_a"), col("type_b"),
            col("ku").cast(LongType).as("union_sketch_size"),
            col("shared").cast(LongType).as("shared_in_union"),
            (col("shared").cast(DoubleType) / col("ku").cast(DoubleType))
              .as("est_jaccard"),
            when(col("ku") < K, col("ku").cast(DoubleType))
              .otherwise(lit((K - 1).toDouble) * lit(4294967296.0) /
                col("tk").cast(DoubleType))
              .as("est_union"))
      },
      Some(s"""
        WITH du AS (
          SELECT DISTINCT event_type, user_id FROM events),
        kmv AS (
          SELECT event_type, h FROM (
            SELECT event_type,
                   ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT
                     AS h,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY ('0x'||substr(md5(CAST(user_id AS VARCHAR)),
                       1,8))::BIGINT ASC) AS rk
            FROM du)
          WHERE rk <= $K),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM (SELECT DISTINCT event_type FROM kmv) a,
               (SELECT DISTINCT event_type FROM kmv) b
          WHERE a.event_type < b.event_type),
        uni AS (
          SELECT type_a, type_b, h, ROW_NUMBER() OVER (
                   PARTITION BY type_a, type_b ORDER BY h ASC) AS rk
          FROM (
            SELECT DISTINCT p.type_a, p.type_b, k.h
            FROM pairs p JOIN kmv k
              ON k.event_type = p.type_a OR k.event_type = p.type_b)),
        fl AS (
          SELECT u.type_a, u.type_b, u.h,
                 CASE WHEN ka.h IS NOT NULL AND kb.h IS NOT NULL
                      THEN 1 ELSE 0 END AS in_both
          FROM uni u
          LEFT JOIN kmv ka ON ka.event_type = u.type_a AND ka.h = u.h
          LEFT JOIN kmv kb ON kb.event_type = u.type_b AND kb.h = u.h
          WHERE u.rk <= $K)
        SELECT type_a, type_b,
               COUNT(*) AS union_sketch_size,
               CAST(SUM(in_both) AS BIGINT) AS shared_in_union,
               CAST(SUM(in_both) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS est_jaccard,
               CASE WHEN COUNT(*) < $K THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE ${K - 1}.0 * 4294967296.0
                         / CAST(MAX(h) AS DOUBLE) END AS est_union
        FROM fl GROUP BY 1, 2
      """))
  }

  /** Mergeable quantile sketch — the missing member of the sketch
    * family (HLL q190, bloom q195, count-min q123, KMV q228 cover
    * cardinality/membership/frequency; this covers QUANTILES): a
    * deterministic bottom-K-by-salted-hash uniform sample (the KMV
    * idea pointed at values) kept by the mergeable [[TopK]]
    * Aggregator, quantiles read as order statistics of the sample
    * next to the exact interpolated percentiles they approximate.
    * Bounded state (K rows per partition shuffled, one K-array
    * merged) where the exact percentile needs a full sort — the
    * 100 TB trade this table quantifies.
    *
    * Everything is deterministic and oracle-expressible: the sample
    * is "the K rows with the smallest md5(orderkey|linenumber)", so
    * DuckDB reproduces the exact same sample, order statistics, and
    * errors — no probabilistic bound needs trusting. */
  private val q267 = {
    val K = 256
    Q(
      "q267_sample_quantile_sketch",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "lineitem")
          .select(
            (lit(0L) - md5Int32(concat(
              col("l_orderkey").cast(StringType), lit("|"),
              col("l_linenumber").cast(StringType)))).as("nh"),
            (dec2(col("l_extendedprice")) * 100).cast(LongType).as("cents"))
        val sample = base.as[(Long, Long)]
          .groupByKey(_ => 0)
          .mapValues(identity)
          .agg(new graft.functions.TopK(K).toColumn.name("top"))
          .toDF("g", "top")
          .select(array_sort(expr("transform(top, p -> p._2)")).as("sv"))
        val exact = base.agg(percentile(col("cents"),
          typedlit(Seq(0.25, 0.5, 0.75, 0.9))).as("ex"))
        sample.crossJoin(broadcast(exact))
          .select(posexplode(typedlit(Seq(0.25, 0.5, 0.75, 0.9)))
            .as(Seq("i", "p")), col("sv"), col("ex"))
          .select(
            (col("p") * 100).cast(LongType).as("p_pct"),
            round(element_at(col("ex"), col("i") + 1) / lit(100.0), 4)
              .as("exact_price"),
            round(element_at(col("sv"),
              greatest(lit(1), least(lit(K),
                ceil(col("p") * size(col("sv"))).cast(IntegerType))))
              / lit(100.0), 2).as("sample_price"))
          .withColumn("abs_err",
            round(abs(col("exact_price") - col("sample_price")), 4))
          .orderBy(col("p_pct"))
      },
      Some(s"""
        WITH base AS (
          SELECT ('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)||'|'
                   ||CAST(l_linenumber AS VARCHAR)),1,8))::BIGINT AS h,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                   AS BIGINT) AS cents
          FROM lineitem),
        samp AS (
          SELECT list(cents ORDER BY cents) AS sv
          FROM (SELECT cents FROM base ORDER BY h, cents LIMIT $K)),
        ex AS (SELECT quantile_cont(cents, [0.25, 0.5, 0.75, 0.9]) AS ex
               FROM base),
        ps AS (SELECT * FROM (VALUES (1, 0.25), (2, 0.5), (3, 0.75),
                 (4, 0.9)) t(i, p))
        SELECT CAST(p * 100 AS BIGINT) AS p_pct,
               round(ex[i] / 100.0, 4) AS exact_price,
               round(sv[greatest(1, least($K,
                 CAST(ceil(p * len(sv)) AS INT)))] / 100.0, 2)
                 AS sample_price,
               round(abs(round(ex[i] / 100.0, 4)
                 - round(sv[greatest(1, least($K,
                     CAST(ceil(p * len(sv)) AS INT)))] / 100.0, 2)), 4)
                 AS abs_err
        FROM ps, samp, ex
        ORDER BY p_pct
      """))
  }

  val registry: Seq[Q] = Seq(q190, q191, q195, q228, q267)
}
