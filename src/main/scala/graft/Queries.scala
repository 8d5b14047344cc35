package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.functions.Exprs._
import graft.operators.Coerce

/** The engine's query registry: every operator from SURVEY.md §2 (plus the
  * large-scale-pipeline extensions) exposed as a named
  * `(SparkSession, sfDir) => DataFrame`, with a DuckDB-equivalent ANSI SQL
  * oracle where the operator is SQL-expressible.
  *
  * Numeric-output discipline (so Spark and the DuckDB oracle hash
  * identically): money arithmetic in DECIMAL(18,2) space surfaced as
  * double; integer outputs pinned to 64-bit; no raw double aggregation.
  */
case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(Tables.tuned(s), dir, name)

  // ---------------------------------------------------------------------
  // Wave 1 — reference relational parity (SURVEY §2.2-§2.3, §2.10)
  // ---------------------------------------------------------------------

  /** TPC-H Q1-style pricing summary: filter -> hash aggregate with exact
    * decimal money math. Scans only 7 of 11 lineitem columns (column
    * pruning) and pushes the shipdate filter to parquet.
    */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
          * (lit(1) + dec2(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             SUM(l_quantity) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
             SUM(l_quantity) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
    """))

  /** The reference's class-balance query: conditional label + group count
    * (reference: spark_model_trainer.py:151-156 — `is_high_protein =
    * when(Protein-G > 20, 1.0).otherwise(0.0)` then groupBy().count()).
    */
  private val q02 = Q(
    "q02_class_balance",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn("is_high_value",
          when(col("value") > 20.0, 1.0).otherwise(0.0))
        .groupBy(col("is_high_value"))
        .agg(count(lit(1)).as("n")),
    Some("""
      SELECT CAST(CASE WHEN value > 20.0 THEN 1.0 ELSE 0.0 END AS DOUBLE)
               AS is_high_value,
             COUNT(*) AS n
      FROM events
      GROUP BY 1
    """))

  /** Coerce-with-defaults over a dirty source (SURVEY §1.3): JSON field ->
    * double with 0.0 default, string with 'Unknown' default — the
    * reference's three-layer "default, not null" rule as one projection
    * (reference: producer.py:79-87, batch_writer_consumer.py:50-58).
    */
  private val q03 = Q(
    "q03_coerce_defaults",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn("k",
          Coerce.toDoubleOrDefault(get_json_object(col("props"), "$.k")))
        .withColumn("etype", Coerce.toStringOrDefault(col("event_type")))
        .groupBy(col("etype"))
        .agg(sum(col("k").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_k"),
          count(lit(1)).as("n")),
    Some("""
      SELECT COALESCE(event_type, 'Unknown') AS etype,
             CAST(SUM(CAST(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_k,
             COUNT(*) AS n
      FROM events
      GROUP BY 1
    """))

  /** Null-fill semantics (reference: spark_model_trainer.py:53,63
    * `df.na.fill`): synthesize nulls with nullif, then fill. */
  private val q04 = Q(
    "q04_null_fill",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("lang_n", expr("nullif(lang, 'en')"))
      d.na.fill("Unknown", Seq("lang_n"))
        .groupBy(col("lang_n")).agg(count(lit(1)).as("n"))
    },
    Some("""
      SELECT COALESCE(NULLIF(lang, 'en'), 'Unknown') AS lang_n, COUNT(*) AS n
      FROM documents
      GROUP BY 1
    """))

  /** Missing-column synthesis (reference: spark_model_trainer.py:55-59):
    * absent columns appear as constant defaults. */
  private val q05 = Q(
    "q05_missing_col_synth",
    (s, dir) =>
      Coerce.withDefaults(
        t(s, dir, "documents"),
        numeric = Seq("n_chars", "not_present_metric"),
        strings = Seq("lang", "not_present_desc"))
        .groupBy(col("lang"), col("not_present_desc"))
        .agg(sum(col("n_chars")).cast(DoubleType).as("sum_chars"),
          sum(col("not_present_metric")).as("sum_missing")),
    Some("""
      SELECT lang, 'Unknown' AS not_present_desc,
             CAST(SUM(CAST(n_chars AS DOUBLE)) AS DOUBLE) AS sum_chars,
             CAST(SUM(0.0) AS DOUBLE) AS sum_missing
      FROM documents
      GROUP BY 1, 2
    """))

  /** Deterministic cumulative limit-slice (reference:
    * spark_model_trainer.py:210-226 trains model k on the first k/5 of
    * the data via bare `limit()`; the engine imposes an explicit total
    * order first so the slice is reproducible — SURVEY §7.4).
    */
  private val q06 = Q(
    "q06_limit_slice",
    (s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(10000)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty")),
    Some("""
      SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10000)
      GROUP BY 1
    """))

  /** Group-by count — the reference's only true aggregation surface
    * (spark_model_trainer.py:156). */
  private val q07 = Q(
    "q07_group_count",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")),
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    """))

  /** Per-table record counts — the README `/stats/modelN` surface
    * (reference: README.md:128-132). */
  private val q08 = Q(
    "q08_table_stats",
    (s, dir) => {
      val tables = Seq("customer", "orders", "lineitem", "events", "documents")
      tables.map { n =>
        t(s, dir, n).agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("tbl"), col("n_rows"))
      }.reduce(_.unionByName(_))
    },
    Some("""
      SELECT 'customer' AS tbl, COUNT(*) AS n_rows FROM customer
      UNION ALL SELECT 'orders', COUNT(*) FROM orders
      UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
      UNION ALL SELECT 'events', COUNT(*) FROM events
      UNION ALL SELECT 'documents', COUNT(*) FROM documents
    """))

  /** Point lookup by key — the README `/food_details/<fdc_id>` surface
    * (reference: README.md:122-126). Pushes an equality predicate into
    * the parquet scan. */
  private val q09 = Q(
    "q09_point_lookup",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") === 1L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          dec2(col("o_totalprice")).cast(DoubleType).as("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority")),
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
      FROM orders WHERE o_orderkey = 1
    """))

  /** Case-insensitive substring search — the README allergen surface
    * (reference: README.md:92,116-120 `lower(ingredients).contains(x)`). */
  private val q10 = Q(
    "q10_substring_search",
    (s, dir) =>
      t(s, dir, "documents")
        .filter(lower(col("text")).contains("merge sort"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
    Some("""
      SELECT doc_id, lang, source, n_chars
      FROM documents WHERE lower(text) LIKE '%merge sort%'
    """))

  /** Row-level projection with a computed money column (reference §2.2
    * P1/P7 narrow projections; exact decimal net price). */
  private val q11 = Q(
    "q11_projection",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), asLong(col("l_linenumber")).as("l_linenumber"),
          col("l_quantity"),
          (dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast(DoubleType).as("net_price"),
          col("l_returnflag")),
    Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_quantity,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
             l_returnflag
      FROM lineitem
    """))

  // ---------------------------------------------------------------------
  // Wave 2 — joins / set ops / sorts / window functions (SURVEY §2.4:
  // absent from the reference, provided by the engine as first-class ops)
  // ---------------------------------------------------------------------

  /** Revenue per nation: 4-way join with broadcast dimensions (region,
    * nation, customer broadcast; fact tables shuffle on join keys).
    * TPC-H Q5 shape. */
  private val q13 = Q(
    "q13_join_revenue_by_nation",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
    """))

  /** Left outer join preserving customers with zero orders; counts are of
    * the non-null right side. */
  private val q14 = Q(
    "q14_join_left_outer",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          sum(coalesce(dec2(col("o_totalprice")), lit(0)))
            .cast(DoubleType).as("total_spend"))
    },
    Some("""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
             CAST(SUM(COALESCE(CAST(o_totalprice AS DECIMAL(18,2)), 0)) AS DOUBLE) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1
    """))

  /** Left-semi join (EXISTS): customers having at least one finished
    * order. */
  private val q15 = Q(
    "q15_semi_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """))

  /** Left-anti join (NOT EXISTS): customers with no pending order. */
  private val q16 = Q(
    "q16_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """))

  /** UNION (distinct): nation keys present in either customer or
    * supplier. */
  private val q17 = Q(
    "q17_union_distinct",
    (s, dir) =>
      t(s, dir, "customer").select(asLong(col("c_nationkey")).as("nkey"))
        .union(t(s, dir, "supplier").select(asLong(col("s_nationkey")).as("nkey")))
        .distinct(),
    Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nkey FROM customer
      UNION
      SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    """))

  /** INTERSECT: nation keys with both customers and suppliers. */
  private val q18 = Q(
    "q18_intersect",
    (s, dir) =>
      t(s, dir, "customer").select(asLong(col("c_nationkey")).as("nkey"))
        .intersect(
          t(s, dir, "supplier").select(asLong(col("s_nationkey")).as("nkey"))),
    Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nkey FROM customer
      INTERSECT
      SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    """))

  /** EXCEPT: parts never shipped in a high-quantity line. */
  private val q19 = Q(
    "q19_except",
    (s, dir) =>
      t(s, dir, "part").select(col("p_partkey").as("pkey"))
        .except(
          t(s, dir, "lineitem").filter(col("l_quantity") > 48.0)
            .select(col("l_partkey").as("pkey"))),
    Some("""
      SELECT p_partkey AS pkey FROM part
      EXCEPT
      SELECT l_partkey FROM lineitem WHERE l_quantity > 48.0
    """))

  /** Global top-k with deterministic tiebreak — plans to
    * TakeOrderedAndProject (per-partition top-k then driver merge of k
    * rows; no full sort, no full shuffle — the 100 TB-safe top-k). */
  private val q20 = Q(
    "q20_topk_orders",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"),
          dec2(col("o_totalprice")).cast(DoubleType).as("o_totalprice")),
    Some("""
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """))

  /** Ranking window: top-3 orders per customer (row_number with
    * deterministic tiebreak). */
  private val q21 = Q(
    "q21_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          dec2(col("o_totalprice")).cast(DoubleType).as("o_totalprice"),
          asLong(col("rn")).as("rn"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
             CAST(rn AS BIGINT) AS rn
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders)
      WHERE rn <= 3
    """))

  /** Running-sum window over an exact decimal, per customer ordered by
    * date. */
  private val q22 = Q(
    "q22_window_running_sum",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("run_total", sum(dec2(col("o_totalprice"))).over(w)
          .cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("run_total"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      FROM orders
    """))

  /** lag(): delta between consecutive order prices per customer, exact in
    * decimal space. */
  private val q23 = Q(
    "q23_window_lag",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("prev", lag(dec2(col("o_totalprice")), 1).over(w))
        .withColumn("delta", (dec2(col("o_totalprice")) - col("prev"))
          .cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"), col("delta"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
                  LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1)
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS delta
      FROM orders
    """))

  /** ROLLUP: hierarchical subtotals (returnflag -> linestatus ->
    * grand total). */
  private val q24 = Q(
    "q24_rollup",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty")),
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """))

  /** CUBE over order status x priority. */
  private val q25 = Q(
    "q25_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total")),
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """))

  /** GROUPING SETS with explicit set list. */
  private val q26 = Q(
    "q26_grouping_sets",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("graft_q26_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM graft_q26_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      """)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """))

  /** Exact distinct aggregation (expands to a two-phase aggregate;
    * approx_count_distinct is the 100 TB fallback, exercised rows-only
    * since HLL sketches are engine-specific). */
  private val q27 = Q(
    "q27_distinct_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n")),
    Some("""
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
      FROM lineitem GROUP BY 1
    """))

  /** Shipping-priority query (TPC-H Q3 shape): selective dimension
    * filter, 3-way join, aggregate, top-10. */
  private val q28 = Q(
    "q28_shipping_priority",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      val li = t(s, dir, "lineitem")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("revenue"))
    },
    Some("""
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, revenue
      FROM (
        SELECT o_orderkey, o_orderdate,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate)
      ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """))

  /** min/max/sum/count profile per group (part catalog stats). */
  private val q29 = Q(
    "q29_minmax_agg",
    (s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"),
          asLong(sum(col("p_size"))).as("sum_size"),
          asLong(min(col("p_size"))).as("min_size"),
          asLong(max(col("p_size"))).as("max_size"),
          count(lit(1)).as("n")),
    Some("""
      SELECT p_brand, MIN(p_retailprice) AS min_price,
             MAX(p_retailprice) AS max_price,
             CAST(SUM(p_size) AS BIGINT) AS sum_size,
             CAST(MIN(p_size) AS BIGINT) AS min_size,
             CAST(MAX(p_size) AS BIGINT) AS max_size,
             COUNT(*) AS n
      FROM part GROUP BY 1
    """))

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val registry: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11,
    q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25,
    q26, q27, q28, q29) ++
    graft.functions.ScalarQueries.registry ++
    graft.streaming.StreamQueries.registry ++
    graft.operators.DedupQueries.registry ++
    graft.operators.SimilarityQueries.registry ++
    graft.ml.MlQueries.registry ++
    graft.operators.AnalyticQueries.registry ++
    graft.sources.SourceQueries.registry ++
    graft.operators.PipelineQueries.registry ++
    graft.operators.TemporalGraphQueries.registry ++
    graft.operators.StatQueries.registry ++
    graft.operators.SubqueryQueries.registry ++
    graft.operators.SketchQueries.registry ++
    graft.operators.Spark4Queries.registry ++
    graft.operators.QualityQueries.registry ++
    graft.operators.TrainingSetQueries.registry ++
    graft.operators.BpeQueries.registry ++
    graft.operators.LmQueries.registry ++
    graft.operators.RetrievalQueries.registry ++
    graft.operators.UnigramQueries.registry ++
    graft.operators.LshIndexQueries.registry ++
    graft.operators.LexIndexQueries.registry ++
    graft.operators.SetSimQueries.registry ++
    graft.operators.RebalanceQueries.registry ++
    graft.operators.ClusterIndexQueries.registry ++
    graft.operators.LtrHoldoutQueries.registry ++
    graft.operators.RepeatBudgetQueries.registry

  // NO stripMargin here: its margin char is '|', so an oracle line that
  // begins with a '||' concatenation would silently lose a pipe
  private def normalize(sql: String): String =
    sql.trim.linesIterator.map(_.trim).filter(_.nonEmpty)
      .mkString(" ")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap
}
