package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** TPC-H subquery-decorrelation suite (Q2 / Q15 / Q18 / Q20 / Q22
  * shapes, re-based onto the testdata star schema — lineitem stands in
  * for partsupp as the part↔supplier relation). All five are issued
  * through spark.sql so the oracle text is the SAME SQL (modulo view
  * names): the point of this family is Catalyst's subquery machinery —
  * correlated scalar subqueries, uncorrelated scalar thresholds, nested
  * IN chains, and correlated NOT EXISTS — each decorrelating to
  * joins/aggregates a 1000-executor plan can run.
  *
  * Thresholds are RELATIVE (cross-multiplied against data-derived
  * totals in exact integer/decimal space), never absolute literals, so
  * every query stays non-degenerate at any scale factor — q188's
  * "above 1.05× average supplier volume" selects ~4 suppliers at
  * sf0.001 and ~200 at sf0.1 from the same text.
  */
object SubqueryQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** TPC-H Q2 shape: per part, the minimum-cost supplier via a
    * CORRELATED scalar aggregate subquery (cost = min line price in
    * integer cents). Catalyst decorrelates the subquery into a
    * per-part min aggregate joined back on p_partkey — two shuffles of
    * the cost relation, no per-row re-aggregation. The cost relation
    * itself reduces the fact table to the (part, supplier) pair
    * dimension first.
    */
  private val q185 = Q(
    "q185_min_cost_supplier",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "lineitem").createOrReplaceTempView("graft_q185_lineitem")
      t(s, dir, "part").createOrReplaceTempView("graft_q185_part")
      t(s, dir, "supplier").createOrReplaceTempView("graft_q185_supplier")
      s.sql("""
        WITH cost AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS cost_cents
          FROM graft_q185_lineitem
          -- semi-join prune pushed into the subquery relation: the
          -- per-part MIN only matters for parts that survive the
          -- p_size filter, so the cost aggregation reads ~20% of the
          -- fact instead of all of it (the oracle aggregates the
          -- unpruned relation — the hash match proves equivalence)
          WHERE l_partkey IN (SELECT p_partkey FROM graft_q185_part
                              WHERE p_size <= 10)
          GROUP BY 1, 2)
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, c.cost_cents
        FROM graft_q185_part p
        JOIN cost c ON p.p_partkey = c.pk
        JOIN graft_q185_supplier s ON s.s_suppkey = c.sk
        WHERE p.p_size <= 10
          AND c.cost_cents = (SELECT MIN(c2.cost_cents) FROM cost c2
                              WHERE c2.pk = c.pk)
        ORDER BY c.cost_cents, p.p_partkey, s.s_suppkey
        LIMIT 20
      """)
    },
    Some("""
      WITH cost AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS cost_cents
        FROM lineitem GROUP BY 1, 2)
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, c.cost_cents
      FROM part p
      JOIN cost c ON p.p_partkey = c.pk
      JOIN supplier s ON s.s_suppkey = c.sk
      WHERE p.p_size <= 10
        AND c.cost_cents = (SELECT MIN(c2.cost_cents) FROM cost c2
                            WHERE c2.pk = c.pk)
      ORDER BY c.cost_cents, p.p_partkey, s.s_suppkey
      LIMIT 20
    """))

  /** TPC-H Q15 shape: the top-revenue supplier(s) of a quarter via an
    * UNCORRELATED scalar MAX subquery over a shared revenue view. The
    * subquery evaluates once (one extra aggregation of the ~supplier-
    * dimension revenue table) and broadcasts as a literal into the
    * filter; revenue equality is DECIMAL-exact, so "the" max is
    * engine-independent even under ties.
    */
  private val q186 = Q(
    "q186_top_supplier",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "lineitem").createOrReplaceTempView("graft_q186_lineitem")
      t(s, dir, "supplier").createOrReplaceTempView("graft_q186_supplier")
      s.sql("""
        WITH rev AS (
          SELECT l_suppkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
          FROM graft_q186_lineitem
          WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
          GROUP BY 1)
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_rev AS DOUBLE) AS total_revenue
        FROM graft_q186_supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        ORDER BY s.s_suppkey
      """)
    },
    Some("""
      WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        GROUP BY 1)
      SELECT s.s_suppkey, s.s_name,
             CAST(r.total_rev AS DOUBLE) AS total_revenue
      FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
      WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
      ORDER BY s.s_suppkey
    """))

  /** TPC-H Q18 shape: large-volume orders via IN over a HAVING
    * aggregate subquery. The IN list is itself an aggregation of the
    * fact table (orders whose total quantity exceeds 300 — a per-order
    * property, scale-invariant); Catalyst plans it as a semi join on
    * l_orderkey against the aggregated set. Quantities sum in BIGINT,
    * prices surface as integral cents.
    */
  private val q187 = Q(
    "q187_large_volume",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "lineitem").createOrReplaceTempView("graft_q187_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("graft_q187_orders")
      t(s, dir, "customer").createOrReplaceTempView("graft_q187_customer")
      s.sql("""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS total_price_cents,
               SUM(CAST(l.l_quantity AS BIGINT)) AS total_qty
        FROM graft_q187_customer c
        JOIN graft_q187_orders o ON c.c_custkey = o.o_custkey
        JOIN graft_q187_lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM graft_q187_lineitem
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
        ORDER BY total_price_cents DESC, o.o_orderkey
        LIMIT 20
      """)
    },
    Some("""
      SELECT c.c_name, c.c_custkey, o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS total_price_cents,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
      GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
      ORDER BY total_price_cents DESC, o.o_orderkey
      LIMIT 20
    """))

  /** TPC-H Q20 shape: a nested IN chain — suppliers IN (the high-volume
    * shippers of parts IN (a name slice)) — with a RELATIVE volume
    * threshold: above 1.05× the average supplier's slice volume,
    * expressed as the cross-multiplication q·n·20 > total·21 so the
    * comparison stays in exact BIGINT space and the query is
    * non-degenerate at every scale factor. The inner IN is a broadcast
    * semi join of part onto the fact scan; the outer IN is a semi join
    * against the aggregated slice.
    */
  private val q188 = Q(
    "q188_semi_chain",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "lineitem").createOrReplaceTempView("graft_q188_lineitem")
      t(s, dir, "part").createOrReplaceTempView("graft_q188_part")
      t(s, dir, "supplier").createOrReplaceTempView("graft_q188_supplier")
      s.sql("""
        WITH slice AS (
          SELECT l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
          FROM graft_q188_lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM graft_q188_part
                              WHERE p_name LIKE '%a%')
          GROUP BY 1)
        SELECT s_suppkey, s_name
        FROM graft_q188_supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM slice
          WHERE q * (SELECT COUNT(*) FROM slice) * 20 >
                (SELECT SUM(q) FROM slice) * 21)
        ORDER BY s_suppkey
      """)
    },
    Some("""
      WITH slice AS (
        SELECT l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%a%')
        GROUP BY 1)
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM slice
        WHERE q * (SELECT COUNT(*) FROM slice) * 20 >
              (SELECT SUM(q) FROM slice) * 21)
      ORDER BY s_suppkey
    """))

  /** TPC-H Q22 shape: above-average-balance customers with no urgent
    * orders, per market segment. The "above average" test cross-
    * multiplies against uncorrelated COUNT/SUM scalar subqueries
    * (balance · n_positive > total_positive) so the cut is DECIMAL-
    * exact — no double-average drift at the boundary — and the
    * correlated NOT EXISTS becomes a broadcast anti join against the
    * urgent-order custkey set.
    */
  private val q189 = Q(
    "q189_balance_opportunity",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "orders").createOrReplaceTempView("graft_q189_orders")
      t(s, dir, "customer").createOrReplaceTempView("graft_q189_customer")
      s.sql("""
        WITH pos AS (
          SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS b
          FROM graft_q189_customer WHERE c_acctbal > 0)
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS totacctbal
        FROM graft_q189_customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
                (SELECT COUNT(*) FROM pos) > (SELECT SUM(b) FROM pos)
          AND NOT EXISTS (
            SELECT 1 FROM graft_q189_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
      """)
    },
    Some("""
      WITH pos AS (
        SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS b
        FROM customer WHERE c_acctbal > 0)
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS totacctbal
      FROM customer c
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
              (SELECT COUNT(*) FROM pos) > (SELECT SUM(b) FROM pos)
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
    """))

  val registry: Seq[Q] = Seq(q185, q186, q187, q188, q189)
}
