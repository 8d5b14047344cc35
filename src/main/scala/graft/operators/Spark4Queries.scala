package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Exprs.asLong

/** Spark 4 language-surface operators: the VARIANT semi-structured
  * type, SQL pipe syntax, and collation-aware grouping. These are
  * engine-surface showcases — each compiles to the same Catalyst plans
  * as its classic formulation (the oracle runs the classic form on
  * DuckDB), so they prove the NEW front doors produce the same answers
  * as the old ones.
  */
object Spark4Queries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** VARIANT ingestion of the events props JSON: parse_json once into
    * a variant column, typed variant_get extraction, aggregate. At
    * scale this is the schema-on-read path for heterogeneous JSON —
    * the variant binary encoding is columnar-shreddable, and the
    * typed get pushes into the scan in formats that support it. The
    * oracle extracts the same field with DuckDB's JSON operators —
    * integer-exact outputs.
    */
  private val q198 = Q(
    "q198_variant_json",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "events").createOrReplaceTempView("graft_q198_events")
      s.sql("""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(variant_get(parse_json(props), '$.k', 'bigint'))
                    AS BIGINT) AS sum_k,
               CAST(MIN(variant_get(parse_json(props), '$.k', 'bigint'))
                    AS BIGINT) AS min_k,
               CAST(MAX(variant_get(parse_json(props), '$.k', 'bigint'))
                    AS BIGINT) AS max_k
        FROM graft_q198_events
        WHERE props IS NOT NULL
        GROUP BY event_type
      """)
    },
    Some("""
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS sum_k,
             CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS min_k,
             CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS max_k
      FROM events
      WHERE props IS NOT NULL
      GROUP BY event_type
    """))

  /** SQL pipe syntax (Spark 4 `|>` operators): the pricing-summary
    * aggregation written as a linear pipeline — FROM |> WHERE |>
    * AGGREGATE ... GROUP BY |> ORDER BY. Identical Catalyst plan to
    * the classic q01 form; the oracle runs the classic SQL. */
  private val q199 = Q(
    "q199_pipe_syntax",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "lineitem").createOrReplaceTempView("graft_q199_lineitem")
      s.sql("""
        FROM graft_q199_lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |> AGGREGATE
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
      """)
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  /** Collation-aware grouping: a mixed-case part-type column (lower on
    * even keys; the source values are uppercase) grouped under UTF8_LCASE, so 'STANDARD BRASS' and
    * 'standard brass' land in one group WITHOUT rewriting the data —
    * the collation travels in the type, the comparator changes, and
    * hash aggregation/joins use collation-aware hashing. The oracle
    * expresses the same semantics the classic way (GROUP BY lower);
    * output keys are lowercased explicitly so both engines emit
    * identical representatives.
    */
  private val q200 = Q(
    "q200_collation_group",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "part").createOrReplaceTempView("graft_q200_part")
      s.sql("""
        WITH mixed AS (
          SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
                      ELSE p_type END AS ptype,
                 p_retailprice
          FROM graft_q200_part)
        SELECT MIN(lower(ptype)) AS ptype_lc,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM mixed
        GROUP BY collate(ptype, 'UTF8_LCASE')
      """)
    },
    Some("""
      WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
                    ELSE p_type END AS ptype,
               p_retailprice
        FROM part)
      SELECT MIN(lower(ptype)) AS ptype_lc,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM mixed
      GROUP BY lower(ptype)
    """))

  /** SQL:2016 LISTAGG (new in Spark 4) with WITHIN GROUP ordering and
    * DISTINCT: per market segment, the ordered distinct list of order
    * priorities seen. The WITHIN GROUP sort makes the concatenation
    * deterministic — the property that lets a string aggregate be
    * oracle-hashed at all (DuckDB spells it string_agg ... ORDER BY).
    * q104 builds the same shape from sort_array(collect_set(...));
    * this is the native-function form.
    */
  private val q201 = Q(
    "q201_listagg",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "orders").createOrReplaceTempView("graft_q201_orders")
      t(s, dir, "customer").createOrReplaceTempView("graft_q201_customer")
      s.sql("""
        SELECT c_mktsegment,
               listagg(DISTINCT o_orderpriority, '|')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM graft_q201_orders JOIN graft_q201_customer
          ON o_custkey = c_custkey
        GROUP BY c_mktsegment
      """)
    },
    Some("""
      SELECT c_mktsegment,
             string_agg(DISTINCT o_orderpriority, '|'
               ORDER BY o_orderpriority) AS priorities,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    """))

  /** Deterministic keyset-style pagination: ORDER BY with tiebreak +
    * LIMIT/OFFSET (OFFSET is the Spark 3.4+ surface). The plan still
    * avoids a full global sort: CollectLimit with offset takes
    * limit+offset per partition and skips on the driver — fine for
    * page-sized offsets; the docstring caveat (deep offsets scan
    * O(offset) rows; prefer keyset predicates at depth) is the honest
    * scale note every pagination API carries.
    */
  private val q202 = Q(
    "q202_offset_pagination",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "orders").createOrReplaceTempView("graft_q202_orders")
      s.sql("""
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS price_cents
        FROM graft_q202_orders
        ORDER BY price_cents DESC, o_orderkey
        LIMIT 10 OFFSET 20
      """)
    },
    Some("""
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents
      FROM orders
      ORDER BY price_cents DESC, o_orderkey
      LIMIT 10 OFFSET 20
    """))

  /** GROUP BY ALL / ORDER BY ALL (the SQL-surface shorthand both Spark
    * 4 and DuckDB resolve to every non-aggregate select item): the
    * shorthand and the explicit spelling must produce the identical
    * plan — here Spark runs the shorthand and the oracle runs the
    * classic expansion, so the differential check certifies the
    * resolution rule itself. Plan shape is an ordinary partial/final
    * hash aggregate on the two resolved keys; ALL resolution is purely
    * an analysis-time rewrite with zero runtime cost at any scale.
    */
  private val q214 = Q(
    "q214_group_by_all",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "orders").createOrReplaceTempView("graft_q214_orders")
      s.sql("""
        SELECT o_orderpriority,
               CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM graft_q214_orders
        GROUP BY ALL
        ORDER BY ALL
      """)
    },
    Some("""
      SELECT o_orderpriority,
             CAST(YEAR(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM orders
      GROUP BY o_orderpriority, YEAR(CAST(o_orderdate AS TIMESTAMP))
      ORDER BY 1, 2, 3, 4
    """))

  /** Error-safe arithmetic under ANSI mode: Spark 4 runs with
    * spark.sql.ansi.enabled=true, where division by zero, bad casts,
    * and bigint overflow are runtime ERRORS — a single poisoned row
    * kills a 100 TB job hours in. The try_* family (try_divide /
    * try_cast / try_add) converts each error class to NULL row-locally,
    * which is the only admissible semantics at scale: the error path
    * costs nothing on clean rows, poisoned rows degrade to counted
    * NULLs instead of job retries, and the per-class NULL counts below
    * are exactly the data-quality telemetry a pipeline alerts on. The
    * oracle expresses the identical semantics with guard CASEs /
    * TRY_CAST, so the differential check pins the try_* NULL contract
    * itself (all counts BIGINT-exact).
    */
  private val q215 = Q(
    "q215_try_arithmetic",
    (s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      e.select(
        col("event_type"),
        expr("try_divide(value, k - 25)").as("d"),
        expr("try_cast(CASE WHEN k < 50 THEN CAST(k AS STRING)" +
          " ELSE concat('x', CAST(k AS STRING)) END AS BIGINT)").as("c"),
        expr("try_add(9223372036854775800L, k)").as("o"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          asLong(sum(when(col("d").isNull, 1).otherwise(0))).as("n_div0"),
          asLong(sum(when(col("c").isNull, 1).otherwise(0)))
            .as("n_badcast"),
          asLong(sum(when(col("o").isNull, 1).otherwise(0)))
            .as("n_overflow"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, value,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events),
      t AS (
        SELECT event_type,
               CASE WHEN k - 25 = 0 THEN NULL
                    ELSE value / (k - 25) END AS d,
               TRY_CAST(CASE WHEN k < 50 THEN CAST(k AS VARCHAR)
                             ELSE 'x' || CAST(k AS VARCHAR) END
                        AS BIGINT) AS c,
               CASE WHEN k > 7 THEN NULL
                    ELSE 9223372036854775800 + k END AS o
        FROM e)
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div0,
             CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_badcast,
             CAST(SUM(CASE WHEN o IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overflow
      FROM t GROUP BY 1
    """))

  val registry: Seq[Q] = Seq(q198, q199, q200, q201, q202, q214, q215)
}
