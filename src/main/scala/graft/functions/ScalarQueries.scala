package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.Exprs._
import graft.operators.Coerce

/** Scalar-function query surface (SURVEY §2.8: the reference itself uses
  * only cast/lower/when/round/json — reference: producer.py:80-85,
  * README.md:92, spark_model_trainer.py:152-153, api.py:220,230 — the
  * engine provides the full date/string/regex/json/array families as
  * codegen'd built-ins, never UDFs).
  */
object ScalarQueries {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  /** Date/time extraction + truncation over order dates. */
  private val q30 = Q(
    "q30_date_functions",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast(LongType).as("yr"),
          quarter(col("o_orderdate")).cast(LongType).as("qtr"),
          month(col("o_orderdate")).cast(LongType).as("mo"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total")),
    Some("""
      SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
             EXTRACT(QUARTER FROM o_orderdate) AS qtr,
             EXTRACT(MONTH FROM o_orderdate) AS mo,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2, 3, 4
    """))

  /** String function family over customer names. */
  private val q31 = Q(
    "q31_string_functions",
    (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).cast(LongType).as("name_len"),
        substring(col("c_name"), 10, 5).as("name_mid"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
        reverse(col("c_name")).as("rev_name"),
        lpad(col("c_custkey").cast(StringType), 12, "0").as("padded_key"),
        trim(lit("  x  ")).as("trimmed")),
    Some("""
      SELECT c_custkey,
             upper(c_name) AS uname,
             length(c_name) AS name_len,
             substring(c_name, 10, 5) AS name_mid,
             concat_ws('|', c_mktsegment, c_name) AS seg_name,
             regexp_replace(c_name, 'Customer', 'Cust') AS short_name,
             reverse(c_name) AS rev_name,
             lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
             trim('  x  ') AS trimmed
      FROM customer
    """))

  /** regexp_extract / rlike-style filtering: pull the numeric id out of
    * the customer name and verify it round-trips to the key. */
  private val q32 = Q(
    "q32_regexp",
    (s, dir) =>
      t(s, dir, "customer")
        .withColumn("extracted",
          regexp_extract(col("c_name"), "([0-9]+)", 1))
        .filter(col("c_name").rlike("^Customer#"))
        .withColumn("id_matches",
          Coerce.toDoubleOrDefault(col("extracted")).cast(LongType)
            === col("c_custkey"))
        .groupBy(col("id_matches"))
        .agg(count(lit(1)).as("n")),
    Some("""
      SELECT (CAST(COALESCE(TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS DOUBLE), 0.0) AS BIGINT) = c_custkey) AS id_matches,
             COUNT(*) AS n
      FROM customer
      WHERE regexp_matches(c_name, '^Customer#')
      GROUP BY 1
    """))

  /** JSON extraction over the events props column (the engine's
    * from_json/get_json_object surface; the reference serializes/parses
    * JSON only at the Kafka boundary — producer.py:28). */
  private val q33 = Q(
    "q33_json_extract",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn("k",
          Coerce.toDoubleOrDefault(get_json_object(col("props"), "$.k")))
        .withColumn("k_bucket", floor(col("k") / 10.0).cast(LongType))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_k")),
    Some("""
      SELECT CAST(FLOOR(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0) / 10.0) AS BIGINT) AS k_bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_k
      FROM events GROUP BY 1
    """))

  /** split + explode word count (the generator/UDTF surface — SURVEY
    * §2.9: none in the reference; exploding tokenization is the
    * text-pipeline workhorse). Top-20 with deterministic tiebreak. */
  private val q34 = Q(
    "q34_explode_wordcount",
    (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(20),
    Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY 1 ORDER BY n DESC, word ASC LIMIT 20
    """))

  /** Array function family: size / distinct / sort / slice / join /
    * contains over tokenized documents. */
  private val q35 = Q(
    "q35_array_functions",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          // null-guarded (q47 discipline): NULL text -> NULL counts on
          // both engines, not Spark's legacy size(NULL) = -1
          when(col("text").isNotNull, size(col("words")))
            .cast(LongType).as("n_words"),
          when(col("text").isNotNull, size(array_distinct(col("words"))))
            .cast(LongType).as("n_distinct"),
          array_join(slice(array_sort(array_distinct(col("words"))), 1, 3), " ")
            .as("first3_sorted"),
          array_contains(col("words"), "spark").as("has_spark")),
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             array_to_string((list_sort(list_distinct(string_split(text, ' '))))[1:3], ' ') AS first3_sorted,
             list_contains(string_split(text, ' '), 'spark') AS has_spark
      FROM documents
    """))

  /** Conditional expression family: multi-branch CASE, least/greatest,
    * coalesce/nullif (reference's only conditional is the single
    * when/otherwise at spark_model_trainer.py:152-153). */
  private val q36 = Q(
    "q36_conditional_functions",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn("bucket",
          when(col("value") < 10.0, "low")
            .when(col("value") < 25.0, "mid")
            .otherwise("high"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(least(col("value"), lit(20.0)).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_capped"),
          sum(greatest(col("value"), lit(5.0)).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_floored")),
    Some("""
      SELECT CASE WHEN value < 10.0 THEN 'low'
                  WHEN value < 25.0 THEN 'mid'
                  ELSE 'high' END AS bucket,
             event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(LEAST(value, 20.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_capped,
             CAST(SUM(CAST(GREATEST(value, 5.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_floored
      FROM events GROUP BY 1, 2
    """))

  /** round/bround — the reference's serve-time rounding (api.py:220,230
    * rounds predictions to 2/4 dp). */
  private val q37r = Q(
    "q37_rounding",
    (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        round(col("value"), 1).as("r1"),
        round(col("value"), 0).as("r0"),
        ceil(col("value")).cast(LongType).as("c"),
        floor(col("value")).cast(LongType).as("f"),
        abs(col("value") - 20.0).cast(DecimalType(18, 2)).cast(DoubleType)
          .as("dist20")),
    Some("""
      SELECT event_id,
             round(value, 1) AS r1,
             round(value, 0) AS r0,
             CAST(CEIL(value) AS BIGINT) AS c,
             CAST(FLOOR(value) AS BIGINT) AS f,
             CAST(CAST(ABS(value - 20.0) AS DECIMAL(18,2)) AS DOUBLE) AS dist20
      FROM events
    """))

  /** Extended string family: initcap/translate/split_part/left/right/
    * repeat/position. */
  private val q38s = Q(
    "q38_string_extended",
    (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        expr("concat(upper(substring(p_name, 1, 1)), substring(p_name, 2))")
          .as("title_name"),
        translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        substring(col("p_name"), 1, 4).as("left4"),
        expr("right(p_name, 4)").as("right4"),
        repeat(lit("-"), 3).as("dashes"),
        expr("instr(p_name, 'widget')").cast(LongType).as("widget_pos")),
    Some("""
      SELECT p_partkey,
             upper(substring(p_name, 1, 1)) || substring(p_name, 2) AS title_name,
             translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
             string_split(p_name, ' ')[1] AS first_word,
             substring(p_name, 1, 4) AS left4,
             right(p_name, 4) AS right4,
             repeat('-', 3) AS dashes,
             CAST(instr(p_name, 'widget') AS BIGINT) AS widget_pos
      FROM part
    """))

  /** Date arithmetic: day diffs against a fixed anchor, month ends,
    * interval shifts (all surfaced as strings/longs for stable
    * comparison). */
  private val q39d = Q(
    "q39_date_arithmetic",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
          .cast(LongType).as("days_since_epoch_95"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
          .as("month_end"),
        date_format(col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "yyyy-MM-dd").as("plus_90d"),
        dayofweek(col("o_orderdate")).cast(LongType).as("dow_sun1")),
    Some("""
      SELECT o_orderkey,
             datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_95,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d,
             CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1
      FROM orders
    """))

  /** Bitwise operation family over integer keys (and/or/xor/shift/
    * popcount — the primitives the hash/sketch operators build on). */
  private val q88 = Q(
    "q88_bitops",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("o_orderkey & 255").cast(LongType).as("low_byte"),
          expr("o_orderkey | 1").cast(LongType).as("with_low_bit"),
          expr("o_orderkey ^ 21845").cast(LongType).as("xored"),
          expr("shiftleft(o_orderkey, 2)").cast(LongType).as("shl2"),
          expr("shiftright(o_orderkey, 3)").cast(LongType).as("shr3"),
          expr("bit_count(o_orderkey)").cast(LongType).as("popcount")),
    Some("""
      SELECT o_orderkey,
             o_orderkey & 255 AS low_byte,
             o_orderkey | 1 AS with_low_bit,
             xor(o_orderkey, 21845) AS xored,
             o_orderkey << 2 AS shl2,
             o_orderkey >> 3 AS shr3,
             CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
      FROM orders
    """))

  /** NULL-semantics suite: null-safe equality (`<=>`, DuckDB
    * `IS NOT DISTINCT FROM`) joining on a DERIVED NULLABLE key —
    * where plain `=` silently drops the null-key rows — plus the
    * nullif/nvl2/coalesce family. The derived key is null for
    * low-priority orders, so null-key groups genuinely match through
    * the null-safe join; the oracle certifies Spark's `<=>` and
    * DuckDB's IS NOT DISTINCT FROM agree row-for-row. */
  private val q161 = Q(
    "q161_null_safe_ops",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("prio_key",
          when(col("o_orderpriority") > "3", col("o_orderpriority")))
      val dim = o.groupBy(col("prio_key").as("k"))
        .agg(count(lit(1)).as("n_in_class"))
      o.join(broadcast(dim), col("prio_key") <=> col("k"))
        .groupBy(col("o_orderstatus"))
        .agg(
          asLong(count(lit(1))).as("n"),
          asLong(sum(when(col("prio_key").isNull, 1).otherwise(0)))
            .as("n_null_key"),
          asLong(sum(col("n_in_class"))).as("sum_class_sizes"),
          asLong(count(nullif(col("o_orderpriority"), lit("1-URGENT"))))
            .as("n_not_urgent"),
          asLong(sum(when(col("prio_key").isNotNull, 2).otherwise(1)))
            .as("nvl2_sum"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderstatus, o_orderpriority,
               CASE WHEN o_orderpriority > '3' THEN o_orderpriority END
                 AS prio_key
        FROM orders),
      dim AS (SELECT prio_key AS k, COUNT(*) AS n_in_class
              FROM o GROUP BY 1)
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN prio_key IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_key,
             CAST(SUM(n_in_class) AS BIGINT) AS sum_class_sizes,
             CAST(COUNT(NULLIF(o_orderpriority, '1-URGENT')) AS BIGINT)
               AS n_not_urgent,
             CAST(SUM(CASE WHEN prio_key IS NOT NULL THEN 2 ELSE 1 END)
               AS BIGINT) AS nvl2_sum
      FROM o JOIN dim ON prio_key IS NOT DISTINCT FROM k
      GROUP BY 1
    """))

  val registry: Seq[Q] = Seq(q30, q31, q32, q33, q34, q35, q36, q37r,
    q38s, q39d, q88, q161)
}
