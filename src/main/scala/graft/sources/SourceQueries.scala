package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Source/sink round-trips and physical-layout patterns (SURVEY §2.1:
  * the reference's S1-S5 are CSV and JSON-over-Kafka boundaries; here
  * each boundary is exercised end-to-end and the result checked against
  * the oracle computed straight from the source table — if the
  * round-trip loses or mangles anything, the hashes diverge).
  */
object SourceQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  private def eventsSlim(s: SparkSession, dir: String) =
    t(s, dir, "events").select(
      col("event_id"),
      unix_millis(col("ts")).as("ts_ms"),
      col("event_type"),
      col("value"))

  private val slimSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_ms", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private val profileOracle = """
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             MIN(epoch_ms(CAST(ts AS TIMESTAMP))) AS min_ts_ms,
             MAX(epoch_ms(CAST(ts AS TIMESTAMP))) AS max_ts_ms
      FROM events GROUP BY 1
  """

  private def profile(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_value"),
        min(col("ts_ms")).as("min_ts_ms"),
        max(col("ts_ms")).as("max_ts_ms"))

  /** CSV sink -> multi-file CSV directory scan with explicit schema
    * (reference: batch CSV files written then unioned by one directory
    * read — batch_writer_consumer.py:63-69, spark_model_trainer.py:190).
    * The aggregate must equal the one computed from the parquet source. */
  private val q70 = Q(
    "q70_csv_roundtrip",
    (s, dir) => {
      val tmp = Files.createTempDirectory("graft_csv_rt_").toString
      eventsSlim(s, dir).coalesce(4).write
        .mode("overwrite").option("header", "true").csv(tmp)
      profile(s.read.option("header", "true").schema(slimSchema).csv(tmp))
    },
    Some(profileOracle))

  /** JSON-lines sink -> text scan + from_json with explicit schema — the
    * reference's Kafka message boundary (producer.py:28 serializes, the
    * consumer parses; here: to_json on write, from_json on read). */
  private val q71 = Q(
    "q71_json_roundtrip",
    (s, dir) => {
      val tmp = Files.createTempDirectory("graft_json_rt_").toString
      eventsSlim(s, dir)
        .select(to_json(struct(col("event_id"), col("ts_ms"),
          col("event_type"), col("value"))).as("value"))
        .coalesce(4).write.mode("overwrite").text(tmp)
      val parsed = s.read.text(tmp)
        .select(from_json(col("value"), slimSchema).as("m"))
        .select(col("m.*"))
      profile(parsed)
    },
    Some(profileOracle))

  /** Hive-style partitioned layout + partition pruning: write orders
    * partitioned by year, read back with a partition filter — at scale
    * the filter prunes directories before any IO happens. */
  private val q72 = Q(
    "q72_partition_pruning",
    (s, dir) => {
      val tmp = Files.createTempDirectory("graft_part_").toString
      t(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("yr").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("yr") === 1997)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      GROUP BY 1
    """))

  /** Skew-mitigation pattern: salted two-phase aggregation (partial
    * aggregate on (key, salt), final on key). The result must be
    * identical to the direct aggregation — the salt only reshapes the
    * shuffle so one hot key spreads over many reducers. */
  private val q73 = Q(
    "q73_salted_agg",
    (s, dir) => {
      val partial = t(s, dir, "lineitem")
        .withColumn("salt", col("l_orderkey") % 8)
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("l_quantity")).as("pq"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("pp"))
      partial.groupBy(col("l_returnflag"))
        .agg(sum(col("pn")).as("n"),
          sum(col("pq")).as("sum_qty"),
          sum(col("pp")).cast(DoubleType).as("sum_price"))
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY 1
    """))

  /** Exact percentiles (linear interpolation — identical formula to
    * DuckDB's quantile_cont). */
  private val q74 = Q(
    "q74_percentiles",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50_qty"),
          round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90_qty"),
          round(percentile(col("l_discount"), lit(0.5)), 4).as("p50_disc")),
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
             round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
             round(quantile_cont(l_discount, 0.5), 4) AS p50_disc
      FROM lineitem GROUP BY 1
    """))

  /** Schema evolution: union two projections with different column
    * sets by name, absent columns null-filled (unionByName
    * allowMissingColumns == DuckDB's UNION ALL BY NAME). */
  private val q86 = Q(
    "q86_union_schema_evolution",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val v1 = o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val v2 = o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM (
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1996)
      GROUP BY 1, 2
    """))

  /** Conditional / filtered aggregation: count_if and FILTER-style
    * sums in one pass over the fact table. */
  private val q87 = Q(
    "q87_conditional_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count_if(col("l_quantity") > 25.0).as("n_high_qty"),
          count_if(col("l_discount") === 0.0).as("n_no_disc"),
          sum(when(col("l_quantity") > 25.0,
            col("l_extendedprice").cast(DecimalType(18, 2)))
            .otherwise(lit(0)))
            .cast(DoubleType).as("high_qty_revenue")),
    Some("""
      SELECT l_returnflag,
             CAST(count_if(l_quantity > 25.0) AS BIGINT) AS n_high_qty,
             CAST(count_if(l_discount = 0.0) AS BIGINT) AS n_no_disc,
             CAST(SUM(CASE WHEN l_quantity > 25.0
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      ELSE 0 END) AS DOUBLE) AS high_qty_revenue
      FROM lineitem GROUP BY 1
    """))

  /** The SQL-string entry path: the same engine surface through
    * `spark.sql` over registered temp views — ANSI join + aggregate
    * text shared (modulo dialect) with the oracle. Everything else in
    * the registry uses the DataFrame API; this proves the SQL front
    * door compiles to the same Catalyst plans. */
  private val q103 = Q(
    "q103_sql_entry",
    (s, dir) => {
      Tables.tuned(s)
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY c.c_mktsegment
      """)
    },
    Some("""
      SELECT c.c_mktsegment AS segment,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY c.c_mktsegment
    """))

  val registry: Seq[Q] = Seq(q70, q71, q72, q73, q74, q86, q87, q103)
}
