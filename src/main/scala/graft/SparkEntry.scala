package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` is the flagship smoke query; `queries`/`oracleSql` are the
  * operator inventory (one entry per implemented operator from SURVEY.md
  * §2, assembled in [[Queries]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's class-balance check (spark_model_trainer.py:151-156):
    * conditional binary label + group count, over the lineitem fact table.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.load(Tables.tuned(spark), "/root/testdata/sf0.001", "lineitem")
      .withColumn("is_high_qty", when(col("l_quantity") > 25.0, 1.0).otherwise(0.0))
      .groupBy(col("is_high_qty"))
      .agg(count(lit(1)).as("n"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
