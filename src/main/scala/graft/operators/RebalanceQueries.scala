package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.TextOps

/** q283 — shard-rebalancing PLANNER: given per-shard token loads (the
  * thing that actually skews a training job — token mass, not file
  * count; q160 compacts files, this plans DATA moves), emit the exact
  * minimal-mass move plan that lands every shard on its balanced
  * target. The classic exact construction: assign integer targets
  * T div S (+1 for the first T mod S shards, by shard order), order
  * donors and receivers by shard id, lay both out on ONE cumulative
  * flow axis, and each (donor, receiver) pair moves exactly the
  * OVERLAP of its cumulative intervals — Σ moves = Σ excess = Σ
  * deficit, provably minimal total mass, all integer algebra so both
  * engines agree bit-for-bit.
  *
  * Scale shape: ONE corpus aggregate (tokens per shard) is the only
  * data-scale work; the planner itself is algebra over S ≤ dozens of
  * rows (shard count is deployment config, never data) — the
  * unpartitioned windows here order that S-row frame, which is the
  * RegistrySmokeSpec constant-bound contract. */
object RebalanceQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    Tables.load(Tables.tuned(s), dir, n)

  private val Shards = 8

  private val q283 = Q(
    "q283_shard_rebalance",
    (s, dir) => {
      val loads0 = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .groupBy(pmod(col("doc_id"), lit(Shards.toLong)).as("shard"))
        .agg(sum(size(TextOps.words(col("text"))).cast(LongType))
          .as("load"))
      // every shard exists even when empty (an empty shard is the
      // hungriest receiver)
      val loads = s.range(Shards).select(col("id").as("shard"))
        .join(loads0, Seq("shard"), "left")
        .select(col("shard"), coalesce(col("load"), lit(0L)).as("load"))
      val tot = loads.agg(sum(col("load")).as("t"))
      val withTarget = loads.crossJoin(broadcast(tot))
        .withColumn("target",
          expr(s"t div $Shards") +
            when(col("shard") < expr(s"t % $Shards"), 1L).otherwise(0L))
        .withColumn("excess",
          greatest(col("load") - col("target"), lit(0L)))
        .withColumn("deficit",
          greatest(col("target") - col("load"), lit(0L)))
      val wOrd = Window.orderBy(col("shard"))
      val donors = withTarget.filter(col("excess") > 0)
        .withColumn("de", sum(col("excess")).over(wOrd))
        .withColumn("ds", col("de") - col("excess"))
        .select(col("shard").as("from_shard"), col("ds"), col("de"))
      val receivers = withTarget.filter(col("deficit") > 0)
        .withColumn("re", sum(col("deficit")).over(wOrd))
        .withColumn("rs", col("re") - col("deficit"))
        .select(col("shard").as("to_shard"), col("rs"), col("re"))
      donors.crossJoin(broadcast(receivers))
        .withColumn("tokens_moved",
          least(col("de"), col("re")) - greatest(col("ds"), col("rs")))
        .filter(col("tokens_moved") > 0)
        .select(col("from_shard"), col("to_shard"), col("tokens_moved"))
        .orderBy(col("from_shard"), col("to_shard"))
    },
    Some(s"""
      WITH l0 AS (
        SELECT doc_id % $Shards AS shard,
               CAST(SUM(len(string_split(
                 regexp_replace(trim(lower(text)),'\\s+',' ','g'),' ')))
                 AS BIGINT) AS load
        FROM documents WHERE text IS NOT NULL GROUP BY 1),
      loads AS (
        SELECT r.range AS shard, COALESCE(l0.load, 0) AS load
        FROM range($Shards) r LEFT JOIN l0 ON l0.shard = r.range),
      tot AS (SELECT SUM(load) AS t FROM loads),
      wt AS (
        SELECT shard, load,
               t // $Shards + CASE WHEN shard < t % $Shards
                                   THEN 1 ELSE 0 END AS target
        FROM loads, tot),
      ed AS (
        SELECT shard, GREATEST(load - target, 0) AS excess,
               GREATEST(target - load, 0) AS deficit
        FROM wt),
      donors AS (
        SELECT shard AS from_shard,
               SUM(excess) OVER (ORDER BY shard) - excess AS ds,
               SUM(excess) OVER (ORDER BY shard) AS de
        FROM ed WHERE excess > 0),
      receivers AS (
        SELECT shard AS to_shard,
               SUM(deficit) OVER (ORDER BY shard) - deficit AS rs,
               SUM(deficit) OVER (ORDER BY shard) AS re
        FROM ed WHERE deficit > 0)
      SELECT from_shard, to_shard,
             CAST(LEAST(de, re) - GREATEST(ds, rs) AS BIGINT)
               AS tokens_moved
      FROM donors, receivers
      WHERE LEAST(de, re) - GREATEST(ds, rs) > 0
      ORDER BY 1, 2
    """))

  val registry: Seq[Q] = Seq(q283)
}
