package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Queries, Tables}
import graft.functions.TextOps

/** q283 (shard-rebalance planner) invariants the oracle equality can't
  * state on its own: the plan must CONSERVE mass (Σ moved = Σ excess =
  * Σ deficit) and LAND every shard exactly on its integer target when
  * applied — the property that makes it an executable plan rather
  * than a report. */
class RebalanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("applying the move plan lands every shard exactly on its target") {
    val moves = Queries.registry.find(_.name == "q283_shard_rebalance")
      .get.build(spark, dir).collect()
      .map(r => (r.getAs[Long]("from_shard"), r.getAs[Long]("to_shard"),
        r.getAs[Long]("tokens_moved")))
    assert(moves.forall(_._3 > 0))
    // recompute loads/targets independently
    val loads0 = Tables.load(Tables.tuned(spark), dir, "documents")
      .filter(col("text").isNotNull)
      .groupBy(pmod(col("doc_id"), lit(8L)).as("shard"))
      .agg(sum(size(TextOps.words(col("text"))).cast("long")).as("load"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loads = (0L until 8L).map(i => i -> loads0.getOrElse(i, 0L)).toMap
    val total = loads.values.sum
    val target = (0L until 8L).map(i =>
      i -> (total / 8 + (if (i < total % 8) 1L else 0L))).toMap
    // conservation
    val excess = loads.map { case (i, l) => (l - target(i)).max(0L) }.sum
    assert(moves.map(_._3).sum == excess, "plan does not conserve mass")
    // application: load - out + in == target for EVERY shard
    (0L until 8L).foreach { i =>
      val out = moves.collect { case (f, _, m) if f == i => m }.sum
      val in = moves.collect { case (_, to, m) if to == i => m }.sum
      assert(loads(i) - out + in == target(i),
        s"shard $i lands on ${loads(i) - out + in}, target ${target(i)}")
      assert(out == 0L || in == 0L,
        s"shard $i both donates and receives")
    }
  }
}
