package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Queries

/** q99's connected components must group each planted duplicate family:
  * for doc_id k < 10 the corpus contains k (original), k+100000 (near
  * copy) and k+200000 (exact copy), which form one component labeled by
  * its minimum member k; for 10 <= k < 20 only the exact copy pair
  * {k, k+200000} exists. */
class DupClustersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("planted dup families co-cluster; clusters partition the nodes") {
    val q99 = Queries.registry.find(_.name == "q99_dup_clusters").get
    val clusters = q99.build(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).split(",").map(_.toLong).toSet))
    // a family may absorb accidental near-dups (that's what connected
    // components does), but its members must land in ONE cluster
    def clusterOf(id: Long): Set[Long] =
      clusters.find(_._3.contains(id))
        .getOrElse(fail(s"doc $id in no cluster"))._3
    (0L until 10L).foreach { k =>
      assert(Set(k, k + 100000, k + 200000).subsetOf(clusterOf(k)),
        s"family of $k split across clusters")
    }
    (10L until 20L).foreach { k =>
      assert(clusterOf(k).contains(k + 200000),
        s"exact-copy pair of $k split across clusters")
    }
    clusters.foreach { case (lbl, n, members) =>
      assert(members.size.toLong == n)
      assert(members.min == lbl, s"cluster $lbl not labeled by min member")
    }
    // members appear in exactly one cluster (it's a partition)
    val all = clusters.toSeq.flatMap(_._3)
    assert(all.size == all.distinct.size, "overlapping clusters")
  }
}
