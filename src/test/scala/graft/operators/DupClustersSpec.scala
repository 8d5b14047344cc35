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

  test("q235 telemetry pair mass equals q84's exact pair count; samples bounded") {
    val dir = "/root/testdata/sf0.001"
    def q(n: String) = Queries.registry.find(_.name == n).get
    val q84Rows = q("q84_simhash_hamming").build(spark, dir).count()
    val rows = q("q235_simhash_dup_telemetry").build(spark, dir).collect()
    // the bounded-recall contract: the telemetry surrenders individual
    // doc pairs beyond the sample, NEVER pair mass — every doc pair
    // q84 emits is counted in exactly one signature-pair row
    val mass = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(mass == q84Rows,
      s"telemetry pair mass $mass != q84 pair count $q84Rows")
    rows.foreach { r =>
      val ids1 = r.getAs[String]("sample1").split(",").map(_.toLong)
      assert(ids1.length <= 5 && ids1.length.toLong <= r.getAs[Long]("n1"))
      assert(ids1.sorted.sameElements(ids1), "sample not ascending")
      val ids2 = r.getAs[String]("sample2").split(",").map(_.toLong)
      assert(ids2.length <= 5 && ids2.length.toLong <= r.getAs[Long]("n2"))
      if (r.getAs[Long]("dist") == 0L)
        assert(r.getAs[Long]("s1") == r.getAs[Long]("s2"))
      else assert(r.getAs[Long]("s1") < r.getAs[Long]("s2"))
    }
  }

  test("q241 telemetry pair mass equals q51's exact pair count; samples bounded") {
    val dir = "/root/testdata/sf0.001"
    def q(n: String) = Queries.registry.find(_.name == n).get
    val q51Rows = q("q51_minhash_lsh").build(spark, dir).count()
    val rows = q("q241_minhash_dup_telemetry").build(spark, dir).collect()
    // the bounded-recall contract: the telemetry surrenders individual
    // doc pairs beyond the sample, NEVER pair mass — every doc pair
    // q51 verifies is counted in exactly one content-group-pair row
    val mass = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(mass == q51Rows,
      s"telemetry pair mass $mass != q51 pair count $q51Rows")
    assert(rows.nonEmpty, "planted dup corpus must produce telemetry")
    rows.foreach { r =>
      val ids1 = r.getAs[String]("sample1").split(",").map(_.toLong)
      assert(ids1.length <= 5 && ids1.length.toLong <= r.getAs[Long]("n1"))
      assert(ids1.sorted.sameElements(ids1), "sample not ascending")
      val ids2 = r.getAs[String]("sample2").split(",").map(_.toLong)
      assert(ids2.length <= 5 && ids2.length.toLong <= r.getAs[Long]("n2"))
      val (g1, g2) = (r.getAs[String]("g1"), r.getAs[String]("g2"))
      if (g1 == g2) assert(r.getAs[Double]("jac") == 1.0,
        "intra-group row must be an exact-dup group")
      else assert(g1 < g2 && r.getAs[Double]("jac") >= 0.5)
    }
    // the planted families are visible at group grain: every doc_id<20
    // original has an exact-copy group of size >= 2 (its +200000 copy)
    val intra = rows.filter(r => r.getAs[String]("g1") == r.getAs[String]("g2"))
    assert(intra.nonEmpty, "exact-copy plants must appear as intra rows")
    assert(intra.forall(_.getAs[Long]("n1") >= 2L))
  }

  test("label propagation over an EMPTY pair graph converges to an empty frame without throwing") {
    // degenerate-input guard (the q295/IvfIndexStream discipline): a
    // corpus with no near-dup pairs feeds an empty edge set; the
    // convergence SUM aggregates to NULL and must read as 0, not NPE
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(graft.operators.DedupQueries.dupClusterLabels(noPairs)
      .count() == 0L)
  }
}
