package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ArtifactSnapshot (round-19 verdict #1, the batch half): the four
  * maintained batch-artifact families resolve through ONE snapshot
  * manifest — pinned readers serve exactly the artifacts the direct
  * constructors serve, and repeated snapshots of an unchanged corpus
  * reuse one manifest instead of minting leases. */
class ArtifactSnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val tmp = graft.TestTmp.dir("graft_snapspec_fixture_")
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0L until 16L).map { i =>
      val text = i % 3 match {
        case 0 => base + " family zero"
        case 1 => base + s" family one variant ${i % 2}"
        case _ => s"completely unrelated content number $i with many words"
      }
      (i, text, "en", "s1", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    (0L until 8L).map(i =>
      (i, Array.tabulate(8)(j => if (j == (i % 8).toInt) 1.0f else 0.0f),
        i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("pinned readers match the direct constructors; unchanged corpus reuses one manifest") {
    val snap = ArtifactSnapshot.pinned(spark, fixtureDir)
    assert(snap.keySet == Set("lsh_rows", "cluster_sigs",
      "cluster_labels", "lex_df", "lex_meta", "ivf_assigned"))
    // snapshot content == the direct artifact constructors'
    assert(rowSet(snap("lsh_rows")()) ==
      rowSet(LshIndexQueries.mergedIndex(spark, fixtureDir)()))
    val parts = ClusterIndexQueries.mergedParts(spark, fixtureDir)
    assert(rowSet(snap("cluster_labels")()) ==
      rowSet(parts("labels")()))
    assert(rowSet(snap("cluster_sigs")()) == rowSet(parts("sigs")()))
    val lex = LexIndexQueries.mergedStats(spark, fixtureDir)
    assert(rowSet(snap("lex_df")()) == rowSet(lex("df")()))
    assert(rowSet(snap("lex_meta")()) == rowSet(lex("meta")()))
    assert(snap("ivf_assigned")().count() == 8L)
    // change-driven publication: a second snapshot of the SAME corpus
    // reuses the manifest — exactly one lease exists
    ArtifactSnapshot.pinned(spark, fixtureDir)
    val fp = BpeQueries.fingerprint(spark, fixtureDir)
    val root = s"${spark.conf.get("spark.sql.warehouse.dir",
      "spark-warehouse")}/graft_snap_$fp"
    val live = graft.streaming.SnapshotManifest.live(spark, root)
    assert(live.size == 1, s"expected one manifest, got ${live.size}")
    // the one manifest pins all five artifact paths + the corpus fp
    val entries = live.head._2
    assert(entries.keySet == Set("art.lsh_rows", "art.cluster_sigs",
      "art.cluster_labels", "art.lex_df", "art.lex_meta", "art.ivf_fp"))
    assert(entries("art.ivf_fp") == fp)
  }
}
