package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Queries, Tables}

/** q280 (maintained BM25 lexical index) invariants: the exact-merge
  * contract stats(A) ⊕ stats(B) ≡ stats(A ∪ B), the artifact
  * lifecycle, and — the property that makes the index USABLE — scoring
  * from the maintained artifact reproduces q271's from-scratch lexical
  * ranking bit-for-bit. */
class LexIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def docs() = Tables.load(Tables.tuned(spark), dir, "documents")

  test("merge-equivalence: merged artifact stats equal from-scratch full-corpus stats") {
    LshIndexQueries.resetMemoForTest()
    graft.TestTmp.register(
      LshIndexQueries.artifactPath(spark, dir, "lexhist"))
    graft.TestTmp.register(
      LshIndexQueries.artifactPath(spark, dir, "lexmerged"))
    val merged = LexIndexQueries.mergedStats(spark, dir)
    val (dfS, metaS) = LexIndexQueries.stats(docs())
    def dfSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val m = dfSet(merged("df")())
    val sc = dfSet(dfS)
    assert(m == sc, s"df diff: ${(m.diff(sc) ++ sc.diff(m)).take(5)}")
    assert(m.nonEmpty)
    val mMeta = merged("meta")().head()
    val sMeta = metaS.head()
    assert(mMeta.getLong(0) == sMeta.getLong(0), "n_docs diverges")
    assert(mMeta.getLong(1) == sMeta.getLong(1), "sum_dl diverges")
  }

  test("artifact lifecycle: load and memo paths never rebuild") {
    val before = LshIndexQueries.buildCount.get()
    LshIndexQueries.resetMemoForTest()
    val a = LexIndexQueries.mergedStats(spark, dir)("df")()
      .collect().map(_.toString).sorted
    assert(LshIndexQueries.buildCount.get() == before,
      "artifact load path rebuilt")
    val b = LexIndexQueries.mergedStats(spark, dir)("df")()
      .collect().map(_.toString).sorted
    assert(LshIndexQueries.buildCount.get() == before,
      "memo path rebuilt")
    assert(a.sameElements(b) && a.nonEmpty)
  }

  test("deletion: merged ⊖ stats(retracted) == stats(surviving); zero-df terms drop") {
    LshIndexQueries.resetMemoForTest()
    graft.TestTmp.register(
      LshIndexQueries.artifactPath(spark, dir, "lexhist"))
    graft.TestTmp.register(
      LshIndexQueries.artifactPath(spark, dir, "lexmerged"))
    val merged = LexIndexQueries.mergedStats(spark, dir)
    val retr = col("doc_id") % 7 === 3
    val (dfR, metaR) = LexIndexQueries.subtractStats(
      merged("df")(), merged("meta")(), docs().filter(retr))
    val (dfS, metaS) = LexIndexQueries.stats(docs().filter(!retr))
    def dfSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val a = dfSet(dfR)
    val b = dfSet(dfS)
    assert(a == b, s"df diff: ${(a.diff(b) ++ b.diff(a)).take(5)}")
    assert(a.nonEmpty)
    // zero-df drop: no term may survive with df <= 0, and the
    // surviving vocabulary must be exactly the from-scratch one
    assert(a.forall(_._2 > 0))
    val rMeta = metaR.head()
    val sMeta = metaS.head()
    assert(rMeta.getLong(0) == sMeta.getLong(0), "n_docs diverges")
    assert(rMeta.getLong(1) == sMeta.getLong(1), "sum_dl diverges")
  }

  test("scoring from the maintained artifact == q271's from-scratch lexical arm") {
    val fromArtifact = Queries.registry
      .find(_.name == "q280_bm25_index_maintain").get
      .build(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("lex_rank"),
        r.getAs[Double]("bm25")))
      .sortBy(_._2)
    val fromScratch = RetrievalQueries.shortlists(spark, dir)._1
      .select(col("doc_id"), col("lex_rank"), col("bm25"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2)
    assert(fromArtifact.nonEmpty)
    assert(fromArtifact.toSeq == fromScratch.toSeq,
      s"artifact-scored ranking diverges from from-scratch:\n" +
        s"  artifact ${fromArtifact.take(3).mkString(",")}\n" +
        s"  scratch  ${fromScratch.take(3).mkString(",")}")
  }
}
