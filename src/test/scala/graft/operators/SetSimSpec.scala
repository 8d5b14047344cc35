package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Queries

/** q282 (PPJoin exact set-similarity) invariants: prefix filtering
  * must be candidate-COMPLETE — the output equals a brute-force
  * all-pairs shingle Jaccard on a threshold-engineered fixture — and
  * the cross-operator containment q51 ⊆ q282 must hold on the real
  * fixture: MinHash banding can only LOSE true pairs (bands that all
  * miss), never invent them, so the exact join dominates it. */
class SetSimSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def q(n: String) = Queries.registry.find(_.name == n).get

  private def shingles(words: Seq[String]): Set[String] =
    // sliding(5) yields a partial window for short docs; the engine's
    // shingleSet (and the oracle) return EMPTY below 5 words
    if (words.length < 5) Set.empty
    else words.sliding(5).map(_.mkString(" ")).toSet

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val tmp = graft.TestTmp.dir("graft_ppjoin_fixture_")
    val ten = (1 to 10).map(i => s"tok$i")
    val docs = Seq(
      1L -> ten.mkString(" "),                 // base: 6 shingles
      2L -> ten.take(9).mkString(" "),         // drop last: 5/6 = 0.833
      3L -> ten.take(7).mkString(" "),         // truncate: 3/6 = 0.5 (boundary)
      4L -> ten.take(6).mkString(" "),         // 2/6 = 0.333 < 0.5
      5L -> ten.mkString(" "),                 // exact copy of 1
      6L -> "wholly unrelated words only here present",
      7L -> "tiny doc")                        // <5 words: no shingles
    docs.map { case (id, text) =>
      (id, text, "en", "s1", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q282 equals brute-force all-pairs shingle Jaccard at threshold 0.5") {
    val got = q("q282_ppjoin_setsim").build(spark, fixtureDir).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Double]("jac"))).toSet
    // brute force over the SAME planted corpus the query reads
    // (DedupQueries.corpus adds exact/near copies at +200000/+100000)
    val base = DedupQueries.corpus(
      graft.Tables.load(graft.Tables.tuned(spark), fixtureDir,
        "documents"))
      .collect()
      .flatMap { r =>
        Option(r.getAs[String]("text")).map { tx =>
          val w = tx.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
          (r.getAs[Long]("doc_id"), shingles(w.toSeq))
        }
      }.filter(_._2.nonEmpty)
    val expected = (for {
      (i, si) <- base; (j, sj) <- base if i < j
      inter = (si & sj).size
      jac = inter.toDouble / (si.size + sj.size - inter)
      if jac >= 0.5
    } yield (i, j, BigDecimal(jac).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(expected.exists(p => p._1 == 1L && p._2 == 3L),
      "fixture lost its boundary (jac == 0.5) pair")
    assert(!expected.exists(p => (p._1, p._2) == (1L, 4L)),
      "fixture's below-threshold pair leaked into expected")
    assert(got == expected,
      s"diff: ${(got.diff(expected) ++ expected.diff(got)).take(5)}")
  }

  test("containment: q51's banded pairs are a subset of q282's exact pairs") {
    val dir = "/root/testdata/sf0.001"
    val exact = q("q282_ppjoin_setsim").build(spark, dir).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    val banded = q("q51_minhash_lsh").build(spark, dir).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(exact.nonEmpty && banded.nonEmpty)
    assert(banded.subsetOf(exact),
      s"banding invented pairs the exact join rejects: ${
        banded.diff(exact).take(5)}")
  }

  test("q287 telemetry funnel is consistent with q282's output mass") {
    for (d <- Seq(fixtureDir, "/root/testdata/sf0.001")) {
      val t = q("q287_ppjoin_telemetry").build(spark, d).head()
      // funnel shape: tokens ⊇ active, candidates ⊇ verified
      assert(t.getAs[Long]("n_prefix_tokens") >=
        t.getAs[Long]("n_active_tokens"))
      assert(t.getAs[Long]("n_cand_pairs") >=
        t.getAs[Long]("n_verified"))
      assert(t.getAs[Long]("n_prefix_rows") >=
        t.getAs[Long]("n_groups"))
      // the doc-pair masses (computed from group sizes, never
      // materialized) must equal the exact join's actual output
      val nOut = q("q282_ppjoin_setsim").build(spark, d).count()
      assert(t.getAs[Long]("n_cross_doc_pairs") +
        t.getAs[Long]("n_intra_doc_pairs") == nOut,
        s"telemetry mass != q282 output at $d")
    }
  }
}
