package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q284 (maintained dup-cluster labels) invariants: the
  * merge-equivalence contract merge(labels(A), shard B) ≡
  * labels(A ∪ B) — the q276/q140 incremental-maintenance identity
  * applied to connected components — plus the artifact lifecycle
  * (build once, memo/load paths never recompute) and the frontier
  * semantics (an untouched history cluster keeps its label; a new
  * content with an edge into history re-labels exactly its touched
  * component). Fresh temp fixture per run, like LshIndexSpec. */
class ClusterIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 50 base words -> 46 shingles per doc; suffix/prefix variants tune
  // exact Jaccard levels (comments give the closed-form values).
  private val W: Seq[String] = Seq(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "one", "two",
    "three", "four", "five", "six", "seven", "eight", "nine", "ten",
    "eleven", "twelve", "thirteen", "fourteen", "fifteen", "sixteen",
    "seventeen", "eighteen", "nineteen", "twenty", "apple", "banana",
    "cherry", "damson")
  private val V: Seq[String] = Seq(
    "red", "orange", "yellow", "green", "blue", "indigo", "violet",
    "black", "white", "gray", "pink", "brown", "teal", "cyan",
    "magenta", "maroon", "navy", "olive", "lime", "silver")
  private def txt(ws: Seq[String]) = ws.mkString(" ")

  /** History component P: g1 and g1b differ in the last word only
    * (jac = 45/47 ≈ .957 — collides in every band with near
    * certainty). History singleton-content Q: unrelated vocabulary,
    * no edges. Arriving bridge g3 replaces W's first 10 words with
    * V's (jac(g3, g1) = 36/56 ≈ .643). Arriving far content g2
    * replaces W's first 20 (jac(g2, g1) = 26/66 ≈ .394 — under
    * threshold; jac(g2, g3) = 32/60 ≈ .533 — a candidate only if a
    * band collides, which the equivalence assertion tolerates either
    * way). Exact-dup replicas of g1 land in BOTH shards. */
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val tmp = graft.TestTmp.dir("graft_clustidx_fixture_")
    val g1 = txt(W)
    val g1last = txt(W.init :+ "grape")
    val g3 = txt(V.take(10) ++ W.drop(10))
    val g2 = txt(V.take(20) ++ W.drop(20))
    val q = txt(V ++ V.reverse ++ V.take(10)) // 50 words, V-vocabulary
    // ids ≥ 20 so DedupQueries.corpus() plants no +100000/+200000
    // copies (those would entangle the expected cluster memberships)
    val docs: Seq[(Long, String)] = Seq(
      20L -> g1, // history (20%4=0)
      21L -> g1last, // history: near-dup of g1 -> component P
      22L -> q, // history: unrelated content, no edges
      24L -> g1, // history: exact replica of g1 (same content)
      23L -> g3, // ARRIVING: bridge, edge to g1 (and maybe g2)
      27L -> g2, // ARRIVING: far variant
      31L -> g1, // ARRIVING: exact replica of old content g1
      35L -> "tiny doc", // arriving, <5 words: no shingles
      39L -> null.asInstanceOf[String])
    docs.map { case (id, text) =>
      (id, text, "en", "s1",
        Option(text).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def docs() =
    spark.read.parquet(s"$fixtureDir/documents.parquet")

  private def registerArtifacts(): Unit = {
    graft.TestTmp.register(
      ClusterIndexQueries.artifactPath(spark, fixtureDir, "hist"))
    graft.TestTmp.register(
      ClusterIndexQueries.artifactPath(spark, fixtureDir, "merged"))
  }

  private def labelSet(df: org.apache.spark.sql.DataFrame) =
    df.select("h", "lbl").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("merge-equivalence: merge(labels(A), shard B) == labels(A ∪ B)") {
    LshIndexQueries.resetMemoForTest()
    registerArtifacts()
    val merged = labelSet(
      ClusterIndexQueries.mergedParts(spark, fixtureDir)("labels")())
    val scratch = labelSet(
      ClusterIndexQueries.fromScratchLabels(docs()))
    assert(merged == scratch,
      s"diff: ${(merged.diff(scratch) ++ scratch.diff(merged)).take(8)}")
    assert(merged.nonEmpty)
  }

  test("frontier semantics: bridge touches P; exact replica joins without an edge") {
    LshIndexQueries.resetMemoForTest()
    registerArtifacts()
    val spark2 = spark
    import spark2.implicits._
    val labels = ClusterIndexQueries
      .mergedParts(spark, fixtureDir)("labels")()
      .select("h", "lbl").as[(String, String)].collect().toMap
    def h(text: String): String = {
      import org.apache.spark.sql.functions.{col, md5}
      Seq(text).toDF("t")
        .select(md5(graft.functions.TextOps.norm(col("t"))))
        .head().getString(0)
    }
    val g1 = txt(W)
    val g1last = txt(W.init :+ "grape")
    val g3 = txt(V.take(10) ++ W.drop(10))
    // g1/g1b formed a history component; the arriving bridge g3 has
    // exact jac .643 with g1 — IF its bands collide (deterministic
    // for these texts) it must share their cluster in the MERGED
    // labels; either way g1 and g1b share one
    assert(labels.contains(h(g1)) && labels(h(g1)) == labels(h(g1last)),
      "history component P lost its internal edge")
    if (labels.contains(h(g3)))
      assert(labels(h(g3)) == labels(h(g1)),
        "bridge collided but did not join P")
    // doc 11 carries old content g1: membership, not a new content —
    // cluster must still be keyed by content min-hash
    val q284 = graft.Queries.registry
      .find(_.name == "q284_cluster_index_maintain").get
    val out = q284.build(spark, fixtureDir).collect()
    val pCluster = out.find(_.getString(0) == labels(h(g1)))
    assert(pCluster.isDefined, "P's cluster missing from q284 output")
    // P's docs: 20, 21, 24, 31 (+ 23 iff the bridge's bands collided)
    val nDocs = pCluster.get.getAs[Long]("n_docs")
    assert(nDocs == 4L || nDocs == 5L, s"unexpected P size $nDocs")
    assert(pCluster.get.getAs[Long]("min_doc") == 20L)
  }

  test("merged sigs part equals from-scratch content-grain signatures") {
    LshIndexQueries.resetMemoForTest()
    registerArtifacts()
    def sigSet(df: org.apache.spark.sql.DataFrame) =
      df.select("h", "band_idx", "bh").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val merged = sigSet(
      ClusterIndexQueries.mergedParts(spark, fixtureDir)("sigs")())
    // from-scratch content-grain signatures over the full corpus:
    // distinct content of every doc, banded once
    import org.apache.spark.sql.functions._
    val scratch = sigSet {
      val c = DedupQueries.corpus(docs())
        .withColumn("nt", graft.functions.TextOps.norm(col("text")))
        .filter(col("nt").isNotNull)
        .select(md5(col("nt")).as("h"), col("nt"))
        .groupBy("h").agg(min("nt").as("nt"))
        .withColumn("sh", graft.functions.TextOps.shingleSet(
          split(col("nt"), " "), 5))
      DedupQueries.minhashBandTable(c.select(col("h"), col("sh")), "h")
        .filter(col("bh").isNotNull)
        .select(col("h"), col("band_idx").cast("long").as("band_idx"),
          col("bh"))
    }
    assert(merged == scratch,
      s"diff: ${(merged.diff(scratch) ++ scratch.diff(merged)).take(5)}")
    assert(merged.nonEmpty)
  }

  test("deletion equals from-scratch on corpus-minus-deleted; partial retraction keeps the content") {
    import org.apache.spark.sql.functions.{col, md5}
    val all = docs()
    // tombstone 21 (g1last's ONLY doc — its content leaves the graph,
    // touching component P) and 24, 31 (two of g1's three replicas —
    // content g1 must SURVIVE with doc 20 and keep its membership)
    val tombs = Set(21L, 24L, 31L)
    val surviving = all.filter(!col("doc_id").isin(tombs.toSeq: _*))
    val corpus = DedupQueries.corpus(all)
    val memb = corpus
      .withColumn("nt", graft.functions.TextOps.norm(col("text")))
      .filter(col("nt").isNotNull)
      .select(col("doc_id"), md5(col("nt")).as("h"))
    val delH = memb
      .groupBy(col("h"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.when(
          !col("doc_id").isin(tombs.toSeq: _*), 1L).otherwise(0L))
        .as("alive"))
      .filter(col("alive") === 0).select(col("h"))
    val (sigs0, labels0) = ClusterIndexQueries.fromScratchState(all)
    val (sigs1, labels1) = ClusterIndexQueries.delCore(
      sigs0, labels0, delH,
      h => ClusterIndexQueries.groupsFor(surviving)
        .join(h, Seq("h"), "left_semi"))
    val (sigsS, labelsS) = ClusterIndexQueries.fromScratchState(surviving)
    assert(labelSet(labels1) == labelSet(labelsS),
      s"label diff: ${(labelSet(labels1).diff(labelSet(labelsS)) ++
        labelSet(labelsS).diff(labelSet(labels1))).take(8)}")
    def sigSet(df: org.apache.spark.sql.DataFrame) =
      df.select("h", "band_idx", "bh").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(sigSet(sigs1) == sigSet(sigsS), "sigs diff after deletion")
    // the partially-retracted content g1 must still be labelled (its
    // doc 20 survives, and so does its edge to... g1last is gone, but
    // the bridge g3 may hold it) — at minimum it must not be treated
    // as deleted: its h must appear in sigs1
    val spark2 = spark
    import spark2.implicits._
    val hG1 = Seq(txt(W)).toDF("t")
      .select(md5(graft.functions.TextOps.norm(col("t"))))
      .head().getString(0)
    assert(sigSet(sigs1).exists(_._1 == hG1),
      "partially-retracted content lost its signatures")
  }

  test("deletion splits a planted chain component into two") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{col, md5}
    // 33-word chain c0..c4: step k swaps ONE word at interior position
    // 5k (positions 5,10,15,20 — ≥5 apart so killed shingle windows
    // are disjoint, and ≥5 from both text ends so each swap kills a
    // full 5 windows). K = 29 shingles; adjacent pairs differ in 1
    // word → jac = 24/34 ≈ .706 ≥ .5 (edges, given band collision —
    // asserted below); pairs ≥2 apart differ in ≥2 → jac ≤ 19/39 ≈
    // .487 < .5, so exact verify REJECTS them deterministically even
    // when a band collides. The component is a path; deleting the
    // middle content c2 must split it into {c0,c1} and {c3,c4} — and
    // c2's label was potentially the component min (dangling-label
    // case), which no edge-local patch could repair.
    val base = W.take(33)
    def chain(k: Int): String =
      txt(base.zipWithIndex.map { case (w, i) =>
        val step = i / 5
        if (i % 5 == 0 && i >= 5 && i <= 20 && step <= k) V(step) else w
      })
    val texts = (0 to 4).map(chain)
    val docsDf = texts.zipWithIndex.map { case (t, i) =>
      (40L + i, t, "en", "s1", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    def h(text: String): String =
      Seq(text).toDF("t")
        .select(md5(graft.functions.TextOps.norm(col("t"))))
        .head().getString(0)
    val hs = texts.map(h)
    val (sigs0, labels0) = ClusterIndexQueries.fromScratchState(docsDf)
    val lbl0 = labelSet(labels0).toMap
    assert(hs.forall(lbl0.contains) && hs.map(lbl0).distinct.size == 1,
      s"chain did not form one component: ${hs.map(lbl0.get)}")
    // delete the middle content c2 (its only doc, 42)
    val surviving = docsDf.filter(col("doc_id") =!= 42L)
    val delH = Seq(hs(2)).toDF("h")
    val (_, labels1) = ClusterIndexQueries.delCore(
      sigs0, labels0, delH,
      hh => ClusterIndexQueries.groupsFor(surviving)
        .join(hh, Seq("h"), "left_semi"))
    val lbl1 = labelSet(labels1).toMap
    assert(!lbl1.contains(hs(2)), "deleted content kept a label")
    assert(lbl1(hs(0)) == lbl1(hs(1)), "left half broke apart")
    assert(lbl1(hs(3)) == lbl1(hs(4)), "right half broke apart")
    assert(lbl1(hs(0)) != lbl1(hs(3)),
      "deletion failed to split the chain")
    // and the repaired labels equal a from-scratch world that never
    // saw c2
    assert(labelSet(labels1) ==
      labelSet(ClusterIndexQueries.fromScratchLabels(surviving)))
  }

  test("q294 IVF audit arm counts the real assignment frame (one row per vector; anti-join after-count)") {
    // round-18 advice #3: the audit's IVF before/after must be
    // sourced from q293's assignment frame + tombstone anti-join, not
    // from the raw embeddings table — this pins the helper's two
    // load-bearing contracts: (a) EXACTLY one assignment row per
    // embeddings vector (what keeps the COUNT-over-embeddings oracle
    // honest against the artifact count), (b) the tombstone anti-join
    // removes precisely the retracted vec_ids.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = graft.TestTmp.dir("graft_q294_ivf_pin_")
    val vecs = (0L until 97L).map { i =>
      val a = Array.fill(8)(0.0f)
      a((i % 8).toInt) = 1.0f
      a(((i + 5) % 8).toInt) = 0.01f * (i % 11)
      (i, a)
    }
    vecs.toDF("vec_id", "embedding")
      .write.parquet(s"$tmp/embeddings.parquet")
    val assigned = SimilarityQueries.ivfAssigned(spark, tmp)
      .localCheckpoint()
    assert(assigned.count() == 97L)
    assert(assigned.select("vec_id").distinct().count() == 97L)
    val after = assigned.join(
      assigned.filter(ClusterIndexQueries.isRetracted(col("vec_id")))
        .select(col("vec_id")),
      Seq("vec_id"), "left_anti")
    val expectedAfter = vecs.map(_._1).count(_ % 7 != 3)
    assert(after.count() == expectedAfter.toLong)
    // the retracted ids are exactly the vec_id % 7 == 3 set
    val removed = assigned.select("vec_id")
      .except(after.select("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(removed == vecs.map(_._1).filter(_ % 7 == 3).toSet)
  }

  test("artifact lifecycle: one build per artifact; memo and load paths identical") {
    LshIndexQueries.resetMemoForTest()
    registerArtifacts()
    // a prior test in this suite may already have published the
    // artifacts — consume one load to settle, then count
    ClusterIndexQueries.mergedParts(spark, fixtureDir)("labels")()
      .collect()
    LshIndexQueries.resetMemoForTest()
    val before = LshIndexQueries.buildCount.get()
    val first = ClusterIndexQueries.mergedParts(spark, fixtureDir)(
      "labels")().collect().map(_.toString).sorted
    assert(LshIndexQueries.buildCount.get() == before,
      "artifact load path rebuilt")
    val again = ClusterIndexQueries.mergedParts(spark, fixtureDir)(
      "labels")().collect().map(_.toString).sorted
    assert(LshIndexQueries.buildCount.get() == before,
      "memo path rebuilt")
    assert(first.sameElements(again))
    assert(first.nonEmpty)
  }
}
