package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Coerce

/** Property-based checks (SURVEY §5.3): coercion totality, top-k
  * containment, cumulative-slice monotonicity. Generated inputs are
  * batched into a single DataFrame per property so each property costs
  * one Spark job, with a fixed seed for reproducibility.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[A]): A =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  test("coercion totality: any string row -> fully-typed row, never null") {
    import spark.implicits._
    val strings = sample(Gen.listOfN(500, Gen.oneOf(
      Gen.numStr, Gen.alphaStr, Gen.asciiPrintableStr,
      Gen.const(""), Gen.const(null: String),
      Gen.double.map(_.toString))))
    val df = strings.toDF("raw")
    val coerced = df.select(
      Coerce.toDoubleOrDefault(col("raw")).as("d"),
      Coerce.toStringOrDefault(col("raw")).as("s"))
    assert(coerced.filter(col("d").isNull || col("s").isNull).count() == 0)
    // numeric strings survive exactly
    val roundTrip = Seq("1.5", "-2", "0.0").toDF("raw")
      .select(Coerce.toDoubleOrDefault(col("raw")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(roundTrip == Seq(1.5, -2.0, 0.0))
  }

  test("top-k is a prefix of the full ranking") {
    import spark.implicits._
    val data = sample(Gen.listOfN(300,
      Gen.zip(Gen.choose(0L, 1000000L), Gen.choose(-1e6, 1e6))))
      .distinctBy(_._1) // unique ids -> total order is unambiguous
    val df = data.toDF("id", "v")
    val full = df.orderBy(col("v").desc, col("id").asc)
      .collect().map(_.getLong(0)).toSeq
    for (k <- Seq(1, 7, 50, data.size)) {
      val topk = df.orderBy(col("v").desc, col("id").asc).limit(k)
        .collect().map(_.getLong(0)).toSeq
      assert(topk == full.take(k), s"k=$k")
    }
  }

  test("shingle algebra: count, width, membership under random docs") {
    import spark.implicits._
    import graft.functions.TextOps
    val docs = sample(Gen.listOfN(300, Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
        .map(_.mkString(" ")))))
    val df = docs.toDF("text").withColumn("w", TextOps.words(col("text")))
    // |shingles(w,n)| == max(0, |w|-n+1); every shingle has exactly n words
    val bad = df.select(col("w"),
        TextOps.shingles(col("w"), 3).as("sh"))
      .filter(
        size(col("sh")) =!= greatest(lit(0), size(col("w")) - lit(2)) ||
          exists(col("sh"), s => size(split(s, " ")) =!= 3))
    assert(bad.count() == 0)
    // distinct variant: subset of plain, no duplicates
    val badSet = df.select(TextOps.shingles(col("w"), 3).as("sh"),
        TextOps.shingleSet(col("w"), 3).as("ss"))
      .filter(size(array_except(col("ss"), col("sh"))) =!= 0 ||
        size(col("ss")) =!= size(array_distinct(col("ss"))))
    assert(badSet.count() == 0)
  }

  test("minhash signature: containment bound under random shingle sets") {
    import spark.implicits._
    // signature component of a superset is <= the subset's component
    // (min over more hashes can only shrink lexicographically)
    val sets = sample(Gen.listOfN(200, Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.identifier))))
    val df = sets.map(s => (s.toArray, (s ++ Seq("extra_x")).toArray))
      .toDF("a", "ab")
    val sig = graft.plans.MinHashSig.minhashSig(_: org.apache.spark.sql.Column, 4)
    val bad = df.select(sig(col("a")).as("sa"), sig(col("ab")).as("sab"))
      .filter(exists(zip_with(col("sa"), col("sab"), (x, y) => y > x),
        identity))
    assert(bad.count() == 0)
  }

  test("cumulative slices are monotone under any data") {
    import spark.implicits._
    val data = sample(Gen.listOfN(137,
      Gen.zip(Gen.choose(0.0, 100.0), Gen.alphaStr)))
      .zipWithIndex.map { case ((p, d), i) => (p, s"${d}_$i") }
    val df = data.toDF("Protein-G", "description")
    val slices = graft.ml.Trainer.cumulativeSlices(
      df, Seq("Protein-G", "description"))
    val sets = slices.map(
      _.select("description").collect().map(_.getString(0)).toSet)
    sets.sliding(2).foreach {
      case Seq(a, b) => assert(a.subsetOf(b))
      case _ =>
    }
    assert(sets.last.size == 137)
  }

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    Queries.registry.find(_.name == name).get.build(spark, sfDir)

  test("bloom decontamination is a superset of exact decontamination") {
    // same benchmark set, same >=0.5 ratio rule: the bloom filter can
    // only ADD hits (false positives), never lose one, and per doc its
    // hit count must dominate the exact count
    val exact = run("q96_contamination")
      .select("doc_id", "n_hit").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = run("q113_bloom_decontamination")
      .select("doc_id", "n_hit").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet.subsetOf(bloom.keySet),
      s"bloom lost docs: ${exact.keySet -- bloom.keySet}")
    exact.foreach { case (doc, nHit) =>
      assert(bloom(doc) >= nHit, s"doc $doc: bloom ${bloom(doc)} < exact $nHit")
    }
  }

  test("containment dominates Jaccard on every shared candidate pair") {
    // |A∩B|/min >= |A∩B|/union, so any pair surviving q50's 0.3 Jaccard
    // cut has containment >= its Jaccard value
    val jac = run("q50_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cont = run("q112_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.nonEmpty)
    jac.foreach { case (pair, j) =>
      cont.get(pair).foreach(c => assert(c >= j - 1e-9, s"$pair: $c < $j"))
    }
  }

  test("token chunks cover every token and respect the 64/48 geometry") {
    val chunks = run("q110_token_chunking")
      .select("doc_id", "chunk_id", "off", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      // offsets advance by exactly the stride and start at 0
      sorted.zipWithIndex.foreach { case ((_, cid, off, n), i) =>
        assert(cid == i && off == i * 48L)
        assert(n >= 1 && n <= 64)
      }
      // every token index < off_last + n_last is covered: consecutive
      // chunks overlap (next off <= prev off + 64) except a final short
      // chunk, which by construction starts within the previous chunk
      sorted.sliding(2).foreach {
        case Array((_, _, o1, n1), (_, _, o2, _)) =>
          assert(o2 <= o1 + n1, "gap between consecutive chunks")
        case _ =>
      }
    }
  }

  test("q141 SQ8 error respects the quantization-step bound") {
    // per dimension, |x - reconstruct(x)| <= step/2 where
    // step = (max-min)/255, so any vector's MSE <= max_d(step^2)/4
    val r = run("q141_scalar_quantization").collect().head
    val steps = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(((max(col("x")) - min(col("x"))) / 255.0).as("step"))
      .agg(max(col("step") * col("step"))).collect().head.getDouble(0)
    val bound = steps / 4.0 + 1e-9
    assert(r.getAs[Double]("mse_max") <= bound,
      s"mse_max ${r.getAs[Double]("mse_max")} exceeds step bound $bound")
    assert(r.getAs[Double]("mse_mean") <= r.getAs[Double]("mse_max"))
  }

  // --- sequence-packing pair (q216/q217) under generated corpora ----
  // Random doc lengths (incl. zero-token and >2·2048-token docs, plus
  // exact pack multiples) written as a documents.parquet fixture, then
  // run through the REAL registry queries — not a re-implementation.
  private lazy val packingFixture: (String, Long) = {
    import spark.implicits._
    // one [a-z]+ token per "a" word; "" and "   " carry zero tokens
    val lens = sample(Gen.listOfN(80, Gen.frequency(
      (5, Gen.choose(0, 300)),      // typical short docs (incl. 0)
      (2, Gen.choose(4097, 6000)),  // docs spanning >2 packs
      (1, Gen.oneOf(2048, 4096)),   // exact pack multiples
      (1, Gen.const(0)))))          // extra zero-token mass
    val rows = lens.zipWithIndex.map { case (n, i) =>
      val text = if (n == 0 && i % 2 == 0) "   " // whitespace-only
                 else Seq.fill(n)("a").mkString(" ")
      (i.toLong, text)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_packing_prop_").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    (dir, lens.map(_.toLong).sum)
  }

  test("packing conservation: q217 slice tokens sum to the corpus total") {
    val (dir, totalTok) = packingFixture
    val manifest = Queries.registry
      .find(_.name == "q217_pack_boundary_manifest").get.build(spark, dir)
      .collect()
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum == totalTok,
      s"slices lose/mint tokens (expected $totalTok)")
  }

  test("packing exactness: every interior pack holds exactly 2048 tokens") {
    val (dir, _) = packingFixture
    val manifest = Queries.registry
      .find(_.name == "q217_pack_boundary_manifest").get.build(spark, dir)
      .collect()
    val lastPack = manifest.map(_.getAs[Long]("pack_id")).max
    val bad = manifest.filter(r =>
      r.getAs[Long]("pack_id") != lastPack &&
        r.getAs[Long]("n_tokens") != 2048L)
    assert(bad.isEmpty,
      s"non-2048 interior packs: ${bad.take(3).mkString(", ")}")
  }

  test("packing consistency: q217 manifest reproduces q216's pack summary") {
    val (dir, _) = packingFixture
    val summary = Queries.registry
      .find(_.name == "q216_sequence_packing").get.build(spark, dir)
      .collect().map(r => r.getAs[Long]("pack_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val manifest = Queries.registry
      .find(_.name == "q217_pack_boundary_manifest").get.build(spark, dir)
      .collect().map(r => r.getAs[Long]("pack_id") ->
        (r.getAs[Long]("n_slices"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_carryover_docs"))).toMap
    // q216 assigns each doc to the pack of its FIRST token, so q216's
    // pack set is the set of packs where at least one doc STARTS —
    // exactly the manifest packs with a non-carryover slice
    val startPacks = manifest.filter { case (_, (sl, _, co)) => sl > co }
    assert(summary.keySet == startPacks.keySet,
      "pack sets diverge between summary and manifest")
    // docs starting in a pack = its slices minus its carried-over docs
    startPacks.foreach { case (p, (slices, _, carry)) =>
      assert(summary(p)._1 == slices - carry,
        s"pack $p: n_docs ${summary(p)._1} != $slices-$carry")
    }
    // both views conserve the same corpus total
    assert(summary.values.map(_._2).sum ==
      manifest.values.map(_._2).sum)
  }

  // --- adversarial UTF-8 plane (round-11): the text kernels against
  // a JVM mirror of the normalization CONTRACT (explicit whitespace
  // class [ \t\n\f\r], simple case mapping for the two Java-vs-
  // utf8proc hazard chars U+0130/U+03A3). tools/nasty_check.py runs
  // the same plane END-TO-END against DuckDB. -----------------------

  /** The contract mirror of TextOps.norm (NOT Java's `\s`, NOT
    * String.trim — Spark's trim strips ' ' only). Shared with the
    * other brute-force specs via [[TestTextRef]]. */
  private def normRef(s: String): String = TestTextRef.norm(s)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private val nastyTokens: Seq[String] = Seq(
    "plain", "漢字テキスト", "étude", "e\u0301tude" /* combining */,
    "😀😀", "👩‍👩‍👧" /* ZWJ family */, "a‍b",
    "İstanbul", "ΦΩΣ" /* final sigma */, "ΣΑΣ", "ς", "ß", "ı",
    "a\u00a0b" /* NBSP glues into ONE token */, "a\u3000b",
    "a\u2028b", "a\u0085b", "a\u000bb" /* vtab: NOT whitespace */,
    "x" * 100000 /* 10^5-char single token */)

  private val nastyDoc: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf(nastyTokens))
    sep <- Gen.listOfN(math.max(n - 1, 0),
      Gen.oneOf(" ", "  ", "\t", "\n", " \r ", "\f"))
    lead <- Gen.oneOf("", " ", "\t ")
    trail <- Gen.oneOf("", " ", " \n")
  } yield lead + toks.zip(sep :+ "").map { case (a, b) => a + b }
    .mkString + trail

  test("nasty plane: TextOps.norm matches the contract mirror exactly") {
    import spark.implicits._
    import graft.functions.TextOps
    val docs = sample(Gen.listOfN(300, nastyDoc)) ++ nastyTokens
    val got = docs.toDF("text")
      .select(TextOps.norm(col("text")).as("n"))
      .collect().map(_.getString(0))
    val want = docs.map(normRef)
    got.zip(want).zip(docs).foreach { case ((g, w), d) =>
      assert(g == w, s"norm diverges on ${d.take(40).map(_.toInt)}")
    }
  }

  test("nasty plane: fingerprint matches md5 over mirror-sorted vocab; shingle algebra holds") {
    import spark.implicits._
    import graft.functions.TextOps
    val docs = sample(Gen.listOfN(200, nastyDoc)).filter(_.nonEmpty)
    val rows = docs.toDF("text")
      .select(col("text"), TextOps.fingerprint(col("text")).as("fp"),
        TextOps.words(col("text")).as("w"),
        TextOps.shingles(TextOps.words(col("text")), 3).as("sh"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      // mirror fingerprint: md5 of space-joined UTF8-BINARY-sorted
      // distinct words (Spark string sort order = unsigned byte order)
      val words = normRef(text).split(" ", -1).toSeq
      val vocab = words.distinct
        .sortBy(w => w.getBytes("UTF-8").map(b => (b & 0xff).toChar).mkString)
      assert(r.getString(1) == md5Hex(vocab.mkString(" ")),
        s"fingerprint diverges on ${text.take(40).map(_.toInt)}")
      val w = r.getSeq[String](2)
      assert(w == words, "words diverge from mirror")
      val sh = r.getSeq[String](3)
      assert(sh.length == math.max(0, w.length - 2))
      // post-split words carry no ' ', so each 3-shingle splits back
      // into exactly 3 words
      assert(sh.forall(_.split(" ", -1).length == 3))
    }
  }

  test("nasty plane: 1e5-char tokens keep every kernel total and linear") {
    import spark.implicits._
    import graft.functions.TextOps
    val big = Seq.fill(50)("y" * 100000).mkString(" ")
    val r = Seq(big, "z " + big, big + " " + big).toDF("text")
      .select(TextOps.fingerprint(col("text")).as("fp"),
        size(TextOps.shingleSet(TextOps.words(col("text")), 5)).as("nsh"),
        graft.plans.MinHashSig.minhashSig(
          TextOps.shingleSet(TextOps.words(col("text")), 5), 4).as("ms"))
      .collect()
    assert(r.length == 3)
    assert(r.forall(_.getAs[String]("fp").length == 32))
    assert(r.forall(_.getAs[Seq[String]]("ms").length == 4))
    // doc 1: 50 identical tokens -> 1 distinct 5-shingle
    assert(r(0).getAs[Int]("nsh") == 1)
  }

  test("q142 reconciliation is total and unambiguous") {
    // every document's key attaches to exactly one canonical source:
    // per-source n_obs sums to the corpus size, and exact+fuzzy
    // partition each group's observations
    val rows = run("q142_fuzzy_reconcile").collect()
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") + r.getAs[Long]("n_fuzzy")
        == r.getAs[Long]("n_obs"))
    }
  }
}
