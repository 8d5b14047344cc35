package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{GatedBroadcast, PrefixPass}

/** Crossover measurement harness for SCALE.md: times each scale-shaped
  * query in BOTH its shapes — the registry's distributed shape and the
  * naive single-partition / unconditional-broadcast shape it replaces —
  * at a given sf directory, from the SAME query code.
  *
  * Shapes are flipped by session conf only:
  *   - PrefixPass queries (q94/q159/q178/q182): `graft.prefixpass.naive`
  *     = true runs every primitive as the plain window formulation
  *     (unpartitioned `Window.orderBy` → SinglePartition exchange).
  *   - GatedBroadcast queries (q135/q163): `graft.broadcast.rowLimit`
  *     = 0 pins the shuffled-join fallback; default (5M) lets the
  *     gate hint broadcast while the measured side is bounded.
  *
  * Usage: runMain graft.tools.ScaleBench <sfDir> [query ...]
  * Prints one JSON line per (query, shape) with min-of-2 seconds.
  */
object ScaleBench {

  private val PrefixQueries = Seq(
    "q94_ntile_buckets", "q159_skyline", "q178_abc_classes",
    "q182_rfm_segments")
  private val GatedQueries = Seq(
    "q135_copurchase_pagerank", "q163_bfs_hops")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else PrefixQueries ++ GatedQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def cleanup(): Unit = {
      PrefixPass.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    def time(name: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        dt
      }
      math.min(once(), once())
    }

    names.foreach { name =>
      if (name == "probe:dedup") { dedupProbe(spark, sfDir); cleanup() }
      else if (name == "probe:recall") { recallProbe(spark, sfDir); cleanup() }
      else runShapes(spark, sfDir, name, time)
    }
    spark.stop()
  }

  private def runShapes(spark: SparkSession, sfDir: String, name: String,
      time: String => Double): Unit = {
    {
      val shapes: Seq[(String, () => Unit, () => Unit)] =
        if (PrefixQueries.contains(name)) Seq(
          ("twophase", () => (), () => ()),
          ("naive_window",
            () => spark.conf.set(PrefixPass.NaiveConfKey, "true"),
            () => spark.conf.unset(PrefixPass.NaiveConfKey)))
        else if (!GatedQueries.contains(name))
          // no shape toggle for this query: a single plain timing
          // (used for the linear-scaling measurements of the corpus
          // wave — sf0.1 vs the GenScale x10 fixture)
          Seq(("plain", () => (), () => ()))
        else Seq(
          ("gated_broadcast", () => (), () => ()),
          ("shuffle_join",
            () => spark.conf.set(GatedBroadcast.ConfKey, "0"),
            () => spark.conf.unset(GatedBroadcast.ConfKey)))
      shapes.foreach { case (shape, set, unset) =>
        set()
        try {
          val dt = time(name)
          println(f"""{"query":"$name","shape":"$shape","sec":$dt%.3f,"sf":"$sfDir"}""")
        } finally unset()
      }
    }
  }

  /** SCALE.md candidate-growth probe for the dedup family (round-9
    * advice #2): counts the EXACT candidate frames q50/q112 (capped
    * posting lists) and q51 (LSH band buckets) join, next to corpus
    * size and verified-output size, so SCALE.md can state measured
    * candidate growth instead of a design argument. */
  private def dedupProbe(spark: SparkSession, sfDir: String): Unit = {
    val docs = graft.Tables.load(graft.Tables.tuned(spark), sfDir, "documents")
    val nDocs = docs.count()
    val (cand50, _) = graft.operators.DedupQueries.prunedCandParts(docs)
    val nCand50 = cand50.count()
    val nOut50 = graft.SparkEntry.queries("q50_ngram_jaccard")(spark, sfDir).count()
    val (cand51, _) = graft.operators.DedupQueries.lshBandParts(docs)
    val nCand51 = cand51.count()
    val nOut51 = graft.SparkEntry.queries("q51_minhash_lsh")(spark, sfDir).count()
    println(s"""{"probe":"dedup","sf":"$sfDir","n_docs":$nDocs,""" +
      s""""cand_posting_cap":$nCand50,"out_q50":$nOut50,""" +
      s""""cand_lsh_bands":$nCand51,"out_q51":$nOut51}""")
  }

  /** SCALE.md ANN recall probe (round-9 advice #5): recall@10 of the
    * multiprobe LSH (q101's own output), plus recall@5 of the
    * single-bucket LSH query (q56) and the IVF nprobe=2 query (q59)
    * against the exact scan (q53, self excluded) — all through the
    * registry queries themselves. */
  private def recallProbe(spark: SparkSession, sfDir: String): Unit = {
    val r101 = graft.SparkEntry.queries("q101_ann_recall")(spark, sfDir)
      .collect().head
    val exact5 = graft.SparkEntry.queries("q53_cosine_knn")(spark, sfDir)
      .collect().map(_.getLong(0)).filter(_ != 0L).take(5).toSet
    def top5(name: String): Set[Long] =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.getLong(0)).take(5).toSet
    val lsh5 = top5("q56_ann_lsh_query")
    val ivf5 = top5("q59_ivf_ann")
    val rl = (exact5 & lsh5).size / 5.0
    val ri = (exact5 & ivf5).size / 5.0
    println(s"""{"probe":"recall","sf":"$sfDir",""" +
      s""""multiprobe_recall10":${r101.getAs[Double]("recall")},""" +
      f""""lsh_bucket_recall5":$rl%.2f,"ivf_recall5":$ri%.2f}""")
  }
}
