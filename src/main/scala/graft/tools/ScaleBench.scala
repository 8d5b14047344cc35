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
    spark.stop()
  }
}
