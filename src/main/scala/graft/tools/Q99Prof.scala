package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Phase breakdown for the q50/q99/q281 capped-pair machinery
  * (round-18): times candidate generation, pair verification, and
  * label propagation separately at ×100 so optimization effort lands
  * on the measured phase. */
object Q99Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.tools.HarnessConf.tuning(sfDir))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q99prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(Tables.tuned(spark), sfDir, "documents")
    val (cand, shTab) = timed("cand_parts")(
      graft.operators.DedupQueries.prunedCandParts(docs))
    val candC = timed("cand_materialize")(cand.localCheckpoint())
    println(s"[q99prof] cand_rows ${candC.count()}")
    println(s"[q99prof] shTab_rows ${timed("shtab")(shTab.count())}")
    val pairs = timed("dup_pairs")(
      graft.operators.DedupQueries.dupPairs(docs).localCheckpoint())
    println(s"[q99prof] pair_rows ${pairs.count()}")
    val labels = timed("propagation")(
      graft.operators.DedupQueries.dupClusterLabels(pairs))
    println(s"[q99prof] label_rows ${labels.count()}")
    timed("summary")(
      labels.groupBy(col("lbl").as("cluster"))
        .agg(count(lit(1)).as("n_docs"),
          array_join(transform(array_sort(collect_list(col("id"))),
            _.cast(org.apache.spark.sql.types.StringType)), ",")
            .as("members"))
        .count())
    spark.stop()
  }
}
