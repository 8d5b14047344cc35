package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps

/** Stage breakdown for q251's plan (round-18 mechanism hunt): times
  * each lineage segment separately in one session so the 18–50 s
  * cross-protocol spread can be attributed to a PHASE (shingle+
  * minhash scan, band checkpoint, prefix window, final join) instead
  * of guessed at from end-to-end numbers. Reps default 3. */
object Q251Prof {
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
    val reps = sys.env.getOrElse("GRAFT_PROF_REPS", "3").toInt
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q251prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to reps).foreach { i =>
      println(s"[q251prof] --- rep $i ---")
      val docs = Tables.load(Tables.tuned(spark), sfDir, "documents")
      val c = graft.operators.DedupQueries.corpus(docs)
        .withColumn("sh",
          TextOps.shingleSet(TextOps.words(col("text")), 5))
      val bandsPlan = graft.operators.DedupQueries
        .minhashBandTable(c, "doc_id")
        .withColumn("batch_id", expr("doc_id div 100"))
      // phase 1: the corpus scan -> shingle -> minhash -> explode
      // pipeline, materialized into the narrow checkpoint
      val bands = timed("bands_checkpoint")(bandsPlan.localCheckpoint())
      println(s"[q251prof] bands_rows ${bands.count()}")
      // phase 2: per-(sig, batch) minima + prefix window
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band_idx"), col("bh"))
        .orderBy(col("batch_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val prefix = bands
        .groupBy(col("band_idx"), col("bh"), col("batch_id"))
        .agg(min(col("doc_id")).as("batch_min"))
        .withColumn("min_earlier", min(col("batch_min")).over(w))
        .filter(col("min_earlier").isNotNull)
        .drop("batch_min")
      val prefixC = timed("prefix_window")(prefix.localCheckpoint())
      println(s"[q251prof] prefix_rows ${prefixC.count()}")
      // phase 3: the final equi-join + per-doc aggregate
      timed("final_join")(
        bands.join(prefixC, Seq("band_idx", "bh", "batch_id"))
          .groupBy(col("doc_id"), col("batch_id"))
          .agg(count(lit(1)).as("n_hit_bands"),
            min(col("min_earlier")).as("first_seen"))
          .count())
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
