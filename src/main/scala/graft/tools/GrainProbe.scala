package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B probe for the signatures() grain fork (round-20): times
  * the kernel and q251's downstream under both forced grains on one
  * session. */
object GrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[grainprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    val docs = graft.Tables.load(graft.Tables.tuned(spark), sfDir,
      "documents")
    import org.apache.spark.sql.types._
    val c = graft.operators.DedupQueries.corpus(docs)
    val base = c
      .withColumn("nt", graft.functions.TextOps.norm(col("text")))
      .filter(col("nt").isNotNull)
      .select(col("doc_id"), md5(col("nt")).as("h"), col("nt"))
    (1 to 2).foreach { rep =>
      println(s"[grainprobe] --- rep $rep ---")
      timed("base_count")(base.count())
      timed("memb_ckpt") {
        val m = base.select(col("doc_id"), col("h")).localCheckpoint()
        m.count()
      }
      cleanup()
      timed("doc_shingle_only")(
        base.repartition(col("doc_id"))
          .withColumn("sh", graft.functions.TextOps.shingleSet(
            split(col("nt"), " "), 5))
          .select(col("doc_id"), col("h"), col("sh"))
          .select(sum(size(col("sh")))).collect())
      cleanup()
      timed("doc_minhash")(
        graft.operators.DedupQueries.minhashBandTable(
          base.repartition(col("doc_id"))
            .withColumn("sh", graft.functions.TextOps.shingleSet(
              split(col("nt"), " "), 5))
            .select(col("doc_id"), col("h"), col("sh")),
          "doc_id", "h")
          .filter(col("bh").isNotNull).count())
      cleanup()
      timed("content_grp_shingle_only")(
        base.select(col("h"), col("nt"))
          .repartition(col("h"))
          .groupBy(col("h")).agg(min(col("nt")).as("nt"))
          .withColumn("sh", graft.functions.TextOps.shingleSet(
            split(col("nt"), " "), 5))
          .select(sum(size(col("sh")))).collect())
      cleanup()
      timed("content_minhash")(
        graft.operators.DedupQueries.minhashBandTable(
          base.select(col("h"), col("nt"))
            .repartition(col("h"))
            .groupBy(col("h")).agg(min(col("nt")).as("nt"))
            .withColumn("sh", graft.functions.TextOps.shingleSet(
              split(col("nt"), " "), 5))
            .select(col("h"), col("sh")), "h")
          .filter(col("bh").isNotNull).count())
      cleanup()
    }
    println("=== DOC PLAN ===")
    graft.operators.DedupQueries.minhashBandTable(
      base.repartition(col("doc_id"))
        .withColumn("sh", graft.functions.TextOps.shingleSet(
          split(col("nt"), " "), 5))
        .select(col("doc_id"), col("h"), col("sh")), "doc_id", "h")
      .filter(col("bh").isNotNull).explain()
    println("=== CONTENT PLAN ===")
    graft.operators.DedupQueries.minhashBandTable(
      base.select(col("h"), col("nt"))
        .repartition(col("h"))
        .groupBy(col("h")).agg(min(col("nt")).as("nt"))
        .withColumn("sh", graft.functions.TextOps.shingleSet(
          split(col("nt"), " "), 5))
        .select(col("h"), col("sh")), "h")
      .filter(col("bh").isNotNull).explain()
    graft.operators.DedupQueries.forceGrainForTest = None
    spark.stop()
  }
}
