package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps

/** Stage breakdown for the q183/q90 ×100 cross-sweep spread
  * (round-18 VERDICT #1): q183_multi_exists ran 10.1/22.6/35.7 s and
  * q90_boilerplate_ngrams 4.9→10.0 s across same-fixture, same-code
  * sweeps. Hypotheses under test, per query:
  *
  * q183 — the shared derived view (lineitem⋈orders + late flag) is
  * referenced THREE times (l1, the EXISTS semi, the NOT EXISTS anti);
  * Spark plans each reference as its own subtree, so the corpus-scale
  * join runs 3× per execution — a 3× amplifier on any ambient scan
  * pressure. Phases: (a) the join materialized once, (b) the
  * semi/anti/agg over the MATERIALIZED input, (c) the shipped shape
  * (lineage re-derived 3×) end-to-end.
  *
  * q90 — doc-grain 8-gram explode on a replicated corpus (the q251
  * mechanism: per-doc text work × replication). Phases: (a) the
  * doc-grain explode+distinct-agg as shipped, (b) the content-group
  * variant (shingle once per distinct content, doc_freq = Σ member
  * counts of contents carrying the gram — exact because every doc
  * has exactly one content).
  */
object SpreadProf {
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
      println(f"[spreadprof] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(true))
      System.gc()
    }
    val sql183 = """
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM graft_q183_supplier
        JOIN graft_q183_li l1 ON s_suppkey = l1.l_suppkey
        WHERE l1.late = 1
          AND EXISTS (
            SELECT 1 FROM graft_q183_li l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM graft_q183_li l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.late = 1)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10"""
    (1 to reps).foreach { i =>
      println(s"[spreadprof] --- rep $i ---")
      // ---------------- q183 ----------------
      val t = (n: String) => Tables.load(Tables.tuned(spark), sfDir, n)
      val liPlan = t("lineitem")
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .select(col("l_orderkey"), col("l_suppkey"),
          (datediff(col("l_shipdate"), col("o_orderdate")) > 60)
            .cast(org.apache.spark.sql.types.IntegerType).as("late"))
      t("supplier").createOrReplaceTempView("graft_q183_supplier")
      // (c) shipped shape: the view re-derives the join per reference
      liPlan.createOrReplaceTempView("graft_q183_li")
      timed("q183_shipped_3x_lineage")(spark.sql(sql183).count())
      // (a) the join materialized once
      val liC = timed("q183_li_checkpoint")(liPlan.localCheckpoint())
      println(s"[spreadprof] li_rows ${liC.count()}")
      // (b) semi/anti/agg over the materialized input
      liC.createOrReplaceTempView("graft_q183_li")
      timed("q183_semi_anti_on_ckpt")(spark.sql(sql183).count())
      cleanup()
      // (d) round-19 verdict #4: the residual spread lives in the
      // checkpoint WRITE — does a serialized columnar persist
      // (MEMORY_AND_DISK_SER InMemoryRelation) of the same 3-column
      // view pin it? cacheManager serves all three view references
      // off the one cached relation, same compute-once effect.
      val liP = liPlan.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      timed("q183_li_persist_ser")(liP.count())
      liP.createOrReplaceTempView("graft_q183_li")
      timed("q183_semi_anti_on_persist")(spark.sql(sql183).count())
      cleanup()
      // ---------------- q90 ----------------
      val docs = t("documents")
      // (a) shipped doc-grain shape
      timed("q90_shipped_doc_grain")(
        docs.select(col("doc_id"),
          explode(TextOps.shingleSet(TextOps.words(col("text")), 8))
            .as("gram"))
          .groupBy(col("gram"))
          .agg(countDistinct(col("doc_id")).as("doc_freq"))
          .filter(col("doc_freq") >= 3).count())
      // (b) content-group variant: shingle per distinct content,
      // doc_freq = Σ member doc counts
      timed("q90_content_group")({
        val base = docs
          .withColumn("nt", TextOps.norm(col("text")))
          .filter(col("nt").isNotNull)
          .select(col("doc_id"), md5(col("nt")).as("h"), col("nt"))
        val counts = base.groupBy(col("h"))
          .agg(count(lit(1)).as("n_docs"), min(col("nt")).as("nt"))
        counts
          .select(col("h"), col("n_docs"),
            explode(TextOps.shingleSet(split(col("nt"), " "), 8))
              .as("gram"))
          .groupBy(col("gram"))
          .agg(sum(col("n_docs")).as("doc_freq"))
          .filter(col("doc_freq") >= 3).count()
      })
      cleanup()
    }
    spark.stop()
  }
}
