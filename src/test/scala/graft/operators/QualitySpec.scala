package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the corpus-quality / layout operators (q207/q208/q210)
  * beyond the oracle hash: TV-distance bounds and cross-multiplied
  * exactness, OOV-rate brute-force agreement, and z-order pruning
  * soundness (every matching row lives in a read bucket) and
  * effectiveness (z-order reads fewer rows than linear sort for the
  * 2-D box).
  */
class QualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def df(name: String) = graft.Queries.queries(name)(spark, dir)

  private def toks(): Array[(Long, String, String)] =
    graft.Tables.load(graft.Tables.tuned(spark), dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q207: TV is in [0, 1] and matches a brute-force distribution diff") {
    val rows = df("q207_corpus_drift_tv").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_tok"),
        r.getAs[Long]("tv_num"), r.getAs[Double]("tv"))).toMap
    val tk = toks()
    val n = tk.length.toLong
    val cw = tk.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    tk.groupBy(_._2).foreach { case (src, ts) =>
      val ns = ts.length.toLong
      val csw = ts.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val num = cw.map { case (w, c) =>
        math.abs(csw.getOrElse(w, 0L) * n - c * ns)
      }.sum
      val (gotN, gotNum, gotTv) = rows(src)
      assert(gotN == ns && gotNum == num, s"source $src")
      assert(gotTv >= 0.0 && gotTv <= 1.0)
      assert(gotTv == num.toDouble / ((2.0 * ns) * n))
    }
  }

  test("q208: OOV counts match brute force against the top-16 vocabulary") {
    val tk = toks()
    val cw = tk.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val core = cw.toSeq.sortBy { case (w, c) => (-c, w) }.take(16)
      .map(_._1).toSet
    val byDoc = tk.groupBy(_._1)
    df("q208_oov_quality").collect().foreach { r =>
      val ws = byDoc(r.getLong(0)).map(_._3)
      val oov = ws.count(w => !core.contains(w)).toLong
      assert(r.getAs[Long]("n_tokens") == ws.length.toLong)
      assert(r.getAs[Long]("n_oov") == oov)
      assert(r.getAs[Double]("oov_rate") == oov.toDouble / ws.length)
    }
  }

  test("q210: pruning is sound (rows_read >= rows_match) and z-order beats" +
    " the linear layout on the 2-D box") {
    val rows = df("q210_layout_pruning").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("buckets_read"),
        r.getAs[Long]("rows_read"), r.getAs[Long]("rows_match"))).toMap
    val (zB, zR, zM) = rows("zorder")
    val (lB, lR, lM) = rows("linear")
    assert(zM == lM)
    assert(zR >= zM && lR >= lM, "a read set must cover the matches")
    assert(zR <= lR, s"z-order read $zR rows, linear $lR")
    assert(zB <= lB)
  }

  test("q238 rank surprisal matches a brute-force recount") {
    val docs = graft.Tables.load(graft.Tables.tuned(spark), dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def words(t: String): Array[String] = graft.TestTextRef.words(t)
    val freq = docs.flatMap(d => words(d._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rank = freq.toSeq.sortBy { case (w, c) => (-c, w) }
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    val rareCut = rank.size.toLong / 2
    val expected = docs.map { case (id, text) =>
      val rs = words(text).map(rank)
      val n = rs.length.toLong
      val sr = rs.sum
      id -> ((n, (sr / n) * 1000000L + ((sr % n) * 1000000L) / n,
        rs.count(_ > rareCut).toLong * 1000000L / n))
    }.toMap
    val got = df("q238_rank_surprisal").collect().map(r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("mean_rank_micro"),
          r.getAs[Long]("rare_frac_micro")))).toMap
    assert(got == expected,
      s"surprisal diverges on ${ (got.keySet -- expected.keySet).take(3) }" +
        s" / first diff: ${got.find(kv => expected.get(kv._1) != Some(kv._2)).take(1)}")
  }
}
