package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** TrainerSpec-style invariants for the q250 quality-selection loop —
  * the properties the contract oracle can't express: seeded
  * determinism of the selection set, rule agreement on clear-margin
  * docs, and the model-artifact round-trip.
  */
class MlQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("seeded determinism: two independent fits select the same docs") {
    val s1 = MlQueries.qualitySelectedDocs(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val s2 = MlQueries.qualitySelectedDocs(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(s1.nonEmpty, "selection must be non-empty")
    assert(s1 == s2, "seeded fits must select identical doc sets")
  }

  test("clear-margin docs agree with the rule label at >= 90%") {
    val (_, scored) = MlQueries.qualityModelAndScored(spark, dir)
    val rows = scored.select("qs", "label", "prediction").collect()
    val clear = rows.filter { r =>
      val qs = r.getDouble(0)
      qs >= MlQueries.QualityClearGood || qs <= MlQueries.QualityClearBad
    }
    assert(clear.nonEmpty, "clear-margin band must be populated")
    val agree = clear.count(r => r.getDouble(1) == r.getDouble(2))
    assert(agree.toDouble / clear.length >= 0.9,
      s"clear-margin agreement ${agree.toDouble / clear.length}")
  }

  test("model artifact round-trips: loaded model scores identically") {
    val (m, _) = MlQueries.qualityModelAndScored(spark, dir)
    val out = java.nio.file.Files
      .createTempDirectory("graft_quality_model_").toString
    m.write.overwrite().save(out)
    val loaded = org.apache.spark.ml.PipelineModel.load(out)
    val labeled = MlQueries.qualityLabeled(spark, dir).localCheckpoint()
    def preds(model: org.apache.spark.ml.PipelineModel) =
      model.transform(labeled).select("doc_id", "prediction")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(preds(m) == preds(loaded),
      "loaded model's predictions diverge from the fitted model's")
  }

  test("selection output composes: unique doc ids, rule score carried") {
    val sel = MlQueries.qualitySelectedDocs(spark, dir).collect()
    assert(sel.map(_.getLong(0)).distinct.length == sel.length,
      "selection must be one row per doc")
    sel.foreach(r => assert(!r.isNullAt(r.fieldIndex("qs"))))
  }
}
