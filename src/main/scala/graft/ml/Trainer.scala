package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Coerce

/** The reference's 5-model cumulative trainer, Spark-native
  * (reference: pyspark_app/spark_model_trainer.py:177-243).
  *
  * Model k trains on the first k/5 of the data — the reference slices
  * with a bare `limit()` and admits the result is order-dependent
  * (spark_model_trainer.py:226 comment); the engine imposes an explicit
  * total order before slicing so runs are reproducible (SURVEY §7.4).
  * GBT seeds are pinned for the same reason (the reference leaves them
  * unset — spark_model_trainer.py:130,164).
  *
  * Scale note: each `fit` is a sequence of distributed jobs
  * (StandardScaler = one agg pass; KMeans/GBT = iterative); the input
  * is persisted once across the 5 slices exactly as the reference does
  * (spark_model_trainer.py:206,242).
  */
object Trainer {

  val KmeansK = 5
  val KmeansSeed = 1L
  val GbtMaxIter = 10
  val GbtSeed = 42L
  val NumModels = 5

  /** Model-id -> type name (spark_model_trainer.py:12, api.py:21-25). */
  def modelType(k: Int): String = k match {
    case 1 | 2 => "clustering"
    case 3     => "recommendation"
    case 4     => "regression"
    case 5     => "classification"
    case _     => throw new IllegalArgumentException(s"model id $k")
  }

  /** The reference's prepare_dataframe (spark_model_trainer.py:46-64):
    * coerce every schema column with defaults, synthesizing any that
    * are absent. */
  def prepare(df: DataFrame): DataFrame =
    Coerce.withDefaults(df, FoodSchema.numericCols,
      Seq(FoodSchema.descriptionCol))

  /** Conditional binary label (spark_model_trainer.py:151-153). */
  def withLabel(df: DataFrame): DataFrame =
    df.withColumn(FoodSchema.labelCol,
      when(col(s"`${FoodSchema.proteinCol}`") > FoodSchema.highProteinThreshold,
        1.0).otherwise(0.0))

  /** Models 1-2: assemble 17 features -> z-score -> KMeans(k=5, seed=1)
    * (spark_model_trainer.py:68-89). handleInvalid="skip" at train as in
    * the reference (its serve path uses "keep" — the asymmetry is
    * reproduced in Serve). */
  def clusteringPipeline(): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FoodSchema.numericCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")
    val scaler = new StandardScaler()
      .setInputCol("features").setOutputCol("scaled_features")
      .setWithMean(true).setWithStd(true)
    val kmeans = new KMeans()
      .setK(KmeansK).setSeed(KmeansSeed)
      .setFeaturesCol("scaled_features").setPredictionCol("prediction")
    new Pipeline().setStages(Array(assembler, scaler, kmeans))
  }

  /** Model 3: assemble + scale only — the recommendation snapshot
    * pipeline (spark_model_trainer.py:91-110). */
  def scalingPipeline(): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FoodSchema.numericCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")
    val scaler = new StandardScaler()
      .setInputCol("features").setOutputCol("scaled_features")
      .setWithMean(true).setWithStd(true)
    new Pipeline().setStages(Array(assembler, scaler))
  }

  /** Model 4: GBT regression of Energy-KCAL on 3 macro-nutrients
    * (spark_model_trainer.py:116-142). */
  def regressionPipeline(): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FoodSchema.regressionFeatures.toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")
    val gbt = new GBTRegressor()
      .setLabelCol(FoodSchema.energyCol).setFeaturesCol("features")
      .setMaxIter(GbtMaxIter).setSeed(GbtSeed)
    new Pipeline().setStages(Array(assembler, gbt))
  }

  /** Model 5: GBT binary classification of is_high_protein
    * (spark_model_trainer.py:144-173). */
  def classificationPipeline(): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FoodSchema.classificationFeatures.toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")
    val gbt = new GBTClassifier()
      .setLabelCol(FoodSchema.labelCol).setFeaturesCol("features")
      .setMaxIter(GbtMaxIter).setSeed(GbtSeed)
    new Pipeline().setStages(Array(assembler, gbt))
  }

  /** Deterministic cumulative slices: slice k holds the first
    * k*n/total rows under an explicit total order
    * (spark_model_trainer.py:208-226, made reproducible).
    *
    * `limit` is Int-bounded, so slices are capped at ~2.1 B rows; the
    * require makes that cap an explicit error instead of a silent
    * `toInt` wraparound. Past that size, the global-total-order slice
    * semantics the reference uses stop being a sane operation anyway —
    * shard the input first. */
  def cumulativeSlices(
      df: DataFrame,
      orderCols: Seq[String],
      total: Int = NumModels): Seq[DataFrame] = {
    val n = df.count()
    require(n <= Int.MaxValue.toLong,
      s"cumulativeSlices: $n rows exceeds limit()'s Int bound; " +
        "shard the input before slicing")
    val ordered = df.orderBy(orderCols.map(col): _*)
    (1 to total).map(k => ordered.limit((n * k / total).toInt))
  }

  /** The full reference training run: prepare, label, persist, 5
    * cumulative slices, one model per slice, artifacts saved under
    * `outDir/model_<k>` (+ `outDir/reco_snapshot` parquet for model 3).
    * Slices smaller than `minRows` are skipped, mirroring the
    * reference's count gates (spark_model_trainer.py:72,121,158).
    * Returns the per-model row counts actually trained on.
    */
  def trainAll(
      raw: DataFrame,
      orderCols: Seq[String],
      outDir: String,
      minRows: Long = 10): Map[Int, Long] = {
    val data = withLabel(prepare(raw)).persist()
    try {
      val results = cumulativeSlices(data, orderCols).zipWithIndex.flatMap {
        case (slice, idx) =>
          val k = idx + 1
          val nRows = slice.count()
          if (nRows < minRows) None
          else {
            k match {
              case 1 | 2 =>
                clusteringPipeline().fit(slice)
                  .write.overwrite().save(s"$outDir/model_$k")
              case 3 =>
                val pm = scalingPipeline().fit(slice)
                pm.write.overwrite().save(s"$outDir/model_$k")
                pm.transform(slice)
                  .select(col(FoodSchema.descriptionCol),
                    col("scaled_features"))
                  .write.mode("overwrite")
                  .parquet(s"$outDir/reco_snapshot")
              case 4 =>
                regressionPipeline().fit(slice)
                  .write.overwrite().save(s"$outDir/model_$k")
              case 5 =>
                classificationPipeline().fit(slice)
                  .write.overwrite().save(s"$outDir/model_$k")
            }
            Some(k -> nRows)
          }
      }
      results.toMap
    } finally data.unpersist()
  }

  def loadModel(dir: String, k: Int): PipelineModel =
    PipelineModel.load(s"$dir/model_$k")
}
