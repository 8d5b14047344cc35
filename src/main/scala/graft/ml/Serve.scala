package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.ml.feature.{StandardScalerModel, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
import org.apache.spark.ml.regression.GBTRegressionModel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The reference's serving surface (api_server/api.py:159-238), minus
  * Flask: each endpoint body as a pure function over a 1-row DataFrame.
  *
  * The one structural departure (SURVEY §2.6): recommendation top-k is
  * computed distributed over the snapshot (scan + TakeOrderedAndProject)
  * instead of the reference's collect-everything-to-driver sklearn KNN
  * (api.py:107-119) — its main scalability cliff.
  */
object Serve {

  /** HTTP JSON payload -> 1-row DataFrame with the full numeric schema;
    * absent keys default to 0.0 (api.py:159-170). */
  def inputRow(spark: SparkSession, payload: Map[String, Double]): DataFrame = {
    val values = FoodSchema.numericCols.map(c => payload.getOrElse(c, 0.0))
    val row = Row.fromSeq(values :+ "query")
    spark.createDataFrame(
      java.util.Collections.singletonList(row), FoodSchema.schema)
  }

  /** Models 1-2: cluster id for one input (api.py:190-199). */
  def predictCluster(model: PipelineModel, input: DataFrame): Int =
    model.transform(input).select("prediction").head().getInt(0)

  /** Model 3: top-k most similar foods by cosine over the z-scaled
    * snapshot (api.py:201-212), distributed. Returns
    * (description, cosine_distance) rows, ascending distance,
    * deterministic tiebreak on description. */
  def recommend(
      spark: SparkSession,
      scalerModel: PipelineModel,
      snapshotPath: String,
      payload: Map[String, Double],
      k: Int = 5): DataFrame = {
    val probeVec = scalerModel.transform(inputRow(spark, payload))
      .select(vector_to_array(col("scaled_features")).as("pv"))
    val snapshot = spark.read.parquet(snapshotPath)
      .select(col(FoodSchema.descriptionCol),
        vector_to_array(col("scaled_features")).as("v"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.plans.VectorFunctions.dot(a, b)
    snapshot.crossJoin(broadcast(probeVec))
      .withColumn("cosine_distance",
        lit(1.0) - dot(col("v"), col("pv")) /
          (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("pv"), col("pv")))))
      .orderBy(col("cosine_distance").asc, col(FoodSchema.descriptionCol).asc)
      .limit(k)
      .select(col(FoodSchema.descriptionCol), col("cosine_distance"))
  }

  /** Model 4: energy prediction, rounded to 2 dp (api.py:214-220). */
  def predictEnergy(model: PipelineModel, input: DataFrame): Double = {
    val raw = model.transform(input).select("prediction").head().getDouble(0)
    BigDecimal(raw).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Model 5: (label, P(high-protein)) with the probability rounded to
    * 4 dp (api.py:222-230). */
  def classifyProtein(model: PipelineModel, input: DataFrame): (Double, Double) = {
    val row = model.transform(input)
      .select(col("prediction"), col("probability")).head()
    val p = row.getAs[MlVector]("probability")(1)
    (row.getDouble(0),
      BigDecimal(p).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // -------------------------------------------------------------------
  // Driver-local scoring — no Spark job per request.
  //
  // The reference disables whole-stage codegen at serve time because
  // 1-row Spark inference is too slow (api.py:58). The Spark-native
  // answer is not to launch jobs at all for a single probe: extract the
  // fitted parameters once and evaluate on the driver. Equality with
  // the transform path is asserted in TrainerSpec; distributed scoring
  // (above) remains the batch path.
  // -------------------------------------------------------------------

  private def stage[T](model: PipelineModel)(pf: PartialFunction[Any, T]): T =
    model.stages.collectFirst(pf).getOrElse(
      throw new IllegalArgumentException(
        s"pipeline ${model.uid} lacks expected stage"))

  /** Assemble the payload in the pipeline's own feature order. */
  private def assembled(model: PipelineModel,
      payload: Map[String, Double]): MlVector = {
    val cols = stage(model) { case a: VectorAssembler => a }.getInputCols
    Vectors.dense(cols.map(c => payload.getOrElse(c, 0.0)))
  }

  /** StandardScaler's exact transform: (x - mean) * (std==0 ? 0 : 1/std). */
  private def zscale(s: StandardScalerModel, v: MlVector): MlVector =
    Vectors.dense(Array.tabulate(v.size) { i =>
      val shifted = v(i) - s.mean(i)
      if (s.std(i) == 0.0) 0.0 else shifted / s.std(i)
    })

  /** Models 1-2, local: assemble -> z-scale -> nearest centroid. */
  def localCluster(model: PipelineModel, payload: Map[String, Double]): Int = {
    val scaler = stage(model) { case s: StandardScalerModel => s }
    val kmeans = stage(model) { case k: KMeansModel => k }
    kmeans.predict(zscale(scaler, assembled(model, payload)))
  }

  /** Model 4, local: assemble -> GBT sum-of-trees, rounded 2 dp. */
  def localEnergy(model: PipelineModel, payload: Map[String, Double]): Double = {
    val gbt = stage(model) { case g: GBTRegressionModel => g }
    BigDecimal(gbt.predict(assembled(model, payload)))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Model 5, local: (label, P(high-protein) rounded 4 dp). */
  def localProtein(model: PipelineModel,
      payload: Map[String, Double]): (Double, Double) = {
    val gbt = stage(model) { case g: GBTClassificationModel => g }
    val probs = gbt.predictProbability(assembled(model, payload))
    val label = if (probs(1) > probs(0)) 1.0 else 0.0
    (label,
      BigDecimal(probs(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
