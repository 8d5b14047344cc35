package graft.ml

import org.apache.spark.sql.types._

/** The reference's canonical 18-column food schema: 17 nutrient doubles
  * + description, declared identically in four places of the reference
  * (producer.py:13-19, batch_writer_consumer.py:13-19,
  * pyspark_app/spark_model_trainer.py:17-24, api_server/api.py:27-48).
  * Column names contain spaces/commas/parens/hyphens — always address
  * them via `col("...")`, never bare identifiers.
  */
object FoodSchema {

  val numericCols: Seq[String] = Seq(
    "Protein-G",
    "Total lipid (fat)-G",
    "Carbohydrate, by difference-G",
    "Energy-KCAL",
    "Sugars, total including NLEA-G",
    "Fiber, total dietary-G",
    "Calcium, Ca-MG",
    "Iron, Fe-MG",
    "Sodium, Na-MG",
    "Vitamin D (D2 + D3)-UG",
    "Cholesterol-MG",
    "Fatty acids, total saturated-G",
    "Potassium, K-MG",
    "Vitamin C, total ascorbic acid-MG",
    "Vitamin B-6-MG",
    "Vitamin B-12-UG",
    "Zinc, Zn-MG")

  val descriptionCol = "description"

  val schema: StructType = StructType(
    numericCols.map(StructField(_, DoubleType, nullable = true))
      :+ StructField(descriptionCol, StringType, nullable = true))

  /** Model-5 label rule: Protein-G > 20.0 (reference:
    * spark_model_trainer.py:41-43,151-153). */
  val proteinCol = "Protein-G"
  val highProteinThreshold = 20.0
  val labelCol = "is_high_protein"

  /** Model-4 regression target + features (reference:
    * spark_model_trainer.py:37-38). */
  val energyCol = "Energy-KCAL"
  val regressionFeatures: Seq[String] = Seq(
    "Protein-G", "Total lipid (fat)-G", "Carbohydrate, by difference-G")

  /** Model-5 classification features (reference:
    * spark_model_trainer.py:39-40, api.py:44-48). */
  val classificationFeatures: Seq[String] = Seq(
    "Total lipid (fat)-G", "Carbohydrate, by difference-G",
    "Sugars, total including NLEA-G", "Sodium, Na-MG")
}
