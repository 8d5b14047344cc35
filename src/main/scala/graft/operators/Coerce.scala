package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's signature "default, not null" coercion semantics.
  *
  * Every layer of the reference substitutes a default rather than
  * propagating null: numerics -> 0.0, description -> "Unknown"
  * (reference: producer.py:79-87, batch_writer_consumer.py:50-58,
  * pyspark_app/spark_model_trainer.py:46-64, api_server/api.py:159-170).
  * Spark's `cast` yields null on unparseable input (with ANSI off), so
  * the engine-wide rule is `coalesce(cast(c), lit(default))`, plus
  * synthesizing absent columns as constant defaults
  * (spark_model_trainer.py:55-59).
  */
object Coerce {

  /** string/any -> double, unparseable or missing -> default (0.0). */
  def toDoubleOrDefault(c: Column, default: Double = 0.0): Column =
    coalesce(c.cast(DoubleType), lit(default))

  /** any -> string, null -> default ("Unknown"). */
  def toStringOrDefault(c: Column, default: String = "Unknown"): Column =
    coalesce(c.cast(StringType), lit(default))

  /** Project `df` onto exactly (numeric ++ strings), coercing each column
    * with defaults and synthesizing any column the input lacks — the
    * whole of the reference's `prepare_dataframe`
    * (spark_model_trainer.py:46-64) as one declarative select.
    */
  def withDefaults(
      df: DataFrame,
      numeric: Seq[String],
      strings: Seq[String],
      numDefault: Double = 0.0,
      strDefault: String = "Unknown"): DataFrame = {
    val present = df.columns.toSet
    val sel = (numeric ++ strings).map { c =>
      val isNum = numeric.contains(c)
      if (!present.contains(c)) {
        (if (isNum) lit(numDefault) else lit(strDefault)).as(c)
      } else if (isNum) toDoubleOrDefault(col(c), numDefault).as(c)
      else toStringOrDefault(col(c), strDefault).as(c)
    }
    df.select(sel: _*)
  }
}
