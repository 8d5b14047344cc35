package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ClassicConversions, ColumnConversions}

/** Bridge into the sql package for the engine's custom Catalyst
  * expressions: Column <-> Expression conversion is `private[sql]` in
  * Spark 4's unified Column API, so the (stable, classic) converters
  * are re-exported here for graft.plans.
  */
object GraftColumnBridge {

  def column(e: Expression): Column =
    ClassicConversions.ColumnConstructorExt(Column).apply(e)

  def expression(c: Column): Expression =
    ColumnConversions.expression(c)
}
