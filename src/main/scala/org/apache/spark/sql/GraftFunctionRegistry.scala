package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions._

/** Narrow shim (same pattern as GraftTreeAccess): register a function
  * builder on an ALREADY-RUNNING session. `SparkSessionExtensions` only
  * applies at session construction (`getOrCreate` on a live session
  * ignores `withExtensions`), and `sessionState` is `private[sql]`.
  */
object GraftFunctionRegistry {
  def registerTemp(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Column ↔ Expression bridges (`classic.ExpressionUtils` is
    * private[sql] at the Scala level despite public bytecode). */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** DataFrame over a hand-built LogicalPlan (`Dataset.ofRows` is
    * private[sql]) — the entry point for custom logical nodes planned
    * by an injected strategy. */
  def dataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
