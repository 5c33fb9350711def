package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge over Spark's `private[sql]` Column↔Expression converters
  * and function registry — the supported-in-practice seam every Spark
  * expression library uses (the alternative, string `expr(...)`, loses
  * type safety and literal folding). No Spark internals are reimplemented
  * here; this only re-exports two converters and one registry call.
  */
object GraftSqlBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert a Column built from sql.functions compositions into a plain
    * catalyst Expression TREE (UnresolvedFunction nodes the analyzer
    * then resolves). [[expression]] wraps the column node opaquely —
    * fine as a leaf inside a plan, but a FunctionRegistry builder must
    * return a real tree or codegen meets an Unevaluable wrapper.
    */
  def expressionTree(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  def registerFunction(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  /** Create a DataFrame from an RDD of InternalRows without the external
    * Row round-trip — the seam behind the Misra-Gries scan kernel
    * (Sketches.mgSummaries), whose per-element cost was dominated by
    * UTF8String→String decoding and GenericRowWithSchema allocation in
    * the DataFrame.mapPartitions path. Same supported-in-practice tier
    * as the converters above (Spark's own sources use it for exactly
    * this move).
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
