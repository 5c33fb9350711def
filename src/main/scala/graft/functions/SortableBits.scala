package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Monotone IEEE-754 total-order transform (the Lucene
  * `NumericUtils.doubleToSortableLong` construction): a signed long
  * whose ordering equals double ordering
  * (−Inf < … < −0.0 < +0.0 < … < +Inf < NaN) —
  * `bits ^ ((bits >> 63) & Long.MaxValue)` over `doubleToLongBits`.
  * The transform is an involution, so the same bit math inverts it.
  *
  * This is what lets [[graft.ops.Quantiles]] run its integer radix
  * refinement over DOUBLE columns exactly: transform once in the scan
  * projection (codegen'd — a Scala UDF here would run interpreted on
  * every refinement pass), select in sortable-long space, invert the
  * resolved key driver-side. Callers own the −0.0/NaN policy: the
  * transform distinguishes −0.0 from +0.0 and orders NaN above +Inf,
  * while SQL equality/ordering treats −0.0 = +0.0 and NULLs NaN-like —
  * Quantiles normalizes (+ 0.0) and excludes NaN before transforming.
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression
    with Serializable {
  override def prettyName: String = "graft_sortable_bits"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects DOUBLE, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    SortableBits.toSortable(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = Double.doubleToLongBits($v);
         |${ev.value} = $b ^ (($b >> 63) & Long.MAX_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortableBits {

  /** Scalar form (and the expression's eval): monotone, involutive. */
  def toSortable(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  /** Inverse of [[toSortable]] (the same involution, then bits→double). */
  def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))

  /** Column form of the codegen'd transform. */
  def sortable(c: Column): Column =
    GraftSqlBridge.column(DoubleSortableBits(
      GraftSqlBridge.expression(c.cast("double"))))
}
