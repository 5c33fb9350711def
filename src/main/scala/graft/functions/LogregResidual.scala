package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** σ(Σ_i x_i·w[bucket_i]) − y over a pivoted feature row — the per-doc
  * logistic-regression residual of [[graft.ops.Classify]]'s pivoted GD
  * fast path, as a native Catalyst expression (r19 verdict #4).
  *
  * The former Scala UDF decoded the `fs: array<struct<bucket,x>>`
  * column to a boxed `Seq[Row]` (one GenericRowWithSchema per feature
  * per doc PER ITERATION) and looked weights up in an immutable
  * `Map[Long, Double]` (boxing every key). This expression walks the
  * unsafe array in place under WholeStageCodegen and indexes a dense
  * `double[]` (bucket −1, the intercept, lives at slot 0 — buckets are
  * bounded by the pivot cap, so the dense table is at most a few
  * hundred KB). Arithmetic is term-identical: same per-element
  * `x·w(bucket)` products accumulated in `fs` array order, same
  * `1/(1+exp(−m)) − y`; the dense array holds exactly the map's stored
  * values (absent buckets 0.0, the map's default), so results are
  * bit-identical — ClassifySpec's pivoted==join pin covers this path.
  *
  * Null policy (matches the replaced ScalaUDF with a primitive Double
  * parameter): a NULL `fs` or NULL `y` yields NULL (BinaryExpression
  * default), which the downstream `sum(r·x)` then ignores. Feature
  * structs carry non-null fields by construction (hashedFeatures).
  */
case class LogregResidual(left: Expression, right: Expression,
    weights: Array[Double]) extends BinaryExpression {

  override def prettyName: String = "graft_logreg_residual"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(s: StructType, _), DoubleType)
        if s.fields.length == 2 && s.fields(0).dataType == LongType &&
          s.fields(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<bigint,double>>, double), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(fs: Any, y: Any): Any =
    LogregKernel.residual(fs.asInstanceOf[ArrayData],
      y.asInstanceOf[Double], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, (fs, y) =>
      s"${ev.value} = graft.functions.LogregKernel.residual($fs, $y, $w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Row-level kernel behind [[LogregResidual]] (top-level object: Scala
  * emits static forwarders, so generated Java calls it directly inside
  * WholeStageCodegen — the [[TextShingles]] pattern).
  */
object LogregKernel {

  /** `w` is dense over bucket+1 (slot 0 = the −1 intercept bucket). */
  def residual(fs: ArrayData, y: Double, w: Array[Double]): Double = {
    var m = 0.0
    var i = 0
    val n = fs.numElements()
    while (i < n) {
      val f = fs.getStruct(i, 2)
      m += f.getDouble(1) * w(f.getLong(0).toInt + 1)
      i += 1
    }
    1.0 / (1.0 + math.exp(-m)) - y
  }
}
