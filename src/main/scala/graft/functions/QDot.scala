package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the quantized integer dot product.
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` — is a
  * higher-order function that Catalyst cannot codegen: every pair
  * evaluation allocates a zipped array and runs boxed lambda calls, which
  * dominated the all-pairs similarity scans (2M pairs × 64 dims at sf0.1).
  * This expression stays inside whole-stage codegen and runs a primitive
  * long loop over the unsafe array data — the preference order of SURVEY
  * §7.3 / the build brief: compose built-ins if cheap enough, else a
  * custom `Expression` with `doGenCode`, before ever reaching for UDFs.
  *
  * Null semantics: null result if either ARRAY is null (BinaryExpression
  * default). Null ELEMENTS are not rejected — the unsafe-array getLong
  * reads them as 0, so they contribute 0 to the sum; this is a documented
  * contract of the public `qdot` SQL function (see GraftExtensions'
  * ExpressionInfo), chosen over a per-element isNullAt branch in the hot
  * loop (2M pairs × 64 dims at sf0.1; every engine-internal caller feeds
  * quantizeVec output, which is element-non-null by construction).
  * Lengths may differ; the product runs over the shorter prefix.
  */
case class QDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"

  // Declared input types give SQL callers (GraftExtensions registers qdot
  // in the function registry) a clean AnalysisException on wrong-typed
  // arguments instead of a runtime ClassCastException / Janino error.
  // Return type narrowed to Seq[DataType] (covariant) because
  // AbstractDataType is private[sql] in Spark 4.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any =
    QDotOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.QDotOps.dot($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Static helper invoked from generated code (standalone object so scalac
  * emits a static forwarder Janino can call). */
object QDotOps {
  def dot(a: ArrayData, b: ArrayData): Long = {
    // Indexed getLong, not toLongArray: the copies allocated two fresh
    // long[64] per evaluated pair — ~2 GB of short-lived garbage across a
    // 2M-pair scan — in exactly the hot loop this expression exists for.
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Column API for the expression. */
  def qdotNative(a: Column, b: Column): Column =
    Bridge.column(QDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
