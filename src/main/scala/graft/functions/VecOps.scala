package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the embedding-quantization primitive —
  * the round-19 sweep finishing what [[QDotProduct]] (round 14) and
  * [[SpaceWords]]/[[NgramsConcat]] (round 18) started: higher-order
  * functions evaluate INTERPRETED inside otherwise codegen'd stages
  * (boxed lambda calls, a fresh single-element projection per element),
  * and the quantize `transform` ran in the SCAN stage of all 25 sim_*
  * queries, the emb_* family and the semdedup family — per-row corpus
  * CPU at any scale, pure serial wall on the fixtures' single-row-group
  * scans.
  *
  * Exact drop-in equivalents, pinned by VecOpsSpec against the HOF forms
  * on fixture embeddings and adversarial cases:
  *
  *  - [[QuantizeVec]](v, scale) ≡ `transform(v, x =>
  *    round(x.cast("double") * scale).cast("long"))` for float/double
  *    element types: the float→double widening, the double multiply, the
  *    HALF_UP decimal-string rounding (java.math.BigDecimal.valueOf, the
  *    exact formula of Spark's Round on DoubleType) and the ANSI
  *    double→long cast (raise on NaN/±Inf/overflow — unreachable for the
  *    engine's µ/milli-unit embedding domain, matching the ANSI-default
  *    session the HOF form ran under) are each replicated bit-for-bit.
  *    Null elements map to null (the lambda's cast-of-null), null array
  *    to null (UnaryExpression default); output element nullability
  *    mirrors the input's.
  *  - [[Md5MinArray]](arr) ≡ `array_min(transform(arr, e => md5(e)))`
  *    — and therefore also ≡ `array_min(transform(array_distinct(arr),
  *    e => md5(e)))`, because a min is duplicate-blind — in ONE pass with
  *    one reused MessageDigest: per element md5 of the UTF-8 bytes,
  *    lowercase-hex, binary (= lexicographic, all digests 32 chars) min.
  *    Null elements are skipped (md5(null) → null, which array_min
  *    ignores); empty/all-null arrays give null (array_min's contract).
  */
case class QuantizeVec(child: Expression, scale: Double)
  extends UnaryExpression {

  private def childArray: ArrayType = child.dataType.asInstanceOf[ArrayType]
  private def elemIsFloat: Boolean = childArray.elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec requires array<float> or array<double>, got $other")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = childArray.containsNull)
  override def prettyName: String = "quantize_vec"

  override def nullSafeEval(v: Any): Any =
    VecOps.quantize(v.asInstanceOf[ArrayData], scale, elemIsFloat,
      childArray.containsNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecOps.quantize($c, ${scale}D, $elemIsFloat, ${childArray.containsNull});")

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

case class Md5MinArray(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_min_array requires array<string>, got $other")
  }

  override def dataType: DataType = StringType
  // Null even for a non-null child: empty / all-null arrays yield null
  // (array_min over an empty transform output).
  override def nullable: Boolean = true
  override def prettyName: String = "md5_min_array"

  override def nullSafeEval(v: Any): Any =
    VecOps.md5Min(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.VecOps.md5Min($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Md5MinArray =
    copy(child = newChild)
}

/** ≡ `zip_with(a, b, (x, y) => x * scale - y)` over array<long> — the
  * residual-vector build that runs per corpus row in the IVFPQ residual
  * chains (and, at scale 1, the rerank diff). zip_with semantics
  * replicated exactly: output length = max(len(a), len(b)); a missing or
  * null element on either side yields a null element (the lambda's
  * arithmetic over null); output containsNull = true (the HOF's lambda
  * nullability). ANSI multiply/subtract overflow raises — unreachable for
  * the engine's milli/micro-unit domain. VecOpsSpec pins equality. */
case class ZipScaleSub(left: Expression, right: Expression, scale: Long)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"zip_scale_sub requires two array<bigint>, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "zip_scale_sub"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.zipScaleSub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.zipScaleSub($a, $b, ${scale}L);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZipScaleSub =
    copy(left = newLeft, right = newRight)
}

/** Static helpers invoked from generated code (standalone object so scalac
  * emits static forwarders Janino can call — the QDotOps pattern). */
object VecOps {

  /** round(x * scale) with Spark-Round/ANSI-cast semantics, per element.
    * See [[QuantizeVec]]. */
  def quantize(arr: ArrayData, scale: Double, isFloat: Boolean,
      containsNull: Boolean): ArrayData = {
    val n = arr.numElements()
    if (!containsNull) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = roundToLong(d * scale)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          out(i) = java.lang.Long.valueOf(roundToLong(d * scale))
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Spark's Round-on-double (HALF_UP over the shortest decimal
    * representation — BigDecimal.valueOf, NOT Math.rint's HALF_EVEN and
    * NOT the binary-value `new BigDecimal(d)`), then the ANSI double→long
    * cast: NaN/±Inf pass through Round and the cast RAISES, as it does on
    * out-of-long-range values — the same outcome as the HOF form under
    * the engine's ANSI-default sessions, unreachable for the quantized
    * embedding domain (|x·scale| ≤ ~4e6). */
  private def roundToLong(m: Double): Long = {
    if (java.lang.Double.isNaN(m) || java.lang.Double.isInfinite(m))
      throw new ArithmeticException(
        s"quantize_vec: non-finite value $m cannot be cast to BIGINT")
    val r = java.math.BigDecimal.valueOf(m)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    if (!(Math.floor(r) <= Long.MaxValue.toDouble &&
          Math.ceil(r) >= Long.MinValue.toDouble))
      throw new ArithmeticException(
        s"quantize_vec: value $r out of BIGINT range")
    r.toLong
  }

  /** Binary-min md5 hex digest over the non-null elements; null when none.
    * See [[Md5MinArray]]. */
  def md5Min(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    var min: UTF8String = null
    if (n == 0) return min
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val s = arr.getUTF8String(i)
        val dig = md.digest(s.getBytes)
        val hex = new Array[Byte](32)
        var j = 0
        while (j < 16) {
          hex(2 * j) = HexDigits((dig(j) >> 4) & 0xF)
          hex(2 * j + 1) = HexDigits(dig(j) & 0xF)
          j += 1
        }
        val h = UTF8String.fromBytes(hex)
        if (min == null || h.compareTo(min) < 0) min = h
      }
      i += 1
    }
    min
  }

  private val HexDigits: Array[Byte] = "0123456789abcdef".getBytes("US-ASCII")

  /** x·scale − y elementwise with zip_with's max-length/null-padding
    * contract. See [[ZipScaleSub]]. */
  def zipScaleSub(a: ArrayData, b: ArrayData, scale: Long): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.max(na, nb)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < na && i < nb && !a.isNullAt(i) && !b.isNullAt(i))
        out(i) = java.lang.Long.valueOf(Math.subtractExact(
          Math.multiplyExact(a.getLong(i), scale), b.getLong(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column APIs for the expressions. */
  def quantizeVec(c: Column, scale: Double): Column =
    Bridge.column(QuantizeVec(Bridge.expression(c), scale))
  def md5MinArray(c: Column): Column =
    Bridge.column(Md5MinArray(Bridge.expression(c)))
  def zipScaleSub(a: Column, b: Column, scale: Long): Column =
    Bridge.column(ZipScaleSub(Bridge.expression(a), Bridge.expression(b), scale))
}
