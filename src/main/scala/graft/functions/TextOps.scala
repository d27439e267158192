package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hottest text primitives —
  * whitespace tokenization and n-gram construction — replacing the
  * higher-order-function forms that Catalyst cannot codegen (the QDot
  * precedent: HOFs evaluate interpreted inside an otherwise codegen'd
  * stage, with boxed lambda calls and a fresh array allocation per
  * element; round-18 StageProfile measured the tokenize+shingle scan
  * stages — single-task by the fixture's one-row-group layout, so their
  * CPU is pure serial wall — as the dominant cost of the whole
  * text/dedup family).
  *
  * Exact drop-in equivalents, pinned by TextOpsSpec against the
  * declarative forms on fixture text and adversarial cases:
  *
  *  - [[SpaceWords]](text) ≡ `filter(split(text, " "), w => w =!= "")`:
  *    split on the single space byte (0x20 never occurs inside a
  *    multi-byte UTF-8 sequence, so byte-level scanning is
  *    codepoint-safe), empties dropped. Output element type/nullability
  *    matches StringSplit's `ArrayType(StringType, containsNull=false)`
  *    so downstream schemas are bit-identical. Word slices share the
  *    input's byte array (no per-word copy).
  *  - [[NgramsConcat]](words, n) ≡ `transform(sequence(0, size-n),
  *    i => concat_ws(" ", w[i+1], ..., w[i+n]))` for size(words) ≥ n —
  *    every caller filters that precondition; below it this expression
  *    returns an EMPTY array (the HOF form's descending-sequence
  *    behavior there was unreachable-by-contract). One pass, one byte
  *    buffer per gram.
  *
  * Null semantics: null input → null output (UnaryExpression default);
  * array ELEMENTS are non-null by both producers' contracts
  * ([[SpaceWords]] output feeding [[NgramsConcat]]).
  */
case class SpaceWords(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "space_words"

  override def nullSafeEval(v: Any): Any =
    TextOps.spaceWords(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.spaceWords($c);")

  override protected def withNewChildInternal(newChild: Expression): SpaceWords =
    copy(child = newChild)
}

case class NgramsConcat(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"ngram width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def prettyName: String = "ngrams_concat"

  override def nullSafeEval(v: Any): Any =
    TextOps.ngramsConcat(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.ngramsConcat($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramsConcat =
    copy(child = newChild)
}

/** Static helpers invoked from generated code (standalone object so scalac
  * emits static forwarders Janino can call — the QDotOps pattern). */
object TextOps {

  def spaceWords(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val len = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < len) {
      while (i < len && b(i) == ' ') i += 1
      val st = i
      while (i < len && b(i) != ' ') i += 1
      if (i > st) out += UTF8String.fromBytes(b, st, i - st)
    }
    new GenericArrayData(out.toArray)
  }

  def ngramsConcat(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](len)
    var i = 0
    while (i < len) { words(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      var nBytes = n - 1
      var j = 0
      while (j < n) { nBytes += words(i + j).numBytes; j += 1 }
      val buf = new Array[Byte](nBytes)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val w = words(i + j)
        w.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += w.numBytes
        j += 1
      }
      out(i) = UTF8String.fromBytes(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column APIs for the expressions. */
  def spaceWords(c: Column): Column = Bridge.column(SpaceWords(Bridge.expression(c)))
  def ngramsConcat(c: Column, n: Int): Column =
    Bridge.column(NgramsConcat(Bridge.expression(c), n))
}
