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

/** Round-19 HOF sweep (verdict #2) — three more interpreted higher-order
  * forms replaced by codegen'd one-pass equivalents, pinned by
  * TextOpsSpec:
  *
  *  - [[SumCharLen]](w) ≡ `aggregate(transform(w, x =>
  *    length(x).cast("long")), 0L, (acc, x) => acc + x)`: sum of CHARACTER
  *    lengths (UTF8String.numChars). A null ELEMENT nulls the whole sum
  *    (the HOF's acc + null), a null array gives null, an empty array 0.
  *  - [[CountAsciiLowerWords]](w) ≡ `size(filter(w, x =>
  *    x.rlike("[a-z]"))).cast("long")` for non-null arrays: the regex
  *    only asks "contains an ASCII lowercase letter", and in UTF-8 the
  *    bytes 0x61–0x7A can ONLY encode those letters (continuation bytes
  *    are ≥ 0x80), so a byte scan is exact. Null elements are skipped
  *    (rlike(null) → null → filter drops); a null ARRAY gives null —
  *    which matches the HOF form too, because under the engine's
  *    ANSI-default sessions size(null) is NULL (the -1 legacy branch
  *    needs ANSI off).
  *  - [[FilterOutWords]](w, block) ≡ `filter(w, x => !x.isin(block: _*))`:
  *    keep elements not in the constant block list — a hash probe per
  *    element instead of an interpreted lambda running a |block|-long
  *    comparison chain. Null elements are dropped (isin(null) → null →
  *    filter drops), matching the HOF form.
  */
case class SumCharLen(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def prettyName: String = "sum_char_len"
  // A null element nulls the sum even for a non-null array.
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextOps.sumCharLen(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sumLen")
      s"""
         |java.lang.Long $r = graft.functions.TextOps.sumCharLen($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumCharLen =
    copy(child = newChild)
}

case class CountAsciiLowerWords(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def prettyName: String = "count_ascii_lower_words"

  override def nullSafeEval(v: Any): Any =
    TextOps.countAsciiLowerWords(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.countAsciiLowerWords($c);")

  override protected def withNewChildInternal(newChild: Expression): CountAsciiLowerWords =
    copy(child = newChild)
}

case class FilterOutWords(child: Expression, block: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = child.dataType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def prettyName: String = "filter_out_words"

  @transient private lazy val blockSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](block.size * 2)
    block.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    TextOps.filterOutWords(v.asInstanceOf[ArrayData], blockSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("blockSet", blockSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextOps.filterOutWords($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): FilterOutWords =
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
    // Null elements are SKIPPED within a gram — exactly concat_ws's
    // contract, which the replaced HOF form built each gram with
    // (ADVICE r18: the first cut NPE'd here where the HOF silently
    // skipped; engine-internal callers feed SpaceWords output, which is
    // element-non-null, so this branch costs one null check per word).
    val words = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      words(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      var nBytes = 0
      var nPresent = 0
      var j = 0
      while (j < n) {
        val w = words(i + j)
        if (w != null) { nBytes += w.numBytes; nPresent += 1 }
        j += 1
      }
      if (nPresent > 1) nBytes += nPresent - 1
      val buf = new Array[Byte](nBytes)
      var pos = 0
      var emitted = 0
      j = 0
      while (j < n) {
        val w = words(i + j)
        if (w != null) {
          if (emitted > 0) { buf(pos) = ' '; pos += 1 }
          w.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
          pos += w.numBytes
          emitted += 1
        }
        j += 1
      }
      out(i) = UTF8String.fromBytes(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sum of character lengths; null on null element (the aggregate-HOF
    * acc + null contract). Boxed return because of exactly that null. */
  def sumCharLen(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Count of non-null elements containing an ASCII lowercase byte. */
  def countAsciiLowerWords(arr: ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = arr.getUTF8String(i).getBytes
        var j = 0
        var hit = false
        while (!hit && j < b.length) {
          if (b(j) >= 'a' && b(j) <= 'z') hit = true
          j += 1
        }
        if (hit) c += 1
      }
      i += 1
    }
    c
  }

  /** Keep non-null elements not in the block set (one hash probe each). */
  def filterOutWords(arr: ArrayData, block: java.util.HashSet[UTF8String]): ArrayData = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        if (!block.contains(w)) out += w
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column APIs for the expressions. */
  def spaceWords(c: Column): Column = Bridge.column(SpaceWords(Bridge.expression(c)))
  def ngramsConcat(c: Column, n: Int): Column =
    Bridge.column(NgramsConcat(Bridge.expression(c), n))
  def sumCharLen(c: Column): Column = Bridge.column(SumCharLen(Bridge.expression(c)))
  def countAsciiLowerWords(c: Column): Column =
    Bridge.column(CountAsciiLowerWords(Bridge.expression(c)))
  def filterOutWords(c: Column, block: Seq[String]): Column =
    Bridge.column(FilterOutWords(Bridge.expression(c), block))
}
