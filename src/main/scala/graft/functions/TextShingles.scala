package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen shingle extraction — the single hottest expression of
  * the text/dedup pipeline (word n-gram shingles feed the CMS/HLL/Bloom
  * sketches, MinHash/SetSimJoin dedup, and decontamination — ~30 gate
  * queries route through it).
  *
  * The original formulation (`transform(sequence(0, size(toks)-n),
  * i -> concat_ws(" ", slice(toks, i+1, n)))` over `split(text, " ")`)
  * is semantically exact but evaluates the lambda per element through
  * the interpreted expression walker (higher-order functions are
  * CodegenFallback), allocating a split array, a sequence array, one
  * sliced array and one concat per shingle. Because the delimiter is a
  * single space and `split` keeps empty tokens (limit -1),
  * `concat_ws(" ", toks[i..j])` is EXACTLY the byte range of the
  * original text from the start of token i to the end of token j — so
  * one byte scan for space positions plus zero-copy UTF8String slices
  * over one shared byte array reproduces the array bit-for-bit
  * (ShingleExprSpec pins equality against the HOF formulation on the
  * full edge-case lattice: null/empty text, consecutive/leading/
  * trailing spaces, fewer tokens than n, multi-byte UTF-8).
  *
  * Null/edge semantics (identical to the HOF form, rule 10):
  *  - null text  -> EMPTY array (never null): the explicit null policy
  *    lives INSIDE the computing expression (house rule 11) so explode
  *    emits nothing and no phantom '' shingle is born;
  *  - empty text -> [""] (one empty shingle; callers filter '' per the
  *    shared shingle policy);
  *  - fewer than n tokens -> one shingle = the whole text.
  *
  * UTF-8 safety: multi-byte sequences never contain 0x20 (continuation
  * bytes are >= 0x80), so byte-level space scanning equals the regex
  * `split(text, " ")` tokenization.
  */
case class WordShingleArray(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def prettyName: String = if (distinct) "graft_word_shingles" else "graft_word_shingle_occurrences"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // null input maps to an empty array, so the result itself is never null
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any =
    TextShingles.word(child.eval(input).asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      s"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.TextShingles.word(
         |    ${childGen.isNull} ? null : ${childGen.value}, $n, $distinct);
       """.stripMargin
    ev.copy(code = code"$resultCode", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character n-gram shingles (distinct), the codegen replacement for
  * `array_distinct(transform(sequence(1, greatest(length(t)-n+1, 1)),
  * i -> substr(t, i, n)))`. Substring semantics are by CODEPOINT
  * (Spark `substr`), so the scan records codepoint start offsets and
  * slices byte ranges between them. Null text -> `[null]` (ONE null
  * element, never a null array): `greatest` ignores its null argument,
  * so the HOF form evaluates `sequence(1, 1)` and `substr(null, 1, n)`
  * yields the single null element — pinned in ShingleExprSpec, and
  * deliberately different from the word form's empty array.
  */
case class CharShingleArray(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def prettyName: String = "graft_char_shingles"

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  // null input maps to [null]; the array itself is never null
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any =
    TextShingles.charDistinct(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      s"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.TextShingles.charDistinct(
         |    ${childGen.isNull} ? null : ${childGen.value}, $n);
       """.stripMargin
    ev.copy(code = code"$resultCode", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-level kernels behind [[WordShingleArray]] / [[CharShingleArray]]
  * (top-level object: Scala emits static forwarders, so generated Java
  * calls these directly inside WholeStageCodegen).
  */
object TextShingles {

  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Word n-gram shingle array of `t`; occurrences, or first-occurrence
    * distinct when `distinct`. Null -> empty array.
    */
  def word(t: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (t == null) return Empty
    val bytes = t.getBytes
    val nb = bytes.length
    // pass 1: count spaces (tokens = spaces + 1)
    var spaces = 0
    var i = 0
    while (i < nb) {
      if (bytes(i) == 0x20) spaces += 1
      i += 1
    }
    val numToks = spaces + 1
    // pass 2: token start offsets
    val starts = new Array[Int](numToks)
    var j = 1
    i = 0
    while (i < nb) {
      if (bytes(i) == 0x20) { starts(j) = i + 1; j += 1 }
      i += 1
    }
    val count = math.max(numToks - n, 0) + 1
    if (!distinct) {
      val out = new Array[Any](count)
      var s = 0
      while (s < count) {
        out(s) = slice(bytes, nb, starts, numToks, s, n)
        s += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](math.min(count * 2, 1 << 16))
      var s = 0
      while (s < count) {
        seen.add(slice(bytes, nb, starts, numToks, s, n))
        s += 1
      }
      new GenericArrayData(
        seen.toArray(new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
    }
  }

  /** Shingle s = bytes from start of token s to end of token
    * min(s+n-1, numToks-1) — the exact `concat_ws(" ", slice(toks, s+1, n))`
    * byte range, shared-buffer (UTF8String.fromBytes wraps, no copy).
    */
  @inline private def slice(bytes: Array[Byte], nb: Int, starts: Array[Int],
      numToks: Int, s: Int, n: Int): UTF8String = {
    val from = starts(s)
    val lastTok = math.min(s + n - 1, numToks - 1)
    val until = if (lastTok + 1 < numToks) starts(lastTok + 1) - 1 else nb
    UTF8String.fromBytes(bytes, from, until - from)
  }

  /** Distinct char n-gram shingles of `t` (first-occurrence order):
    * codepoint positions 1..max(numChars-n+1, 1), each sliced to at most
    * n codepoints — `substr(t, i, n)` exactly, including the whole-text
    * (or "") single shingle when numChars < n.
    */
  def charDistinct(t: UTF8String, n: Int): ArrayData = {
    if (t == null) return new GenericArrayData(Array[Any](null))
    val bytes = t.getBytes
    val nb = bytes.length
    // codepoint start offsets; charStarts(c) = byte offset of codepoint c,
    // sentinel charStarts(nChars) = nb
    var nChars = 0
    var i = 0
    while (i < nb) {
      // UTF-8 start byte: not a continuation byte (0b10xxxxxx)
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    val charStarts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nb) {
      if ((bytes(i) & 0xC0) != 0x80) { charStarts(c) = i; c += 1 }
      i += 1
    }
    charStarts(nChars) = nb
    val count = math.max(nChars - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](math.min(count * 2, 1 << 16))
    var s = 0
    while (s < count) {
      val from = charStarts(math.min(s, nChars))
      val until = charStarts(math.min(s + n, nChars))
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      s += 1
    }
    new GenericArrayData(
      seen.toArray(new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
  }
}
