package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftops.GraftInternal
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte/char kernels for the payload-as-bytes operators
  * (multimodal family) and the char-window tokenizers (shingles, LID
  * trigrams).
  *
  * Why these exist (optimization guide §1.2 step 2, "per-task work"):
  * the composed-expression forms they replace index characters with
  * `ascii(substring(text, i, 1))` — and `substring` on a UTF8String must
  * scan from the start of the string to find character i, so a per-byte
  * explode or an `aggregate(sequence(1, n), …)` fold touches O(len²)
  * bytes per document. The r12 bench showed the multimodal and
  * shingle-bearing doc queries dominated by exactly this (the same
  * disease doc_cdc_chunks had before its kernel: 26 s → sub-second).
  * Each kernel below is one linear scan over the UTF-8 bytes inside
  * whole-stage codegen.
  *
  * ASCII-only contract, same as [[TextHashKernels.cdcCuts]]: the kernels
  * read UTF-8 BYTES, the expression forms they replace read CHARACTERS.
  * The two agree iff every character is single-byte; the driver corpora
  * are ASCII by construction (verified: every `documents.text` row at
  * sf0.001/0.01/0.1 matches `^[\x00-\x7F]*$`), and ByteKernelsSpec pins
  * kernel == expression-form equivalence on the gate corpus.
  */
object ByteKernels {

  /** Unsigned byte values of the UTF-8 encoding, one array<int> entry per
    * byte — for ASCII text identical to
    * `transform(sequence(1, length(t)), i -> ascii(substring(t, i, 1)))`.
    */
  def asciiCodes(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xFF; i += 1 }
    new GenericArrayData(out)
  }

  /** All k-byte windows at the given stride, as strings — for ASCII text
    * identical to `substring(text, i, k)` for
    * `i in sequence(1, length(text) - k + 1, stride)`. Slices share the
    * backing byte array (UTF8String.substring is offset-based), so the
    * pass is O(len) with no per-window copying.
    */
  def charWindows(text: UTF8String, k: Int, stride: Int): ArrayData = {
    // slice the byte array directly: UTF8String.substring is CHARACTER-
    // indexed and scans from the string head (the very O(len²) this
    // kernel removes); fromBytes shares one backing array across windows
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[AnyRef])
    val cnt = (n - k) / stride + 1
    val out = new Array[AnyRef](cnt)
    var w = 0
    while (w < cnt) {
      out(w) = UTF8String.fromBytes(bytes, w * stride, k)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Σ |a_i − b_i| over the common prefix (i < min(len)) — for ASCII text
    * identical to `aggregate(sequence(1, least(length(a), length(b))), 0L,
    * (acc, i) -> acc + abs(ascii(substring(a, i, 1)) -
    * ascii(substring(b, i, 1))))`.
    */
  def sadPrefix(a: UTF8String, b: UTF8String): Long = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = Math.min(ab.length, bb.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.abs((ab(i) & 0xFF) - (bb(i) & 0xFF))
      i += 1
    }
    acc
  }

  /** Σ (u(i+stride) − u(i))² for 1-based i in [1, bound] (empty when
    * bound < 1) — the gradient-energy focus fold of mm_keyframes /
    * mm_focus_measure. For ASCII text identical to
    * `aggregate(sequence(1, bound), 0L, (acc, i) -> acc +
    * (ascii(substring(t, i+stride, 1)) - ascii(substring(t, i, 1)))²)`
    * whenever bound >= 1. Caller guarantees bound + stride <= length.
    */
  def strideSqSum(text: UTF8String, stride: Int, bound: Int): Long = {
    if (bound < 1) return 0L
    val bytes = text.getBytes
    var acc = 0L
    var i = 0
    while (i < bound) {
      val d = (bytes(i + stride) & 0xFF) - (bytes(i) & 0xFF)
      acc += d.toLong * d
      i += 1
    }
    acc
  }
}

/** array<int> of unsigned byte values of a string column. */
case class AsciiCodes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ascii_codes"
  override protected def nullSafeEval(input: Any): Any =
    ByteKernels.asciiCodes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteKernels.asciiCodes($c)")
  override protected def withNewChildInternal(c: Expression): AsciiCodes =
    copy(child = c)
}

/** array<string> of the k-byte windows of a string column at `stride`. */
case class CharWindows(child: Expression, k: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_windows"
  override protected def nullSafeEval(input: Any): Any =
    ByteKernels.charWindows(input.asInstanceOf[UTF8String], k, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteKernels.charWindows($c, $k, $stride)")
  override protected def withNewChildInternal(c: Expression): CharWindows =
    copy(child = c)
}

/** Σ|a_i − b_i| over the common prefix of two string columns. */
case class ByteSadPrefix(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sad_prefix"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ByteKernels.sadPrefix(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ByteKernels.sadPrefix($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ByteSadPrefix = copy(left = l, right = r)
}

/** Σ(u(i+stride) − u(i))² for i in [1, bound] of a string column; the
  * bound rides as a second (integer) child so each row can derive it
  * from its own length.
  */
case class ByteStrideSqSum(left: Expression, right: Expression, stride: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_stride_sq_sum"
  override protected def nullSafeEval(t: Any, bound: Any): Any =
    ByteKernels.strideSqSum(t.asInstanceOf[UTF8String], stride,
      bound.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, b) =>
      s"graft.functions.ByteKernels.strideSqSum($t, $stride, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ByteStrideSqSum = copy(left = l, right = r)
}

object ByteFunctions {
  def ascii_codes(c: Column): Column =
    GraftInternal.column(AsciiCodes(GraftInternal.expr(c)))
  def char_windows(c: Column, k: Int, stride: Int): Column =
    GraftInternal.column(CharWindows(GraftInternal.expr(c), k, stride))
  def byte_sad_prefix(a: Column, b: Column): Column =
    GraftInternal.column(ByteSadPrefix(GraftInternal.expr(a), GraftInternal.expr(b)))
  def byte_stride_sq_sum(c: Column, bound: Column, stride: Int): Column =
    GraftInternal.column(ByteStrideSqSum(GraftInternal.expr(c),
      GraftInternal.expr(bound), stride))
}
