package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftops.GraftInternal
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text fingerprinting kernels. The composed-expression form
  * (sequence → transform(xxhash64(substring)) → sliding array_min)
  * allocates O(len·w) intermediate arrays per row; these kernels do one
  * scan over the UTF8 bytes with two reusable buffers. Rolling-hash
  * winnowing per the standard document-fingerprinting scheme
  * (re-expresses odin-style record digesting for the dedup pipeline).
  */
object TextHashKernels {

  /** xxh64-style avalanche of a k-byte window hash chain; cheap rolling
    * base hash (polynomial) + finalizer, deterministic across JVMs.
    */
  private def mix(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** Winnowed fingerprints: k-gram rolling hashes, min per w-window,
    * distinct, sorted. One pass, no per-window allocation.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    // rolling polynomial hash: h_i = h_{i-1}*B + b, with B^k removal
    val B = 1000003L
    var bk = 1L
    var i = 0
    while (i < k) { bk *= B; i += 1 }
    val gram = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < n) {
      h = h * B + (bytes(i) & 0xFF)
      if (i >= k) h -= bk * (bytes(i - k) & 0xFF)
      if (i >= k - 1) gram(i - k + 1) = mix(h)
      i += 1
    }
    // sliding min over w grams; collect distinct mins
    val out = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j + w <= nGrams) {
      var m = gram(j)
      var t = j + 1
      while (t < j + w) { if (gram(t) < m) m = gram(t); t += 1 }
      out.add(m)
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  /** MinHash signature over k-gram rolling hashes with stride: nPerm
    * values derived from two base hashes (h1 XOR rotl(h2, i)).
    */
  def minhash(text: UTF8String, k: Int, stride: Int, nPerm: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val sig = new Array[Long](nPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    if (n < k) return new GenericArrayData(sig)
    val B = 1000003L
    var bk = 1L
    var i = 0
    while (i < k) { bk *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < n) {
      h = h * B + (bytes(i) & 0xFF)
      if (i >= k) h -= bk * (bytes(i - k) & 0xFF)
      val pos = i - k + 1
      if (pos >= 0 && pos % stride == 0) {
        val h1 = mix(h)
        val h2 = mix(h1 ^ 0x9e3779b97f4a7c15L)
        var p = 0
        while (p < nPerm) {
          val hp = if (p == 0) h1 ^ h2
            else h1 ^ ((h2 << p) | (h2 >>> (64 - p)))
          if (hp < sig(p)) sig(p) = hp
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over whitespace tokens: per-bit votes from each
    * token's hash, one pass, no tokenizer allocation beyond the scan.
    */
  def simhash64(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var i = 0
    var h = 0L
    var inTok = false
    def vote(th: Long): Unit = {
      var j = 0
      while (j < 64) {
        if (((th >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    while (i < n) {
      val b = bytes(i)
      if (b == ' ') {
        if (inTok) { vote(mix(h)); h = 0L; inTok = false }
      } else {
        h = h * 1000003L + (b & 0xFF)
        inTok = true
      }
      i += 1
    }
    if (inTok) vote(mix(h))
    var sim = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }
}


/** array<long> of winnowed fingerprints of a string column. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashKernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** array<long> MinHash signature of a string column. */
case class MinHashSignature(child: Expression, k: Int, stride: Int, nPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.minhash(input.asInstanceOf[UTF8String], k, stride, nPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashKernels.minhash($c, $k, $stride, $nPerm)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** 64-bit SimHash of a string column (whitespace tokens, bit votes). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object TextFunctions {
  def winnow_fingerprints(c: Column, k: Int = 20, w: Int = 5): Column =
    GraftInternal.column(WinnowFingerprints(GraftInternal.expr(c), k, w))
  def minhash_signature(c: Column, k: Int = 20, stride: Int = 4, nPerm: Int = 32): Column =
    GraftInternal.column(MinHashSignature(GraftInternal.expr(c), k, stride, nPerm))
  def simhash64(c: Column): Column =
    GraftInternal.column(SimHash64(GraftInternal.expr(c)))

  /** SQL registration of the text kernels (default parameters). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_signature",
      (es: Seq[Expression]) => MinHashSignature(es.head, 20, 4, 32), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      (es: Seq[Expression]) => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      (es: Seq[Expression]) => WinnowFingerprints(es.head, 20, 5), "scala_udf")
  }
}
