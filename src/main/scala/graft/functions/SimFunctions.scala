package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftops.GraftInternal
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Shared scalar kernel for interpreted eval and generated code. */
object SimMath {

  /** Σ floor(x_i · y_i · 2^30) over two equal-length numeric arrays —
    * bit-identical to the `aggregate(zip_with(...FLOOR(x*y*2^30)...))`
    * tree it replaces (same double multiply order, same floor-then-
    * truncate). Precondition: non-null elements (embedding vectors);
    * unequal lengths take the common prefix (the HOF tree would yield
    * NULL there — no caller compares arrays of different length).
    */
  def qdot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Long = {
    val n = Math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += Math.floor(x * y * 1.073741824e9).toLong
      i += 1
    }
    acc
  }
}

/** Codegen-native quantized dot product: one fused loop inside
  * whole-stage codegen instead of an interpreted higher-order-function
  * tree. Spark's ArrayAggregate/ZipWith never participate in codegen
  * (they are lambda-interpreted even inside a WholeStageCodegen span), so
  * on pair-scoring paths — O(n·cell) evaluations in the similarity
  * module — the HOF tree costs ~µs per pair where this costs ~ns.
  * Null-intolerant binary over array&lt;float&gt; / array&lt;double&gt;.
  */
case class QDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot_long"

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"qdot_long: unsupported input type $t")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimMath.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SimMath.qdot(" +
        s"$a, $b, ${isFloatArr(left)}, ${isFloatArr(right)});")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QDotLong = copy(left = l, right = r)
}

object SimFunctions {
  /** Column-level quantized dot: Σ floor(x_i·y_i·2^30) as BIGINT. */
  def qdotLong(a: Column, b: Column): Column =
    GraftInternal.column(QDotLong(GraftInternal.expr(a), GraftInternal.expr(b)))
}
