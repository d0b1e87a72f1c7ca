package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftops.GraftInternal

/** A Catalyst-native banded range join: inner-join left rows carrying a
  * [lo, hi] band against right rows whose value falls inside it, within
  * the same key group. This is the "sensor readings near an order's
  * price point" / "events inside an interval" query that ODIN answers by
  * scanning per-entity stores (odin_common/src/ranges.rs overlap algebra).
  *
  * Physical shape: both sides hash-clustered on the key, left sorted by
  * (key, lo), right sorted by (key, value); one forward sweep per
  * partition holding only the right rows whose value can still fall into
  * a future band (lo is non-decreasing, so eviction is safe) — O(n+m+out)
  * with a working set bounded by the band density, vs. the O(n·m)
  * nested-loop Spark plans for non-equi conditions after the equi key.
  * Same partitioning story as sort-merge join: one shuffle per side.
  */
case class RangeJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftLo: Expression,
    leftHi: Expression,
    rightVal: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

case class RangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftLo: Expression,
    leftHi: Expression,
    rightVal: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftLo)
      .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightVal)
      .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val loExpr = leftLo
    val hiExpr = leftHi
    val valExpr = rightVal
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(
        BindReferences.bindReferences(lKeyExprs, lOut))
      val rKeyProj = UnsafeProjection.create(
        BindReferences.bindReferences(rKeyExprs, rOut))
      val loBound = BindReferences.bindReference(loExpr, lOut)
      val hiBound = BindReferences.bindReference(hiExpr, lOut)
      val valBound = BindReferences.bindReference(valExpr, rOut)
      val outProj = UnsafeProjection.create(
        outAttrs.map(_.asInstanceOf[Expression]), lOut ++ rOut)
      val joined = new JoinedRow
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))

      val rBuf = rIter.buffered
      // right rows of the current key with value <= max(hi) seen so far;
      // lo is non-decreasing within a key, so rows below lo can be evicted
      val held = scala.collection.mutable.ArrayDeque.empty[InternalRow]
      var curKey: InternalRow = null

      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow).copy()
        val loV = loBound.eval(lRow)
        val hiV = hiBound.eval(lRow)
        // SQL inner-join semantics: null keys and null band edges never match
        if (lKey.anyNull || loV == null || hiV == null) Iterator.empty
        else {
          val lo = loV.asInstanceOf[Double]
          val hi = hiV.asInstanceOf[Double]
          if (curKey == null || keyOrd.compare(curKey, lKey) != 0) {
            held.clear()
            curKey = lKey
          }
          // pull right rows for this key up to the band's upper edge
          var pulling = true
          while (pulling && rBuf.hasNext) {
            val head = rBuf.head
            val rKey = rKeyProj(head)
            if (rKey.anyNull) { rBuf.next() } // null key never matches: discard
            else {
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) rBuf.next() // key already passed: discard
            else if (cmp == 0) {
              val v = valBound.eval(head)
              if (v != null && v.asInstanceOf[Double] <= hi) {
                held.append(head.copy()); rBuf.next()
              } else if (v == null) rBuf.next() // null value never matches
              else pulling = false
            } else pulling = false
            }
          }
          // evict rows that fell below every future band
          while (held.nonEmpty
            && valBound.eval(held.head).asInstanceOf[Double] < lo)
            held.removeHead()
          // held may retain rows pulled for a wider earlier band: re-check hi
          held.iterator.filter { r =>
            val v = valBound.eval(r).asInstanceOf[Double]
            v >= lo && v <= hi
          }.map(r => outProj(joined(lRow, r)))
        }
      }
    }
  }
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(l, r, lk, rk, lo, hi, v) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, lo, hi, v) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object RangeJoin {
  /** Inner banded range join: rows of `rightDf` whose DOUBLE `rightVal`
    * lies in `[lo, hi]` of a `leftDf` row, within equal key groups. `lo`
    * must be non-decreasing in the per-key sort for the sweep to be exact,
    * which holds for any `lo`/`hi` derived monotonically from one left
    * column (bands, intervals, tolerances).
    */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      lo: Column, hi: Column, rightVal: Column): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
    // computed band edges are projected onto the inputs first, so the node
    // only ever carries resolved attributes (arbitrary Column expressions
    // inside a custom node would bypass the analyzer)
    val l2 = leftDf
      .withColumn("__graft_lo", lo.cast("double"))
      .withColumn("__graft_hi", hi.cast("double"))
    val r2 = rightDf.withColumn("__graft_val", rightVal.cast("double"))
    GraftInternal.ofRows(spark, RangeJoinNode(
      l2.queryExecution.analyzed, r2.queryExecution.analyzed,
      Seq(GraftInternal.expr(leftKey)),
      Seq(GraftInternal.expr(rightKey)),
      GraftInternal.expr(l2("__graft_lo")),
      GraftInternal.expr(l2("__graft_hi")),
      GraftInternal.expr(r2("__graft_val"))))
      .drop("__graft_lo", "__graft_hi", "__graft_val")
  }
}
