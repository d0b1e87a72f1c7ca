package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftops.GraftInternal

/** A Catalyst-native as-of join: for every left row, attach the single
  * right row with the greatest time <= left time within the same key group
  * (left-outer semantics). This is the operator ODIN's stores answer
  * imperatively — "state of entity X as of time T"
  * (odin_goesr/src/lib.rs:262 update_hotspots folds new sets onto the
  * latest store; odin_adsb/src/adsb.rs:89 merges updates by timestamp).
  *
  * Physical shape: both sides hash-clustered on the key and sorted by
  * (key, time[, tiebreak]); a single forward-merge pass per partition —
  * O(n+m), one shuffle each side, no per-row lookups. This is the plan a
  * 1000-executor cluster wants: the same partitioning/sort as a
  * sort-merge join, with a streaming merge instead of buffering.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak))
      .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val numRightCols = rOut.size
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(
        BindReferences.bindReferences(lKeyExprs, lOut))
      val rKeyProj = UnsafeProjection.create(
        BindReferences.bindReferences(rKeyExprs, rOut))
      val lTimeBound = BindReferences.bindReference(lTimeExpr, lOut)
      val rTimeBound = BindReferences.bindReference(rTimeExpr, rOut)
      // bind against nullable right attrs — the merge feeds an all-null
      // row for unmatched left rows, and a non-nullable binding would
      // skip the null bits in codegen
      val outProj = UnsafeProjection.create(outAttrs.map(_.asInstanceOf[Expression]),
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(numRightCols)
      val joined = new JoinedRow
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))

      val rBuf = rIter.buffered
      var matchRow: InternalRow = null
      var matchKey: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow).copy()
        val lTimeVal = lTimeBound.eval(lRow)
        if (lKey.anyNull || lTimeVal == null) {
          // SQL join semantics: a null key or null time never matches —
          // left-outer extend with nulls (null keys sort first, so no
          // right-side state is disturbed by skipping the advance)
          outProj(joined(lRow, nullRight))
        } else {
          val lT = lTimeVal.asInstanceOf[Long]
          // advance the right side up to (key, time <= lT), retaining the
          // last row seen for this key (sorted ties resolve to the last)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            if (rKey.anyNull) { rBuf.next() } // null key never matches: discard
            else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) { rBuf.next() } // different (smaller) key: discard
              else if (cmp == 0) {
                val rTimeVal = rTimeBound.eval(rRow)
                if (rTimeVal == null) { rBuf.next() } // null time: discard
                else {
                  val rT = rTimeVal.asInstanceOf[Long]
                  if (rT <= lT) {
                    matchRow = rRow.copy()
                    matchKey = rKey.copy()
                    rBuf.next()
                  } else advancing = false
                }
              } else advancing = false
            }
          }
          val rSide =
            if (matchRow != null && matchKey != null && keyOrd.compare(matchKey, lKey) == 0)
              matchRow
            else nullRight
          outProj(joined(lRow, rSide))
        }
      }
    }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object AsOf {
  /** Left as-of join: attach to each left row the latest right row with
    * `rightTime <= leftTime` in the same key group. Times must be LONG
    * (epoch seconds/nanos); ties on time resolve to the greatest
    * `tieBreak`.
    */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      tieBreak: Column): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // computed time/tiebreak expressions are projected onto the inputs
    // first so the custom node only carries resolved attributes (arbitrary
    // Column expressions inside a custom node bypass the analyzer)
    val l2 = leftDf.withColumn("__graft_lt", leftTime.cast("long"))
    val r2 = rightDf
      .withColumn("__graft_rt", rightTime.cast("long"))
      .withColumn("__graft_tb", tieBreak)
    GraftInternal.ofRows(spark, AsOfJoinNode(
      l2.queryExecution.analyzed, r2.queryExecution.analyzed,
      Seq(GraftInternal.expr(leftKey)), Seq(GraftInternal.expr(rightKey)),
      GraftInternal.expr(l2("__graft_lt")), GraftInternal.expr(r2("__graft_rt")),
      Seq(GraftInternal.expr(r2("__graft_tb")))))
      .drop("__graft_lt", "__graft_rt", "__graft_tb")
  }
}
