package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** A whole-operator Catalyst extension — tier (c) of the build plan's
  * preference order, with the as-of join as its canonical subject: the
  * logical node below, a planner strategy, and a sort-merge physical
  * operator that matches each left row to the LATEST right row of the
  * same key with rightTime ≤ leftTime in ONE forward pass per
  * co-partition.
  *
  * Scale design: `requiredChildDistribution` is
  * [[StatefulOpClusteredDistribution]] on the join keys — the exact
  * hash-co-partitioning contract streaming stateful joins use, which
  * EnsureRequirements satisfies by inserting hash exchanges and which
  * AQE may not coalesce asymmetrically (partition counts are pinned) —
  * and `requiredChildOrdering` is (keys, time), so Catalyst plans the
  * per-partition sorts. The merge itself is O(|L| + |R|) per partition
  * with O(1) state (one held payload row), versus the window
  * composition's union + carry-forward over the concatenated stream.
  * `zipPartitions` hard-fails on a partition-count mismatch, so a
  * broken co-partitioning is loud, never silent.
  *
  * Both time expressions must be LongType (the graft.plans.AsOf API
  * converts timestamps to epoch micros); a null left time matches
  * nothing and null right times are skipped. Several right rows with
  * EQUAL (key, time) tie on sort order — which of their payloads wins
  * is sort-stability-dependent; callers needing determinism there must
  * pre-reduce the right side to one row per (key, time).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    carried: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ carried.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, carried) =>
      AsOfJoinExec(lk, rk, lt, rt, carried, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ carried.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = {
    val n = SQLConf.get.numShufflePartitions
    StatefulOpClusteredDistribution(leftKeys, n) ::
      StatefulOpClusteredDistribution(rightKeys, n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val carriedExprs: Seq[Expression] = carried
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(
        BindReferences.bindReferences(leftKeys, lOut))
      val rKeyProj = UnsafeProjection.create(
        BindReferences.bindReferences(rightKeys, rOut))
      val lTimeBound = BindReferences.bindReference(leftTime, lOut)
      val rTimeBound = BindReferences.bindReference(rightTime, rOut)
      val payloadProj = UnsafeProjection.create(
        BindReferences.bindReferences(carriedExprs, rOut))
      val nullPayload = new GenericInternalRow(carried.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, lOut ++ carried)

      new Iterator[InternalRow] {
        // one-row lookahead into the right side (copied: sort iterators
        // reuse row objects) plus the held latest-version payload
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTimeVal: Any = _
        private var heldKey: UnsafeRow = _
        private var heldPayload: UnsafeRow = _
        advanceRight()

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIt.hasNext) {
            val r = rIt.next()
            val t = rTimeBound.eval(r)
            if (t != null) { // null right times never match anything
              rRow = r.copy()
              rKey = rKeyProj(rRow).copy()
              rTimeVal = t
            }
          }
        }

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lKey = lKeyProj(l)
          val lTimeVal = lTimeBound.eval(l)
          // consume right rows with key < leftKey (stale groups) or
          // key == leftKey and time ≤ leftTime (usable versions — the
          // LAST one wins, which the (key, time) sort guarantees)
          var scanning = lTimeVal != null
          while (scanning && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 &&
              rTimeVal.asInstanceOf[Long] <= lTimeVal.asInstanceOf[Long]) {
              heldKey = rKey
              heldPayload = payloadProj(rRow).copy()
              advanceRight()
            } else scanning = false
          }
          val matched = lTimeVal != null && heldKey != null &&
            keyOrd.compare(heldKey, lKey) == 0
          resultProj(joined(l, if (matched) heldPayload else nullPayload))
        }
      }
    }
  }
}
