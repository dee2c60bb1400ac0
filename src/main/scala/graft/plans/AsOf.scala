package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.{AsOfDirection, AsOfJoinPlan, AsOfJoinStrategy, Bridge}

/** DataFrame-facing API for the native as-of join (the tier-(c)
  * whole-operator extension in org.apache.spark.sql.graft.AsOfJoin):
  * for each left row, attach the `carried` columns of the right row
  * selected by `direction` — "backward" (default): the LATEST right
  * row with equal keys and rightTime ≤ leftTime; "forward": the
  * EARLIEST with rightTime ≥ leftTime; "nearest": whichever of those
  * two has the smaller |rightTime − leftTime| (ties break backward) —
  * nulls when no such row exists. `tolerance` (same units as the time
  * columns) drops candidates whose gap exceeds it;
  * `allowExactMatches = false` excludes rightTime == leftTime (strict
  * inequality, all three directions — the full `merge_asof` matrix;
  * strict nearest uses the two-slot merge, see the operator scaladoc).
  * This is the public
  * `merge_asof` surface (pandas / Spark's pandas-API). Both time
  * columns must be LongType (epoch micros — use unix_micros upstream).
  * NULL keys never match on either side (equi-join semantics); see the
  * operator scaladoc for tie behavior on equal (key, time).
  *
  * The planner strategy registers idempotently through
  * `spark.experimental.extraStrategies` (the public runtime hook); a
  * session built with `.config("spark.sql.extensions",
  * "graft.GraftExtensions")` gets it at startup instead.
  */
object AsOf {
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      carried: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    val dir = AsOfDirection.parse(direction)
    require(tolerance.forall(_ >= 0L), "as-of tolerance must be >= 0")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = Bridge.analyzed(left)
    // re-alias every right column: Alias mints fresh exprIds, so when
    // both sides derive from the same source relation (self as-of join),
    // DeduplicateRelations rewrites the right SUBTREE under these
    // aliases while the attribute references this node stores stay
    // valid — without this, the stored right-side references go stale
    // after re-analysis (ATTRIBUTE_NOT_FOUND at execution).
    import org.apache.spark.sql.functions.col
    val rPlan = Bridge.analyzed(
      right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*))
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             side: String)(name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$name' on the $side side " +
            s"(has ${plan.output.map(_.name).mkString(", ")})"))
    Bridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, "left")),
      keys.map(attr(rPlan, "right")),
      attr(lPlan, "left")(leftTime),
      attr(rPlan, "right")(rightTime),
      carried.map(attr(rPlan, "right")),
      dir, tolerance, allowExactMatches))
  }
}
