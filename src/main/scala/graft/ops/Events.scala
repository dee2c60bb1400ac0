package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GenSnap

/** Event-time windowing over `events.parquet` — the streaming-shaped
  * surface the reference only advertises (README.md:2 promises "Spark &
  * Kafka streaming"; none exists — SURVEY.md §2.6). These are the
  * batch/oracle-checkable forms; `graft.streaming.Streams` runs the same
  * logic as Structured Streaming with watermarks + state.
  *
  * Timestamps: events.ts arrives at µs precision through [[eventsUs]],
  * which adapts to either parquet physical type the harness has shipped
  * (TIMESTAMP(NANOS) read as LongType nanos under
  * `spark.sql.legacy.parquet.nanosAsLong`, or TIMESTAMP(MICROS) read as
  * TIMESTAMP_NTZ) — both engines see identical µs values either way.
  *
  * Value sums: `value` is a double; naive SUM is addition-order-
  * dependent. We quantize with floor(value·1e6) → exact BIGINT sums
  * (order-free, partial-aggregation-safe at any scale) → one final
  * double division. floor() never ties, unlike round().
  *
  * Scale notes: tumbling/sliding windows aggregate by (bucket, type) —
  * partial aggregation map-side, one shuffle of group keys. Sessionize
  * shuffles once on user_id (the window partition key) and computes
  * gaps/sessions with a single sort within partitions; at 100 TB the
  * same plan holds as long as a single user's history fits an executor
  * (true for any realistic user), with AQE handling celebrity-user skew.
  */
object Events {

  import Tables._

  /** events with ts as µs-precision TimestampType, identical to the
    * DuckDB oracle's make_timestamp(epoch_ns(ts) // 1000).
    *
    * Schema-adaptive: the harness has shipped events.ts both as parquet
    * TIMESTAMP(NANOS) (Spark 4 refuses it by default; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it reads as LongType
    * nanos, truncated here to µs by integer division) and as
    * TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ; cast to TimestampType —
    * exact under the UTC session TZ every entrypoint sets). Dispatching
    * on the OBSERVED column type keeps both vintages working without
    * mutating session config from a table loader. The oracle side needs
    * no branch: DuckDB's epoch_ns(ts) // 1000 is exact for either
    * physical type. */
  def eventsUs(s: SparkSession, d: String): DataFrame = {
    // the NTZ→TimestampType cast below reinterprets wall-clock fields
    // under the SESSION time zone — loud guard instead of a silent
    // shift for a library caller whose session isn't UTC (all repo
    // entrypoints set UTC; see also temporalEdges, which was made
    // TZ-independent outright via datediff)
    require(s.conf.get("spark.sql.session.timeZone") == "UTC",
      "eventsUs requires spark.sql.session.timeZone=UTC (event-time " +
        "semantics are defined in UTC; a non-UTC session would shift " +
        "every window boundary)")
    val e = table(s, d, "events")
    e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        e.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        e.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  val sqlTs = "make_timestamp(epoch_ns(ts) // 1000)"

  /** Origin-alignment contract for every `time_bucket` oracle (r10
    * advice): DuckDB's time_bucket buckets from a 2000-01-03 00:00 UTC
    * origin while Spark's window() buckets from the 1970 epoch, so the
    * two agree exactly IFF the bucket width divides the 946,857,600 s
    * origin gap (10,959 days = 3·13·281 — so 15 min / 1 h / 6 h / 1 day
    * all divide it, but e.g. 7 days does NOT). Asserted at class load so
    * a new oracle width can't silently misalign buckets; any width
    * outside this list must either divide the gap or pass an explicit
    * `origin` to time_bucket. */
  private val OriginGapSec = 946857600L

  /** Power-analysis constants: standard normal quantiles z_{0.975}
    * (α=0.05 two-sided) and z_{0.80} (power 0.8), plus the 10%-lift
    * multiplier. The Scala doubles are the single source of truth; the
    * *_Sql forms are their %.17e renderings so DuckDB parses the SAME
    * IEEE double directly (playbook: never a plain decimal literal). */
  private val ZAlpha: Double = 1.9599639845400545
  private val ZBeta: Double = 0.8416212335729143
  private val ZAlphaSql: String = f"$ZAlpha%.17e"
  private val ZBetaSql: String = f"$ZBeta%.17e"
  private val Lit11: String = f"${1.1}%.17e"
  private val OracleBucketWidthsSec = Seq(15L * 60, 60L * 60, 6L * 3600)
  require(OracleBucketWidthsSec.forall(OriginGapSec % _ == 0),
    "a time_bucket oracle width does not divide the DuckDB origin gap — " +
      "buckets would misalign vs Spark window(); pass an explicit origin")

  /** Exact order-free sum of a double column: floor-quantize to micro
    * units, sum as BIGINT, divide once at the end. */
  def exactSum(c: Column): Column =
    (sum(floor(c * 1e6).cast("long")) / 1e6).as("tmp")
  def sqlExactSum(e: String): String =
    s"(CAST(sum(CAST(floor($e * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)"

  val queries: Seq[Q] = Seq(
    // ── tumbling 1-hour event-time window ──────────────────────────────
    Q(
      "evt_tumbling_window",
      (s, d) =>
        eventsUs(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), exactSum(col("value")).as("sum_value"))
          .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
            col("event_type"), col("cnt"), col("sum_value"))
          .orderBy("window_start", "event_type"),
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', $sqlTs) AS window_start,
              |  time_bucket(INTERVAL '1 hour', $sqlTs) + INTERVAL '1 hour' AS window_end,
              |  event_type, count(*) AS cnt, ${sqlExactSum("value")} AS sum_value
              |FROM events GROUP BY 1, 2, 3
              |ORDER BY window_start, event_type""".stripMargin)
    ),

    // ── sliding window: 1 hour every 15 minutes ────────────────────────
    // Spark assigns each event to 4 overlapping windows; the oracle
    // reproduces that with an explicit 0..3 offset cross join.
    Q(
      "evt_sliding_window",
      (s, d) =>
        eventsUs(s, d)
          .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
          .agg(count(lit(1)).as("cnt"),
            count_distinct(col("user_id")).as("users"))
          .select(col("w.start").as("window_start"), col("cnt"), col("users"))
          .orderBy("window_start"),
      Some(s"""SELECT time_bucket(INTERVAL '15 minutes', $sqlTs) - k * INTERVAL '15 minutes' AS window_start,
              |  count(*) AS cnt, count(DISTINCT user_id) AS users
              |FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
              |GROUP BY 1 ORDER BY window_start""".stripMargin)
    ),

    // ── OHLC resampling: 15-minute bars over purchase values ───────────
    // The time-series downsampling primitive (pandas `resample().ohlc()`,
    // kdb xbar): open/close are the values of the earliest/latest event
    // in the bar, selected by a min/max over (ts, event_id, value)
    // structs — lexicographic, and (ts, event_id) is unique, so `value`
    // never drives the comparison and the pick is total-ordered on both
    // engines. high/low are plain min/max (no summation anywhere, so no
    // float-fold ceremony needed). One partial-agg'd shuffle on the bar
    // key; at 100 TB bars are the natural write-partition key.
    Q(
      "evt_ohlc_resample",
      (s, d) =>
        eventsUs(s, d).filter(col("event_type") === "purchase")
          .groupBy(window(col("ts"), "15 minutes").as("w"))
          .agg(
            min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
            max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            count(lit(1)).as("n"))
          .select(col("w.start").as("bar_start"),
            col("o.value").as("open"), col("high"), col("low"),
            col("c.value").as("close"), col("n"))
          .orderBy("bar_start"),
      Some(s"""WITH p AS (
              |  SELECT $sqlTs AS tsu, event_id, value FROM events
              |  WHERE event_type = 'purchase'),
              |r AS (
              |  SELECT time_bucket(INTERVAL '15 minutes', tsu) AS bar_start, value,
              |    row_number() OVER (PARTITION BY time_bucket(INTERVAL '15 minutes', tsu)
              |      ORDER BY tsu ASC, event_id ASC) AS rko,
              |    row_number() OVER (PARTITION BY time_bucket(INTERVAL '15 minutes', tsu)
              |      ORDER BY tsu DESC, event_id DESC) AS rkc
              |  FROM p)
              |SELECT bar_start,
              |  max(CASE WHEN rko = 1 THEN value END) AS open,
              |  max(value) AS high, min(value) AS low,
              |  max(CASE WHEN rkc = 1 THEN value END) AS close,
              |  count(*) AS n
              |FROM r GROUP BY bar_start ORDER BY bar_start""".stripMargin)
    ),

    // ── gap-based sessionization (30-minute inactivity) ────────────────
    // lag → new-session flag → running sum = session index → session agg.
    Q(
      "evt_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        eventsUs(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(byUser))
          .withColumn("new_session",
            when(col("gap").isNull || col("gap") > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(run))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("us")).as("start_us"),
            ((max(col("us")) - min(col("us"))) / lit(1000000L).cast("double")).as("duration_s"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, epoch_us($sqlTs) AS us FROM events),
              |flagged AS (
              |  SELECT user_id, us, event_id,
              |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
              |           OR lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
              |         THEN 1 ELSE 0 END AS new_session
              |  FROM e),
              |sessions AS (
              |  SELECT user_id, us,
              |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              |  FROM flagged)
              |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              |  count(*) AS n_events, min(us) AS start_us,
              |  CAST(max(us) - min(us) AS DOUBLE) / 1000000 AS duration_s
              |FROM sessions GROUP BY user_id, session_id
              |ORDER BY user_id, session_id""".stripMargin)
    ),

    // ── native session windows (session_window + merge semantics) ─────
    // Spark's built-in gap-session operator; the oracle reproduces the
    // merge semantics with the lag/cumsum formulation (same sessions as
    // evt_sessionize): start = first event, end = last event + gap.
    Q(
      "evt_session_window_native",
      (s, d) =>
        eventsUs(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("w.start")).as("start_us"),
            unix_micros(col("w.end")).as("end_us"),
            col("n_events"))
          .orderBy("user_id", "start_us"),
      Some(s"""WITH e AS (SELECT event_id, user_id, epoch_us($sqlTs) AS us FROM events),
              |flagged AS (
              |  SELECT user_id, us, event_id,
              |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
              |           OR lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
              |         THEN 1 ELSE 0 END AS new_session
              |  FROM e),
              |sessions AS (
              |  SELECT user_id, us,
              |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              |  FROM flagged)
              |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
              |  count(*) AS n_events
              |FROM sessions GROUP BY user_id, sid
              |ORDER BY user_id, start_us""".stripMargin)
    ),

    // ── pivot: per-user event-type counts ──────────────────────────────
    Q(
      "evt_pivot_type_counts",
      (s, d) =>
        eventsUs(s, d)
          .filter(col("user_id") < 20)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("user_id"),
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
             |FROM events WHERE user_id < 20
             |GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // ── unpivot (melt): wide per-type counts back to long form ─────────
    // The inverse of the pivot above — and NOT a groupBy: unpivot keeps
    // the zero cells the pivot filled in, which a re-aggregation would
    // silently drop. Narrow per-row expansion (5 rows out per row in),
    // no shuffle beyond the pivot's own.
    Q(
      "evt_unpivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        eventsUs(s, d)
          .filter(col("user_id") < 20)
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .na.fill(0L)
          .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "cnt")
          .orderBy("user_id", "event_type")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
             |t AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type),
             |c AS (SELECT user_id, event_type, count(*) AS cnt
             |      FROM events WHERE user_id < 20 GROUP BY 1, 2)
             |SELECT u.user_id, t.event_type, coalesce(c.cnt, 0) AS cnt
             |FROM u CROSS JOIN t
             |LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
             |ORDER BY u.user_id, t.event_type""".stripMargin)
    ),

    // ── top-k revenue users (purchases only) ───────────────────────────
    Q(
      "evt_top_purchasers",
      (s, d) =>
        eventsUs(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("purchases"), exactSum(col("value")).as("revenue"))
          .orderBy(col("revenue").desc, col("user_id").asc)
          .limit(10),
      Some(s"""SELECT user_id, count(*) AS purchases, ${sqlExactSum("value")} AS revenue
              |FROM events WHERE event_type = 'purchase'
              |GROUP BY user_id
              |ORDER BY revenue DESC, user_id ASC LIMIT 10""".stripMargin)
    ),

    // ── interval range join: clicks attributed to a purchase window ────
    // Count, per purchase, the same user's clicks in the 10 minutes
    // before it. The naive plan is a non-equi theta join — a
    // BroadcastNestedLoopJoin that re-evaluates every pair (the measured
    // 610 s landmine, see dedup_embedding_cosine). The scale-safe form:
    // quantize time into window-sized buckets, explode each purchase's
    // interval to the ≤2 buckets it covers, equi-join on
    // (user_id, bucket), then apply the exact bounds as a residual
    // filter. Each (purchase, click) pair meets in exactly one bucket
    // (the click's), so no dedup is needed. Shuffles only on the join
    // key — the same plan at any SF. The oracle runs the literal
    // non-equi join, proving the rewrite exact.
    Q(
      "evt_range_join",
      (s, d) => {
        val W = 600000000L // 10 min in µs = bucket width = window length
        val e = eventsUs(s, d).withColumn("us", unix_micros(col("ts")))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id"), col("us").as("ps"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("us").as("cs"))
        val pb = p.withColumn("bucket",
          explode(sequence(expr(s"(ps - ${W}L) div ${W}L"), expr(s"(ps - 1L) div ${W}L"))))
        val cb = c.withColumn("bucket", expr(s"cs div ${W}L"))
        val matches = pb
          .join(cb, pb("user_id") === cb("cu") && pb("bucket") === cb("bucket"))
          .filter(col("cs") >= col("ps") - lit(W) && col("cs") < col("ps"))
          .groupBy("pid").agg(count(lit(1)).as("n"))
        p.join(matches, Seq("pid"), "left")
          .select(col("pid"), coalesce(col("n"), lit(0L)).as("n_clicks"))
          .orderBy("pid")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_us($sqlTs) AS us FROM events),
              |p AS (SELECT event_id AS pid, user_id, us AS ps FROM e WHERE event_type = 'purchase'),
              |c AS (SELECT user_id, us AS cs FROM e WHERE event_type = 'click')
              |SELECT p.pid, count(c.cs) AS n_clicks
              |FROM p LEFT JOIN c
              |  ON c.user_id = p.user_id AND c.cs >= p.ps - 600000000 AND c.cs < p.ps
              |GROUP BY p.pid ORDER BY p.pid""".stripMargin)
    ),

    // ── weekly cohort retention ────────────────────────────────────────
    // The product-analytics staple: users grouped by first-seen week
    // (their cohort), then distinct-active counts per (cohort, week).
    // Two shuffles — first-seen agg on user_id, then the (cohort, week)
    // distinct-count (partial aggregation both times). Both engines
    // truncate weeks to Monday, and counts are integers, so the matrix
    // matches exactly.
    Q(
      "evt_retention",
      (s, d) => {
        val e = eventsUs(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        val firstSeen = e.groupBy("user_id").agg(min("week").as("cohort"))
        e.join(firstSeen, "user_id")
          .groupBy("cohort", "week")
          .agg(count_distinct(col("user_id")).as("active"))
          .orderBy("cohort", "week")
      },
      Some(s"""WITH e AS (
              |  SELECT user_id, date_trunc('week', $sqlTs) AS week FROM events),
              |fs AS (SELECT user_id, min(week) AS cohort FROM e GROUP BY user_id)
              |SELECT fs.cohort, e.week, count(DISTINCT e.user_id) AS active
              |FROM e JOIN fs ON e.user_id = fs.user_id
              |GROUP BY 1, 2 ORDER BY fs.cohort, e.week""".stripMargin)
    ),

    // ── time-series gap fill: dense daily counts for one user ──────────
    // Downstream time-series consumers need DENSE series; aggregation
    // alone silently drops empty buckets. Generate the full day grid
    // with sequence()/generate_series between the observed bounds and
    // left-join the sparse counts back, zero-filling holes. The grid is
    // driver-free (sequence over an aggregated 1-row bound), the join
    // keys on the bucket — at scale the grid side is tiny and
    // broadcasts.
    Q(
      "evt_gap_fill",
      (s, d) => {
        val e = eventsUs(s, d).filter(col("user_id") === 1)
          .withColumn("day", date_trunc("DAY", col("ts")))
        val days = e.agg(min("day").as("d0"), max("day").as("d1"))
          .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
        days.join(e.groupBy("day").agg(count(lit(1)).as("cnt")), Seq("day"), "left")
          .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
          .orderBy("day")
      },
      Some(s"""WITH e AS (
              |  SELECT date_trunc('day', $sqlTs) AS day FROM events WHERE user_id = 1),
              |grid AS (
              |  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day FROM e),
              |cnts AS (SELECT day, count(*) AS cnt FROM e GROUP BY day)
              |SELECT g.day, coalesce(c.cnt, 0) AS cnt
              |FROM grid g LEFT JOIN cnts c ON g.day = c.day
              |ORDER BY g.day""".stripMargin)
    ),

    // ── time-bounded funnel: view → click → purchase per user ──────────
    // Sequential-pattern analytics (the MATCH_RECOGNIZE shape): a view
    // opens (or re-opens) the funnel, a click within 4 h of that view
    // advances it, a purchase within 4 h of that click completes it —
    // the step-within-window-of-previous-step semantics, with restart
    // on a fresher view while un-clicked. One shuffle on user_id, then
    // a per-user sorted fold: each event becomes one BIGINT
    // `code·10¹⁸ + µs` and the state is one BIGINT
    // `stage·10¹⁸ + anchor_µs` — a single linear state-machine fold in
    // pure integer arithmetic, so both engines fold the identical list
    // to the identical result. Scales like sessionize: a user's
    // history fits a task; the fold is O(events-per-user).
    Q(
      "evt_funnel",
      (s, d) => {
        val E = 1000000000000000000L // stage/code radix (3e18 < 2^63)
        val W = 14400000000L // 4 h step window in µs
        val stepCode = (t: Column) =>
          when(t === "view", 1L).when(t === "click", 2L).when(t === "purchase", 3L).otherwise(0L)
        eventsUs(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("us"), col("event_id"),
            stepCode(col("event_type")).as("code")))).as("seq"))
          .select(col("user_id"),
            transform(col("seq"),
              e => e.getField("code") * lit(E) + e.getField("us")).as("codes"))
          .select(col("user_id"), expr(
            s"""aggregate(codes, 0L, (st, c) -> CASE
               |  WHEN (st div ${E}L = 0 OR st div ${E}L = 1) AND c div ${E}L = 1
               |    THEN ${E}L + c % ${E}L
               |  WHEN st div ${E}L = 1 AND c div ${E}L = 2 AND c % ${E}L - st % ${E}L <= ${W}L
               |    THEN ${2 * E}L + c % ${E}L
               |  WHEN st div ${E}L = 2 AND c div ${E}L = 3 AND c % ${E}L - st % ${E}L <= ${W}L
               |    THEN ${3 * E}L + st % ${E}L
               |  ELSE st END)""".stripMargin).as("acc"))
          .select(col("user_id"), expr(s"acc div ${E}L").as("funnel_stage"))
          .groupBy("funnel_stage").agg(count(lit(1)).as("users"))
          .orderBy("funnel_stage")
      },
      Some {
        // The natural DuckDB form (list(... ORDER BY) + list_reduce)
        // returned RUN-VARYING results on DuckDB 1.0.0 — the ordered
        // list aggregate is stable in isolation, but list_reduce over
        // those lists inside the full projection is not. The oracle
        // therefore replays the fold as a recursive-CTE state machine
        // (one step per (user, event index)) — lambda-free and
        // deterministic, same integer transition function.
        val E = "1000000000000000000"
        val W = "14400000000"
        s"""WITH RECURSIVE e AS (
           |  SELECT user_id, epoch_us($sqlTs) AS us, event_id,
           |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
           |         WHEN 'purchase' THEN 3 ELSE 0 END AS code
           |  FROM events),
           |ord AS (
           |  SELECT user_id, us, code,
           |         row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS i
           |  FROM e),
           |n AS (SELECT user_id, max(i) AS n FROM ord GROUP BY user_id),
           |fold(user_id, i, st) AS (
           |  SELECT user_id, 0, CAST(0 AS BIGINT) FROM n
           |  UNION ALL
           |  SELECT f.user_id, f.i + 1,
           |    CASE
           |      WHEN (f.st // $E = 0 OR f.st // $E = 1) AND o.code = 1
           |        THEN $E + o.us
           |      WHEN f.st // $E = 1 AND o.code = 2 AND o.us - f.st % $E <= $W
           |        THEN 2 * $E + o.us
           |      WHEN f.st // $E = 2 AND o.code = 3 AND o.us - f.st % $E <= $W
           |        THEN 3 * $E + f.st % $E
           |      ELSE f.st END
           |  FROM fold f JOIN ord o ON o.user_id = f.user_id AND o.i = f.i + 1),
           |stages AS (
           |  SELECT f.user_id, f.st // $E AS funnel_stage
           |  FROM fold f JOIN n ON n.user_id = f.user_id AND f.i = n.n)
           |SELECT funnel_stage, count(*) AS users
           |FROM stages GROUP BY funnel_stage ORDER BY funnel_stage""".stripMargin
      }
    ),

    // ── per-user exponential moving average (sequential fold) ──────────
    // EMA is inherently order-dependent — exactly the class of operator
    // naive SQL gets wrong. The deterministic distributed shape: one
    // shuffle by user, then flatMapSortedGroups — Spark's SECONDARY SORT
    // (a spillable per-partition external sort on (user, ts, event_id),
    // no aggregation buffer) hands each user's purchases as a
    // time-ordered ITERATOR, and the zero-seeded fold
    // e_i = e_{i-1}·0.5 + x_i·0.5 streams over it with O(1) state per
    // user — a power user's history never materializes in memory, unlike
    // a collect_list buffer. α = 0.5 is exactly representable, the fold
    // is the same left-to-right double recurrence on both engines (the
    // oracle prepends the 0.0 seed so list_reduce replays it
    // step-for-step) → bit-identical. (A (scale, offset) affine-pair
    // partial agg would also bound state — the maps compose — but a
    // tree-shaped buffer merge rounds its additions in a different
    // order than the sequential fold, so it is NOT guaranteed
    // bit-stable; the sorted-iterator fold is.)
    Q(
      "evt_ema",
      (s, d) => {
        import s.implicits._
        eventsUs(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("value"))
          .as[(Long, Long, Long, Double)]
          .groupByKey(_._1)
          .flatMapSortedGroups(col("us"), col("event_id")) { (uid, it) =>
            var e = 0.0
            var n = 0
            it.foreach { r => e = e * 0.5 + r._4 * 0.5; n += 1 }
            Iterator((uid, n, e))
          }
          .toDF("user_id", "n_events", "ema")
          .orderBy("user_id")
      },
      Some {
        s"""WITH p AS (
           |  SELECT user_id, $sqlTs AS ts, event_id, value
           |  FROM events WHERE event_type = 'purchase'),
           |g AS (
           |  SELECT user_id, list_sort(list(struct_pack(
           |           ts := ts, event_id := event_id, value := value))) AS seq
           |  FROM p GROUP BY user_id)
           |SELECT user_id, CAST(len(seq) AS INT) AS n_events,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |    list_transform(seq, e -> e.value)),
           |    (acc, x) -> acc * 0.5 + x * 0.5) AS ema
           |FROM g ORDER BY user_id""".stripMargin
      }
    ),

    // ── rolling z-score anomaly detection ──────────────────────────────
    // Each purchase is scored against the user's previous ≤20 purchases:
    // |x − μ| > 3σ flags it. The mean/variance come from EXACT integer
    // window sums (value quantized to 1e-4 units: q ≤ ~5·10⁶, q² ≤
    // ~2.4·10¹³, ×20 ≈ 5·10¹⁴ — ample BIGINT headroom; never float
    // stddev, whose merge order isn't reproducible), then one fixed
    // double expression per row → bit-identical. One shuffle by user;
    // the frame is ROWS-bounded so state is O(1) per row at any scale.
    Q(
      "evt_rolling_zscore",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-20, -1)
        eventsUs(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1e4).cast("long").as("q"))
          .select(col("user_id"), col("event_id"), col("q"),
            count(col("q")).over(w).as("n"),
            sum(col("q")).over(w).as("s1"),
            sum(col("q") * col("q")).over(w).as("s2"))
          .filter(col("n") >= 10)
          .withColumn("mean", col("s1").cast("double") / col("n"))
          .withColumn("varr",
            col("s2").cast("double") / col("n") - col("mean") * col("mean"))
          .filter(col("varr") > 0.0)
          .withColumn("z",
            (col("q").cast("double") - col("mean")) / sqrt(col("varr")))
          .filter(abs(col("z")) > 3.0)
          .select(col("user_id"), col("event_id"), col("z"))
          .orderBy("user_id", "event_id")
      },
      Some {
        s"""WITH p AS (
           |  SELECT user_id, $sqlTs AS ts, event_id,
           |         CAST(floor(value * 10000) AS BIGINT) AS q
           |  FROM events WHERE event_type = 'purchase'),
           |wf AS (
           |  SELECT user_id, event_id, q,
           |         count(q) OVER w AS n,
           |         CAST(sum(q) OVER w AS BIGINT) AS s1,
           |         CAST(sum(q * q) OVER w AS BIGINT) AS s2
           |  FROM p
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
           |m AS (
           |  SELECT user_id, event_id, q, n,
           |         CAST(s1 AS DOUBLE) / n AS mean,
           |         CAST(s2 AS DOUBLE) / n -
           |           (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS varr
           |  FROM wf WHERE n >= 10),
           |z AS (
           |  SELECT user_id, event_id,
           |         (CAST(q AS DOUBLE) - mean) / sqrt(varr) AS z
           |  FROM m WHERE varr > 0.0)
           |SELECT user_id, event_id, z FROM z
           |WHERE abs(z) > 3.0 ORDER BY user_id, event_id""".stripMargin
      }
    ),

    // ── session transition matrix (first-order Markov over events) ─────
    // P(next event type | current) per user journey: one lag window per
    // user ordered by (ts, event_id) — the same single-shuffle
    // sessionize shape — then a (prev, cur) group count and one exact
    // division by the per-prev row total. The behavioral-model
    // fingerprint (and the input to Markov-chain attribution); counts
    // exact BIGINTs, probability a single IEEE division.
    Q(
      "evt_transition_matrix",
      (s, d) => {
        val ev = eventsUs(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        val trans = ev.withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("cur"))
          .agg(count(lit(1)).as("cnt"))
        val tot = trans.groupBy("prev").agg(sum("cnt").as("tot"))
        trans.join(tot, "prev")
          .select(col("prev"), col("cur"), col("cnt"),
            (col("cnt").cast("double") / col("tot").cast("double")).as("prob"))
          .orderBy("prev", "cur")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, event_type, $sqlTs AS ts, event_id FROM events),
              |lagged AS (
              |  SELECT user_id, event_type AS cur,
              |    lag(event_type) OVER (PARTITION BY user_id
              |      ORDER BY ts ASC, event_id ASC) AS prev
              |  FROM ev),
              |trans AS (
              |  SELECT prev, cur, CAST(count(*) AS BIGINT) AS cnt
              |  FROM lagged WHERE prev IS NOT NULL GROUP BY prev, cur),
              |tot AS (SELECT prev, CAST(sum(cnt) AS BIGINT) AS tot FROM trans GROUP BY prev)
              |SELECT t.prev, t.cur, t.cnt,
              |  CAST(t.cnt AS DOUBLE) / CAST(tt.tot AS DOUBLE) AS prob
              |FROM trans t JOIN tot tt USING (prev)
              |ORDER BY prev, cur""".stripMargin)
    ),

    // ── robust outliers: median/MAD, distributed rank selection ────────
    // The robust companion to evt_rolling_zscore: flag events whose
    // value sits more than 3 MADs from the per-type median — immune to
    // the outliers themselves (mean/σ are not), which is why curation
    // pipelines prefer it. Both the median and the MAD are TYPE-1
    // (actual data values, no interpolation) selected by rank joins —
    // rank rows, join rank (n+1) DIV 2 — so there is no collect_list
    // and the per-group heavy rows stay distributed; |v−med| and 3·mad
    // are single exact IEEE ops, so the flagged set hash-matches.
    Q(
      "evt_mad_outliers",
      (s, d) => {
        val ev = eventsUs(s, d)
          .select(col("event_id"), col("event_type").as("et"), col("value"))
        def rankSel(df: DataFrame, valueCol: String, out: String): DataFrame = {
          val ranked = df.withColumn("rn", row_number().over(
            Window.partitionBy("et").orderBy(col(valueCol).asc)))
          val n = df.groupBy("et").agg(count(lit(1)).as("n"))
          ranked.join(n, "et")
            .filter(col("rn") === expr("(n + 1) DIV 2"))
            .select(col("et"), col(valueCol).as(out))
        }
        val med = rankSel(ev, "value", "med")
        val dev = ev.join(broadcast(med), "et")
          .select(col("event_id"), col("et"), col("value"), col("med"),
            abs(col("value") - col("med")).as("dev"))
        val mad = rankSel(dev, "dev", "mad")
        dev.join(broadcast(mad), "et")
          .filter(col("dev") > lit(3.0) * col("mad"))
          .select(col("event_id"), col("et").as("event_type"), col("value"),
            col("med"), col("mad"))
          .orderBy("event_type", "event_id")
      },
      Some(s"""WITH ev AS (SELECT event_id, event_type AS et, value FROM events),
              |r1 AS (SELECT et, value,
              |         row_number() OVER (PARTITION BY et ORDER BY value ASC) AS rn
              |       FROM ev),
              |n AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY et),
              |med AS (SELECT r1.et, r1.value AS med FROM r1 JOIN n USING (et)
              |        WHERE r1.rn = (n.n + 1) // 2),
              |dev AS (SELECT ev.event_id, ev.et, ev.value, med.med,
              |          abs(ev.value - med.med) AS dev
              |        FROM ev JOIN med USING (et)),
              |r2 AS (SELECT et, dev,
              |         row_number() OVER (PARTITION BY et ORDER BY dev ASC) AS rn
              |       FROM dev),
              |madt AS (SELECT r2.et, r2.dev AS mad FROM r2 JOIN n USING (et)
              |         WHERE r2.rn = (n.n + 1) // 2)
              |SELECT d.event_id, d.et AS event_type, d.value, d.med, madt.mad
              |FROM dev d JOIN madt USING (et)
              |WHERE d.dev > 3.0 * madt.mad
              |ORDER BY event_type, event_id""".stripMargin)
    ),

    // ── sequential pattern matching (MATCH_RECOGNIZE / CEP) ────────────
    // Detect per-user occurrences of the strict consecutive sequence
    // view → click → purchase in event-time order — the complex-event-
    // processing primitive (Flink CEP / SQL MATCH_RECOGNIZE / funnels
    // with adjacency). Spark has no MATCH_RECOGNIZE; for a FIXED-length
    // pattern the lead() chain over the per-user ordered stream IS the
    // NFA: one shuffle on user_id, one sort within partitions, narrow
    // filters after. (ts, event_id) is a unique order key, so the match
    // set is total-ordered and identical on both engines. SCALE: same
    // shape as evt_sessionize — per-user history on one executor,
    // AQE-handled skew; pattern length extends the lead() chain, never
    // the shuffle count. Variable-length (Kleene) patterns go to
    // flatMapGroupsWithState (graft.streaming) instead.
    Q(
      "evt_pattern_match",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        eventsUs(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("t1", lead(col("event_type"), 1).over(w))
          .withColumn("t2", lead(col("event_type"), 2).over(w))
          .withColumn("end_event_id", lead(col("event_id"), 2).over(w))
          .withColumn("end_ts", lead(col("ts"), 2).over(w))
          .filter(col("event_type") === "view" && col("t1") === "click" &&
            col("t2") === "purchase")
          .select(col("user_id"), col("event_id").as("start_event_id"),
            col("end_event_id"),
            (unix_micros(col("end_ts")) - unix_micros(col("ts"))).as("span_us"))
          .orderBy("user_id", "start_event_id")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, $sqlTs AS ts, event_id, event_type FROM events),
              |led AS (
              |  SELECT user_id, ts, event_id, event_type,
              |    lead(event_type, 1) OVER w AS t1,
              |    lead(event_type, 2) OVER w AS t2,
              |    lead(event_id, 2) OVER w AS end_event_id,
              |    lead(ts, 2) OVER w AS end_ts
              |  FROM ev
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
              |SELECT user_id, event_id AS start_event_id, end_event_id,
              |  epoch_us(end_ts) - epoch_us(ts) AS span_us
              |FROM led
              |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
              |ORDER BY user_id, start_event_id""".stripMargin)
    ),

    // ── marketing attribution: first-touch vs last-touch revenue ───────
    // For every purchase, credit its value to a "channel": the FIRST
    // non-purchase event the user ever produced before it (first-touch)
    // and the LAST one before it (last-touch); purchases with no prior
    // touch credit "(direct)". The window frame
    // [unbounded preceding, 1 preceding] with IGNORE-NULLS first/last is
    // the exact as-of semantics both engines share; (ts, event_id) is a
    // unique order key so the credited channel is total-ordered
    // deterministic. Each purchase then fans out to its two credit rows
    // (first/last) and one conditional aggregation produces both reports
    // in a single pass — revenue through the floor-quantized exactSum,
    // so the per-channel totals are order-free BIGINT sums. SCALE: one
    // shuffle on user_id for the window, one partial-agg shuffle on the
    // ~5-row channel key; per-user history on one executor is the same
    // contract as sessionize/funnel, with AQE absorbing celebrity skew.
    Q(
      "evt_attribution",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val touch = when(col("event_type") =!= "purchase", col("event_type"))
        eventsUs(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"))
          .withColumn("ft", first(touch, ignoreNulls = true).over(w))
          .withColumn("lt", last(touch, ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("value"),
            explode(array(
              struct(lit("first").as("kind"),
                coalesce(col("ft"), lit("(direct)")).as("channel")),
              struct(lit("last").as("kind"),
                coalesce(col("lt"), lit("(direct)")).as("channel")))).as("c"))
          .groupBy(col("c.channel").as("channel"))
          .agg(
            sum(when(col("c.kind") === "first", 1L).otherwise(0L)).as("ft_purchases"),
            exactSum(when(col("c.kind") === "first", col("value"))).as("ft_revenue"),
            sum(when(col("c.kind") === "last", 1L).otherwise(0L)).as("lt_purchases"),
            exactSum(when(col("c.kind") === "last", col("value"))).as("lt_revenue"))
          .orderBy("channel")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, $sqlTs AS ts, event_id, event_type, value FROM events),
              |touched AS (
              |  SELECT event_type, value,
              |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
              |      OVER w AS ft,
              |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
              |      OVER w AS lt
              |  FROM ev
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
              |credits AS (
              |  SELECT 'first' AS kind, coalesce(ft, '(direct)') AS channel, value
              |  FROM touched WHERE event_type = 'purchase'
              |  UNION ALL
              |  SELECT 'last' AS kind, coalesce(lt, '(direct)') AS channel, value
              |  FROM touched WHERE event_type = 'purchase')
              |SELECT channel,
              |  CAST(sum(CASE WHEN kind = 'first' THEN 1 ELSE 0 END) AS BIGINT) AS ft_purchases,
              |  ${sqlExactSum("CASE WHEN kind = 'first' THEN value END")} AS ft_revenue,
              |  CAST(sum(CASE WHEN kind = 'last' THEN 1 ELSE 0 END) AS BIGINT) AS lt_purchases,
              |  ${sqlExactSum("CASE WHEN kind = 'last' THEN value END")} AS lt_revenue
              |FROM credits GROUP BY channel ORDER BY channel""".stripMargin)
    ),

    // ── windowed heavy hitters: top-3 event types per 6-hour window ────
    // The "trending now" shape: tumbling event-time windows, per-window
    // ranking by total value. Ranking happens on the exact micro-unit
    // BIGINT sum (order-free under any shuffle; event_type breaks
    // ties), so the rank — and therefore the emitted row set — is
    // deterministic on both engines; the double emit divides once at
    // the end. Two shuffles total: the (window, type) partial agg and
    // the per-window rank over a HANDFUL of type rows per window —
    // the per-key state never grows with row count, so the plan is
    // unchanged at 100 TB (the streaming analogue is
    // Streams.sessionize's windowed agg + an approx_top_k accumulator
    // when the type domain explodes).
    Q(
      "evt_window_topk",
      (s, d) => {
        val agg = eventsUs(s, d)
          .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(floor(col("value") * 1e6).cast("long")).as("sum_u"))
        val rw = Window.partitionBy("w")
          .orderBy(col("sum_u").desc, col("event_type").asc)
        agg.withColumn("rk", row_number().over(rw))
          .filter(col("rk") <= 3)
          .select(col("w.start").as("window_start"), col("rk"),
            col("event_type"), col("cnt"),
            (col("sum_u") / 1e6).as("sum_value"))
          .orderBy("window_start", "rk")
      },
      Some(s"""WITH agg AS (
              |  SELECT time_bucket(INTERVAL '6 hours', $sqlTs) AS window_start,
              |    event_type, count(*) AS cnt,
              |    sum(CAST(floor(value * 1000000) AS BIGINT)) AS sum_u
              |  FROM events GROUP BY 1, 2),
              |rk AS (
              |  SELECT window_start, event_type, cnt, sum_u,
              |    row_number() OVER (PARTITION BY window_start
              |                       ORDER BY sum_u DESC, event_type ASC) AS rk
              |  FROM agg)
              |SELECT window_start, CAST(rk AS INT) AS rk, event_type,
              |  CAST(cnt AS BIGINT) AS cnt,
              |  CAST(sum_u AS DOUBLE) / 1000000 AS sum_value
              |FROM rk WHERE rk <= 3
              |ORDER BY window_start, rk""".stripMargin)
    ),

    // ── frequent 3-step behavior sequences (sequential pattern mining) ─
    // The k=3 slice of PrefixSpan-style mining: which consecutive
    // type-triples dominate user journeys. evt_transition_matrix is the
    // k=2 Markov view; triples expose order the 1-step matrix cannot
    // (view→click→purchase vs click→view→purchase). Two LEADs over the
    // same (user, ts, event_id) window — ONE shuffle for both — then a
    // count and top-20; support is exact BIGINT, the journey share
    // divides once by the exact triple total. At 100 TB the window is
    // per-user-partitioned (no global sort), the count map-side
    // combines, and top-20 is a TakeOrdered — the same plan at any
    // corpus size.
    Q(
      "evt_seq_patterns",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        val tri = eventsUs(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .groupBy(col("event_type").as("s1"), col("t2").as("s2"), col("t3").as("s3"))
          .agg(count(lit(1)).as("support"))
        tri.crossJoin(broadcast(tri.agg(sum("support").as("tot"))))
          .select(col("s1"), col("s2"), col("s3"), col("support"),
            (col("support").cast("double") / col("tot").cast("double")).as("share"))
          .orderBy(col("support").desc, col("s1").asc, col("s2").asc, col("s3").asc)
          .limit(20)
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, event_type, $sqlTs AS ts, event_id FROM events),
              |led AS (
              |  SELECT event_type AS s1,
              |    lead(event_type, 1) OVER (PARTITION BY user_id
              |      ORDER BY ts ASC, event_id ASC) AS s2,
              |    lead(event_type, 2) OVER (PARTITION BY user_id
              |      ORDER BY ts ASC, event_id ASC) AS s3
              |  FROM ev),
              |tri AS (
              |  SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS support
              |  FROM led WHERE s3 IS NOT NULL GROUP BY 1, 2, 3),
              |tot AS (SELECT CAST(sum(support) AS BIGINT) AS tot FROM tri)
              |SELECT s1, s2, s3, support,
              |  CAST(support AS DOUBLE) / CAST(tot AS DOUBLE) AS share
              |FROM tri CROSS JOIN tot
              |ORDER BY support DESC, s1 ASC, s2 ASC, s3 ASC LIMIT 20""".stripMargin)
    ),

    // ── CUSUM drift detection (integer-exact, two windows) ─────────────
    // Page's one-sided CUSUM over the daily purchase-value series:
    // S_t = max(0, S_{t-1} + (x_t − k)) flags sustained upward drift.
    // The recurrence looks inherently sequential, but the prefix
    // identity S_t = C_t − min_{j≤t} C_j (C = running sum of x − k)
    // turns it into TWO stacked windows over the same per-day ordering —
    // the standard trick for turning clamp-recurrences into dataflow.
    // Everything is exact micro-unit BIGINT (x_t = day's value sum in
    // µunits, k = 120 units): no float until the emitted columns, so
    // the alarm set (S_t > h) is driver-hash-exact. SCALE: the daily
    // rollup is one partial-agg shuffle; the series windows run over
    // DAYS (tiny) — a per-entity CUSUM would partition both windows by
    // the entity key, same two shuffles.
    Q(
      "evt_cusum",
      (s, d) => {
        val k = 120L * 1000000L
        val h = 600L * 1000000L
        val daily = eventsUs(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 1e6).cast("long")).as("xu"))
        val wCum = Window.orderBy(col("day").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val c = daily.withColumn("cu", sum(col("xu") - k).over(wCum))
        val st = c.withColumn("smin", min(least(col("cu"), lit(0L))).over(wCum))
          .select(col("day"), col("xu"),
            (col("cu") - col("smin")).as("su"))
        st.select(col("day"),
            (col("xu").cast("double") / 1e6).as("day_value"),
            (col("su").cast("double") / 1e6).as("cusum"),
            (col("su") > h).as("alarm"))
          .orderBy("day")
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST($sqlTs AS DATE) AS day,
              |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS xu
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
              |c AS (
              |  SELECT day, xu,
              |    sum(xu - 120000000) OVER (ORDER BY day ASC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
              |  FROM daily),
              |st AS (
              |  SELECT day, xu, cu,
              |    cu - min(least(cu, 0)) OVER (ORDER BY day ASC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS su
              |  FROM c)
              |SELECT day, CAST(xu AS DOUBLE) / 1000000 AS day_value,
              |  CAST(su AS DOUBLE) / 1000000 AS cusum,
              |  su > 600000000 AS alarm
              |FROM st ORDER BY day""".stripMargin)
    ),

    // ── Holt–Winters double exponential smoothing + residual anomalies ─
    // The forecasting layer on top of evt_cusum's drift alarm: level +
    // trend smoothing (α = β = 1/2, exactly representable) over the
    // same daily purchase series, one-step-ahead forecast f_t = l + b,
    // residual r_t = x_t − f_t, anomaly when |r_t| > 1000 after a
    // 4-day warmup. The coupled (l, b) recurrence is inherently
    // sequential — the evt_ema discipline applies: Spark folds the
    // sorted day iterator with O(1) state (flatMapSortedGroups; the
    // global daily series is one group — a per-entity variant keys the
    // groupBy by entity, same shape), and the oracle replays the SAME
    // double expressions step-for-step via a recursive CTE over the day
    // index, so every level/trend/forecast/residual is bit-identical.
    // Zero seed (l₀ = b₀ = 0) like EMA's; x_t enters as the exact
    // µunit BIGINT day sum divided once.
    Q(
      "evt_holt_winters",
      (s, d) =>
        holtWintersRows(s, d)
          .select(date_add(lit("1970-01-01").cast("date"), col("epd")).as("day"),
            col("day_value"), col("forecast"), col("residual"),
            col("level"), col("trend"),
            (col("rn") >= 5 && abs(col("residual")) > 1000.0).as("anomaly"))
          .orderBy("day"),
      Some(s"""WITH RECURSIVE
              |$sqlHwCtes
              |SELECT day, x AS day_value, f AS forecast, r AS residual,
              |  l AS level, b AS trend,
              |  (rn >= 5 AND abs(r) > 1000.0) AS anomaly
              |FROM hw WHERE rn >= 1 ORDER BY day""".stripMargin)
    ),

    // ── forecast accuracy: MAE + MASE of the Holt–Winters one-step ─────
    // The eval that decides whether a forecaster earns its keep: mean
    // absolute error of the HW one-step forecast vs the naive-1
    // baseline (f_t = x_{t−1}), and their ratio — MASE (Hyndman &
    // Koehler 2006), < 1 iff the model beats naive. Both residual
    // streams replay the SAME recurrence rows (the shared [[sqlHwCtes]]
    // fold), then every |residual| is floor-quantized to exact µunits
    // so the sums are order-free BIGINTs and each mean divides once.
    // Day 1 is excluded on both sides (its HW "residual" is the zero
    // seed's warmup artifact and naive-1 has no predecessor).
    Q(
      "evt_forecast_accuracy",
      (s, d) => {
        val w = Window.orderBy(col("epd"))
        val rows = holtWintersRows(s, d)
          .withColumn("prev_x", lag(col("day_value"), 1).over(w))
          .filter(col("rn") >= 2)
          .select(
            floor(abs(col("residual")) * 1e6).cast("long").as("hwu"),
            floor(abs(col("day_value") - col("prev_x")) * 1e6).cast("long")
              .as("nvu"))
        rows.agg(count(lit(1)).as("n_days"),
            sum("hwu").as("shw"), sum("nvu").as("snv"))
          .select(col("n_days"),
            ((col("shw").cast("double") / 1e6) / col("n_days").cast("double"))
              .as("mae_hw"),
            ((col("snv").cast("double") / 1e6) / col("n_days").cast("double"))
              .as("mae_naive"),
            (col("shw").cast("double") / col("snv").cast("double")).as("mase"))
      },
      Some(s"""WITH RECURSIVE
              |$sqlHwCtes,
              |res AS (
              |  SELECT h.rn,
              |    CAST(floor(abs(h.r) * 1000000) AS BIGINT) AS hwu,
              |    CAST(floor(abs(h.x - p.x) * 1000000) AS BIGINT) AS nvu
              |  FROM hw h JOIN idx p ON p.rn = h.rn - 1
              |  WHERE h.rn >= 2),
              |agg AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n_days,
              |    CAST(sum(hwu) AS BIGINT) AS shw,
              |    CAST(sum(nvu) AS BIGINT) AS snv
              |  FROM res)
              |SELECT n_days,
              |  (CAST(shw AS DOUBLE) / 1000000) / CAST(n_days AS DOUBLE) AS mae_hw,
              |  (CAST(snv AS DOUBLE) / 1000000) / CAST(n_days AS DOUBLE) AS mae_naive,
              |  CAST(shw AS DOUBLE) / CAST(snv AS DOUBLE) AS mase
              |FROM agg""".stripMargin)
    ),

    // ── RFM segmentation (recency / frequency / monetary quintiles) ────
    // The classic customer-base census: per user, days since last
    // purchase (vs the corpus max day), purchase count, and exact
    // µunit spend; each dimension scored 1-5 by quintile over a TOTAL
    // order (value + user_id tiebreak — quintiles are deterministic
    // only under one). The oracle says `ntile(5)` over a flat window;
    // the engine computes the IDENTICAL tile without any global
    // single-partition sort (VERDICT r11): the three dimensions
    // explode into (dim, sort_value) pairs, the global rank comes from
    // the text_weighted_sample two-level scan — per-block partitioned
    // row_numbers (parallel) + a tiny per-dim block-offset table
    // joined back by broadcast — and the tile is then a PURE INTEGER
    // FUNCTION of (rank, N): with q = N DIV 5, r = N MOD 5, row i gets
    // tile (i−1) DIV (q+1) + 1 when i ≤ r·(q+1), else
    // r + (i − r·(q+1) − 1) DIV q + 1 — exactly SQL ntile's
    // remainder-to-early-groups rule on both engines. SCALE: one
    // partial-agg shuffle per user, one partitioned window per block,
    // one broadcast; the only ordered pass over a non-blocked input is
    // the offset window over the BLOCK table (≈ N / block-width rows;
    // the per-dim widths are the knob).
    Q(
      "evt_rfm",
      (s, d) => {
        val peru = eventsUs(s, d).filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(max(to_date(col("ts"))).as("last_day"),
            count(lit(1)).as("frequency"),
            sum(floor(col("value") * 1e6).cast("long")).as("mu"))
        val gmax = peru.agg(max("last_day").as("gday"))
        val base = peru.crossJoin(broadcast(gmax))
          .select(col("user_id"),
            datediff(col("gday"), col("last_day")).cast("long").as("recency_days"),
            col("frequency"), col("mu"))
          .transform(GenSnap.snap) // rank pass + final join read one materialization
        // sv ascending ≡ each ntile's ORDER BY (recency DESC → negate).
        // Blocks are RANGES of sv (DIV is monotone, truncation included)
        // sized to the dimension's magnitude: days ~1e2, counts ~1e2-1e4,
        // µunit spend ~1e9 — so blocks hold O(10-100) rows at the gate
        // SFs and the offset table stays ≪ N at any SF.
        val ex = base.select(col("user_id"), explode(array(
            struct(lit("r").as("dim"), (-col("recency_days")).as("sv")),
            struct(lit("f").as("dim"), col("frequency").cast("long").as("sv")),
            struct(lit("m").as("dim"), col("mu").as("sv")))).as("e"))
          .select(col("user_id"), col("e.dim").as("dim"), col("e.sv").as("sv"))
          .withColumn("blk",
            when(col("dim") === "r", expr("sv DIV 8"))
              .when(col("dim") === "f", expr("sv DIV 8"))
              .otherwise(expr("sv DIV 4194304"))) // 2^22 µunits ≈ $4.19
        val rin = row_number().over(
          Window.partitionBy("dim", "blk").orderBy(col("sv").asc, col("user_id").asc))
        val blkTot = ex.groupBy("dim", "blk").agg(count(lit(1)).as("btot"))
        val blkOff = blkTot.withColumn("boff",
            coalesce(sum("btot").over(Window.partitionBy("dim").orderBy("blk")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("dim").as("odim"), col("blk").as("oblk"), col("boff"))
        val ncnt = base.agg(count(lit(1)).as("nn"))
        // ntile(5) as arithmetic on the exact global rank: q=N DIV 5,
        // r=N MOD 5; greatest(q,1) keeps the (unreached when q=0) else
        // branch division total.
        val tile =
          when(expr("grank <= (nn % 5) * (nn DIV 5 + 1)"),
              expr("(grank - 1) DIV (nn DIV 5 + 1) + 1"))
            .otherwise(expr(
              "nn % 5 + (grank - (nn % 5) * (nn DIV 5 + 1) - 1) DIV greatest(nn DIV 5, 1) + 1"))
            .cast("int")
        val scored = ex.withColumn("rin", rin)
          .join(broadcast(blkOff),
            col("dim") === col("odim") && col("blk") === col("oblk"))
          .withColumn("grank", col("boff") + col("rin"))
          .crossJoin(broadcast(ncnt))
          .withColumn("score", tile)
          .groupBy("user_id")
          .agg(max(when(col("dim") === "r", col("score"))).as("r_score"),
            max(when(col("dim") === "f", col("score"))).as("f_score"),
            max(when(col("dim") === "m", col("score"))).as("m_score"))
        base.join(scored, "user_id")
          .select(col("user_id"), col("recency_days"), col("frequency"),
            (col("mu").cast("double") / 1e6).as("monetary"),
            col("r_score"), col("f_score"), col("m_score"))
          .withColumn("rfm_code",
            col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .orderBy("user_id")
      },
      Some(s"""WITH peru AS (
              |  SELECT user_id, max(CAST($sqlTs AS DATE)) AS last_day,
              |    CAST(count(*) AS BIGINT) AS frequency,
              |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS mu
              |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
              |g AS (SELECT max(last_day) AS gday FROM peru),
              |base AS (
              |  SELECT user_id, CAST(gday - last_day AS BIGINT) AS recency_days,
              |    frequency, mu
              |  FROM peru, g),
              |scored AS (
              |  SELECT user_id, recency_days, frequency,
              |    CAST(mu AS DOUBLE) / 1000000 AS monetary,
              |    ntile(5) OVER (ORDER BY recency_days DESC, user_id ASC) AS r_score,
              |    ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) AS f_score,
              |    ntile(5) OVER (ORDER BY mu ASC, user_id ASC) AS m_score
              |  FROM base)
              |SELECT user_id, recency_days, frequency, monetary,
              |  r_score, f_score, m_score,
              |  r_score * 100 + f_score * 10 + m_score AS rfm_code
              |FROM scored ORDER BY user_id""".stripMargin)
    ),

    // ── anomaly consensus: CUSUM drift ∧ Holt–Winters residual ─────────
    // The alert a pipeline actually pages on: CUSUM says the level has
    // DRIFTED, the forecaster says today is FAR from predicted — the
    // conjunction kills both false-positive families (a one-day spike
    // trips HW but not CUSUM; slow drift trips CUSUM but not HW). Both
    // detectors replay over the SAME daily rollup (shared CTE prefix);
    // the join is by day, the consensus one boolean AND.
    Q(
      "evt_anomaly_consensus",
      (s, d) => {
        val k = 120L * 1000000L
        val h = 600L * 1000000L
        val hw = holtWintersRows(s, d)
          .select(date_add(lit("1970-01-01").cast("date"), col("epd")).as("day"),
            col("residual"), col("rn"))
        val daily = eventsUs(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 1e6).cast("long")).as("xu"))
        val wCum = Window.orderBy(col("day").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val cu = daily.withColumn("cu", sum(col("xu") - k).over(wCum))
          .withColumn("smin", min(least(col("cu"), lit(0L))).over(wCum))
          .select(col("day"), (col("cu") - col("smin") > h).as("cusum_alarm"))
        hw.join(cu, "day")
          .select(col("day"), col("cusum_alarm"),
            (col("rn") >= 5 && abs(col("residual")) > 1000.0).as("hw_anomaly"))
          .withColumn("consensus", col("cusum_alarm") && col("hw_anomaly"))
          .orderBy("day")
      },
      Some(s"""WITH RECURSIVE
              |$sqlHwCtes,
              |c AS (
              |  SELECT day, xu,
              |    sum(xu - 120000000) OVER (ORDER BY day ASC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
              |  FROM daily),
              |st AS (
              |  SELECT day,
              |    cu - min(least(cu, 0)) OVER (ORDER BY day ASC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS su
              |  FROM c)
              |SELECT h.day, st.su > 600000000 AS cusum_alarm,
              |  (h.rn >= 5 AND abs(h.r) > 1000.0) AS hw_anomaly,
              |  (st.su > 600000000 AND h.rn >= 5 AND abs(h.r) > 1000.0) AS consensus
              |FROM hw h JOIN st ON st.day = h.day
              |WHERE h.rn >= 1
              |ORDER BY h.day""".stripMargin)
    ),

    // ── interval union: total covered time per user ────────────────────
    // The interval-algebra primitive (union length of overlapping
    // spans): every event opens a 30-minute activity window; merged
    // islands per user via gaps-and-islands — an island starts where
    // the span's start exceeds the running max end of everything
    // before it (two stacked windows, the evt_cusum discipline), then
    // per-island extents aggregate. All µs BIGINTs; one shuffle by
    // user, windows ROWS-bounded.
    Q(
      "evt_interval_union",
      (s, d) => {
        val span = 30L * 60L * 1000000L
        val e = eventsUs(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("su"),
            col("event_id"))
          .withColumn("eu", col("su") + span)
        val wOrd = Window.partitionBy("user_id")
          .orderBy(col("su").asc, col("event_id").asc)
        val withPrev = e.withColumn("pmax",
          max("eu").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        val islands = withPrev
          .withColumn("newi",
            when(col("pmax").isNull || col("su") > col("pmax"), 1L).otherwise(0L))
          .withColumn("island",
            sum("newi").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        islands.groupBy("user_id", "island")
          .agg(min("su").as("is_start"), max("eu").as("is_end"),
            count(lit(1)).as("n_ev"))
          .groupBy("user_id")
          .agg(sum("n_ev").as("n_events"),
            count(lit(1)).as("n_islands"),
            sum(col("is_end") - col("is_start")).as("covered_us"))
          .select(col("user_id"), col("n_events"), col("n_islands"),
            (col("covered_us").cast("double") / 60000000.0).as("covered_minutes"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (
              |  SELECT user_id, epoch_ns(ts) // 1000 AS su, event_id,
              |    epoch_ns(ts) // 1000 + 1800000000 AS eu
              |  FROM events),
              |p AS (
              |  SELECT user_id, su, eu, event_id,
              |    max(eu) OVER (PARTITION BY user_id ORDER BY su ASC, event_id ASC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
              |  FROM e),
              |i AS (
              |  SELECT user_id, su, eu,
              |    CAST(sum(CASE WHEN pmax IS NULL OR su > pmax THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY user_id ORDER BY su ASC, event_id ASC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
              |  FROM p),
              |isl AS (
              |  SELECT user_id, island, CAST(min(su) AS BIGINT) AS is_start,
              |    CAST(max(eu) AS BIGINT) AS is_end, CAST(count(*) AS BIGINT) AS n_ev
              |  FROM i GROUP BY user_id, island),
              |agg AS (
              |  SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
              |    CAST(count(*) AS BIGINT) AS n_islands,
              |    CAST(sum(is_end - is_start) AS BIGINT) AS covered_us
              |  FROM isl GROUP BY user_id)
              |SELECT user_id, n_events, n_islands,
              |  CAST(covered_us AS DOUBLE) / 60000000.0 AS covered_minutes
              |FROM agg ORDER BY user_id""".stripMargin)
    ),

    // ── cohort LTV curve (cumulative revenue by cohort age) ────────────
    // The companion to evt_retention's activity grid: per signup-week
    // cohort, cumulative purchase revenue per user at each week of
    // cohort age — the curve a growth team reads payback periods off.
    // Revenue accumulates as exact µunit BIGINTs; the cumulative window
    // runs per cohort over its (few) age rows; cohort size divides
    // once. Same date_trunc-week cohorting both engines (the
    // evt_retention convention).
    Q(
      "evt_cohort_ltv",
      (s, d) => {
        val p = eventsUs(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"),
            floor(col("value") * 1e6).cast("long").as("vu"))
        val firstW = p.groupBy("user_id").agg(min("week").as("cohort"))
        val sized = firstW.groupBy("cohort").agg(count(lit(1)).as("n_users"))
        val aged = p.join(firstW, "user_id")
          .select(col("cohort"),
            expr("CAST(datediff(CAST(week AS DATE), CAST(cohort AS DATE)) DIV 7 AS BIGINT)")
              .as("age_weeks"), col("vu"))
          .groupBy("cohort", "age_weeks").agg(sum("vu").as("rev_u"))
        val w = Window.partitionBy("cohort").orderBy("age_weeks")
          .rowsBetween(Window.unboundedPreceding, 0)
        aged
          .withColumn("cum_u", sum("rev_u").over(w))
          .join(sized, "cohort")
          .select(col("cohort"), col("age_weeks"), col("n_users"),
            (col("rev_u").cast("double") / 1e6).as("revenue"),
            (col("cum_u").cast("double") / 1e6).as("cum_revenue"),
            ((col("cum_u").cast("double") / 1e6) / col("n_users").cast("double"))
              .as("ltv_per_user"))
          .orderBy("cohort", "age_weeks")
      },
      Some(s"""WITH p AS (
              |  SELECT user_id, date_trunc('week', $sqlTs) AS week,
              |    CAST(floor(value * 1000000) AS BIGINT) AS vu
              |  FROM events WHERE event_type = 'purchase'),
              |fw AS (SELECT user_id, min(week) AS cohort FROM p GROUP BY user_id),
              |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
              |       FROM fw GROUP BY cohort),
              |aged AS (
              |  SELECT fw.cohort,
              |    CAST(date_diff('day', CAST(fw.cohort AS DATE), CAST(p.week AS DATE)) // 7 AS BIGINT)
              |      AS age_weeks,
              |    CAST(sum(p.vu) AS BIGINT) AS rev_u
              |  FROM p JOIN fw ON fw.user_id = p.user_id
              |  GROUP BY 1, 2),
              |cum AS (
              |  SELECT cohort, age_weeks, rev_u,
              |    CAST(sum(rev_u) OVER (PARTITION BY cohort ORDER BY age_weeks
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_u
              |  FROM aged)
              |SELECT c.cohort, c.age_weeks, s.n_users,
              |  CAST(c.rev_u AS DOUBLE) / 1000000 AS revenue,
              |  CAST(c.cum_u AS DOUBLE) / 1000000 AS cum_revenue,
              |  (CAST(c.cum_u AS DOUBLE) / 1000000) / CAST(s.n_users AS DOUBLE) AS ltv_per_user
              |FROM cum c JOIN sz s USING (cohort)
              |ORDER BY c.cohort, c.age_weeks""".stripMargin)
    ),

    // ── two-proportion A/B test (conversion z² in exact rationals) ─────
    // The experimentation primitive: split users by id parity (the
    // deterministic assignment a real platform hashes), compare
    // high-value-purchase conversion rates (a purchase with value >
    // 200 — plain purchase is universal in this corpus, which would
    // pool p̂ to 1 and zero the variance term), and emit the two-proportion z²
    // statistic — (p̂₁ − p̂₀)² / (p̂(1−p̂)(1/n₀ + 1/n₁)) with p̂ pooled —
    // built from FOUR exact BIGINTs in one fixed expression written
    // token-for-token identically in both engines (z² needs no sqrt,
    // so nothing transcendental anywhere; significance is z² against
    // the χ²₁ 95% critical value 3.84). SCALE: two distinct shuffles
    // (users, converters) + a broadcast flag join + a 1-row agg.
    // ── difference-in-differences (the quasi-experiment estimator) ─────
    // When assignment isn't randomized per-exposure (a feature ships to
    // arm 1 mid-month), the causal read is DiD: (post−pre) change in the
    // treated arm minus the same change in the control arm, which nets
    // out both the arm-level baseline difference and the common time
    // trend. Arms are the user_id % 2 convention (evt_ab_test); the
    // intervention date splits the fixed 30-day window in half. All
    // sufficient statistics are EXACT: per-arm user counts and per-
    // (arm, period) revenue totals floor-quantized to cents (the
    // evt_cuped discipline), so only the final estimate divides — one
    // token-identical rational expression on both engines. SCALE: one
    // distinct-users shuffle + ONE conditional-aggregation pass over
    // the purchase rows; the two 1-row aggregates cross-join free.
    Q(
      "evt_did",
      (s, d) => {
        val ev = eventsUs(s, d)
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val ua = ev.select(col("user_id")).distinct()
          .agg(
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n1"))
        val r = ev.filter(col("event_type") === "purchase")
          .select((col("user_id") % 2).as("arm"), (col("ts") >= cut).as("post"),
            floor(col("value") * 100).cast("long").as("cents"))
        val ra = r.agg(
          sum(when(!col("post") && col("arm") === 0, col("cents")).otherwise(0L)).as("pre0"),
          sum(when(col("post") && col("arm") === 0, col("cents")).otherwise(0L)).as("post0"),
          sum(when(!col("post") && col("arm") === 1, col("cents")).otherwise(0L)).as("pre1"),
          sum(when(col("post") && col("arm") === 1, col("cents")).otherwise(0L)).as("post1"))
        ra.crossJoin(ua).select(
          col("n0"), col("n1"), col("pre0"), col("post0"), col("pre1"), col("post1"),
          ((col("post1").cast("double") - col("pre1").cast("double")) / col("n1").cast("double")
            - (col("post0").cast("double") - col("pre0").cast("double")) / col("n0").cast("double"))
            .as("did_cents_per_user"))
      },
      Some("""WITH ua AS (
             |  SELECT
             |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
             |  FROM (SELECT DISTINCT user_id FROM events)),
             |r AS (
             |  SELECT user_id % 2 AS arm,
             |    (ts >= TIMESTAMP '2024-01-16 00:00:00') AS post,
             |    CAST(floor(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |ra AS (
             |  SELECT
             |    CAST(sum(CASE WHEN NOT post AND arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS pre0,
             |    CAST(sum(CASE WHEN post AND arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS post0,
             |    CAST(sum(CASE WHEN NOT post AND arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS pre1,
             |    CAST(sum(CASE WHEN post AND arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS post1
             |  FROM r)
             |SELECT n0, n1, pre0, post0, pre1, post1,
             |  (CAST(post1 AS DOUBLE) - CAST(pre1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
             |    - (CAST(post0 AS DOUBLE) - CAST(pre0 AS DOUBLE)) / CAST(n0 AS DOUBLE)
             |    AS did_cents_per_user
             |FROM ra, ua""".stripMargin)
    ),

    Q(
      "evt_ab_test",
      (s, d) => {
        val users = eventsUs(s, d).select(col("user_id")).distinct()
        val conv = eventsUs(s, d)
          .filter(col("event_type") === "purchase" && col("value") > 200.0)
          .select(col("user_id")).distinct()
          .withColumn("cflag", lit(1L))
        val flagged = users.join(conv, Seq("user_id"), "left")
          .select((col("user_id") % 2).as("arm"),
            coalesce(col("cflag"), lit(0L)).as("cflag"))
        val agg = flagged.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("cflag")).otherwise(0L)).as("c0"),
          sum(when(col("arm") === 1, col("cflag")).otherwise(0L)).as("c1"))
        val p0 = col("c0").cast("double") / col("n0").cast("double")
        val p1 = col("c1").cast("double") / col("n1").cast("double")
        val pp = (col("c0") + col("c1")).cast("double") /
          (col("n0") + col("n1")).cast("double")
        val z2 = ((p1 - p0) * (p1 - p0)) /
          ((pp * (lit(1.0) - pp)) *
            (lit(1.0) / col("n0").cast("double") + lit(1.0) / col("n1").cast("double")))
        agg.select(col("n0"), col("n1"), col("c0"), col("c1"),
          p0.as("rate_a"), p1.as("rate_b"), z2.as("z2"),
          (z2 > 3.84).as("significant"))
      },
      Some(s"""WITH u AS (SELECT DISTINCT user_id FROM events),
              |cv AS (SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS cflag
              |       FROM events WHERE event_type = 'purchase' AND value > 200.0),
              |f AS (
              |  SELECT u.user_id % 2 AS arm, coalesce(cv.cflag, 0) AS cflag
              |  FROM u LEFT JOIN cv USING (user_id)),
              |agg AS (
              |  SELECT
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              |    CAST(sum(CASE WHEN arm = 0 THEN cflag ELSE 0 END) AS BIGINT) AS c0,
              |    CAST(sum(CASE WHEN arm = 1 THEN cflag ELSE 0 END) AS BIGINT) AS c1
              |  FROM f)
              |SELECT n0, n1, c0, c1,
              |  CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate_a,
              |  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate_b,
              |  (((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
              |    * ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))))
              |  / (((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
              |      * (1.0 - (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))))
              |     * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS z2,
              |  (((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
              |    * ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))))
              |  / (((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
              |      * (1.0 - (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))))
              |     * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) > 3.84 AS significant
              |FROM agg""".stripMargin)
    ),

    // ── sequential probability ratio test (Wald 1945) ─────────────────
    // The experimentation family's SEQUENTIAL member: evt_ab_test is the
    // fixed-horizon z-test, but production experiment platforms monitor
    // daily and stop early — SPRT is the optimal such rule. Treatment
    // arm (user_id % 2 = 1) conversions (the ab_test flag) are rolled up
    // by ENROLLMENT day (the user's first event date); the
    // log-likelihood ratio for H1: p=0.06 vs H0: p=0.03 accumulates as a
    // calendar-bounded prefix sum of EXACT integers on the 2^20 grid
    // (the DoReMi ln-quantization path, bit-identical across engines):
    // each day adds convs·⌊ln(p1/p0)·2^20⌋ + misses·⌊ln((1−p1)/(1−p0))
    // ·2^20⌋, and the Wald boundaries ⌊ln(0.95/0.05)·2^20⌋ /
    // ⌊ln(0.05/0.95)·2^20⌋ (α=β=0.05) classify each day into
    // accept_h1 / accept_h0 / continue. SCALE: the corpus-sized work is
    // one groupBy(user) + one groupBy(day); the sequential fold runs on
    // the per-day table (bounded by calendar — the evt_cusum shape).
    Q(
      "evt_sprt",
      (s, d) => {
        val Scale = 1048576L
        val win = floor(log(lit(0.06) / lit(0.03)) * Scale).cast("long")
        val loss = floor(log((lit(1.0) - lit(0.06)) / (lit(1.0) - lit(0.03))) * Scale).cast("long")
        val upperA = floor(log(lit(0.95) / lit(0.05)) * Scale).cast("long")
        val lowerB = floor(log(lit(0.05) / lit(0.95)) * Scale).cast("long")
        val firstDay = eventsUs(s, d)
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
          .filter(col("user_id") % 2 === 1)
          .select(col("user_id"), to_date(col("t0")).as("day"))
        val conv = eventsUs(s, d)
          .filter(col("event_type") === "purchase" && col("value") > 200.0)
          .select(col("user_id")).distinct()
          .withColumn("cflag", lit(1L))
        val daily = firstDay.join(conv, Seq("user_id"), "left")
          .groupBy("day")
          .agg(count(lit(1)).as("enrolls"),
            sum(coalesce(col("cflag"), lit(0L))).as("convs"))
        val wCum = Window.orderBy(col("day").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        daily
          .withColumn("llr_fp",
            sum(col("convs") * win + (col("enrolls") - col("convs")) * loss).over(wCum))
          .select(col("day"), col("enrolls"), col("convs"), col("llr_fp"),
            when(col("llr_fp") >= upperA, "accept_h1")
              .when(col("llr_fp") <= lowerB, "accept_h0")
              .otherwise("continue").as("signal"))
          .orderBy("day")
      },
      Some(s"""WITH fd AS (
              |  SELECT user_id, CAST(min($sqlTs) AS DATE) AS day
              |  FROM events GROUP BY user_id),
              |t AS (SELECT user_id, day FROM fd WHERE user_id % 2 = 1),
              |cv AS (SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS cflag
              |       FROM events WHERE event_type = 'purchase' AND value > 200.0),
              |daily AS (
              |  SELECT day, CAST(count(*) AS BIGINT) AS enrolls,
              |    CAST(sum(coalesce(cv.cflag, 0)) AS BIGINT) AS convs
              |  FROM t LEFT JOIN cv USING (user_id) GROUP BY day),
              |k AS (SELECT
              |  CAST(floor(ln(0.06 / 0.03) * 1048576) AS BIGINT) AS win,
              |  CAST(floor(ln((1.0 - 0.06) / (1.0 - 0.03)) * 1048576) AS BIGINT) AS loss,
              |  CAST(floor(ln(0.95 / 0.05) * 1048576) AS BIGINT) AS ua,
              |  CAST(floor(ln(0.05 / 0.95) * 1048576) AS BIGINT) AS lb),
              |pre AS (
              |  SELECT day, enrolls, convs,
              |    CAST(sum(convs * k.win + (enrolls - convs) * k.loss)
              |      OVER (ORDER BY day ASC
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS llr_fp,
              |    k.ua, k.lb
              |  FROM daily CROSS JOIN k)
              |SELECT day, enrolls, convs, llr_fp,
              |  CASE WHEN llr_fp >= ua THEN 'accept_h1'
              |       WHEN llr_fp <= lb THEN 'accept_h0'
              |       ELSE 'continue' END AS signal
              |FROM pre ORDER BY day""".stripMargin)
    ),

    // ── experiment power analysis (required sample size per arm) ──────
    // The question every A/B test report gets asked next: "how long
    // until we could DETECT a 10% relative lift?" Classic two-proportion
    // sample-size formula at α=0.05 (two-sided) / power 0.8:
    //   n = (z_α·sqrt(2·p̄·(1−p̄)) + z_β·sqrt(p₁q₁ + p₂q₂))² / (p₁−p₂)²
    // with p₁ the MEASURED control conversion (evt_ab_test's exact
    // c0/n0), p₂ = 1.1·p₁ the target, p̄ their midpoint. Everything
    // downstream of the four exact BIGINTs is one fixed token-identical
    // double chain: two correctly-rounded sqrts, the z constants
    // emitted as %.17e literals (the KS/Benford convention), one final
    // ceil that both engines take on the same double. SCALE: identical
    // to evt_ab_test — two distinct shuffles + a 1-row formula.
    Q(
      "evt_power_analysis",
      (s, d) => {
        val users = eventsUs(s, d).select(col("user_id")).distinct()
        val conv = eventsUs(s, d)
          .filter(col("event_type") === "purchase" && col("value") > 200.0)
          .select(col("user_id")).distinct()
          .withColumn("cflag", lit(1L))
        val agg = users.join(conv, Seq("user_id"), "left")
          .select((col("user_id") % 2).as("arm"),
            coalesce(col("cflag"), lit(0L)).as("cflag"))
          .agg(
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") === 0, col("cflag")).otherwise(0L)).as("c0"))
        val p1 = col("c0").cast("double") / col("n0").cast("double")
        val p2 = lit(1.1) * p1
        val pbar = (p1 + p2) / lit(2.0)
        val num = lit(ZAlpha) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
          lit(ZBeta) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
        val nReq = (num * num) / ((p2 - p1) * (p2 - p1))
        agg.select(col("n0"), col("c0"),
          p1.as("p_base"), p2.as("p_target"),
          nReq.as("n_required"),
          ceil(nReq).cast("long").as("n_required_ceil"),
          (col("n0").cast("double") >= nReq).as("arm_large_enough"))
      },
      Some(s"""WITH u AS (SELECT DISTINCT user_id FROM events),
              |cv AS (SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS cflag
              |       FROM events WHERE event_type = 'purchase' AND value > 200.0),
              |agg AS (
              |  SELECT
              |    CAST(sum(CASE WHEN u.user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
              |    CAST(sum(CASE WHEN u.user_id % 2 = 0 THEN coalesce(cv.cflag, 0) ELSE 0 END) AS BIGINT) AS c0
              |  FROM u LEFT JOIN cv ON u.user_id = cv.user_id),
              |f AS (
              |  SELECT n0, c0,
              |    CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p1,
              |    $Lit11 * (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS p2
              |  FROM agg),
              |g AS (
              |  SELECT n0, c0, p1, p2, (p1 + p2) / 2.0 AS pbar FROM f),
              |h AS (
              |  SELECT n0, c0, p1, p2,
              |    $ZAlphaSql * sqrt(2.0 * pbar * (1.0 - pbar))
              |      + $ZBetaSql * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS num
              |  FROM g)
              |SELECT n0, c0, p1 AS p_base, p2 AS p_target,
              |  (num * num) / ((p2 - p1) * (p2 - p1)) AS n_required,
              |  CAST(ceil((num * num) / ((p2 - p1) * (p2 - p1))) AS BIGINT)
              |    AS n_required_ceil,
              |  CAST(n0 AS DOUBLE) >= (num * num) / ((p2 - p1) * (p2 - p1))
              |    AS arm_large_enough
              |FROM h""".stripMargin)
    ),

    // ── SEASONAL (triple) Holt–Winters: level + trend + weekly cycle ───
    // The full Holt–Winters: an additive 7-slot day-of-week seasonal
    // vector joins the level/trend pair, all smoothing constants 1/2:
    //   f_t = l + b + s[dow],  r_t = x_t − f_t
    //   l'  = 0.5·(x − s[dow]) + 0.5·(l + b)
    //   b'  = 0.5·(l' − l) + 0.5·b
    //   s'[dow] = 0.5·(x − l') + 0.5·s[dow]
    // with dow = (t − 1) mod 7 over the gap-free daily index (shared
    // verbatim with the oracle). State stays O(1) per series (2 + 7
    // doubles in the sorted-iterator fold); the oracle carries the
    // seven slots as recursive-CTE columns stepping the SAME double
    // expressions (LATERAL binds s[dow] and l' once per step), so
    // every level/trend/seasonal/forecast/residual is bit-identical.
    // Anomaly threshold 1300 after a one-full-season warmup (rn ≥ 8).
    Q(
      "evt_holt_winters_seasonal",
      (s, d) => {
        import s.implicits._
        val daily = eventsUs(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .as("epd"))
          .agg(sum(floor(col("value") * 1e6).cast("long")).as("xu"))
        daily.as[(Int, Long)]
          .groupByKey(_ => 0)
          .flatMapSortedGroups(col("epd")) { (_, it) =>
            var l = 0.0
            var b = 0.0
            val sv = Array.fill(7)(0.0)
            var rn = 0
            it.map { case (epd, xu) =>
              rn += 1
              val dow = (rn - 1) % 7
              val x = xu.toDouble / 1000000
              val sd = sv(dow)
              val f = l + b + sd
              val r = x - (l + b + sd)
              val l2 = 0.5 * (x - sd) + 0.5 * (l + b)
              val b2 = 0.5 * (l2 - l) + 0.5 * b
              val s2 = 0.5 * (x - l2) + 0.5 * sd
              l = l2; b = b2; sv(dow) = s2
              (epd, x, f, r, l2, b2, s2, rn >= 8 && math.abs(r) > 1300.0)
            }
          }
          .toDF("epd", "day_value", "forecast", "residual", "level", "trend",
            "seasonal", "anomaly")
          .select(date_add(lit("1970-01-01").cast("date"), col("epd")).as("day"),
            col("day_value"), col("forecast"), col("residual"),
            col("level"), col("trend"), col("seasonal"), col("anomaly"))
          .orderBy("day")
      },
      Some {
        val selSd = "CASE ((i.rn - 1) % 7) " +
          (0 until 7).map(k => s"WHEN $k THEN h.s${k + 1}").mkString(" ") + " END"
        val sCols = (0 until 7).map(k =>
          s"CASE WHEN (i.rn - 1) % 7 = $k THEN 0.5 * (i.x - l2.ln2) + 0.5 * h.s${k + 1} " +
            s"ELSE h.s${k + 1} END").mkString(",\n              |    ")
        // the emitted seasonal is the row's OWN (just-updated) slot
        val selOut = "CASE ((rn - 1) % 7) " +
          (0 until 7).map(k => s"WHEN $k THEN s${k + 1}").mkString(" ") + " END"
        val zeros = Seq.fill(12)("CAST(0.0 AS DOUBLE)").mkString(", ")
        s"""WITH RECURSIVE daily AS (
           |  SELECT CAST($sqlTs AS DATE) AS day,
           |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS xu
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           |idx AS (
           |  SELECT day, CAST(xu AS DOUBLE) / 1000000 AS x,
           |    row_number() OVER (ORDER BY day) AS rn
           |  FROM daily),
           |hws(rn, day, x, l, b, s1, s2, s3, s4, s5, s6, s7, f, r) AS (
           |  SELECT 0, DATE '1970-01-01', $zeros
           |  UNION ALL
           |  SELECT i.rn, i.day, i.x,
           |    l2.ln2,
           |    0.5 * (l2.ln2 - h.l) + 0.5 * h.b,
           |    $sCols,
           |    h.l + h.b + l1.sd,
           |    i.x - (h.l + h.b + l1.sd)
           |  FROM hws h JOIN idx i ON i.rn = h.rn + 1,
           |  LATERAL (SELECT $selSd AS sd) l1,
           |  LATERAL (SELECT 0.5 * (i.x - l1.sd) + 0.5 * (h.l + h.b) AS ln2) l2)
           |SELECT day, x AS day_value, f AS forecast, r AS residual,
           |  l AS level, b AS trend,
           |  ($selOut) AS seasonal,
           |  (rn >= 8 AND abs(r) > 1300.0) AS anomaly
           |FROM hws WHERE rn >= 1 ORDER BY day""".stripMargin
      }
    ),

    // ── autocorrelation function (ACF) of the daily event series ───────
    // The seasonality detector that feeds Holt–Winters its period: the
    // lag-L Pearson correlation of daily event counts for L ∈ {1,2,3,7}
    // (a 7-day peak ⇒ weekly cycle). Pairs come from a calendar self-
    // join (day, day+L) — missing days simply drop the pair, which is
    // the standard irregular-series convention and deterministic. All
    // six sufficient statistics are exact BIGINTs (daily counts are
    // small: n·Σab bounded far under 2^63), so both engines reach the
    // identical integers and the final r = num/sqrt(d1·d2) is ONE
    // token-identical IEEE expression — bit-exact, no quantization
    // (the evt_rolling_zscore convention). At scale: one day-grained
    // pre-aggregation (tiny), then a 4·|days|-row broadcast self-join —
    // the corpus is touched once.
    Q(
      "evt_autocorr",
      (s, d) => {
        val daily = eventsUs(s, d)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("x"))
        val lagged = daily
          .withColumn("lag", explode(array(Seq(1, 2, 3, 7).map(lit): _*)))
          .withColumn("day2", date_add(col("day"), col("lag")))
        val pairs = lagged.alias("a")
          .join(daily.select(col("day").as("day2"), col("x").as("y")).alias("b"),
            "day2")
        pairs.groupBy("lag")
          .agg(count(lit(1)).as("n_pairs"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
          .select(col("lag"), col("n_pairs"),
            (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
            (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("d1"),
            (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("d2"))
          .filter(col("d1") > 0 && col("d2") > 0)
          .select(col("lag"), col("n_pairs"), col("num"), col("d1"), col("d2"),
            (col("num").cast("double") /
              sqrt(col("d1").cast("double") * col("d2").cast("double"))).as("acf"))
          .orderBy("lag")
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST($sqlTs AS DATE) AS day,
              |         CAST(count(*) AS BIGINT) AS x
              |  FROM events GROUP BY 1),
              |pairs AS (
              |  SELECT l.lag, a.x AS x, b.x AS y
              |  FROM daily a
              |  CROSS JOIN (VALUES (1),(2),(3),(7)) l(lag)
              |  JOIN daily b ON b.day = a.day + l.lag),
              |st AS (
              |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
              |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              |         CAST(sum(x * x) AS BIGINT) AS sxx,
              |         CAST(sum(y * y) AS BIGINT) AS syy,
              |         CAST(sum(x * y) AS BIGINT) AS sxy
              |  FROM pairs GROUP BY lag),
              |mo AS (
              |  SELECT lag, n_pairs,
              |         n_pairs * sxy - sx * sy AS num,
              |         n_pairs * sxx - sx * sx AS d1,
              |         n_pairs * syy - sy * sy AS d2
              |  FROM st)
              |SELECT lag, n_pairs, num, d1, d2,
              |       CAST(num AS DOUBLE) /
              |         sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)) AS acf
              |FROM mo WHERE d1 > 0 AND d2 > 0 ORDER BY lag""".stripMargin)
    ),

    // ── CUPED variance-reduced A/B comparison (Deng et al. 2013) ───────
    // The experimentation-platform workhorse: adjust each user's
    // experiment-period purchase total by their PRE-period total
    // (adj_i = post_i − θ·(pre_i − mean(pre)), θ = cov/var from the
    // pooled pre/post pairs), shrinking metric variance by ρ² without
    // biasing the treatment difference. Arms are the evt_ab_test
    // deterministic user_id % 2 split; the period split is the month's
    // midpoint. The key identity: the ARM-LEVEL adjusted mean needs no
    // per-user adjusted column — mean_adj_a = (Σpost_a − θ·(Σpre_a −
    // n_a·mean(pre)))/n_a — so the whole operator is ONE pass over the
    // per-user pairs producing 11 exact BIGINT sums (values in cents;
    // users absent from a period contribute 0), with the n·Σ cross
    // terms ridden through DECIMAL(38,0)/HUGEINT (the assortativity
    // convention) and every double derived from NAMED intermediates —
    // token-identical on both engines. SF ceiling: the n·Σxx cross
    // terms stay under 1e38 while n·(Σ cents²) < 1e38 — at ~1e4-cent
    // user totals that is n ≲ 1e13 users, far past any realistic
    // experiment; past it Spark NULLs silently vs DuckDB raising (the
    // agg_moments_rollup guard pattern applies if ever approached).
    Q(
      "evt_cuped",
      (s, d) => {
        val cut = lit("2024-01-16").cast("timestamp")
        val e = eventsUs(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(
            sum(when(col("ts") < cut, floor(col("value") * 100).cast("long"))
              .otherwise(0L)).as("pre"),
            sum(when(col("ts") >= cut, floor(col("value") * 100).cast("long"))
              .otherwise(0L)).as("post"))
        val pu = e.select(col("user_id")).distinct()
          .join(p, Seq("user_id"), "left")
          .select((col("user_id") % 2).as("arm"),
            coalesce(col("pre"), lit(0L)).as("pre"),
            coalesce(col("post"), lit(0L)).as("post"))
        def dec38(c: Column) =
          c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val sums = pu.agg(
          count(lit(1)).as("n"),
          sum("pre").as("sp"), sum("post").as("ss"),
          sum(col("pre") * col("pre")).as("spp"),
          sum(col("post") * col("post")).as("sss"),
          sum(col("pre") * col("post")).as("sps"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("pre")).otherwise(0L)).as("sp0"),
          sum(when(col("arm") === 1, col("pre")).otherwise(0L)).as("sp1"),
          sum(when(col("arm") === 0, col("post")).otherwise(0L)).as("ss0"),
          sum(when(col("arm") === 1, col("post")).otherwise(0L)).as("ss1"))
        sums
          .withColumn("num",
            (dec38(col("n")) * dec38(col("sps")) -
              dec38(col("sp")) * dec38(col("ss"))).cast("double"))
          .withColumn("d1",
            (dec38(col("n")) * dec38(col("spp")) -
              dec38(col("sp")) * dec38(col("sp"))).cast("double"))
          .withColumn("d2",
            (dec38(col("n")) * dec38(col("sss")) -
              dec38(col("ss")) * dec38(col("ss"))).cast("double"))
          .withColumn("theta", col("num") / col("d1"))
          .withColumn("rho", col("num") / sqrt(col("d1") * col("d2")))
          .withColumn("mean_pre", col("sp").cast("double") / col("n").cast("double"))
          .withColumn("mean_post_a",
            col("ss0").cast("double") / col("n0").cast("double") / 100.0)
          .withColumn("mean_post_b",
            col("ss1").cast("double") / col("n1").cast("double") / 100.0)
          .withColumn("mean_adj_a",
            (col("ss0").cast("double") - col("theta") *
              (col("sp0").cast("double") - col("n0").cast("double") * col("mean_pre"))) /
              col("n0").cast("double") / 100.0)
          .withColumn("mean_adj_b",
            (col("ss1").cast("double") - col("theta") *
              (col("sp1").cast("double") - col("n1").cast("double") * col("mean_pre"))) /
              col("n1").cast("double") / 100.0)
          .select(col("n0"), col("n1"), col("theta"),
            col("mean_post_a"), col("mean_post_b"),
            (col("mean_post_b") - col("mean_post_a")).as("diff_raw"),
            col("mean_adj_a"), col("mean_adj_b"),
            (col("mean_adj_b") - col("mean_adj_a")).as("diff_cuped"),
            (col("rho") * col("rho")).as("var_reduction"))
      },
      Some(s"""WITH p AS (
              |  SELECT user_id,
              |    CAST(sum(CASE WHEN $sqlTs < TIMESTAMP '2024-01-16'
              |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS pre,
              |    CAST(sum(CASE WHEN $sqlTs >= TIMESTAMP '2024-01-16'
              |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS post
              |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
              |pu AS (
              |  SELECT u.user_id % 2 AS arm,
              |         coalesce(p.pre, 0) AS pre, coalesce(p.post, 0) AS post
              |  FROM (SELECT DISTINCT user_id FROM events) u
              |  LEFT JOIN p USING (user_id)),
              |sums AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(pre) AS BIGINT) AS sp, CAST(sum(post) AS BIGINT) AS ss,
              |    CAST(sum(pre * pre) AS BIGINT) AS spp,
              |    CAST(sum(post * post) AS BIGINT) AS sss,
              |    CAST(sum(pre * post) AS BIGINT) AS sps,
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              |    CAST(sum(CASE WHEN arm = 0 THEN pre ELSE 0 END) AS BIGINT) AS sp0,
              |    CAST(sum(CASE WHEN arm = 1 THEN pre ELSE 0 END) AS BIGINT) AS sp1,
              |    CAST(sum(CASE WHEN arm = 0 THEN post ELSE 0 END) AS BIGINT) AS ss0,
              |    CAST(sum(CASE WHEN arm = 1 THEN post ELSE 0 END) AS BIGINT) AS ss1
              |  FROM pu),
              |m1 AS (
              |  SELECT *,
              |    CAST(CAST(n AS HUGEINT) * sps - CAST(sp AS HUGEINT) * ss AS DOUBLE) AS num,
              |    CAST(CAST(n AS HUGEINT) * spp - CAST(sp AS HUGEINT) * sp AS DOUBLE) AS d1,
              |    CAST(CAST(n AS HUGEINT) * sss - CAST(ss AS HUGEINT) * ss AS DOUBLE) AS d2
              |  FROM sums),
              |m2 AS (
              |  SELECT *, num / d1 AS theta, num / sqrt(d1 * d2) AS rho,
              |    CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS mean_pre
              |  FROM m1),
              |m3 AS (
              |  SELECT *,
              |    CAST(ss0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0 AS mean_post_a,
              |    CAST(ss1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS mean_post_b,
              |    (CAST(ss0 AS DOUBLE) - theta *
              |      (CAST(sp0 AS DOUBLE) - CAST(n0 AS DOUBLE) * mean_pre)) /
              |      CAST(n0 AS DOUBLE) / 100.0 AS mean_adj_a,
              |    (CAST(ss1 AS DOUBLE) - theta *
              |      (CAST(sp1 AS DOUBLE) - CAST(n1 AS DOUBLE) * mean_pre)) /
              |      CAST(n1 AS DOUBLE) / 100.0 AS mean_adj_b
              |  FROM m2)
              |SELECT n0, n1, theta, mean_post_a, mean_post_b,
              |  mean_post_b - mean_post_a AS diff_raw,
              |  mean_adj_a, mean_adj_b,
              |  mean_adj_b - mean_adj_a AS diff_cuped,
              |  rho * rho AS var_reduction
              |FROM m3""".stripMargin)
    ),

    // ── Kaplan–Meier survival curve (signup → first purchase) ──────────
    // The churn/conversion-lag estimator: for the cohort of users with a
    // signup, time-to-event is days from FIRST signup to FIRST purchase
    // at-or-after it; users who never convert are right-censored at the
    // study end (global max event date). At each distinct duration t:
    // d_t events, c_t censorings, n_t at-risk (computed by one
    // cumulative window over the duration-grouped table — never a
    // per-t rescan), and S(t) = Π_{t_i ≤ t} (1 − d_i/n_i). The product
    // is a SEQUENTIAL left fold over ≤(study-days) ordered rows — Spark
    // folds it in one sorted-group iterator (the evt_ema shape) emitting
    // each prefix product incrementally; the oracle recomputes every
    // prefix with list_reduce over the same ordered factor list, which
    // performs the IDENTICAL left-multiplication sequence → bit-equal.
    Q(
      "evt_survival_km",
      (s, d) => {
        import s.implicits._
        val e = eventsUs(s, d)
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts").cast("date")).as("sd"))
        val endDay = e.agg(max(col("ts").cast("date")).as("ed"))
        val pu = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").cast("date").as("pd"))
        val firstP = su.join(pu, Seq("user_id"), "left")
          .filter(col("pd").isNull || col("pd") >= col("sd"))
          .groupBy("user_id", "sd").agg(min("pd").as("fp"))
        // users whose only purchases precede signup are censored too:
        // re-join the full cohort so they aren't dropped by the filter
        val cohort = su.join(firstP.select(col("user_id"), col("fp")),
            Seq("user_id"), "left")
          .crossJoin(broadcast(endDay))
          .select(col("user_id"),
            when(col("fp").isNotNull, datediff(col("fp"), col("sd")))
              .otherwise(datediff(col("ed"), col("sd"))).as("dur"),
            when(col("fp").isNotNull, 1L).otherwise(0L).as("ev"))
        val times = cohort.groupBy("dur")
          .agg(sum("ev").as("d"), sum(lit(1L) - col("ev")).as("c"))
        val wCum = Window.orderBy("dur")
          .rowsBetween(Window.unboundedPreceding, -1)
        val tot = times.agg(sum(col("d") + col("c")).as("tot"))
        val atRisk = times.crossJoin(broadcast(tot))
          .withColumn("n", col("tot") -
            coalesce(sum(col("d") + col("c")).over(wCum), lit(0L)))
        atRisk.select(col("dur"), col("d"), col("c"), col("n"))
          .as[(Int, Long, Long, Long)]
          .groupByKey(_ => 0)
          .flatMapSortedGroups(col("dur")) { (_, it) =>
            var surv = 1.0
            it.map { case (dur, dd, cc, nn) =>
              surv = surv * (1.0 - dd.toDouble / nn.toDouble)
              (dur, dd, cc, nn, surv)
            }
          }
          .toDF("t_days", "n_events", "n_censored", "n_risk", "survival")
          .orderBy("t_days")
      },
      Some(s"""WITH su AS (
              |  SELECT user_id, min(CAST($sqlTs AS DATE)) AS sd
              |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
              |ed AS (SELECT max(CAST($sqlTs AS DATE)) AS ed FROM events),
              |pu AS (
              |  SELECT user_id, CAST($sqlTs AS DATE) AS pd
              |  FROM events WHERE event_type = 'purchase'),
              |firstp AS (
              |  SELECT su.user_id, min(pu.pd) AS fp
              |  FROM su LEFT JOIN pu ON pu.user_id = su.user_id AND pu.pd >= su.sd
              |  GROUP BY su.user_id),
              |cohort AS (
              |  SELECT su.user_id,
              |    CASE WHEN f.fp IS NOT NULL THEN datediff('day', su.sd, f.fp)
              |         ELSE datediff('day', su.sd, ed.ed) END AS dur,
              |    CASE WHEN f.fp IS NOT NULL THEN 1 ELSE 0 END AS ev
              |  FROM su JOIN firstp f ON f.user_id = su.user_id CROSS JOIN ed),
              |times AS (
              |  SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
              |         CAST(sum(1 - ev) AS BIGINT) AS c
              |  FROM cohort GROUP BY dur),
              |atrisk AS (
              |  SELECT dur, d, c,
              |    (SELECT CAST(count(*) AS BIGINT) FROM cohort) -
              |      CAST(coalesce(sum(d + c) OVER (ORDER BY dur
              |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              |      AS n
              |  FROM times),
              |seq AS (
              |  SELECT list(struct_pack(dur := dur, d := d, c := c, n := n)
              |    ORDER BY dur) AS sq
              |  FROM atrisk)
              |SELECT sq[CAST(i AS INT)].dur AS t_days,
              |  sq[CAST(i AS INT)].d AS n_events,
              |  sq[CAST(i AS INT)].c AS n_censored,
              |  sq[CAST(i AS INT)].n AS n_risk,
              |  list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
              |    list_transform(sq[1:CAST(i AS INT)],
              |      e -> 1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE))),
              |    (acc, x) -> acc * x) AS survival
              |FROM seq, LATERAL unnest(range(1, len(sq) + 1)) AS t(i)
              |ORDER BY t_days""".stripMargin)
    ),

    // ── seasonal/trend strength (Hyndman tsfeatures, classical STL) ────
    // The two features that tell a forecaster WHICH model the series
    // needs: F_trend = max(0, 1 − Var(R)/Var(T+R)) and F_seasonal =
    // max(0, 1 − Var(R)/Var(S+R)) from a classical decomposition —
    // T = centered 7-day moving average (full windows only), S =
    // day-of-week means of the detrended series, R the remainder. The
    // decomposition is pure windows + one group-by; every intermediate
    // double derives deterministically from exact µunit BIGINTs, and
    // each variance input is floor-µquantized BEFORE the Σ/Σ² sums so
    // the aggregation is order-free BIGINT (the repo's float-fold
    // rule). One row out, every strength one final double expression.
    Q(
      "evt_seasonal_strength",
      (s, d) => {
        val daily = eventsUs(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(col("ts").cast("date").as("day"))
          .agg(sum(floor(col("value") * 1000000).cast("long")).as("xu"))
        val w7 = Window.orderBy("day").rowsBetween(-3, 3)
        val dec0 = daily
          .withColumn("s7", sum("xu").over(w7))
          .withColumn("c7", count(lit(1)).over(w7))
          .filter(col("c7") === 7)
          .withColumn("x", col("xu").cast("double") / 1e6)
          .withColumn("t", col("s7").cast("double") / 7.0 / 1e6)
          .withColumn("dq", floor((col("x") - col("t")) * 1e6).cast("long"))
          .withColumn("dow", dayofweek(col("day")))
          .transform(GenSnap.snap) // the dow means and the variances share it
        val sdow = dec0.groupBy("dow")
          .agg(sum("dq").as("sd"), count(lit(1)).as("cd"))
          .select(col("dow"),
            (col("sd").cast("double") / col("cd").cast("double") / 1e6).as("sv"))
        // variance inputs quantized to CENTS and the square-sums ridden
        // through DECIMAL(38,0)/HUGEINT: daily totals reach ~1.6e7 cents
        // at sf0.1, whose squares overflow BIGINT sums at larger sf
        def dec38(c: Column) =
          c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val terms = dec0.join(broadcast(sdow), "dow")
          .withColumn("r", col("dq").cast("double") / 1e6 - col("sv"))
          .select(
            floor(col("r") * 100).cast("long").as("rq"),
            floor((col("sv") + col("r")) * 100).cast("long").as("srq"),
            floor((col("t") + col("r")) * 100).cast("long").as("trq"))
        val agg = terms.agg(count(lit(1)).as("n"),
          sum("rq").as("s_r"), sum(dec38(col("rq")) * dec38(col("rq"))).as("ss_r"),
          sum("srq").as("s_sr"), sum(dec38(col("srq")) * dec38(col("srq"))).as("ss_sr"),
          sum("trq").as("s_tr"), sum(dec38(col("trq")) * dec38(col("trq"))).as("ss_tr"))
        def vr(ss: String, sg: String) =
          (col(ss).cast("double") / col("n").cast("double") -
            (col(sg).cast("double") / col("n").cast("double")) *
              (col(sg).cast("double") / col("n").cast("double"))) / 1e4
        agg.select(col("n").as("n_days"),
            vr("ss_r", "s_r").as("var_r"),
            vr("ss_sr", "s_sr").as("var_sr"),
            vr("ss_tr", "s_tr").as("var_tr"))
          .select(col("n_days"), col("var_r"),
            greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_tr"))
              .as("f_trend"),
            greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_sr"))
              .as("f_seasonal"))
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST($sqlTs AS DATE) AS day,
              |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS xu
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
              |ma AS (
              |  SELECT day, xu,
              |    CAST(sum(xu) OVER w AS BIGINT) AS s7,
              |    count(*) OVER w AS c7
              |  FROM daily
              |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              |dec0 AS MATERIALIZED (
              |  SELECT day, CAST(xu AS DOUBLE) / 1e6 AS x,
              |    CAST(s7 AS DOUBLE) / 7.0 / 1e6 AS t,
              |    CAST(floor((CAST(xu AS DOUBLE) / 1e6 -
              |      CAST(s7 AS DOUBLE) / 7.0 / 1e6) * 1e6) AS BIGINT) AS dq,
              |    dayofweek(day) + 1 AS dow
              |  FROM ma WHERE c7 = 7),
              |sdow AS (
              |  SELECT dow,
              |    CAST(sum(dq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6 AS sv
              |  FROM dec0 GROUP BY dow),
              |terms AS (
              |  SELECT
              |    CAST(floor((CAST(dq AS DOUBLE) / 1e6 - sv) * 100) AS BIGINT) AS rq,
              |    CAST(floor((sv + (CAST(dq AS DOUBLE) / 1e6 - sv)) * 100) AS BIGINT) AS srq,
              |    CAST(floor((t + (CAST(dq AS DOUBLE) / 1e6 - sv)) * 100) AS BIGINT) AS trq
              |  FROM dec0 JOIN sdow USING (dow)),
              |agg AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(rq) AS BIGINT) AS s_r,
              |    sum(CAST(rq AS HUGEINT) * rq) AS ss_r,
              |    CAST(sum(srq) AS BIGINT) AS s_sr,
              |    sum(CAST(srq AS HUGEINT) * srq) AS ss_sr,
              |    CAST(sum(trq) AS BIGINT) AS s_tr,
              |    sum(CAST(trq AS HUGEINT) * trq) AS ss_tr
              |  FROM terms),
              |vars AS (
              |  SELECT n AS n_days,
              |    (CAST(ss_r AS DOUBLE) / CAST(n AS DOUBLE) -
              |      (CAST(s_r AS DOUBLE) / CAST(n AS DOUBLE)) *
              |      (CAST(s_r AS DOUBLE) / CAST(n AS DOUBLE))) / 1e4 AS var_r,
              |    (CAST(ss_sr AS DOUBLE) / CAST(n AS DOUBLE) -
              |      (CAST(s_sr AS DOUBLE) / CAST(n AS DOUBLE)) *
              |      (CAST(s_sr AS DOUBLE) / CAST(n AS DOUBLE))) / 1e4 AS var_sr,
              |    (CAST(ss_tr AS DOUBLE) / CAST(n AS DOUBLE) -
              |      (CAST(s_tr AS DOUBLE) / CAST(n AS DOUBLE)) *
              |      (CAST(s_tr AS DOUBLE) / CAST(n AS DOUBLE))) / 1e4 AS var_tr
              |  FROM agg)
              |SELECT n_days, var_r,
              |  greatest(0.0, 1.0 - var_r / var_tr) AS f_trend,
              |  greatest(0.0, 1.0 - var_r / var_sr) AS f_seasonal
              |FROM vars""".stripMargin)
    ),

    // ── two-state burst detection (Kleinberg 2002, batched form) ───────
    // Which days are BURSTS? A two-state hidden process over the daily
    // purchase-count series: state 0 emits at the base rate λ₀ = N/n,
    // state 1 at λ₁ = 1.15·λ₀ (a 15% lift with entry cost γ = 0.5 — sensible
    // sensitivity knobs for a daily retail series; Kleinberg's s and γ); day costs are the Poisson NLL differences
    // λ_s − x·ln λ_s (the x! term is state-independent and drops),
    //  Costs are floor-quantized to
    // the 2^-20 grid THROUGH THE SAME Spark log()/DuckDB ln() path every
    // entropy/idf query already drives bit-identically; after that the
    // Viterbi forward pass, backpointers, and backtrack are PURE BIGINT
    // min-plus — zero float anywhere in the DP. Spark runs the integer
    // DP at the driver over the collected ≤366-row cost series (a
    // bounded calendar boundary, the vec_pca_power convention); the
    // oracle replays forward AND backward as recursive CTEs. Ties break
    // to state 0 everywhere — deterministic.
    Q(
      "evt_burst_detect",
      (s, d) => {
        val daily = eventsUs(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("x"))
        val tot = daily.agg(sum("x").as("nn"), count(lit(1)).as("n"))
        val l0 = col("nn").cast("double") / col("n").cast("double")
        val l1 = lit(1.15) * (col("nn").cast("double") / col("n").cast("double"))
        val costs = daily.crossJoin(broadcast(tot))
          .select(col("day"), col("x"),
            floor((l0 - col("x").cast("double") * log(l0)) * 1048576.0)
              .cast("long").as("c0"),
            floor((l1 - col("x").cast("double") * log(l1)) * 1048576.0)
              .cast("long").as("c1"))
          .orderBy("day")
          .collect() // bounded: one row per calendar day (≤366)
          .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        val gq = 524288L
        val far = 1000000000000000L
        // forward pass with backpointers, ties to state 0
        var d0 = 0L; var d1 = far
        val bps = costs.map { case (_, _, c0, c1) =>
          val bp0 = if (d0 <= d1) 0 else 1
          val bp1 = if (d0 + gq <= d1) 0 else 1
          val nd0 = c0 + math.min(d0, d1)
          val nd1 = c1 + math.min(d0 + gq, d1)
          d0 = nd0; d1 = nd1
          (bp0, bp1)
        }
        var st = if (d0 <= d1) 0 else 1
        val states = new Array[Int](costs.length)
        var i = costs.length - 1
        while (i >= 0) {
          states(i) = st
          st = if (st == 0) bps(i)._1 else bps(i)._2
          i -= 1
        }
        import s.implicits._
        costs.zip(states).map { case ((day, x, _, _), stt) =>
          (day, x, stt, stt == 1)
        }.toSeq.toDF("day", "x", "state", "burst").orderBy("day")
      },
      Some(s"""WITH RECURSIVE daily AS (
              |  SELECT CAST($sqlTs AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
              |tot AS (SELECT CAST(sum(x) AS BIGINT) AS nn,
              |               CAST(count(*) AS BIGINT) AS n FROM daily),
              |costs AS MATERIALIZED (
              |  SELECT day, x,
              |    CAST(floor(((CAST(nn AS DOUBLE) / CAST(n AS DOUBLE)) -
              |      CAST(x AS DOUBLE) * ln(CAST(nn AS DOUBLE) / CAST(n AS DOUBLE)))
              |      * 1048576) AS BIGINT) AS c0,
              |    CAST(floor(((1.15 * (CAST(nn AS DOUBLE) / CAST(n AS DOUBLE))) -
              |      CAST(x AS DOUBLE) * ln(1.15 * (CAST(nn AS DOUBLE) / CAST(n AS DOUBLE))))
              |      * 1048576) AS BIGINT) AS c1,
              |    row_number() OVER (ORDER BY day) AS t
              |  FROM daily CROSS JOIN tot),
              |fwd(t, d0, d1, bp0, bp1) AS (
              |  SELECT 0, CAST(0 AS BIGINT), CAST(1000000000000000 AS BIGINT), 0, 0
              |  UNION ALL
              |  SELECT c.t,
              |    c.c0 + least(f.d0, f.d1),
              |    c.c1 + least(f.d0 + 524288, f.d1),
              |    CASE WHEN f.d0 <= f.d1 THEN 0 ELSE 1 END,
              |    CASE WHEN f.d0 + 524288 <= f.d1 THEN 0 ELSE 1 END
              |  FROM fwd f JOIN costs c ON c.t = f.t + 1),
              |back(t, s) AS (
              |  SELECT t, CASE WHEN d0 <= d1 THEN 0 ELSE 1 END
              |  FROM fwd WHERE t = (SELECT max(t) FROM costs)
              |  UNION ALL
              |  SELECT b.t - 1, CASE WHEN b.s = 0 THEN f.bp0 ELSE f.bp1 END
              |  FROM back b JOIN fwd f ON f.t = b.t
              |  WHERE b.t > 1)
              |SELECT c.day, c.x, b.s AS state, b.s = 1 AS burst
              |FROM costs c JOIN back b ON b.t = c.t
              |ORDER BY day""".stripMargin)
    ),

    // ── changepoint detection by binary segmentation ───────────────────
    // The OFFLINE changepoint finder next to the online CUSUM monitor:
    // on the daily purchase-revenue series, split at the t maximizing
    // the scaled CUSUM statistic |L·P_t − t_rel·S| (the |prefix −
    // expected-under-no-change| distance cleared of its division by L —
    // pure BIGINT, argmax with the (stat desc, rn asc) deterministic
    // tie), then recurse once into each half — three reported splits
    // with exact before/after segment means. Both engines run the
    // IDENTICAL two-level plan: prefix sums in one window, each level
    // one argmax-by-row_number over a bounded segment set. At scale
    // levels are sequential but each level is one parallel pass over
    // (segment × day) rows; depth is the log of the segment budget.
    Q(
      "evt_changepoint_binseg",
      (s, d) => {
        val daily = eventsUs(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(col("ts").cast("date").as("day"))
          .agg(sum(floor(col("value") * 1000000).cast("long")).as("q"))
        val dd = daily
          .withColumn("rn", row_number().over(Window.orderBy("day")))
          .withColumn("c", sum("q").over(
            Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)))
          .transform(GenSnap.snap) // small: one row per day; read per level
        val tot = dd.agg(max("rn").as("n"), max("c").as("s"))
        // level 0: the whole series is one segment [1, n]
        val seg0 = tot.select(lit(0).as("level"), lit(1L).as("lo"),
          col("n").cast("long").as("hi"))
        def split(segs: DataFrame): DataFrame = {
          val bounds = segs
            .join(dd.select(col("rn").as("lo_m1"), col("c").as("cb")),
              col("lo_m1") === col("lo") - 1, "left")
            .select(col("level"), col("lo"), col("hi"),
              coalesce(col("cb"), lit(0L)).as("cb"))
          val cands = bounds.join(dd,
              col("rn") >= col("lo") && col("rn") < col("hi"))
            .join(dd.select(col("rn").as("hi_rn"), col("c").as("ch")),
              col("hi_rn") === col("hi"))
            .withColumn("len", col("hi") - col("lo") + 1)
            .withColumn("sseg", col("ch") - col("cb"))
            .withColumn("pt", col("c") - col("cb"))
            .withColumn("trel", col("rn") - col("lo") + 1)
            .withColumn("stat",
              abs(col("len") * col("pt") - col("trel") * col("sseg")))
          cands.withColumn("rk", row_number().over(
              Window.partitionBy("level", "lo", "hi")
                .orderBy(col("stat").desc, col("rn").asc)))
            .filter(col("rk") === 1)
            .select(col("level"), col("lo"), col("hi"), col("rn").as("t"),
              col("day").as("split_day"),
              (col("pt").cast("double") / col("trel").cast("double") / 1e6)
                .as("mean_before"),
              ((col("sseg") - col("pt")).cast("double") /
                (col("hi") - col("rn")).cast("double") / 1e6).as("mean_after"))
        }
        val s0 = split(seg0).transform(GenSnap.snap)
        val segs1 = s0.select(lit(1).as("level"), col("lo"), col("t").as("hi"))
          .unionByName(s0.crossJoin(broadcast(tot))
            .select(lit(1).as("level"), (col("t") + 1).as("lo"),
              col("n").cast("long").as("hi")))
          .filter(col("hi") - col("lo") >= 1)
        val s1 = split(segs1)
        s0.unionByName(s1)
          .join(dd.select(col("rn").as("lo"), col("day").as("start_day")), "lo")
          .join(dd.select(col("rn").as("hi"), col("day").as("end_day")), "hi")
          .select(col("level"), col("start_day"), col("end_day"),
            col("split_day"), col("mean_before"), col("mean_after"))
          .orderBy("level", "start_day")
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST($sqlTs AS DATE) AS day,
              |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS q
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
              |dd AS MATERIALIZED (
              |  SELECT day, q,
              |    row_number() OVER (ORDER BY day) AS rn,
              |    CAST(sum(q) OVER (ORDER BY day
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
              |  FROM daily),
              |tot AS (SELECT max(rn) AS n, max(c) AS s FROM dd),
              |seg0 AS (SELECT 0 AS level, CAST(1 AS BIGINT) AS lo,
              |                CAST(n AS BIGINT) AS hi FROM tot),
              |s0 AS (
              |  SELECT level, lo, hi, rn AS t, day AS split_day,
              |    CAST(pt AS DOUBLE) / CAST(trel AS DOUBLE) / 1e6 AS mean_before,
              |    CAST(sseg - pt AS DOUBLE) / CAST(hi - rn AS DOUBLE) / 1e6 AS mean_after
              |  FROM (
              |    SELECT b.level, b.lo, b.hi, d.rn, d.day,
              |      b.hi - b.lo + 1 AS len, ch.c - b.cb AS sseg,
              |      d.c - b.cb AS pt, d.rn - b.lo + 1 AS trel,
              |      row_number() OVER (PARTITION BY b.level, b.lo, b.hi
              |        ORDER BY abs((b.hi - b.lo + 1) * (d.c - b.cb) -
              |                     (d.rn - b.lo + 1) * (ch.c - b.cb)) DESC,
              |          d.rn ASC) AS rk
              |    FROM (SELECT g.level, g.lo, g.hi, coalesce(p.c, 0) AS cb
              |          FROM seg0 g LEFT JOIN dd p ON p.rn = g.lo - 1) b
              |    JOIN dd d ON d.rn >= b.lo AND d.rn < b.hi
              |    JOIN dd ch ON ch.rn = b.hi)
              |  WHERE rk = 1),
              |segs1 AS (
              |  SELECT 1 AS level, lo, t AS hi FROM s0
              |  UNION ALL
              |  SELECT 1, t + 1, CAST(n AS BIGINT) FROM s0, tot),
              |s1 AS (
              |  SELECT level, lo, hi, rn AS t, day AS split_day,
              |    CAST(pt AS DOUBLE) / CAST(trel AS DOUBLE) / 1e6 AS mean_before,
              |    CAST(sseg - pt AS DOUBLE) / CAST(hi - rn AS DOUBLE) / 1e6 AS mean_after
              |  FROM (
              |    SELECT b.level, b.lo, b.hi, d.rn, d.day,
              |      b.hi - b.lo + 1 AS len, ch.c - b.cb AS sseg,
              |      d.c - b.cb AS pt, d.rn - b.lo + 1 AS trel,
              |      row_number() OVER (PARTITION BY b.level, b.lo, b.hi
              |        ORDER BY abs((b.hi - b.lo + 1) * (d.c - b.cb) -
              |                     (d.rn - b.lo + 1) * (ch.c - b.cb)) DESC,
              |          d.rn ASC) AS rk
              |    FROM (SELECT g.level, g.lo, g.hi, coalesce(p.c, 0) AS cb
              |          FROM (SELECT * FROM segs1 WHERE hi - lo >= 1) g
              |          LEFT JOIN dd p ON p.rn = g.lo - 1) b
              |    JOIN dd d ON d.rn >= b.lo AND d.rn < b.hi
              |    JOIN dd ch ON ch.rn = b.hi)
              |  WHERE rk = 1)
              |SELECT u.level, ds.day AS start_day, de.day AS end_day,
              |       u.split_day, u.mean_before, u.mean_after
              |FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1) u
              |JOIN dd ds ON ds.rn = u.lo
              |JOIN dd de ON de.rn = u.hi
              |ORDER BY level, start_day""".stripMargin)
    ),

    // ── LTTB time-series downsampling (Steinarsson 2013) ───────────────
    // Largest-Triangle-Three-Buckets — the downsampler every dashboard
    // pipeline runs before plotting: keep the first and last point,
    // split the interior into m−2 buckets, and in each bucket keep the
    // point forming the largest triangle with the PREVIOUSLY KEPT point
    // and the next bucket's centroid. The sequential dependence is
    // resolved RELATIONALLY: a transition table precomputes, for EVERY
    // candidate previous point, the bucket's argmax (area comparisons in
    // exact BIGINTs — the centroid division is cleared by multiplying
    // through by the next bucket's count, so |2·area·c| =
    // |(xp·c−sx)(yq−yp) − (xp−xq)(sy−yp·c)| and there is NO float
    // anywhere in the operator), then the kept path is an 8-step
    // equi-join follow — unrolled joins on Spark, a recursive CTE in the
    // oracle, both walking the IDENTICAL deterministic table
    // ((area desc, rn asc) tie order). Per-bucket candidate pairs are
    // (n/m)² — bounded; every step is an equi-join on (series, prev).
    Q(
      "evt_lttb_downsample",
      (s, d) => {
        val m = 10
        val daily = eventsUs(s, d)
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("y"))
        val wS = Window.partitionBy("event_type")
        val pts = daily
          .withColumn("n", count(lit(1)).over(wS))
          .filter(col("n") > 12)
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("day")))
          .withColumn("bucket",
            when(col("rn") === 1, 0)
              .when(col("rn") === col("n"), m - 1)
              .otherwise(lit(1) + expr(s"((rn - 2) * ${m - 2}) DIV (n - 2)")))
          .transform(GenSnap.snap) // read by nxt, trans, and both path ends
        val nxt = pts.filter(col("bucket") >= 2)
          .groupBy(col("event_type"), (col("bucket") - 1).as("b"))
          .agg(count(lit(1)).as("c"), sum("rn").as("sx"), sum("y").as("sy"))
        val prevSide = pts.filter(col("bucket") <= m - 2)
          .select(col("event_type"), (col("bucket") + 1).as("b"),
            col("rn").as("prn"), col("rn").as("xp"), col("y").as("yp"))
        val candSide = pts.filter(col("bucket").between(1, m - 2))
          .select(col("event_type"), col("bucket").as("b"), col("rn").as("qrn"),
            col("day").as("qday"), col("y").as("qy"))
        val trans = prevSide.join(candSide, Seq("event_type", "b"))
          .join(nxt, Seq("event_type", "b"))
          .withColumn("area2c",
            abs((col("xp") * col("c") - col("sx")) * (col("qy") - col("yp")) -
              (col("xp") - col("qrn")) * (col("sy") - col("yp") * col("c"))))
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type", "b", "prn")
              .orderBy(col("area2c").desc, col("qrn").asc)))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("b"), col("prn"), col("qrn"),
            col("qday"), col("qy"))
          .transform(GenSnap.snap) // walked 8 times below
        var sel = pts.filter(col("bucket") === 0)
          .select(col("event_type"), col("rn"), col("day"), col("y"),
            lit(0).as("seq"))
        var cur = sel.select(col("event_type"), col("rn"))
        (1 to m - 2).foreach { b =>
          val step = cur
            .join(trans.filter(col("b") === b), Seq("event_type"))
            .filter(col("prn") === col("rn"))
            .select(col("event_type"), col("qrn").as("rn"),
              col("qday").as("day"), col("qy").as("y"), lit(b).as("seq"))
          sel = sel.unionByName(step)
          cur = step.select(col("event_type"), col("rn"))
        }
        sel.unionByName(pts.filter(col("bucket") === m - 1)
            .select(col("event_type"), col("rn"), col("day"), col("y"),
              lit(m - 1).as("seq")))
          .select(col("event_type"), col("seq"), col("day"), col("y"))
          .orderBy("event_type", "seq")
      },
      Some(s"""WITH RECURSIVE daily AS (
              |  SELECT event_type, CAST($sqlTs AS DATE) AS day,
              |         CAST(count(*) AS BIGINT) AS y
              |  FROM events GROUP BY 1, 2),
              |pts AS MATERIALIZED (
              |  SELECT event_type, day, y, rn, n,
              |    CASE WHEN rn = 1 THEN 0
              |         WHEN rn = n THEN 9
              |         ELSE 1 + ((rn - 2) * 8) // (n - 2) END AS bucket
              |  FROM (
              |    SELECT event_type, day, y,
              |      row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
              |      count(*) OVER (PARTITION BY event_type) AS n
              |    FROM daily)
              |  WHERE n > 12),
              |nxt AS (
              |  SELECT event_type, bucket - 1 AS b, CAST(count(*) AS BIGINT) AS c,
              |         CAST(sum(rn) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
              |  FROM pts WHERE bucket >= 2 GROUP BY 1, 2),
              |trans AS MATERIALIZED (
              |  SELECT event_type, b, prn, qrn, qday, qy FROM (
              |    SELECT p.event_type, cand.b, p.rn AS prn, cand.qrn, cand.qday, cand.qy,
              |      row_number() OVER (PARTITION BY p.event_type, cand.b, p.rn
              |        ORDER BY abs((p.rn * n.c - n.sx) * (cand.qy - p.y) -
              |                     (p.rn - cand.qrn) * (n.sy - p.y * n.c)) DESC,
              |          cand.qrn ASC) AS rk
              |    FROM pts p
              |    JOIN (SELECT event_type, bucket AS b, rn AS qrn, day AS qday,
              |                 y AS qy
              |          FROM pts WHERE bucket BETWEEN 1 AND 8) cand
              |      ON cand.event_type = p.event_type AND cand.b = p.bucket + 1
              |    JOIN nxt n ON n.event_type = p.event_type AND n.b = cand.b
              |    WHERE p.bucket <= 8)
              |  WHERE rk = 1),
              |path(event_type, b, rn, day, y) AS (
              |  SELECT event_type, 0, rn, day, y FROM pts WHERE bucket = 0
              |  UNION ALL
              |  SELECT t.event_type, t.b, t.qrn, t.qday, t.qy
              |  FROM path p JOIN trans t
              |    ON t.event_type = p.event_type AND t.b = p.b + 1 AND t.prn = p.rn)
              |SELECT event_type, seq, day, y FROM (
              |  SELECT event_type, b AS seq, day, y FROM path
              |  UNION ALL
              |  SELECT event_type, 9, day, y FROM pts WHERE bucket = 9)
              |ORDER BY event_type, seq""".stripMargin)
    ),

    // ── Markov removal-effect attribution (Anderl et al. 2016) ─────────
    // Data-driven multi-touch attribution — the principled answer to the
    // first/last-touch heuristics in evt_attribution: model each user
    // journey (truncated at the first purchase, which absorbs; journeys
    // without one die at END) as a first-order Markov chain over event
    // types, then credit each channel by its REMOVAL EFFECT — how much
    // the start→purchase absorption probability drops when every
    // transition into that channel is redirected to END. Transition
    // counts are one distributed window pass (exact BIGINTs); the chain
    // itself is a ≤6×7 count matrix — a BOUNDED driver boundary (the
    // vec_pca_power convention) — and absorption probabilities come from
    // 60 synchronous Jacobi iterations p ← Qp + r, unrolled in the SAME
    // term order (click, error, signup, view, then r) in Scala and in
    // the oracle's recursive CTE, so every double is bit-identical.
    // Removing a channel zeroes q_{*,X}: IEEE-safe because acc + 0.0·p
    // ≡ acc for the non-negative values here.
    Q(
      "evt_markov_attribution",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val base = eventsUs(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("rn", row_number().over(w))
        val firstP = base.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("rn").as("prn"))
        val kept = base.join(firstP, Seq("user_id"), "left")
          .filter(col("prn").isNull || col("rn") <= col("prn"))
        val w2 = Window.partitionBy("user_id").orderBy("rn")
        val steps = kept
          .withColumn("src",
            coalesce(lag(col("event_type"), 1).over(w2), lit("START")))
          .select(col("src"), col("event_type").as("dst"))
        val lastRn = kept.groupBy("user_id").agg(max("rn").as("mrn"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("hasp"))
        val ends = kept.join(lastRn, "user_id")
          .filter(col("rn") === col("mrn") && col("hasp") === 0)
          .select(col("event_type").as("src"), lit("END").as("dst"))
        val cnts = steps.unionByName(ends)
          .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
          .collect() // bounded: ≤ 6 src × 7 dst transition-type pairs
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
        val trans = Seq("START", "click", "error", "signup", "view")
        val chans = Seq("click", "error", "signup", "view")
        val tot: Map[String, Long] =
          trans.map(f => f -> cnts.collect { case ((`f`, _), c) => c }.sum).toMap
        def q(f: String, x: String, removed: Option[String]): Double =
          if (tot(f) == 0L || removed.contains(x)) 0.0
          else cnts.getOrElse((f, x), 0L).toDouble / tot(f).toDouble
        def absorb(removed: Option[String]): Double = {
          var p = chans.map(_ -> 0.0).toMap
          var pStart = 0.0
          var it = 0
          while (it < 60) {
            val nxt = trans.map { f =>
              var acc = 0.0
              chans.foreach(x => acc = acc + q(f, x, removed) * p.getOrElse(x, 0.0))
              acc = acc + q(f, "purchase", removed)
              f -> acc
            }.toMap
            pStart = nxt("START")
            p = nxt.filterKeys(chans.contains).toMap
            it += 1
          }
          pStart
        }
        val pBase = absorb(None)
        val removedP = chans.map(c => c -> absorb(Some(c))).toMap
        val effects = chans.map(c => pBase - removedP(c))
        var sEff = 0.0
        effects.foreach(e => sEff = sEff + e)
        val rows = chans.zip(effects).map { case (c, e) =>
          (c, pBase, removedP(c), e,
            if (sEff > 0.0) Some(e / sEff) else None)
        }
        import s.implicits._
        rows.toDF("channel", "p_base", "p_removed", "removal_effect",
            "attribution_share")
          .select(col("channel"), col("p_base"), col("p_removed"),
            col("removal_effect"),
            col("attribution_share").cast("double").as("attribution_share"))
          .orderBy("channel")
      },
      Some {
        val trans = Seq("START", "click", "error", "signup", "view")
        val chans = Seq("click", "error", "signup", "view")
        val key = Map("START" -> "s", "click" -> "c", "error" -> "e",
          "signup" -> "g", "view" -> "v")
        // one-row q matrix: q_<f>_<x> plus absorption r_<f>
        val qCols = trans.flatMap { f =>
          (chans :+ "purchase").map { x =>
            val cnt = s"coalesce(max(CASE WHEN src = '$f' AND dst = '$x' THEN cnt END), 0)"
            val t = s"coalesce(sum(CASE WHEN src = '$f' THEN cnt END), 0)"
            val nm = if (x == "purchase") s"r_${key(f)}" else s"q_${key(f)}_${key(x)}"
            s"CASE WHEN $t = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST($cnt AS DOUBLE) / CAST($t AS DOUBLE) END AS $nm"
          }
        }.mkString(",\n  ")
        def iterCte(name: String, removed: Option[String]): String = {
          val upd = trans.map { f =>
            val terms = chans.map { x =>
              val qn = if (removed.contains(x)) "0.0"
              else s"q.q_${key(f)}_${key(x)}"
              s"$qn * p_${key(x)}"
            } :+ s"q.r_${key(f)}"
            terms.mkString(" + ")
          }.mkString(",\n    ")
          s"""$name(it, p_s, p_c, p_e, p_g, p_v) AS (
             |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             |         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
             |  UNION ALL
             |  SELECT it + 1,
             |    $upd
             |  FROM $name, qrow q WHERE it < 60)""".stripMargin
        }
        val iters = (iterCte("it_base", None) +: chans.map(c =>
          iterCte(s"it_no${key(c)}", Some(c)))).mkString(",\n")
        val effSum = chans.map(c => s"(b.p_s - n${key(c)}.p_s)").mkString(" + ")
        val outRows = chans.map(c =>
          s"SELECT '$c' AS channel, b.p_s AS p_base, n${key(c)}.p_s AS p_removed, " +
            s"b.p_s - n${key(c)}.p_s AS removal_effect, " +
            s"CASE WHEN t.s > 0.0 THEN (b.p_s - n${key(c)}.p_s) / t.s END AS attribution_share " +
            s"FROM fb b, ${chans.map(x => s"f${key(x)} n${key(x)}").mkString(", ")}, teff t")
          .mkString("\nUNION ALL\n")
        s"""WITH RECURSIVE base AS (
           |  SELECT user_id, event_type,
           |    row_number() OVER (PARTITION BY user_id ORDER BY $sqlTs, event_id) AS rn
           |  FROM events),
           |firstp AS (
           |  SELECT user_id, min(rn) AS prn FROM base
           |  WHERE event_type = 'purchase' GROUP BY user_id),
           |kept AS (
           |  SELECT b.user_id, b.event_type, b.rn
           |  FROM base b LEFT JOIN firstp f USING (user_id)
           |  WHERE f.prn IS NULL OR b.rn <= f.prn),
           |steps AS (
           |  SELECT coalesce(lag(event_type) OVER
           |      (PARTITION BY user_id ORDER BY rn), 'START') AS src,
           |    event_type AS dst
           |  FROM kept),
           |lastr AS (
           |  SELECT user_id, max(rn) AS mrn,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hasp
           |  FROM kept GROUP BY user_id),
           |ends AS (
           |  SELECT k.event_type AS src, 'END' AS dst
           |  FROM kept k JOIN lastr l ON l.user_id = k.user_id
           |  WHERE k.rn = l.mrn AND l.hasp = 0),
           |tr AS (
           |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
           |    SELECT src, dst FROM steps UNION ALL SELECT src, dst FROM ends)
           |  GROUP BY src, dst),
           |qrow AS (
           |  SELECT
           |  $qCols
           |  FROM tr),
           |$iters,
           |fb AS (SELECT p_s FROM it_base WHERE it = 60),
           |${chans.map(c => s"f${key(c)} AS (SELECT p_s FROM it_no${key(c)} WHERE it = 60)").mkString(",\n")},
           |teff AS (
           |  SELECT $effSum AS s
           |  FROM fb b, ${chans.map(c => s"f${key(c)} n${key(c)}").mkString(", ")})
           |$outRows
           |ORDER BY channel""".stripMargin
      }
    )
  )

  /** The Holt–Winters level/trend fold over the daily purchase series —
    * shared by `evt_holt_winters` (the per-day report) and
    * `evt_forecast_accuracy` (the MASE eval): (epd, day_value, forecast,
    * residual, level, trend, rn), one row per day in day order. */
  private def holtWintersRows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = eventsUs(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .as("epd"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("xu"))
    daily.as[(Int, Long)]
      .groupByKey(_ => 0)
      .flatMapSortedGroups(col("epd")) { (_, it) =>
        var l = 0.0
        var b = 0.0
        var rn = 0
        it.map { case (epd, xu) =>
          rn += 1
          val x = xu.toDouble / 1000000
          val f = l + b
          val r = x - f
          val l2 = 0.5 * x + 0.5 * (l + b)
          val b2 = 0.5 * (l2 - l) + 0.5 * b
          l = l2; b = b2
          (epd, x, f, r, l2, b2, rn)
        }
      }
      .toDF("epd", "day_value", "forecast", "residual", "level", "trend", "rn")
  }

  /** The identical fold as DuckDB CTEs (daily rollup, indexed series,
    * recursive level/trend recurrence) — shared by both HW oracles. */
  private lazy val sqlHwCtes: String =
    s"""daily AS (
       |  SELECT CAST($sqlTs AS DATE) AS day,
       |    CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS xu
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |idx AS (
       |  SELECT day, CAST(xu AS DOUBLE) / 1000000 AS x,
       |    row_number() OVER (ORDER BY day) AS rn
       |  FROM daily),
       |hw(rn, day, x, l, b, f, r) AS (
       |  SELECT 0, DATE '1970-01-01', CAST(0.0 AS DOUBLE),
       |    CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |    CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
       |  UNION ALL
       |  SELECT i.rn, i.day, i.x,
       |    0.5 * i.x + 0.5 * (h.l + h.b),
       |    0.5 * ((0.5 * i.x + 0.5 * (h.l + h.b)) - h.l) + 0.5 * h.b,
       |    h.l + h.b,
       |    i.x - (h.l + h.b)
       |  FROM hw h JOIN idx i ON i.rn = h.rn + 1)""".stripMargin
}
