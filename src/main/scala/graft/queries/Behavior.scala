package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Behavior
import graft.queries.H.t

/** Behavioral / product-analytics queries over the events table —
  * ordered funnels, cohort retention, gap sessionization (the batch
  * companions to §2.9's session windows). All keyed on user_id: one
  * skew-free exchange each (see [[graft.ext.Behavior]] scale notes).
  */
object BehaviorQ {

  /** Strict-order conversion funnel view → click → purchase. Stage i
    * counts users whose earliest qualifying event is strictly after
    * their stage i-1 time. Conversion ratios are IEEE doubles of exact
    * longs (identical in both engines). The oracle chains the same
    * per-user window minima through nested CTEs.
    */
  val q62Funnel = Q(
    "q62_funnel",
    (s, dir) => {
      val e = t(s, dir, "events")
      val fu = Behavior.funnelTimes(e, "user_id", "ts", Seq(
        col("event_type") === "view",
        col("event_type") === "click",
        col("event_type") === "purchase"))
      fu.agg(
          count(lit(1)).cast("bigint").as("n_users"),
          count(col("t0")).cast("bigint").as("n_view"),
          count(col("t1")).cast("bigint").as("n_click"),
          count(col("t2")).cast("bigint").as("n_purchase"))
        .select(col("n_users"), col("n_view"), col("n_click"),
          col("n_purchase"),
          (col("n_view").cast("double") / col("n_users")).as("conv_view"),
          (col("n_click").cast("double") / col("n_view")).as("conv_click"),
          (col("n_purchase").cast("double") / col("n_click")).as("conv_purchase"))
    },
    Some("""WITH s0 AS (SELECT user_id, event_type, ts,
        min(CASE WHEN event_type = 'view' THEN ts END)
          OVER (PARTITION BY user_id) AS t0
        FROM events),
      s1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t0
          THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM s0),
      s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t1
          THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM s1),
      u AS (SELECT user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2
        FROM s2 GROUP BY user_id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(COUNT(t0) AS BIGINT) AS n_view,
        CAST(COUNT(t1) AS BIGINT) AS n_click,
        CAST(COUNT(t2) AS BIGINT) AS n_purchase,
        CAST(COUNT(t0) AS DOUBLE) / COUNT(*) AS conv_view,
        CAST(COUNT(t1) AS DOUBLE) / COUNT(t0) AS conv_click,
        CAST(COUNT(t2) AS DOUBLE) / COUNT(t1) AS conv_purchase
      FROM u"""),
    bench = true)

  /** Weekly cohort retention matrix (cohort = week of first event).
    * DuckDB's date_trunc('week', TIMESTAMP) yields DATE, so the oracle
    * casts back to TIMESTAMP to match Spark's type.
    */
  val q63Retention = Q(
    "q63_retention",
    (s, dir) => Behavior.cohortRetention(t(s, dir, "events"), "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset")),
    Some("""WITH f AS (SELECT user_id,
        CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id),
      sz AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM f GROUP BY cohort_week),
      a AS (SELECT e.user_id, f.cohort_week,
        CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS active_week
        FROM events e JOIN f ON f.user_id = e.user_id),
      g AS (SELECT cohort_week,
        CAST(date_diff('day', cohort_week, active_week) // 7 AS INT) AS week_offset,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM a GROUP BY 1, 2)
      SELECT g.cohort_week, g.week_offset, g.n_active, sz.cohort_size,
        CAST(g.n_active AS DOUBLE) / sz.cohort_size AS retention
      FROM g JOIN sz ON sz.cohort_week = g.cohort_week
      ORDER BY g.cohort_week, week_offset"""))

  /** Per-session stats from gap sessionization (5-minute gap): event
    * count, exact duration in microseconds, landing/exit event types
    * (row_number picks — no struct-keyed arg_min in DuckDB 1.0), and
    * purchase count. The landing/exit windows sort the same way the
    * session numbering does, so Catalyst plans one exchange + one sort.
    */
  val q64Sessionize = Q(
    "q64_sessionize",
    (s, dir) => {
      val se = Behavior.sessionize(t(s, dir, "events"), "user_id", "ts",
        "event_id", gapSeconds = 300L)
      val w = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      se.withColumn("rn_a", row_number().over(w))
        .withColumn("rn_d", row_number().over(wd))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"),
          count(lit(1)).cast("bigint").as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"),
          max(when(col("rn_a") === 1, col("event_type"))).as("landing"),
          max(when(col("rn_d") === 1, col("event_type"))).as("exit_type"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("bigint").as("n_purchases"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""WITH x AS (SELECT user_id, ts, event_id, event_type,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NULL
          OR date_diff('microsecond',
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
            >= 300000000 THEN 1 ELSE 0 END AS brk
        FROM events),
      y AS (SELECT user_id, ts, event_id, event_type,
        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
        FROM x),
      z AS (SELECT *,
        row_number() OVER (PARTITION BY user_id, session_id
          ORDER BY ts, event_id) AS rn_a,
        row_number() OVER (PARTITION BY user_id, session_id
          ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM y)
      SELECT user_id, session_id, MIN(ts) AS session_start,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        date_diff('microsecond', MIN(ts), MAX(ts)) AS duration_us,
        MAX(CASE WHEN rn_a = 1 THEN event_type END) AS landing,
        MAX(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_purchases
      FROM z GROUP BY user_id, session_id
      ORDER BY user_id, session_start"""),
    bench = true)

  val queries: Seq[Q] = Seq(q62Funnel, q63Retention, q64Sessionize)
}
