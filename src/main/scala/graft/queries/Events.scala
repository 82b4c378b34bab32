package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.H.t
import graft.streaming.EventStream

/** Event-time windowing queries — the SAME transform functions
  * graft.streaming runs incrementally (watermarked) are exercised here
  * in batch mode against the DuckDB oracle: one definition, two
  * execution modes (SURVEY.md §2.9).
  */
object Events {

  /** Tumbling 1-hour windows with exact decimal sums. */
  val q26WindowTumbling = Q(
    "q26_window_tumbling",
    (s, dir) => EventStream.tumblingCounts(t(s, dir, "events"), "1 hour")
      .orderBy(col("ws"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS ws,
      date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
      event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type"""))

  /** Sliding 1-hour windows, 30-minute slide: each event lands in two
    * windows; the oracle materializes both via unnest.
    */
  val q27WindowSliding = Q(
    "q27_window_sliding",
    (s, dir) => EventStream.slidingCounts(t(s, dir, "events"), "1 hour", "30 minutes")
      .orderBy(col("ws"), col("event_type")),
    Some("""WITH e AS (SELECT event_type, ts,
        unnest([
          CAST(to_timestamp(floor(epoch(date_trunc('minute', ts)) / 1800) * 1800) AS TIMESTAMP),
          CAST(to_timestamp(floor(epoch(date_trunc('minute', ts)) / 1800) * 1800 - 1800) AS TIMESTAMP)
        ]) AS wsx
      FROM events),
    w AS (SELECT event_type, wsx AS ws, wsx + INTERVAL 1 HOUR AS we
      FROM e WHERE ts >= wsx AND ts < wsx + INTERVAL 1 HOUR)
    SELECT ws, we, event_type, COUNT(*) AS n
    FROM w GROUP BY ws, we, event_type ORDER BY ws, event_type"""))

  /** Session windows (5-minute gap) per user; the oracle rebuilds
    * sessions with gaps-and-islands (new session when the gap is ≥ the
    * timeout, matching Spark's strict-overlap merge).
    */
  val q28SessionWindow = Q(
    "q28_session_window",
    (s, dir) => EventStream.sessionCounts(t(s, dir, "events"), "5 minutes")
      .orderBy(col("user_id"), col("ws")),
    Some("""WITH x AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTE
          THEN 1 ELSE 0 END AS brk
      FROM events),
    y AS (SELECT user_id, ts,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM x)
    SELECT min(ts) AS ws, max(ts) + INTERVAL 5 MINUTE AS we, user_id, COUNT(*) AS n
    FROM y GROUP BY user_id, sid ORDER BY user_id, ws"""))

  val queries: Seq[Q] = Seq(q26WindowTumbling, q27WindowSliding, q28SessionWindow)
}
