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

  /** Time-series resampling to 1-minute OHLC bars per event type — the
    * downsampling idiom (market bars, metrics rollups). Open/close are
    * picked by row_number over the total order (ts, event_id) — both
    * engines window identically; high/low/n are plain aggregates with
    * the decimal discipline. One shuffle on (event_type, bar).
    */
  val q58ResampleOhlc = Q(
    "q58_resample_ohlc",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.queries.H.dec2
      val base = t(s, dir, "events").select(col("event_type"),
        date_trunc("minute", col("ts")).as("bar"),
        col("ts"), col("event_id"), col("value"))
      val w = Window.partitionBy(col("event_type"), col("bar"))
        .orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy(col("event_type"), col("bar"))
        .orderBy(col("ts").desc, col("event_id").desc)
      base
        .withColumn("rn_a", row_number().over(w))
        .withColumn("rn_d", row_number().over(wd))
        .groupBy(col("event_type"), col("bar"))
        .agg(count(lit(1)).as("n"),
          max(dec2(col("value"))).cast("double").as("high"),
          min(dec2(col("value"))).cast("double").as("low"),
          max(when(col("rn_a") === 1, dec2(col("value")))).cast("double").as("open"),
          max(when(col("rn_d") === 1, dec2(col("value")))).cast("double").as("close"))
        .orderBy(col("event_type"), col("bar"))
    },
    Some("""WITH b AS (SELECT event_type, date_trunc('minute', ts) AS bar,
        ts, event_id, CAST(value AS DECIMAL(10,2)) AS v,
        row_number() OVER (PARTITION BY event_type, date_trunc('minute', ts)
          ORDER BY ts, event_id) AS rn_a,
        row_number() OVER (PARTITION BY event_type, date_trunc('minute', ts)
          ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events)
      SELECT event_type, bar, COUNT(*) AS n,
        CAST(MAX(v) AS DOUBLE) AS high, CAST(MIN(v) AS DOUBLE) AS low,
        CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS DOUBLE) AS open,
        CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS DOUBLE) AS close
      FROM b GROUP BY event_type, bar ORDER BY event_type, bar"""))

  /** Dense time-axis gap fill: every minute from each type's first to
    * last bar exists in the output, missing bars carry the
    * last-observation-carried-forward close. Axis generation is a
    * per-type sequence explode (O(span) rows, no driver loop); the fill
    * is a per-type ordered window over the dense axis.
    */
  val q59Gapfill = Q(
    "q59_gapfill",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.queries.H.dec2
      val bars = t(s, dir, "events")
        .filter(col("event_id") <= 2000)
        .select(col("event_type"),
          date_trunc("minute", col("ts")).as("bar"), col("value"))
        .groupBy(col("event_type"), col("bar"))
        .agg(max(dec2(col("value"))).cast("double").as("close"))
      val axis = bars.groupBy(col("event_type"))
        .agg(min(col("bar")).as("t0"), max(col("bar")).as("t1"))
        .select(col("event_type"),
          explode(sequence(col("t0"), col("t1"),
            expr("interval 1 minute"))).as("bar"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bar"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      axis.join(bars, Seq("event_type", "bar"), "left")
        .select(col("event_type"), col("bar"),
          col("close").isNotNull.as("observed"),
          last(col("close"), ignoreNulls = true).over(w).as("close_filled"))
        .orderBy(col("event_type"), col("bar"))
    },
    Some("""WITH bars AS (SELECT event_type, date_trunc('minute', ts) AS bar,
        CAST(MAX(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS close
        FROM events WHERE event_id <= 2000 GROUP BY 1, 2),
      axis AS (SELECT event_type,
        unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS bar
        FROM (SELECT event_type, MIN(bar) AS t0, MAX(bar) AS t1
          FROM bars GROUP BY 1)),
      j AS (SELECT a.event_type, a.bar, b.close,
        b.close IS NOT NULL AS observed
        FROM axis a LEFT JOIN bars b
          ON b.event_type = a.event_type AND b.bar = a.bar)
      SELECT event_type, bar, observed,
        last_value(close IGNORE NULLS) OVER (PARTITION BY event_type
          ORDER BY bar ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS close_filled
      FROM j ORDER BY event_type, bar"""))

  /** SCD Type-2 dimension build: change capture + validity intervals.
    * Each user's event_type stream stands in for a tracked dimension
    * attribute; rows where the attribute changes (vs the previous event
    * in (ts, event_id) order) open a version with valid_from = change
    * time, valid_to = next change time (null ⇒ current, is_current).
    * One user_id exchange; the change-capture lag and the interval-
    * closing lead ride the same sort (filter preserves partitioning).
    */
  val q65Scd2 = Q(
    "q65_scd2",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_from", col("ts"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    },
    Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev
        FROM events),
      ch AS (SELECT user_id, event_type, ts, event_id FROM c
        WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type, ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS valid_to,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          IS NULL AS is_current
      FROM ch ORDER BY user_id, valid_from"""))

  /** Rolling z-score anomaly flags over each event type's value
    * series: mean/variance of the TRAILING 20 observations (current
    * row excluded, so the score is a true out-of-sample residual).
    * Sums are exact decimals on both engines; mean, variance and z are
    * then identical IEEE double arithmetic on those exact operands —
    * the flags adjudicate bit-identically. One (event_type) exchange;
    * variance never needs a second pass (sum + sum-of-squares frames).
    */
  val q66Anomaly = Q(
    "q66_anomaly",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.queries.H.dec2
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)
      val base = t(s, dir, "events")
        .filter(col("event_id") <= 2000)
        .select(col("event_type"), col("ts"), col("event_id"),
          dec2(col("value")).as("v"))
      base
        .withColumn("n_win", count(col("v")).over(w))
        .withColumn("s1", sum(col("v")).over(w).cast("decimal(38,2)").cast("double"))
        .withColumn("s2", sum((col("v") * col("v")).cast("decimal(20,4)")).over(w)
          .cast("decimal(38,4)").cast("double"))
        .filter(col("n_win") === 20)
        .withColumn("mean", col("s1") / col("n_win"))
        .withColumn("variance",
          (col("s2") - col("s1") * col("s1") / col("n_win")) / (col("n_win") - 1))
        .withColumn("z",
          (col("v").cast("double") - col("mean")) / sqrt(col("variance")))
        .filter(abs(col("z")) > 2.5)
        .select(col("event_type"), col("event_id"),
          col("v").cast("double").as("value_d"), col("mean"), col("z"))
        .orderBy(col("event_type"), col("event_id"))
    },
    Some("""WITH b AS (SELECT event_type, ts, event_id,
        CAST(value AS DECIMAL(10,2)) AS v
        FROM events WHERE event_id <= 2000),
      r AS (SELECT event_type, ts, event_id, v,
        COUNT(v) OVER w AS n_win,
        CAST(CAST(SUM(v) OVER w AS DECIMAL(38,2)) AS DOUBLE) AS s1,
        CAST(CAST(SUM(CAST(v * v AS DECIMAL(20,4))) OVER w
          AS DECIMAL(38,4)) AS DOUBLE) AS s2
        FROM b
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      z AS (SELECT event_type, event_id, CAST(v AS DOUBLE) AS value_d,
        s1 / n_win AS mean,
        (CAST(v AS DOUBLE) - s1 / n_win)
          / sqrt((s2 - s1 * s1 / n_win) / (n_win - 1)) AS z
        FROM r WHERE n_win = 20)
      SELECT event_type, event_id, value_d, mean, z FROM z
      WHERE abs(z) > 2.5 ORDER BY event_type, event_id"""))

  /** Equal-width histogram of order totals: closed-form bucket
    * assignment (no per-bucket pass), global min/max via a broadcast
    * single-row aggregate. Bucket edges are IEEE doubles computed
    * identically on both sides; the top edge folds into the last
    * bucket. Shape: one tiny aggregate + one narrow pass + one
    * (bucket) aggregate.
    */
  val q67Histogram = Q(
    "q67_histogram",
    (s, dir) => {
      val nb = 20
      val o = t(s, dir, "orders")
        .select(graft.queries.H.dec2(col("o_totalprice")).cast("double").as("x"))
      val mm = o.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      o.crossJoin(broadcast(mm))
        .withColumn("bucket",
          least(floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / nb))
            .cast("int"), lit(nb - 1)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"))
        .orderBy(col("bucket"))
    },
    Some("""WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(10,2))
          AS DOUBLE) AS x FROM orders),
      mm AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM o)
      SELECT CAST(least(floor((x - lo) / ((hi - lo) / 20)), 19) AS INT)
          AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n, MIN(x) AS x_min, MAX(x) AS x_max
      FROM o, mm GROUP BY 1 ORDER BY bucket"""))

  val queries: Seq[Q] = Seq(q26WindowTumbling, q27WindowSliding,
    q28SessionWindow, q58ResampleOhlc, q59Gapfill, q65Scd2, q66Anomaly,
    q67Histogram)
}
