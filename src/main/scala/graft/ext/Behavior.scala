package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over event streams: sessionization, ordered
  * funnels, cohort retention. The reference delegates all analytics to
  * its warehouse (SURVEY.md §2.7 — no group-by/window anywhere in
  * etl.py); these are the standard event-analytics operators a user of
  * that stack runs post-load, expressed Spark-first.
  *
  * Scale shape: everything here is keyed by the user column — one hash
  * exchange on user_id, then per-user windows/aggregates. User keys are
  * high-cardinality and near-uniform in real event data, so the shuffle
  * is skew-free; nothing ever uses a global (unpartitioned) window.
  */
object Behavior {

  /** Gap-based sessionization (gaps-and-islands): a new session starts
    * when the user's inter-event gap is >= `gapSeconds`. Returns the
    * input plus a per-user `session_id` (0-based, in time order). Ties
    * on the timestamp are broken by `tieCol` so the numbering is
    * deterministic under any partitioning.
    *
    * One exchange on `userCol`; the running sum rides the same sort the
    * lag needs (consecutive WindowExecs, no second shuffle).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val brk = when(prev.isNull ||
      unix_micros(col(tsCol)) - prev >= gapSeconds * 1000000L, 1).otherwise(0)
    events.withColumn("_brk", brk)
      .withColumn("session_id",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - 1)
      .drop("_brk")
  }

  /** Strict-order funnel: per user, the time of stage i is the earliest
    * event matching `stages(i)` that occurs strictly AFTER the user's
    * stage i-1 time (stage 0 is the plain minimum). A user who never
    * reaches stage i-1 can never count for stage i. Returns one row per
    * user with nullable columns `t0..t{n-1}`.
    *
    * Each stage is an unordered min-over-partition window referencing
    * the previous stage's column — Catalyst plans all n windows over
    * the single user_id exchange (no per-stage shuffle, no join chain,
    * no collect), which is what keeps this viable when "users" is
    * hundreds of millions of keys.
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    val staged = stages.zipWithIndex.foldLeft(events) {
      case (df, (pred, i)) =>
        val gated = if (i == 0) pred
          else pred && col(tsCol) > col(s"t${i - 1}")
        df.withColumn(s"t$i", min(when(gated, col(tsCol))).over(w))
    }
    staged.groupBy(col(userCol))
      .agg(min(col("t0")).as("t0"),
        (1 until stages.size).map(i => min(col(s"t$i")).as(s"t$i")): _*)
  }

  /** Weekly cohort retention: users are grouped by the week of their
    * first event (cohort), and counted once per calendar week in which
    * they were active. `retention` = active users / cohort size as an
    * IEEE double of two exact longs.
    *
    * Two exchanges total: one on user (first-seen + the self-join are
    * co-partitioned on the same key, so AQE reuses the layout), one on
    * (cohort, offset) for the final count-distinct.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val sizes = first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).cast("bigint").as("cohort_size"))
    val active = events.join(first, userCol)
      .select(col(userCol), col("cohort_week"),
        date_trunc("week", col(tsCol)).as("active_week"))
      .withColumn("week_offset",
        expr("datediff(active_week, cohort_week) div 7").cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_active"))
    active.join(broadcast(sizes), "cohort_week")
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size"))
  }

  /** Linear (equal-credit) multi-touch attribution — the fractional
    * companion of [[touchAttribution]]: every touch inside the lookback
    * window gets `value / n_touches` of the conversion's credit, one
    * output row per (conversion, touch). Same single user-keyed
    * range-join shape; the per-conversion touch count is a window count
    * over the conversion key (narrow after the join), never a re-join.
    * Credit is a plain double division of identical operands, so an
    * external oracle replays it exactly.
    */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, touchType: String, convType: String,
      lookback: String, typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("user_id"), col(idCol).as("conv_id"),
        col(tsCol).as("conv_ts"), col(valueCol).as("value"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("t_user"), col(idCol).as("touch_id"),
        col(tsCol).as("touch_ts"))
    val w = Window.partitionBy(col("conv_id"))
    conv.join(touch,
        col("user_id") === col("t_user") &&
          col("touch_ts") <= col("conv_ts") &&
          col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $lookback"))
      .withColumn("n_touches", count(lit(1)).over(w).cast("bigint"))
      .select(col("user_id"), col("conv_id"), col("touch_id"),
        col("touch_ts"), col("n_touches"),
        (col("value") / col("n_touches")).as("credit"))
  }

  /** First/last-touch attribution: each conversion credits the
    * earliest and latest touch event of the same user inside the
    * lookback window — the marketing-attribution primitive.
    *
    * Scale shape: one equi-join on the user id with a time-range
    * predicate (bounded join state, the q20/q22 range-join family —
    * never a cross join) and one per-conversion min/max aggregate.
    * Ties are broken by event id, so credit assignment is
    * deterministic under any partitioning.
    *
    * @param typeCol  column holding the event type (touch vs conversion)
    * @param valueCol column carried through per conversion (e.g. revenue)
    */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, touchType: String, convType: String,
      lookback: String, typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("user_id"), col(idCol).as("conv_id"),
        col(tsCol).as("conv_ts"), col(valueCol).as("value"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("t_user"), col(idCol).as("touch_id"),
        col(tsCol).as("touch_ts"))
    conv.join(touch,
        col("user_id") === col("t_user") &&
          col("touch_ts") <= col("conv_ts") &&
          col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $lookback"))
      .groupBy(col("user_id"), col("conv_id"), col("conv_ts"), col("value"))
      .agg(
        min(struct(col("touch_ts"), col("touch_id"))).getField("touch_id")
          .as("first_touch_id"),
        max(struct(col("touch_ts"), col("touch_id"))).getField("touch_id")
          .as("last_touch_id"),
        count(lit(1)).cast("bigint").as("n_touches"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next = to | current = from), estimated from adjacent
    * event pairs in time order (ties broken by `tieCol` so pairing is
    * deterministic under any partitioning). Transition counts are
    * integers and the probability is one double division of integer
    * operands, so the matrix adjudicates exactly.
    *
    * Scale shape: one exchange on the user column for the lag, then a
    * groupBy on the (from, to) pair — the matrix side is O(#types²),
    * so the per-row probability join is a broadcast at any corpus
    * size.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("from_type", lag(col(typeCol), 1).over(w))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col(typeCol).as("to_type"))
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("bigint").as("n"))
    counts
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("row_total").cast("double"))
          .as("prob"))
  }

  /** Gap-constrained sequential patterns: how often does event type A
    * precede event type B within `window` events of the same user's
    * ordered stream? Generalizes [[transitionMatrix]] (that's
    * window = 1) to "A leads to B soon, not necessarily next" — the
    * sequence-mining primitive behind intent detection and
    * funnel-hypothesis discovery. Reported with the independence lift
    * `n_ab·T / (n_a·n_b)` where the totals count WINDOW SLOTS (each
    * ordered pair of positions ≤ window apart), so lift is measured
    * against a slot-uniform null.
    *
    * Determinism: per-user positions are row_number ordered by
    * (ts, event id) — a total order; all counts are exact integers.
    *
    * Scale shape: the pair join is user-equi + bounded index range —
    * fan-out ≤ window per event, shuffled on the user key; type-pair
    * aggregation is O(#types²) rows.
    */
  def sequencePatterns(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, window: Int): DataFrame = {
    val w = Window.partitionBy(col("u"))
      .orderBy(col("ts"), col("eid"))
    val seq0 = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(typeCol).as("et"), col(idCol).as("eid"))
      .withColumn("i", row_number().over(w).cast("bigint"))
      .select(col("u"), col("i"), col("et"))
    // the windowed self-join (the expensive part — fan-out ≤ window
    // rows per event) feeds FOUR aggregates on different keys, so no
    // exchange reuse applies; cache it so the join runs once (the
    // harnesses clearCache between queries)
    val pairs = seq0.as("a")
      .join(seq0.as("b"),
        col("a.u") === col("b.u") && col("b.i") > col("a.i") &&
          col("b.i") <= col("a.i") + window)
      .select(col("a.et").as("type_a"), col("b.et").as("type_b"))
      .cache()
    val tot = pairs.agg(count(lit(1)).cast("bigint").as("t_slots"))
    val aCnt = pairs.groupBy(col("type_a"))
      .agg(count(lit(1)).as("n_a"))
    val bCnt = pairs.groupBy(col("type_b"))
      .agg(count(lit(1)).as("n_b"))
    pairs.groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).cast("bigint").as("n_ab"))
      .join(broadcast(aCnt), "type_a")
      .join(broadcast(bCnt), "type_b")
      .crossJoin(broadcast(tot))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        col("n_a").cast("bigint").as("n_a"),
        col("n_b").cast("bigint").as("n_b"),
        // double operands before multiplying — the bigint product
        // n_ab·t_slots wraps silently under non-ANSI Spark at ~1e9
        // slots while DuckDB errors (same fix as Basket.lift3)
        (col("n_ab").cast("double") * col("t_slots").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
  }
}
