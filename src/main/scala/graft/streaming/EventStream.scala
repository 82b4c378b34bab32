package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.H.{dec2, sum38}

/** Event-time windowed aggregation (SURVEY.md §2.9). The reference has
  * no data-plane streaming (its only stream is the work queue), so this
  * is the engine extension the events fixture exists for.
  *
  * One transform, two execution modes: the same function runs on a
  * batch DataFrame (driver contract, DuckDB oracle) and on a streaming
  * DataFrame (with watermark; incremental state in the state store).
  * That is the point of Structured Streaming — no reimplementation.
  */
object EventStream {

  /** Tumbling event-time windows with exact decimal sums. */
  def tumblingCounts(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum38(dec2(col("value")), 2, "total_value"))
      .select(
        col("window.start").as("ws"),
        col("window.end").as("we"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming variant: watermark bounds state; late rows beyond it are
    * dropped instead of growing the store forever.
    */
  def tumblingCountsStream(events: DataFrame, width: String, watermark: String): DataFrame =
    tumblingCounts(events.withWatermark("ts", watermark), width)

  /** Sliding windows (stream or batch). */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"))

  /** Session windows keyed by user (5-minute gap). */
  def sessionCounts(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ws"),
        col("session_window.end").as("we"), col("user_id"), col("n"))

  /** Streaming dedup — the streaming face of the §2.8 dedup family:
    * exact-key dedup with watermark-bounded state
    * (dropDuplicatesWithinWatermark evicts seen-keys older than the
    * watermark, so state is O(window), not O(stream)). On a batch frame
    * it degrades to plain dropDuplicates (Spark REJECTS the watermarked
    * variant outside streaming).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String], watermark: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Stream-static enrichment: every micro-batch joins the static
    * dimension via an explicit broadcast — the streaming side NEVER
    * shuffles (no state store either; this is stateless row-local
    * enrichment), and the dimension is re-resolved each batch, so a
    * dim-table refresh between batches is picked up automatically.
    * The standard lookup-join shape at any stream rate; at 100 TB/day
    * the only requirement is that the dim fits broadcast, which is
    * what distinguishes it from [[clickThroughJoin]]'s stateful
    * stream-stream shape.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      joinCols: Seq[String]): DataFrame =
    events.join(broadcast(dim), joinCols, "left")

  /** Stream-stream interval join: each event joined to the same user's
    * events of another type within [0, maxDelay] AFTER it. Both sides
    * watermarked; the time-bound predicate lets Spark evict join state —
    * the canonical bounded-state stream-stream join shape.
    */
  def clickThroughJoin(views: DataFrame, acts: DataFrame,
      watermark: String, maxDelay: String): DataFrame = {
    val v = views.select(col("user_id"), col("event_id").as("view_id"),
      col("ts").as("view_ts")).withWatermark("view_ts", watermark)
    val a = acts.select(col("user_id").as("a_user_id"),
      col("event_id").as("act_id"), col("ts").as("act_ts"))
      .withWatermark("act_ts", watermark)
    v.join(a,
      col("user_id") === col("a_user_id") &&
        col("act_ts") >= col("view_ts") &&
        col("act_ts") <= col("view_ts") + expr(s"INTERVAL $maxDelay"))
      .select(col("user_id"), col("view_id"), col("act_id"),
        col("view_ts"), col("act_ts"))
  }

  /** Custom state-store logic (flatMapGroupsWithState): per-user
    * running stats that built-in aggregations can't express — the
    * event count, the exact total value, and the longest gap ever seen
    * between that user's consecutive events (requires remembering the
    * previous event time across micro-batches). Update mode emits one
    * refreshed row per user per batch.
    */
  final case class UserState(n: Long, totalCents: Long, lastTsMicros: Long, maxGapMicros: Long)
  final case class UserStats(user_id: Long, n: Long, total_value: Double, max_gap_seconds: Double)

  def userRunningStats(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[UserStats] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("u"),
        unix_micros(col("ts")).as("t"),
        round(col("value") * 100).cast("long").as("c"))
      // a single NULL would kill the query at the non-nullable encoder
      // — and the poison row replays from the checkpoint forever
      .filter(col("u").isNotNull && col("t").isNotNull && col("c").isNotNull)
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long)], state: GroupState[UserState]) =>
          var s = state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue, 0L))
          // micro-batch rows are not time-ordered: sort this batch's
          // slice (bounded by batch size) before folding into state.
          // Events older than lastTs (late arrivals from an earlier
          // batch) count toward n/total but are EXCLUDED from the gap
          // statistic — folding them in would regress lastTs and
          // corrupt every subsequent gap; an exact max-gap under
          // arbitrary lateness needs watermarked buffering (documented
          // limitation of this running variant).
          it.toSeq.sortBy(_._2).foreach { case (_, ts, cents) =>
            if (ts >= s.lastTsMicros) {
              val gap = if (s.lastTsMicros == Long.MinValue) 0L else ts - s.lastTsMicros
              s = UserState(s.n + 1, s.totalCents + cents, ts, math.max(s.maxGapMicros, gap))
            } else {
              s = UserState(s.n + 1, s.totalCents + cents, s.lastTsMicros, s.maxGapMicros)
            }
          }
          state.update(s)
          Iterator.single(UserStats(user, s.n, s.totalCents / 100.0, s.maxGapMicros / 1e6))
      }
  }
}
