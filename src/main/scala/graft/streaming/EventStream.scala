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
}
