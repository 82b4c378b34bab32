package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSuite

class BehaviorSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val events = graft.queries.H.t(spark, dir, "events")

  test("batch sessionize agrees with Spark's session_window semantics") {
    // one definition, two execution modes: the gaps-and-islands batch
    // sessionizer must reproduce session_window's merge exactly
    // (window end = last ts + gap, new session when gap >= timeout)
    val viaIslands = Behavior.sessionize(events, "user_id", "ts",
        "event_id", gapSeconds = 300L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("ws"),
        (max(col("ts")) + expr("interval 5 minutes")).as("we"),
        count(lit(1)).as("n"))
      .select(col("ws"), col("we"), col("user_id"), col("n"))
    val viaWindow = graft.streaming.EventStream.sessionCounts(events, "5 minutes")
    assert(viaIslands.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaIslands).isEmpty,
      "sessionize and session_window disagree")
  }

  test("funnel stage times are strictly increasing and gated") {
    val fu = Behavior.funnelTimes(events, "user_id", "ts", Seq(
      col("event_type") === "view",
      col("event_type") === "click",
      col("event_type") === "purchase")).collect()
    for (r <- fu; i <- 1 to 2 if !r.isNullAt(i + 1)) {
      assert(!r.isNullAt(i), s"stage $i null but stage ${i + 1} reached")
      assert(r.getTimestamp(i + 1).after(r.getTimestamp(i)),
        "stage times not strictly increasing")
    }
  }

  test("cohort retention is 1.0 at offset zero by construction") {
    val r = Behavior.cohortRetention(events, "user_id", "ts")
      .filter(col("week_offset") === 0).collect()
    assert(r.nonEmpty)
    for (row <- r)
      assert(row.getAs[Double]("retention") == 1.0,
        s"offset-0 retention ${row.getAs[Double]("retention")}")
  }
}
