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

  test("sequencePatterns counts gap-bounded pairs, generalizing transitions") {
    import spark.implicits._
    import java.sql.Timestamp
    // one user, stream A B C A with window 2:
    // pairs: (A,B)(A,C) (B,C)(B,A) (C,A) → 5 slots
    val ev = Seq(("u1", "A", 1L), ("u1", "B", 2L), ("u1", "C", 3L),
      ("u1", "A", 4L))
      .map { case (u, t, i) =>
        (u, Timestamp.valueOf(s"2024-01-01 00:0$i:00"), t, i)
      }.toDF("user_id", "ts", "event_type", "event_id")
    val r = Behavior.sequencePatterns(ev, "user_id", "ts", "event_type",
        "event_id", window = 2)
      .select("type_a", "type_b", "n_ab")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(r === Map(("A", "B") -> 1L, ("A", "C") -> 1L,
      ("B", "C") -> 1L, ("B", "A") -> 1L, ("C", "A") -> 1L))
    // window 1 degenerates to adjacent transitions: A→B, B→C, C→A
    val r1 = Behavior.sequencePatterns(ev, "user_id", "ts", "event_type",
        "event_id", window = 1)
      .select("type_a", "type_b").as[(String, String)].collect().toSet
    assert(r1 === Set(("A", "B"), ("B", "C"), ("C", "A")))
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
