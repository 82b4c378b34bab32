package graft.ext

import graft.SparkSuite
import java.sql.Timestamp

class NearestJoinSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the closest right row in either direction; ties go backward") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:10")), // closest click is AFTER (t=12)
      (2L, 10L, ts("2024-01-01 10:00:02")), // closest is BEFORE (t=0)
      (3L, 10L, ts("2024-01-01 10:00:06")), // equidistant 0/12 → backward (0)
      (4L, 99L, ts("2024-01-01 10:00:00"))  // no clicks for this user
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 100L, ts("2024-01-01 10:00:00")),
      (10L, 101L, ts("2024-01-01 10:00:12"))
    ).toDF("user_id", "click_id", "ts")
    val out = AsOf.nearestJoin(left, right, "user_id", "ts", "ts",
      "click_id", "nearest").collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(1L) == ((Some(101L), Some(2000000L))))
    assert(out(2L) == ((Some(100L), Some(2000000L))))
    assert(out(3L) == ((Some(100L), Some(6000000L)))) // tie → earlier
    assert(out(4L) == ((None, None)))
  }

  test("agrees with the backward as-of when all rights precede lefts") {
    val left = Seq((1L, 5L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((5L, 7L, ts("2024-01-01 11:00:00")),
      (5L, 8L, ts("2024-01-01 11:30:00"))).toDF("user_id", "click_id", "ts")
    val near = AsOf.nearestJoin(left, right, "user_id", "ts", "ts",
      "click_id", "m").select("m").head().getLong(0)
    val back = AsOf.join(left, right, "user_id", "ts", "ts",
      "click_id", "m").select("m").head().getLong(0)
    assert(near == back && near == 8L)
  }
}
