package graft.ext

import graft.SparkSuite

class ProfileSpec extends SparkSuite {

  import spark.implicits._

  private def df = Seq(
    (1L, Some("aa"), Some(1.5)),
    (2L, None, Some(2.5)),
    (3L, Some("bbbb"), None),
    (3L, Some("aa"), Some(2.5))
  ).toDF("id", "s", "x")

  test("profile: nulls, distincts, min/max, avg_len in one pass") {
    val out = Profile.profile(df, Seq(
      "id" -> Profile.Num, "s" -> Profile.Str, "x" -> Profile.Num))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("id").getAs[Long]("n_rows") == 4L)
    assert(out("id").getAs[Long]("n_null") == 0L)
    assert(out("id").getAs[Long]("n_distinct") == 3L)
    assert(out("id").getAs[Double]("min_num") == 1.0)
    assert(out("id").getAs[Double]("max_num") == 3.0)
    assert(out("s").getAs[Long]("n_null") == 1L)
    assert(out("s").getAs[Long]("n_distinct") == 2L)
    assert(out("s").getAs[String]("min_str") == "aa")
    assert(out("s").getAs[String]("max_str") == "bbbb")
    assert(out("s").getAs[Double]("avg_len") == (2 + 4 + 2) / 3.0)
    assert(out("x").getAs[Long]("n_null") == 1L)
  }

  test("exact profile pays Expand; approx profile plans without it") {
    val cols = Seq("id" -> (Profile.Num: Profile.Kind), "s" -> Profile.Str)
    val exactPlan = Profile.profile(df, cols, exact = true)
      .queryExecution.executedPlan.toString
    val approxPlan = Profile.profile(df, cols, exact = false)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct should plan an Expand")
    assert(!approxPlan.contains("Expand"),
      "approx profile must be a single no-Expand pass")
  }
}
