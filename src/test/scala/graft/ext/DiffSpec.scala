package graft.ext

import graft.SparkSuite

class DiffSpec extends SparkSuite {

  import spark.implicits._

  test("added/removed/changed classified; null transitions count as changes") {
    val oldDf = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(20.0)),
      (3L, Option.empty[String], Some(30.0)),
      (4L, Some("d"), Some(40.0))
    ).toDF("id", "s", "v")
    val newDf = Seq(
      (1L, Some("a"), Some(10.0)),           // unchanged → absent
      (2L, Some("b"), Some(21.0)),           // changed value
      (3L, Some("now-set"), Some(30.0)),     // null → value = changed
      (5L, Some("e"), Option.empty[Double])  // added
    ).toDF("id", "s", "v")
    val out = Diff.snapshotDiff(oldDf, newDf, "id", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("identical snapshots diff to empty") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    assert(Diff.snapshotDiff(df, df, "id", Seq("s")).isEmpty)
  }
}
