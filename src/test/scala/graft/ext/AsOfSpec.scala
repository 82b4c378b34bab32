package graft.ext

import graft.SparkSuite

/** Edge-case semantics of the as-of join operator (the sf-scale path is
  * oracle-checked by q22_asof_join).
  */
class AsOfSpec extends SparkSuite {

  test("as-of picks latest at-or-before, ties resolved to greatest value") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10, t=100
      (2L, 10L, 205L), // after both orders at 200
      (3L, 20L, 50L),  // before any right row for key 20
      (4L, 30L, 100L)  // key 30 has no right rows at all
    ).toDF("eid", "k", "t")
    val right = Seq(
      (10L, 100L, 7L),  // exactly at left t=100 → matches (<=)
      (10L, 200L, 8L),
      (10L, 200L, 9L),  // simultaneous: greatest value wins
      (20L, 60L, 5L)
    ).toDF("k", "t", "v")

    val out = AsOf.join(left, right, "k", "t", "t", "v", "matched")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(1L) == Some(7L), "at-or-before must include the same instant")
    assert(out(2L) == Some(9L), "simultaneous right rows: greatest value wins")
    assert(out(3L) == None, "no right row at-or-before -> null")
    assert(out(4L) == None, "key with no right rows -> null")
  }

  test("output keeps exactly the left columns plus the carried value") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L, "x")).toDF("eid", "k", "t", "payload")
    val right = Seq((10L, 90L, 42L)).toDF("k", "t", "v")
    val out = AsOf.join(left, right, "k", "t", "t", "v", "vv")
    assert(out.columns.toSeq == Seq("eid", "k", "t", "payload", "vv"))
    assert(out.count() == 1 && out.head().getLong(4) == 42L)
  }
}
