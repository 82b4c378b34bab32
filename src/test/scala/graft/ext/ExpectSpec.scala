package graft.ext

import graft.SparkSuite
import graft.ext.Expect._

class ExpectSpec extends SparkSuite {

  import spark.implicits._

  test("each check type computes the exact ratio; nulls violate value checks") {
    val df = Seq[(Option[String], Option[Double], Option[String])](
      (Some("a"), Some(1.0), Some("x1")),
      (Some("a"), Some(5.0), Some("x2")),
      (Some("b"), Some(11.0), Some("bad")),
      (None, None, None))
      .toDF("k", "v", "code")
    val rows = Expect.report(df, "t", Seq(
        Completeness("k", 0.7),
        Uniqueness(Seq("k"), 1.0),
        InRange("v", 0.0, 10.0, 0.5),
        InSet("k", Seq("a", "b"), 0.75),
        MatchesRegex("code", "^x[0-9]$", 0.5)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(rows("t.completeness(k)") == ((0.75, true)))
    assert(rows("t.uniqueness(k)") == ((0.5, false)))
    assert(rows("t.in_range(v)") == ((0.5, true)))
    assert(rows("t.in_set(k)") == ((0.75, true)))
    assert(rows("t.matches_regex(code)") == ((0.5, true)))
  }

  test("a check suite runs as one aggregation pass over one scan") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val plan = Expect.report(df, "t", Seq(
        Completeness("k", 1.0), InRange("v", 0.0, 10.0, 1.0),
        InSet("k", Seq("a", "b"), 1.0)))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("LocalTableScan") || l.contains("Scan "))
    assert(scans == 1, s"suite scans the table $scans times:\n$plan")
  }

  test("referential counts null and missing child keys as violations") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Expect.referential(child, "fk", parent, "pk", 1.0, "c").collect()(0)
    assert(r.getString(0) == "c.referential(fk)")
    assert(r.getDouble(1) == 0.5)
    assert(!r.getBoolean(2))
  }

  test("tableFingerprint is order-independent and mutation-sensitive") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "a"), (2L, "b"), (3L, Option.empty[String].orNull))
      .toDF("k", "v")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Expect.tableFingerprint(d, Seq(col("k"), col("v")))
        .collect()(0).getAs[String]("fingerprint")
    val base = fp(df)
    assert(fp(df.orderBy(col("k").desc).repartition(7)) == base,
      "row order or partitioning changed the fingerprint")
    val mutated = Seq((1L, "a"), (2L, "B"), (3L, Option.empty[String].orNull))
      .toDF("k", "v")
    assert(fp(mutated) != base, "a mutated cell must change the digest")
    val dropped = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(fp(dropped) != base, "a dropped row must change the digest")
    // the null sentinel distinguishes null from the empty string
    val empty = Seq((1L, "a"), (2L, "b"), (3L, "")).toDF("k", "v")
    assert(fp(empty) != base, "null and '' must fingerprint differently")
  }

  test("fdViolations reports only lhs values with more than one rhs") {
    import org.apache.spark.sql.functions.col
    // a -> 1 (holds, 2 rows); b -> {1,2,2} (violates); c -> 3 (holds)
    val df = Seq(("a", 1), ("a", 1), ("b", 1), ("b", 2), ("b", 2),
      ("c", 3)).toDF("l", "r")
    val v = Expect.fdViolations(df, Seq(col("l")), col("r")).collect()
    assert(v.length == 1)
    assert(v(0).getString(0) == "b")
    assert(v(0).getAs[Long]("n_rhs") == 2 && v(0).getAs[Long]("n_rows") == 3)
    // a compound lhs that fully determines rhs -> no violations
    val ok = Expect.fdViolations(df, Seq(col("l"), col("r")), col("r"))
    assert(ok.isEmpty)
  }
}
