package graft.core

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** FIXTURES.md B3: token sets, trim interplay, substring survival. */
class NullsSpec extends SparkSuite {
  import spark.implicits._

  private def cleanOf(vals: Seq[String]): Seq[Option[String]] = {
    vals.toDF("v")
      .select(Nulls.cleanNulls(trim($"v")).as("c"))
      .collect().toSeq.map(r => Option(r.getString(0)))
  }

  test("cleaning tokens null out case-insensitively after trim") {
    val in = Seq("", "  ", "None", "none", "NULL", "nan", "<NA>", "NaT", "nAt")
    assert(cleanOf(in).forall(_.isEmpty))
  }

  test("substrings and near-tokens survive") {
    val in = Seq("nancy", "nullable", "N/A", "n/a", "na", "  padded  ")
    assert(cleanOf(in) == Seq(Some("nancy"), Some("nullable"), Some("N/A"),
      Some("n/a"), Some("na"), Some("padded")))
  }

  test("detection mask counts content exactly (etl.py:365 set)") {
    val rows = Seq("x", "", "  ", "None", "N/A", "n/a", "na", "0", "nat")
    val got = rows.toDF("v").select(Nulls.isContent($"v").as("m"))
      .collect().map(_.getBoolean(0)).toSeq
    // 'nat' is NOT in the detection set (only the cleaning set) — content
    assert(got == Seq(true, false, false, false, false, false, false, true, true))
  }

  test("boolCast token map with coerce-to-null") {
    val in = Seq("yes", "No", "TRUE", "0", " t ", "1.0", "junk", "2", null)
    val got = in.toDF("v").select(Nulls.boolCast($"v").as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(got == Seq(Some(true), Some(false), Some(true), Some(false),
      Some(true), Some(true), None, None, None))
  }
}
