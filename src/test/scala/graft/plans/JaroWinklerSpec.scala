package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSuite {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values (Winkler's own examples)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333334) < 1e-15)
    assert(jw("abcd", "abcd") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("", "") == 1.0 && jw("x", "") == 0.0)
    // adjacent transposition outside the window: no matches at all
    assert(jw("ab", "ba") == 0.0)
  }

  test("prefix boost applies only above the 0.7 jaro threshold") {
    // shared 2-char prefix but jaro < 0.7 → NO boost (RapidFuzz/DuckDB)
    assert(math.abs(jw("abcdefghij", "abzzzzzzzz") - 0.4666666666666666) < 1e-15)
    // above threshold the 4-char-capped boost kicks in
    assert(math.abs(jw("aaaa", "aaab") - 0.8833333333333333) < 1e-15)
  }

  test("codegen'd expression equals the kernel and handles nulls") {
    graft.plans.GraftExtensions.ensure(spark)
    val df = Seq(
      (Option("martha"), Option("marhta")),
      (Option("dwayne"), Option("duane")),
      (None: Option[String], Option("x")),
      (Option("x"), None: Option[String])
    ).toDF("a", "b")
    val out = df.select(call_function("jaro_winkler", col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - jw("martha", "marhta")) == 0.0)
    assert(math.abs(out(1).getDouble(0) - jw("dwayne", "duane")) == 0.0)
    assert(out(2).isNullAt(0) && out(3).isNullAt(0))
    // wrong arity / types fail analysis, not execution
    intercept[Exception] {
      df.select(call_function("jaro_winkler", col("a"), lit(3))).collect()
    }
  }

  test("supplementary-plane characters compare as codepoints, not UTF-16 units") {
    // "𝐀" (U+1D400) is a surrogate pair in UTF-16. Codepoint semantics:
    // identical strings → 1.0; "𝐀" vs "𝐁" (U+1D401) are length-1 strings
    // with zero matching codepoints → 0.0. Code-unit semantics would see
    // length-2 strings sharing a high surrogate and return ~0.67.
    val a = "𝐀" // 𝐀
    val b = "𝐁" // 𝐁
    assert(jw(a, a) == 1.0)
    assert(jw(a, b) == 0.0)
    // mixed: BMP prefix + supplementary tail; length must count codepoints
    assert(jw("ab" + a, "ab" + a) == 1.0)
  }

  test("jaro_winkler stays inside whole-stage codegen") {
    graft.plans.GraftExtensions.ensure(spark)
    // non-literal inputs — constant folding would otherwise evaluate
    // the whole expression at plan time and leave a LocalTableScan
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(call_function("jaro_winkler", col("c_name"),
        col("c_mktsegment")).as("jw"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"jaro_winkler fell out of codegen:\n$p")
  }
}
