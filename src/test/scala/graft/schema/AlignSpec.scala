package graft.schema

import graft.SparkSuite
import graft.schema.Infer.Field
import org.apache.spark.sql.functions._

/** FIXTURES.md B5: alignment drops/adds/reorders; coercing casts;
  * null-inflation observer (etl.py:1012–1152).
  */
class AlignSpec extends SparkSuite {
  import spark.implicits._

  private val schema = Seq(
    Field("a", "INTEGER"), Field("b", "BOOLEAN"), Field("missing", "TIMESTAMP"))

  test("drop extra, add missing as NULL, reorder to schema order") {
    val df = Seq(("1", "7", "junk"), ("no", "8", "junk2")).toDF("b", "a", "extra")
    val out = Align.align(df, schema)
    assert(out.columns.toSeq == Seq("a", "b", "missing"))
    val rows = out.collect()
    assert(rows.length == 2)
    val byB = rows.map(r => Option(r.get(1))).toSet
    assert(byB == Set(Some(true), Some(false)))
    val byA = rows.map(r => r.getLong(0)).toSet
    assert(byA == Set(7L, 8L))
    assert(rows.forall(_.isNullAt(2))) // missing all null
  }

  test("coercing casts: unparseable -> NULL, integral strings -> long") {
    val df = Seq("1", "2.0", "2.5", "abc", "").toDF("a")
    val out = Align.align(df, Seq(Field("a", "INTEGER")))
    val got = out.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(got == Set(Some(1L), Some(2L), None))
  }

  test("date/timestamp/time casts") {
    val df = Seq(("2024-01-02", "2024-01-02 03:04:05", "03:04:05"))
      .toDF("d", "ts", "t")
    val out = Align.align(df, Seq(Field("d", "DATE"), Field("ts", "TIMESTAMP"), Field("t", "TIME")))
    val r = out.head()
    assert(r.getDate(0).toString == "2024-01-02")
    assert(r.getTimestamp(1).toString.startsWith("2024-01-02 03:04:05"))
    assert(r.getString(2) == "03:04:05") // TIME → normalized string
  }

  test("null-inflation observer fires at >10% and >5 new nulls") {
    val vals = (1 to 50).map(_.toString) ++ Seq.fill(10)("junk")
    val df = vals.toDF("a")
    val warns = Align.inflationWarnings(df, Seq(Field("a", "INTEGER")))
    assert(warns.size == 1 && warns.head.newNulls == 10)
    // below threshold: 5 bad of 100 → no warning
    val ok = ((1 to 95).map(_.toString) ++ Seq.fill(5)("junk")).toDF("a")
    assert(Align.inflationWarnings(ok, Seq(Field("a", "INTEGER"))).isEmpty)
  }

  test("empty schema is fatal (etl.py:1021)") {
    intercept[IllegalArgumentException] {
      Align.align(Seq("x").toDF("a"), Seq.empty)
    }
  }
}
