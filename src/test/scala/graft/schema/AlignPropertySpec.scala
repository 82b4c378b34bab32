package graft.schema

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.schema.Infer.Field

/** Spark-backed alignment invariants (SURVEY.md §5.3), property-style
  * with a small iteration count (each case runs a Spark job):
  *  - output columns are exactly the schema, in schema order;
  *  - coercion NEVER throws — any cell value yields a value or NULL;
  *  - schema-only columns materialize as all-NULL.
  */
class AlignPropertySpec extends SparkSuite {

  private val bqTypes = Gen.oneOf(
    "INTEGER", "FLOAT", "NUMERIC", "BOOLEAN", "TIMESTAMP", "DATE",
    "TIME", "STRING", "JSON", "BYTES")

  private val cell: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""), Gen.const("  "),
    Gen.const("42"), Gen.const("-7.25"), Gen.const("1e308"), Gen.const("1e309"),
    Gen.const("true"), Gen.const("Y"), Gen.const("0.0"),
    Gen.const("2024-02-29"), Gen.const("2024-13-40"), Gen.const("12:34:56"),
    Gen.const("NaN"), Gen.const("Infinity"), Gen.const("0x1f"),
    Gen.asciiPrintableStr.map(_.take(20)))

  private val caseGen = for {
    nCols <- Gen.choose(1, 4)
    types <- Gen.listOfN(nCols, bqTypes)
    extraTypes <- Gen.listOfN(2, bqTypes) // schema-only columns
    nRows <- Gen.choose(0, 6)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, cell))
  } yield (types, extraTypes, rows)

  test("align: schema order, coerce-never-throw, null-fill for missing columns") {
    val prop = Prop.forAll(caseGen) { case (types, extraTypes, rows) =>
      val dataCols = types.indices.map(i => s"c$i")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row.fromSeq(_)), 1),
        StructType(dataCols.map(StructField(_, StringType))))
      val schema =
        types.zipWithIndex.map { case (t, i) => Field(s"c$i", t) } ++
          extraTypes.zipWithIndex.map { case (t, i) => Field(s"x$i", t) }
      val out = Align.align(df, schema)
      val collected = out.collect() // would throw here if any cast threw
      out.columns.toSeq == schema.map(_.name) &&
        collected.length == rows.length &&
        collected.forall { r =>
          val xs = schema.indices.drop(types.length)
          xs.forall(i => r.isNullAt(i))
        }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(r.passed, r.status.toString)
  }
}
