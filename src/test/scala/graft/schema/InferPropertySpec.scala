package graft.schema

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Randomized inference round-trip (SURVEY.md §5.3): render a typed
  * column to strings, infer, expect the original type class back —
  * including the narrowest-type ordering and the all-digits date guard.
  */
class InferPropertySpec extends SparkSuite {

  private case class Col(expected: String, values: Gen[String])

  private val intCol = Col("INTEGER", Gen.choose(-1000000L, 1000000L).map(_.toString))
  private val floatCol = Col("FLOAT",
    Gen.choose(-1e6, 1e6).map(d => f"$d%.3f").suchThat(s => !s.matches("-?\\d+\\.000")))
  private val tsCol = Col("TIMESTAMP", for {
    y <- Gen.choose(1990, 2030); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
  } yield f"$y%04d-$m%02d-$d%02d")
  private val boolCol = Col("BOOLEAN",
    Gen.oneOf("true", "false", "YES", "no", "T", "f", "y", "N"))
  private val strCol = Col("STRING",
    Gen.alphaStr.map(s => "w" + s.take(8))) // never numeric/date/bool
  // the etl.py:884 guard: all-digit strings must NOT become TIMESTAMP
  // even when they parse as dates (e.g. '20240101'-like zip/id codes) —
  // integral, so they infer INTEGER first anyway; force the guard path
  // with digit strings too big for a long
  private val bigDigitCol = Col("FLOAT",
    Gen.listOfN(25, Gen.numChar).map(_.mkString))

  private val colGen = Gen.oneOf(intCol, floatCol, tsCol, boolCol, strCol, bigDigitCol)

  test("typed->string->infer round-trips the type class") {
    val caseGen = for {
      nCols <- Gen.choose(1, 4)
      specs <- Gen.listOfN(nCols, colGen)
      nRows <- Gen.choose(1, 8)
      cols <- Gen.sequence[List[List[String]], List[String]](
        specs.map(sp => Gen.listOfN(nRows, sp.values)))
    } yield (specs.map(_.expected), cols)

    val prop = Prop.forAll(caseGen) { case (expected, cols) =>
      val names = expected.indices.map(i => s"c$i")
      val rows = cols.transpose.map(Row.fromSeq(_))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(names.map(StructField(_, StringType))))
      val got = Infer.inferSchema(df, names).map(_.bqType)
      got == expected
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(r.passed, r.status.toString)
  }
}
