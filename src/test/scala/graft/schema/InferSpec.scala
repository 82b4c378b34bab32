package graft.schema

import graft.SparkSuite

/** FIXTURES.md B4 inference cascade + round-trip property. */
class InferSpec extends SparkSuite {
  import spark.implicits._

  test("cascade picks narrowest type per column") {
    // nulls, not "": inference runs AFTER cleaning has nulled empty
    // cells (a literal '' makes pandas' to_numeric raise → STRING too)
    val df = Seq(
      ("1", "1.5", "01234", "2024-01-02", "yes", "1", null: String),
      ("2", "2", "90210", "2024-02-03", "No", "abc", null: String),
      (null: String, "2.5", "00001", "2024-03-04", "TRUE", "3", null: String))
      .toDF("ints", "floats", "zips", "dates", "bools", "mixed", "empty")
    val got = Infer.inferSchema(df, df.columns.toSeq).map(f => f.name -> f.bqType).toMap
    assert(got("ints") == "INTEGER")
    assert(got("floats") == "FLOAT")
    assert(got("zips") == "INTEGER") // all-digit guard: never DATE
    assert(got("dates") == "TIMESTAMP")
    assert(got("bools") == "BOOLEAN")
    assert(got("mixed") == "STRING")
    assert(got("empty") == "STRING") // fully-null stays STRING
  }

  test("integral floats infer INTEGER like pandas to_numeric->Int64") {
    val df = Seq("1.0", "25.0", "3").toDF("q")
    assert(Infer.inferSchema(df, Seq("q")).head.bqType == "INTEGER")
  }

  test("numeric-looking bools (0/1) infer INTEGER first, like reference") {
    val df = Seq("0", "1", "1", "0").toDF("b")
    assert(Infer.inferSchema(df, Seq("b")).head.bqType == "INTEGER")
  }

  test("typed->string->infer round-trips the type") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 1.5, true, "abc"),
      (2L, 2.25, false, "def"))
      .toDF("i", "f", "b", "s")
      .withColumn("ts", to_timestamp(lit("2024-05-06 07:08:09")))
    val asStr = df.select(df.columns.map(c => col(c).cast("string").as(c)) :+ col("ts").cast("string").as("ts2"): _*)
    val got = Infer.inferSchema(asStr, Seq("i", "f", "b", "s", "ts2")).map(f => f.name -> f.bqType).toMap
    assert(got("i") == "INTEGER")
    assert(got("f") == "FLOAT")
    assert(got("b") == "BOOLEAN")
    assert(got("s") == "STRING")
    assert(got("ts2") == "TIMESTAMP")
  }
}
