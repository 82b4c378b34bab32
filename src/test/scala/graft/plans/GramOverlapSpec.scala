package graft.plans

import graft.SparkSuite
import graft.ext.Text
import org.apache.spark.sql.functions._

class GramOverlapSpec extends SparkSuite {
  import spark.implicits._

  private def probe(texts: Seq[String], evalGrams: Array[String], n: Int) =
    texts.toDF("text")
      .select(Text.contaminatedNarrow(col("text"), evalGrams, n).as("c"))
      .collect().map(_.getBoolean(0))

  test("gram_overlap matches the arrays_overlap formulation") {
    val texts = Seq(
      "a b c d e f g", "x y z", "a b", "", "c d e x x x x",
      "q w e r t y u i o p")
    val eval = Array("c d e", "t y u")
    val got = probe(texts, eval, 3)
    val want = texts.toDF("text")
      .select(arrays_overlap(
        Text.ngramArray(Text.tokens(col("text")), 3),
        typedLit(eval.toSeq)).as("c"))
      .collect().map(_.getBoolean(0))
    assert(got === want)
    assert(got === Array(true, false, false, false, true, true))
  }

  test("gram_overlap handles degenerate inputs") {
    // doc shorter than n, empty eval set, n covering the whole doc
    assert(probe(Seq("a b"), Array("a b c"), 3) === Array(false))
    assert(probe(Seq("a b c"), Array[String](), 3) === Array(false))
    assert(probe(Seq("a b c"), Array("a b c"), 3) === Array(true))
  }

  test("gram_overlap stays inside whole-stage codegen") {
    // needs a real scan — an all-literal input constant-folds into a
    // LocalTableScan with no codegen stage to inspect
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Text.contaminatedNarrow(col("text"), Array("b c"), 2).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"no codegen span:\n$p")
  }
}
