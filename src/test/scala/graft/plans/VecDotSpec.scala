package graft.plans

import graft.SparkSuite
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Native vec_dot expression: bit-equality with the HOF formulation,
  * SQL resolution via GraftExtensions, null handling.
  */
class VecDotSpec extends SparkSuite {
  import spark.implicits._

  test("resolves in SQL through the session extension") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("bit-identical to the HOF formulation on float vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = emb.select(
      Similarity.dot(col("embedding"), col("embedding")).as("native"),
      Similarity.dotHof(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null elements contribute zero; null array yields null") {
    val df = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](2.0, 5.0, 4.0)))
      .toDF("a", "b")
    assert(df.select(Similarity.dot(col("a"), col("b"))).head().getDouble(0) == 14.0)
    val withNull = df.select(Similarity.dot(lit(null).cast("array<double>"), col("b")))
    assert(withNull.head().isNullAt(0))
  }

  test("length mismatch uses the shorter vector") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0))).toDF("a", "b")
    assert(df.select(Similarity.dot(col("a"), col("b"))).head().getDouble(0) == 30.0)
  }
}
