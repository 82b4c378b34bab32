package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Native arr_jaccard expression: SQL resolution + equivalence with an
  * independent Scala merge-count on randomized sorted arrays.
  */
class ArrJaccardSpec extends SparkSuite {

  test("resolves in SQL through the session extension") {
    val r = spark.sql(
      "SELECT arr_jaccard(array('a','b','c'), array('b','c','d')) AS j").head()
    assert(math.abs(r.getDouble(0) - 2.0 / 4.0) < 1e-15)
  }

  test("matches a reference merge-count on randomized sorted arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases = (1 to 50).map { _ =>
      val a = Seq.fill(rnd.nextInt(20))(s"t${rnd.nextInt(30)}").distinct.sorted
      val b = Seq.fill(rnd.nextInt(20))(s"t${rnd.nextInt(30)}").distinct.sorted
      (a, b)
    }
    def expected(a: Seq[String], b: Seq[String]): Double = {
      val ix = a.toSet.intersect(b.toSet).size
      val un = a.length + b.length - ix
      if (un == 0) 0.0 else ix.toDouble / un
    }
    val got = cases.toDF("a", "b")
      .select(call_function("arr_jaccard", col("a"), col("b")))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == expected(a, b), s"mismatch for $a vs $b")
    }
  }

  test("supplementary-plane strings: correct when sorted in UTF-8 byte order") {
    import spark.implicits._
    // U+1F600 (surrogate pair) sorts BEFORE U+FFFA in Java String order
    // but AFTER in UTF-8 byte order — the expression requires the latter
    val emoji = new String(Character.toChars(0x1F600))
    val bmp = "￺"
    val a = Seq(emoji, bmp).sorted(graft.ext.Dedup.utf8Order)
    val b = Seq(bmp)
    val g = Seq((a, b)).toDF("a", "b")
      .select(call_function("arr_jaccard", col("a"), col("b")))
      .head().getDouble(0)
    assert(g == 0.5, s"expected 0.5, got $g (sort-order mismatch?)")
  }

  test("null elements never match and never crash") {
    val r = spark.sql(
      "SELECT arr_jaccard(array('a', CAST(NULL AS STRING)), array('a'))").head()
    assert(r.getDouble(0) == 1.0 / 2.0) // ix=1, union=2+1-1
  }

  test("empty arrays: union 0 yields 0.0; null array yields null") {
    val r = spark.sql(
      """SELECT arr_jaccard(CAST(array() AS ARRAY<STRING>), CAST(array() AS ARRAY<STRING>)),
        arr_jaccard(CAST(NULL AS ARRAY<STRING>), array('x'))""").head()
    assert(r.getDouble(0) == 0.0)
    assert(r.isNullAt(1))
  }
}
