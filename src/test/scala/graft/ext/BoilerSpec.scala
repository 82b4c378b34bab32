package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BoilerSpec extends SparkSuite {

  import spark.implicits._

  private def docs = Seq(
    // source A: "cookie banner here now x" opens 3 of 4 docs → boilerplate
    (1L, "cookie banner here now x alpha beta gamma delta eps", "A"),
    (2L, "cookie banner here now x one two three four five", "A"),
    (3L, "cookie banner here now x six seven eight nine ten", "A"),
    (4L, "totally unique body text a b c d e", "A"),
    // source B: the SAME banner appears only once → NOT boilerplate in B
    (5L, "cookie banner here now x unrelated b content words here", "B"),
    (6L, "plain b document segment text p q r s t", "B")
  ).toDF("doc_id", "text", "source")

  test("repeated within-source segments are stripped, in-order re-assembly") {
    val out = Boiler.removeBoilerplate(docs, "text", "doc_id", "source",
      segTokens = 5, minDocs = 2).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 1: first segment boilerplate, second kept
    assert(byId(1L).getAs[Long]("n_boiler") == 1L)
    assert(byId(1L).getAs[String]("clean_text") == "alpha beta gamma delta eps")
    assert(byId(1L).getAs[Double]("boiler_frac") == 0.5)
    // doc 4: untouched
    assert(byId(4L).getAs[Long]("n_boiler") == 0L)
    assert(byId(4L).getAs[String]("clean_text") ==
      "totally unique body text a b c d e")
    // the banner is source-scoped: doc 5 in source B keeps it
    assert(byId(5L).getAs[Long]("n_boiler") == 0L)
    assert(byId(5L).getAs[String]("clean_text").startsWith("cookie banner"))
  }

  test("a doc that is ALL boilerplate collapses to empty text") {
    val all = Seq(
      (1L, "x y z w v", "S"),
      (2L, "x y z w v", "S")
    ).toDF("doc_id", "text", "source")
    val out = Boiler.removeBoilerplate(all, "text", "doc_id", "source",
      segTokens = 5, minDocs = 2).orderBy("doc_id").collect()
    assert(out.forall(_.getAs[String]("clean_text") == ""))
    assert(out.forall(_.getAs[Double]("boiler_frac") == 1.0))
  }
}
