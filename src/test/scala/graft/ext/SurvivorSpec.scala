package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SurvivorSpec extends SparkSuite {

  import spark.implicits._

  test("golden records apply field rules over a multi-member cluster") {
    val ents = Seq(
      (1L, Some("Acme Corp"), 10.0, Option.empty[String]),
      (2L, Some("Acme Corporation"), 30.0, Some("RETAIL")),
      (3L, Some("ACME"), 20.0, Some("WHOLESALE")),
      (9L, Some("Solo Inc"), 5.0, Some("RETAIL"))
    ).toDF("id", "name", "bal", "seg")
    // 1-2 and 2-3 matched → one 3-member cluster via CC; 9 singleton
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Survivor.goldenRecords(ents, "id", pairs, Seq(
      Survivor.OldestWins("name"), Survivor.MaxWins("bal"),
      Survivor.FirstNonNull("seg"))).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 9L))
    val c = out(1L)
    assert(c.getAs[Long]("canonical_id") == 1L)
    assert(c.getAs[Long]("n_members") == 3L)
    assert(c.getAs[String]("name") == "Acme Corp") // oldest (id 1) wins
    assert(c.getAs[Double]("bal") == 30.0)         // max wins
    assert(c.getAs[String]("seg") == "RETAIL")     // id 1 null → id 2 wins
    val solo = out(9L)
    assert(solo.getAs[Long]("n_members") == 1L)
    assert(solo.getAs[String]("name") == "Solo Inc")
  }

  test("all-null field survives as null; result stable under repartition") {
    val ents = Seq(
      (1L, Option.empty[String]), (2L, Option.empty[String])
    ).toDF("id", "seg")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Survivor.goldenRecords(ents.repartition(7), "id", pairs,
      Seq(Survivor.FirstNonNull("seg"))).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("seg")))
  }
}
