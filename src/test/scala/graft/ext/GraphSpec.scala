package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {

  import spark.implicits._

  test("symmetric two-node graph converges to equal ranks") {
    val edges = Seq(("a", "b", 1.0), ("b", "a", 1.0)).toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", "w").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - r("b")) < 1e-9)
    assert(math.abs(r("a") - 0.5) < 1e-6)
  }

  test("bidirectional star ranks the hub highest; mass stays <= 1") {
    // hub <-> every spoke: the hub aggregates 5 full spoke ranks while
    // each spoke gets 1/5 of the hub's
    val edges = ((1 to 5).map(i => ("hub", s"s$i", 1.0)) ++
      (1 to 5).map(i => (s"s$i", "hub", 1.0))).toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", "w").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("s1"), s"expected hub above spokes: $r")
    assert(math.abs(r("s1") - r("s3")) < 1e-9, "symmetric spokes must tie")
    assert(r.values.sum <= 1.0 + 1e-9)
  }

  test("weights matter and results are partition-independent") {
    val edges = Seq(
      ("x", "heavy", 9.0), ("x", "light", 1.0),
      ("heavy", "x", 1.0), ("light", "x", 1.0)
    ).toDF("src", "dst", "w")
    val r1 = Graph.pageRank(edges, "src", "dst", "w").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    val r2 = Graph.pageRank(edges.repartition(13), "src", "dst", "w").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r1 == r2, "ranks changed under repartition")
    assert(r1("heavy") > r1("light"))
  }
}
