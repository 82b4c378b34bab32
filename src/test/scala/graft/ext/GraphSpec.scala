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

  test("triangleCount: K4 has 4 triangles, a square has none") {
    def sym(pairs: Seq[(Long, Long)]) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val k4 = sym(for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j))
    val r = Graph.triangleCount(k4, "src", "dst").collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4 && r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_triangles") == 4)
    val square = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(Graph.triangleCount(square, "src", "dst")
      .collect()(0).getAs[Long]("n_triangles") == 0)
    // adding one diagonal closes two triangles
    val diag = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    assert(Graph.triangleCount(diag, "src", "dst")
      .collect()(0).getAs[Long]("n_triangles") == 2)
  }

  test("triangleCount is invariant under repartition and hub skew") {
    // star + one closing edge: hub degree 10, exactly 1 triangle; the
    // degree orientation must keep the wedge fan-out on the spokes
    val pairs = (1L to 10L).map(i => (0L, i)) :+ (1L, 2L)
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val a = Graph.triangleCount(sym, "src", "dst").collect()(0)
    val b = Graph.triangleCount(sym.repartition(13), "src", "dst").collect()(0)
    assert(a.getAs[Long]("n_triangles") == 1)
    assert(a == b)
  }

  test("clusteringCoefficient: K4 all 1.0, square all 0, hub 1/45") {
    def sym(pairs: Seq[(Long, Long)]) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val k4 = sym(for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j))
    val rk4 = Graph.clusteringCoefficient(k4, "src", "dst").collect()
    assert(rk4.forall(_.getAs[Double]("clustering_coeff") == 1.0))
    assert(rk4.forall(_.getAs[Long]("n_triangles") == 3))
    val square = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(Graph.clusteringCoefficient(square, "src", "dst").collect()
      .forall(_.getAs[Double]("clustering_coeff") == 0.0))
    // star with one closed spoke pair: hub deg 10 in 1 triangle
    val pairs = (1L to 10L).map(i => (0L, i)) :+ (1L, 2L)
    val r = Graph.clusteringCoefficient(sym(pairs), "src", "dst")
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("degree"), x.getAs[Double]("clustering_coeff"))).toMap
    assert(r(0L) == ((10L, 2.0 * 1 / (10 * 9))))
    assert(r(1L) == ((2L, 1.0)) && r(2L) == ((2L, 1.0)))
    assert(r(3L) == ((1L, 0.0)), "degree-1 node scores 0")
  }

  test("adamicAdar scores a shared neighbor by 1/ln(its degree)") {
    // the 4-cycle 1-2-3-4: BOTH diagonals (1,3) and (2,4) have two
    // common neighbors of degree 2 -> AA = 2/ln 2 each
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 4L), (4L, 3L))
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val rows = Graph.adamicAdar(sym, "src", "dst", minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("common"), r.getAs[Double]("aa_score"))).toMap
    assert(rows.keySet == Set((1L, 3L), (2L, 4L)))
    assert(rows((1L, 3L))._1 == 2)
    assert(math.abs(rows((1L, 3L))._2 - 2.0 / math.log(2)) < 1e-9)
    // a path 1-2-3 alone: single-wedge pair only appears at minCommon=1
    val path = Seq((1L, 2L), (2L, 3L))
    val psym = (path ++ path.map(p => (p._2, p._1))).toDF("src", "dst")
    assert(Graph.adamicAdar(psym, "src", "dst", minCommon = 2L).isEmpty)
    val one = Graph.adamicAdar(psym, "src", "dst", minCommon = 1L).collect()
    assert(one.length == 1 && (one(0).getLong(0), one(0).getLong(1)) == ((1L, 3L)))
    assert(math.abs(one(0).getAs[Double]("aa_score") - 1.0 / math.log(2)) < 1e-9)
  }

  test("personalizedPageRank concentrates mass near the seed") {
    // triangle a-b-c with tail c-d, seeded at a. (A plain path would be
    // bipartite: the walk oscillates with period 2 and mid-ring nodes
    // can swap order at a fixed iteration count — the triangle breaks
    // the parity so proximity ordering is stable.)
    val pairs = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
      .map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("seed")
    val r = Graph.personalizedPageRank(edges, "src", "dst", "w",
      seeds, "seed").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("a") == r.values.max, s"seed must rank highest: $r")
    assert(r("d") == r.values.min, s"far tail must rank lowest: $r")
    assert(r("b") > r("d") && r("c") > r("d"), s"proximity broken: $r")
    assert(r.values.sum <= 1.0 + 1e-9)
    // a seed absent from the graph is ignored; none present fails fast
    val r2 = Graph.personalizedPageRank(edges, "src", "dst", "w",
      Seq("a", "zz").toDF("seed"), "seed").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r2 == r, "absent seed must not change the teleport set")
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "src", "dst", "w",
        Seq("zz").toDF("seed"), "seed")
    }
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

  test("degreeAssortativity matches a hand Pearson and signs correctly") {
    import spark.implicits._
    // star graph (hub 0 to leaves 1..4, symmetrized): hubs link ONLY
    // to leaves → strongly negative assortativity (= -1 for a star)
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
      .toDF("src", "dst")
    val rs = Graph.degreeAssortativity(star, "src", "dst")
      .select("assortativity").as[Option[Double]].head().get
    assert(math.abs(rs - (-1.0)) < 1e-12, s"star should be -1, got $rs")
    // 4-cycle is 2-regular: zero degree variance → NULL, not NaN
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    assert(Graph.degreeAssortativity(cyc, "src", "dst")
      .select("assortativity").as[Option[Double]].head().isEmpty)
  }

  test("reliable checkpoint() yields results identical to localCheckpoint") {
    // opt-in path (spark.graft.reliableCheckpoint + a checkpoint dir):
    // only the pin's storage medium changes — pageRank (per-iteration
    // pin) and kCore (live-set pin) must be bit-identical
    val edges = ((1L to 5L).map(i => (0L, i, 1.0)) ++
      (1L to 5L).map(i => (i, 0L, 1.0)) ++
      Seq((1L, 2L, 2.0), (2L, 3L, 1.0))).toDF("src", "dst", "w")
    def pr() = Graph.pageRank(edges, "src", "dst", "w").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    def kc() = Graph.kCore(edges.select("src", "dst"), "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (prLocal, kcLocal) = (pr(), kc())
    val dir = java.nio.file.Files.createTempDirectory("reliableckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Iter.ReliableFlag, "true")
    try {
      assert(pr() === prLocal, "pageRank diverged under reliable checkpoint")
      assert(kc() === kcLocal, "kCore diverged under reliable checkpoint")
    } finally spark.conf.set(Iter.ReliableFlag, "false")
  }

  test("kCore keeps the triangle, peels the pendant chain, certifies") {
    import spark.implicits._
    // triangle 1-2-3 plus chain 3-4-5: for k=2 the chain peels off
    // (5 first, then 4), the triangle is the exact 2-core
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = Graph.kCore(edges, "src", "dst", k = 2, rounds = 4)
      .orderBy("node")
      .select("node", "degree", "converged")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(r === Seq((1L, 2L, true), (2L, 2L, true), (3L, 2L, true)))
  }

  test("kCore reports converged=false when rounds run out mid-cascade") {
    import spark.implicits._
    // a 12-node path has NO 2-core; peeling eats one node per end per
    // round, so 3 rounds cannot finish and the certificate must say so
    val und = (1L to 11L).map(i => (i, i + 1))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val partial = Graph.kCore(edges, "src", "dst", k = 2, rounds = 3)
    assert(partial.count() > 0)
    assert(partial.filter(col("converged")).count() === 0L,
      "mid-cascade output must not certify")
    // with enough rounds the path peels to nothing (no 2-core exists)
    assert(Graph.kCore(edges, "src", "dst", k = 2, rounds = 6)
      .count() === 0L)
  }
}
