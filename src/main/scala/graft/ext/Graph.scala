package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond the connected-components labeler
  * ([[Dedup.nearDupLabels]]): weighted PageRank over an edge list —
  * rank sources/domains by how much duplicated content flows into them
  * (edge weight = shared segments), the graph-signal complement of the
  * per-pair overlap audit.
  *
  * Determinism discipline — this is an ITERATIVE float computation,
  * the hardest case, and double→decimal casts are exactly where Spark
  * (shortest-string rounding) and other engines (binary rounding)
  * drift. So ranks live in FIXED POINT: a rank is a BIGINT count of
  * 1e-12 units ("picoranks"). Per-edge contributions floor a product
  * of identical IEEE doubles (bit-identical everywhere), the per-node
  * SUM is integer (order-independent under any partitioning), and the
  * damping update floors again. Every iteration is bit-reproducible
  * and the whole run replays in SQL as unrolled CTEs
  * ([[graft.queries.ExtB]] generates them from the same constants).
  *
  * Scale shape: each iteration is one equi-join of the rank vector
  * (O(nodes)) against the edge list plus one groupBy(dst) — the
  * standard Pregel-as-dataframes formulation. Lineage is cut per
  * iteration ([[Iter.pin]] — localCheckpoint by default, reliable
  * checkpoint() under `spark.graft.reliableCheckpoint` for clusters
  * where executor loss is routine) so the plan doesn't grow
  * unboundedly.
  * Dangling-node mass is dropped (the simple PageRank variant),
  * documented rather than redistributed. Fixed-point headroom: total
  * mass ≤ 1e12 ≪ 2^53, so BIGINT sums convert to double exactly.
  */
object Graph {

  private val Scale = 1e12

  /** @param edges (src, dst, w>0) directed weighted edges; weights must
    *              be integer-valued (counts) so out-weight sums are
    *              exact in doubles
    * @return (node, rank) — rank as DOUBLE (picoranks / 1e12)
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, damping: Double = 0.85, iters: Int = 10): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("double").as("w")).repartition(col("src")).cache()
    // ^ cached PRE-PARTITIONED on src (r19 optimization): the per-round
    // contribution join reads e on src every iteration, and an
    // unpartitioned cache re-exchanged the whole edge table `iters`
    // times; one exchange at cache time lets every round's join reuse
    // the cached partitioning (the ranks side stays a nodes-sized
    // exchange - pins drop partitioning metadata under AQE). Values
    // unchanged: the per-round arithmetic is regrouping-proof.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().cache()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val n = nodes.count().toDouble

    var ranks = nodes
      .withColumn("pr", floor(lit(Scale) / lit(n)).cast("bigint"))
      .transform(Iter.pin)
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(outw, "src")
        .select(col("dst"),
          floor(col("pr").cast("double") * col("w") / col("ow"))
            .cast("bigint").as("c"))
      val sums = contribs.groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          floor((lit(1.0) - lit(damping)) * lit(Scale) / lit(n) +
            lit(damping) * coalesce(col("sc"), lit(0L)).cast("double"))
            .cast("bigint").as("pr"))
        .transform(Iter.pin)
    }
    e.unpersist()
    nodes.unpersist()
    ranks.select(col("node"), (col("pr").cast("double") / lit(Scale)).as("rank"))
  }

  /** Personalized PageRank (Page et al. 1999 §6; the proximity scorer
    * behind "related items" and taint propagation): identical fixed-
    * point discipline to [[pageRank]], but the teleport mass returns to
    * a SEED SET instead of spreading uniformly — rank becomes
    * random-walk proximity to the seeds (e.g. contaminated or
    * gold-labeled nodes). Seeds absent from the graph are ignored;
    * non-seed nodes start (and teleport) at zero.
    *
    * Same bit-reproducibility story: BIGINT picoranks, floored
    * per-edge contributions of identical IEEE doubles, integer sums —
    * every iteration replays in SQL as unrolled CTEs.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, seeds: DataFrame, seedCol: String,
      damping: Double = 0.85, iters: Int = 10): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("double").as("w")).repartition(col("src")).cache()
    // ^ cached PRE-PARTITIONED on src (r19 optimization): the per-round
    // contribution join reads e on src every iteration, and an
    // unpartitioned cache re-exchanged the whole edge table `iters`
    // times; one exchange at cache time lets every round's join reuse
    // the cached partitioning (the ranks side stays a nodes-sized
    // exchange - pins drop partitioning metadata under AQE). Values
    // unchanged: the per-round arithmetic is regrouping-proof.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val nodesS = nodes
      .join(seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("_s", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("_s"), lit(false)).as("is_seed"))
      .transform(Iter.pin)
    val seedN = nodesS.filter(col("is_seed")).count().toDouble
    require(seedN > 0, "no seed is present in the graph")

    val teleport = when(col("is_seed"),
      (lit(1.0) - lit(damping)) * lit(Scale) / lit(seedN))
      .otherwise(lit(0.0))
    var ranks = nodesS
      .withColumn("pr", when(col("is_seed"),
        floor(lit(Scale) / lit(seedN))).otherwise(lit(0L)).cast("bigint"))
      .transform(Iter.pin)
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(outw, "src")
        .select(col("dst"),
          floor(col("pr").cast("double") * col("w") / col("ow"))
            .cast("bigint").as("c"))
      val sums = contribs.groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = nodesS.join(sums, nodesS("node") === sums("dst"), "left")
        .select(nodesS("node"), col("is_seed"),
          floor(teleport +
            lit(damping) * coalesce(col("sc"), lit(0L)).cast("double"))
            .cast("bigint").as("pr"))
        .transform(Iter.pin)
    }
    e.unpersist()
    ranks.select(col("node"),
      (col("pr").cast("double") / lit(Scale)).as("ppr"))
  }

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007) with FIXED deterministic semantics so it replays in SQL:
    *
    *  - init: every node labels itself;
    *  - per round, every node adopts the most frequent label among its
    *    in-neighbors' PREVIOUS-round labels (synchronous update — the
    *    asynchronous variant is order-dependent and unreplayable),
    *    ties → smallest label; nodes with no in-edges keep theirs;
    *  - `rounds` is fixed, not convergence-tested, so an oracle can
    *    unroll it (the [[pageRank]] technique; integer counts, no
    *    floats anywhere).
    *
    * Callers wanting undirected semantics pass both edge directions.
    *
    * Scale shape per round: one equi-join of the O(nodes) label vector
    * against the edge list, one (dst, lbl) count aggregate (map-side
    * combinable), one per-dst argmax via max(struct(cnt, -lbl)) —
    * never a window over the full graph; lineage cut per round.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds > 0)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().cache()
    var labels = nodes.withColumn("lbl", col("node"))
      .transform(Iter.pin)
    for (_ <- 1 to rounds) {
      val best = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
        // argmax: highest count, then LOWEST label (labels are node
        // ids ≥ 0, so -lbl orders ties correctly inside one max)
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("w"))
        .select(col("dst"), (-col("w.neg")).as("newLbl"))
      labels = labels.join(best, labels("node") === best("dst"), "left")
        .select(col("node"), coalesce(col("newLbl"), col("lbl")).as("lbl"))
        .transform(Iter.pin)
    }
    e.unpersist()
    nodes.unpersist()
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** Multi-source BFS distances, `rounds` synchronous hops: the k-hop
    * reachability primitive (e.g. how far does contamination spread
    * from a set of flagged documents through the near-dup graph).
    * Pure integer min-propagation — distance vector starts at 0 on the
    * seeds, each round takes min(dist, 1 + min over in-neighbors) —
    * so an oracle unrolls it exactly like [[pageRank]]'s CTEs. Nodes
    * unreached within `rounds` hops report distance −1 (documented
    * sentinel; NULL would make the driver hash fragile).
    *
    * Scale shape per round: one distance-vector equi-join + one min
    * aggregate per destination (map-side combinable); lineage cut per
    * round. Callers wanting undirected semantics pass both directions.
    */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds > 0)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().cache()
    val s0 = seeds.select(col(seedCol).cast("long").as("node")).distinct()
    val Unreached = Long.MaxValue
    var dist = nodes.join(s0.withColumn("z", lit(0L)), Seq("node"), "left")
      .select(col("node"), coalesce(col("z"), lit(Unreached)).as("d"))
      .transform(Iter.pin)
    for (_ <- 1 to rounds) {
      val relaxed = e.join(dist, e("src") === dist("node"))
        .filter(col("d") =!= Unreached) // don't relax from unreached
        .groupBy(col("dst")).agg((min(col("d")) + 1).as("nd"))
      dist = dist.join(relaxed, dist("node") === relaxed("dst"), "left")
        .select(col("node"), least(col("d"), coalesce(col("nd"),
          lit(Unreached))).as("d"))
        .transform(Iter.pin)
    }
    e.unpersist()
    nodes.unpersist()
    dist.select(col("node"),
      when(col("d") === Unreached, lit(-1L)).otherwise(col("d"))
        .as("distance"))
  }

  /** Exact triangle count via degree-ordered compact-forward (Latapy
    * 2008 / the MapReduce formulation of Suri–Vassilvitskii WWW'11):
    * orient every undirected edge from the (degree, id)-smaller
    * endpoint to the larger, so each triangle is counted exactly once
    * as an oriented wedge a→b, a→c closed by b→c — and the join fan-out
    * is bounded by the ORIENTED out-degree, O(√m) on any graph,
    * instead of the raw degree (the hub-explosion guard).
    *
    * Input is a symmetric edge list (both directions present, no
    * self-loops). Returns one row: (n_nodes, n_edges, n_triangles) —
    * pure integer counts.
    *
    * Scale shape: one degree aggregate, one wedge equi-join on the
    * middle node, one closing semi-join on the (b, c) pair — all hash
    * exchanges on node/pair keys; nothing is ever all-pairs.
    */
  def triangleCount(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("node").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")), "dst")
    // orient by (deg, id): a triangle survives as exactly one wedge
    val oriented = withDeg.filter(
      col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("src") < col("dst")))
      .select(col("src").as("a"), col("dst").as("b")).cache()
    val wedges = oriented.as("o1")
      .join(oriented.as("o2"), col("o1.b") === col("o2.a"))
      .select(col("o1.a").as("a"), col("o1.b").as("b"), col("o2.b").as("c"))
    val closed = wedges.join(oriented
        .select(col("a").as("wa"), col("b").as("wc")),
      col("a") === col("wa") && col("c") === col("wc"), "left_semi")
    val nNodes = e.select(col("src")).distinct().count()
    val nEdges = e.count() / 2
    val nTri = closed.count()
    oriented.unpersist()
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nNodes, nEdges, nTri)).toDF("n_nodes", "n_edges", "n_triangles")
  }

  /** Per-node local clustering coefficient (Watts–Strogatz 1998):
    * `2·t(v) / (deg(v)·(deg(v)−1))` with t(v) the triangles through v,
    * counted once each by the same degree-ordered compact-forward
    * orientation as [[triangleCount]] and attributed to all three
    * corners. Nodes of degree < 2 score 0. Integer counts; one final
    * guarded division per node.
    *
    * Scale shape: [[triangleCount]]'s wedge join kept as an inner join
    * (closed triangles explode to 3 attribution rows), then one
    * node-keyed count — fan-out still bounded by oriented out-degree.
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("node").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")), "dst")
    val oriented = withDeg.filter(
      col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("src") < col("dst")))
      .select(col("src").as("a"), col("dst").as("b")).cache()
    val wedges = oriented.as("o1")
      .join(oriented.as("o2"), col("o1.b") === col("o2.a"))
      .select(col("o1.a").as("a"), col("o1.b").as("b"), col("o2.b").as("c"))
    val closed = wedges.join(oriented
        .select(col("a").as("wa"), col("b").as("wc")),
      col("a") === col("wa") && col("c") === col("wc"))
      .select(col("a"), col("b"), col("c"))
    val triPerNode = closed
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("t"))
    val out = deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("deg").cast("bigint").as("degree"),
        coalesce(col("t"), lit(0L)).cast("bigint").as("n_triangles"),
        when(col("deg") < 2, lit(0.0)).otherwise(
          lit(2.0) * coalesce(col("t"), lit(0L)).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .as("clustering_coeff"))
    oriented.unpersist()
    out
  }

  /** Adamic–Adar link prediction scores (Adamic & Adar 2003): for every
    * 2-hop pair (u, v), `AA = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w)` plus the
    * raw common-neighbor count — the classic "which docs/entities
    * should be linked" primitive. Only integer degrees enter the
    * logarithm, each `1/ln` is canonicalized through DECIMAL(20,12)
    * and the sum runs in DECIMAL(30,14), so scores adjudicate exactly.
    * A common neighbor has degree ≥ 2 by construction, so ln is never
    * zero.
    *
    * Scale shape: one wedge self-join keyed on the middle node w (the
    * only shuffle that matters; fan-out deg(w)² — cap hot hubs with a
    * degree cutoff upstream if the graph has them), then a groupBy on
    * the (u, v) pair.
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Long = 2L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src").as("w")).agg(count(lit(1)).as("deg"))
    val nbrs = e.select(col("dst").as("w"), col("src").as("u"))
    val invLn = lit(1.0) /
      log(col("deg").cast("double")).cast("decimal(20,12)").cast("double")
    val wedges = nbrs.as("l")
      .join(nbrs.withColumnRenamed("u", "v").as("r"), Seq("w"))
      .filter(col("u") < col("v"))
      .join(deg, Seq("w"))
    wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).cast("bigint").as("common"),
        sum(invLn.cast("decimal(30,14)")).as("s"))
      .filter(col("common") >= minCommon)
      .select(col("u"), col("v"), col("common"),
        col("s").cast("double").as("aa_score"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the (directed) edge list — do hubs link to
    * hubs (r > 0, social graphs) or to leaves (r < 0, web/biology)?
    * The one-number wiring diagnostic read alongside the degree
    * distribution before trusting any sampled subgraph.
    *
    * Everything before the final doubles is exact BIGINT: degrees are
    * counts, and the five Pearson power sums (Σx, Σy, Σxy, Σx², Σy²
    * over edges) are integer sums of integer products; the closed form
    * `(nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²))` is then one
    * identical double expression. Degenerate variance (regular graph)
    * returns NULL rather than a NaN.
    *
    * Scale shape: one degree aggregate, two broadcast joins of the
    * O(#nodes) degree table onto the edges, one global aggregate.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val ue = edges.select(col(srcCol).cast("bigint").as("src"),
        col(dstCol).cast("bigint").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val deg = ue.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("bigint").as("d"))
    val joined = ue
      .join(deg.select(col("node").as("src"), col("d").as("dx")), "src")
      .join(deg.select(col("node").as("dst"), col("d").as("dy")), "dst")
    // r10 decimal-width audit: dx·dy summed as BIGINT wraps SILENTLY
    // past 2⁶³ (non-ANSI long arithmetic) — at 10⁹ edges with hub
    // degrees ~10⁶ the product sum is ~10²¹. The power sums now ride
    // DECIMAL(19,0)→(38,0) exactly (the DuckDB-HUGEINT twin: its
    // oracle sums 128-bit and errors loudly); the n·Σxy − ΣxΣy
    // closed form stays in DECIMAL(38,0) and only the final statistic
    // drops to double. The displayed sx/sy/sxy keep their BIGINT
    // contract — past 2⁶³ they null out (detectable) instead of
    // wrapping, while `assortativity` stays exact.
    def d19(c: Column) = c.cast("decimal(19,0)")
    val sums = joined.agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(d19(col("dx"))).cast("decimal(38,0)").as("sxd"),
      sum(d19(col("dy"))).cast("decimal(38,0)").as("syd"),
      sum(d19(col("dx")) * d19(col("dy"))).cast("decimal(38,0)").as("sxyd"),
      sum(d19(col("dx")) * d19(col("dx"))).cast("decimal(38,0)").as("sxxd"),
      sum(d19(col("dy")) * d19(col("dy"))).cast("decimal(38,0)").as("syyd"))
    val nd = d19(col("n"))
    val varx = nd * col("sxxd") - col("sxd") * col("sxd")
    val vary = nd * col("syyd") - col("syd") * col("syd")
    sums.select(col("n"),
      col("sxd").cast("bigint").as("sx"),
      col("syd").cast("bigint").as("sy"),
      col("sxyd").cast("bigint").as("sxy"),
      when(varx > 0 && vary > 0,
        (nd * col("sxyd") - col("sxd") * col("syd")).cast("double") /
          sqrt(varx.cast("double") * vary.cast("double")))
        .otherwise(lit(null).cast("double")).as("assortativity"))
  }

  /** k-core decomposition (Seidman 1983) by synchronous peeling: drop
    * every node with fewer than k live neighbors, recompute degrees
    * over the surviving induced subgraph, repeat for `rounds` rounds —
    * the graph-quality filter that isolates the densely-connected
    * "core" of a link/citation/co-occurrence graph (spam and orphan
    * tails peel off first). Returns the surviving nodes with their
    * in-core degrees and a `converged` certificate: min live degree
    * ≥ k means one more round would change NOTHING, so the output IS
    * the exact k-core regardless of how many rounds it took — the
    * bounded unroll never silently under-peels, it either certifies or
    * reports `converged = false`.
    *
    * Scale shape: each round is two semi-joins of the edge list
    * against the live-node set plus one degree groupBy — O(E) per
    * round, `rounds` a small constant (peeling cascades are shallow on
    * real graphs). Unlike the Lloyd/FPS unrolls, the per-round state
    * is pinned EAGERLY via [[Iter.pin]]: the live set feeds BOTH
    * semi-joins of the next round, so lazy lineage doubles per round
    * and the 6-round plan measurably collapses the optimizer (>9 min
    * at 9 k edges before the pin, seconds after). The pinned state is
    * O(live nodes) per round — at cluster scale set
    * `spark.graft.reliableCheckpoint` + a checkpoint dir and the same
    * pins survive executor loss.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int = 6): DataFrame = {
    val ue = edges.select(col(srcCol).cast("bigint").as("src"),
        col(dstCol).cast("bigint").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .transform(Iter.pin)
    def induced(alive: DataFrame): DataFrame = ue
      .join(alive.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(alive.select(col("node").as("dst")), Seq("dst"), "left_semi")
    var alive = ue.select(col("src").as("node")).distinct()
      .transform(Iter.pin)
    for (_ <- 1 to rounds) {
      alive = induced(alive).groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("bigint").as("degree"))
        .filter(col("degree") >= k).select(col("node"))
        .transform(Iter.pin)
    }
    // degrees must be RECOMPUTED on the final induced subgraph: the
    // loop's last filter used pre-peel degrees, so min ≥ k over those
    // would be a vacuous certificate. A node that lost every edge in
    // the final peel shows up with degree 0 here (and fails the cert).
    val finalDeg = induced(alive).groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("bigint").as("degree"))
    val out = alive.join(finalDeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("degree"), lit(0L)).as("degree"))
    val cert = out.agg((min(col("degree")) >= k).as("conv"))
    out.crossJoin(broadcast(cert))
      .select(col("node"), col("degree"), col("conv").as("converged"))
  }
}
