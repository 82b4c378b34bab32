package graft.grid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Nulls

/** Multi-table detection inside a messy grid — the reference's signature
  * operator (_find_all_tables_in_sheet + _score_table_candidate,
  * etl.py:329–438, 279–324).
  *
  * Pipeline: content mask → 8-connectivity connected components →
  * bounding boxes → min-size filter (3×2, etl.py:72–73,382) → density
  * filter (0.25, etl.py:75,392) → score → greedy non-overlapping
  * selection by score (etl.py:411–435).
  *
  * Two tiers:
  *  - [[findTables]]: spreadsheet-scale driver tier (grids are bounded
  *    by Grid.MaxDriverCells) — union-find labeling, exact replica of
  *    the scipy.ndimage.label semantics.
  *  - [[connectedComponentsDistributed]]: the 100 TB design — rows are
  *    compressed into horizontal runs (O(tables·rows) runs ≪ cells),
  *    runs become graph vertices, vertical/diagonal overlap becomes
  *    edges, and components are found by min-label propagation with
  *    pointer jumping (O(log n) rounds, each one shuffle).
  */
object TableDetect {

  val MinTableRows = 3 // etl.py:72
  val MinTableCols = 2 // etl.py:73
  val DensityThreshold = 0.25 // etl.py:75
  val HeaderConfidence = 0.6 // etl.py:74

  /** r1/c1/r2/c2 are 0-indexed inclusive, like coords_in_sheet (etl.py:429). */
  final case class Detected(
      cells: Array[Array[String]],
      id: String,
      r1: Int, c1: Int, r2: Int, c2: Int,
      score: Double)

  private def isContentCell(v: String): Boolean =
    v != null && !v.matches("^\\s*$") && !Nulls.detectionTokens.contains(v)

  /** Driver-tier detection over a collected grid. */
  def findTables(
      cells: Array[Array[String]],
      minRows: Int = MinTableRows,
      minCols: Int = MinTableCols,
      densityThreshold: Double = DensityThreshold,
      headerConfidence: Double = HeaderConfidence): Seq[Detected] = {
    val nr = cells.length
    if (nr == 0) return Seq.empty
    val nc = cells.map(_.length).maxOption.getOrElse(0)
    if (nc == 0) return Seq.empty

    val mask = Array.tabulate(nr, nc)((r, c) =>
      c < cells(r).length && isContentCell(cells(r)(c)))

    // -- 8-connectivity union-find labeling (scipy.ndimage.label with
    //    np.ones((3,3)) structure, etl.py:369). Labels are assigned in
    //    row-major first-encounter order, matching scipy's output order.
    val parent = Array.fill(nr * nc)(-1)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    for (r <- 0 until nr; c <- 0 until nc if mask(r)(c)) {
      val idx = r * nc + c
      parent(idx) = idx
      // connect to already-visited neighbors: W, NW, N, NE
      if (c > 0 && mask(r)(c - 1)) union(idx, idx - 1)
      if (r > 0) {
        if (c > 0 && mask(r - 1)(c - 1)) union(idx, idx - nc - 1)
        if (mask(r - 1)(c)) union(idx, idx - nc)
        if (c < nc - 1 && mask(r - 1)(c + 1)) union(idx, idx - nc + 1)
      }
    }

    // bounding boxes per component root, in first-encounter order
    final case class BBox(var r1: Int, var c1: Int, var r2: Int, var c2: Int)
    val boxes = scala.collection.mutable.LinkedHashMap.empty[Int, BBox]
    for (r <- 0 until nr; c <- 0 until nc if mask(r)(c)) {
      val root = find(r * nc + c)
      val b = boxes.getOrElseUpdate(root, BBox(r, c, r, c))
      if (r < b.r1) b.r1 = r; if (r > b.r2) b.r2 = r
      if (c < b.c1) b.c1 = c; if (c > b.c2) b.c2 = c
    }

    def slice(b: BBox): Array[Array[String]] =
      (b.r1 to b.r2).map(r => (b.c1 to b.c2).map(c =>
        if (c < cells(r).length) cells(r)(c) else null).toArray).toArray

    // size + density filters (etl.py:382, 388–394)
    val candidates = boxes.values.toSeq.flatMap { b =>
      val blockRows = b.r2 - b.r1 + 1
      val blockCols = b.c2 - b.c1 + 1
      if (blockRows < minRows || blockCols < minCols) None
      else {
        val block = slice(b)
        val points = block.iterator.map(_.count(isContentCell)).sum
        val density = points.toDouble / (blockRows * blockCols)
        if (density < densityThreshold) None
        else Some((b, block))
      }
    }

    // score (etl.py:279–324); min_data_rows = max(1, minRows-1) (etl.py:410)
    val minDataRows = minDataRowsFor(minRows)
    val scored = candidates
      .map { case (b, block) => (b, block, scoreCandidate(block, headerConfidence, minDataRows, densityThreshold)) }
      .filter(_._3 > -0.5)
      .sortBy(-_._3) // stable sort: score ties keep label order, like pandas

    // greedy non-overlap selection (etl.py:411–435)
    val covered = Array.fill(nr, nc)(false)
    var counter = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Detected]
    for ((b, block, score) <- scored) {
      val overlaps = (b.r1 to b.r2).exists(r => (b.c1 to b.c2).exists(c => covered(r)(c)))
      if (!overlaps) {
        counter += 1
        out += Detected(block, s"table_$counter", b.r1, b.c1, b.r2, b.c2, score)
        for (r <- b.r1 to b.r2; c <- b.c1 to b.c2) covered(r)(c) = true
      }
    }
    out.toSeq
  }

  /** min_data_rows = max(1, minRows-1) (etl.py:410) — shared by both
    * tiers so their accept/reject decisions cannot drift apart.
    */
  private def minDataRowsFor(minRows: Int): Int = math.max(1, minRows - 1)

  /** _score_table_candidate (etl.py:279–324), formula-exact:
    * reject density < threshold/2; header score from the first row
    * (0.4 plausible / 0.3 all-unique / 0.1 weak); reject if data rows
    * (minus plausible header) < minDataRows;
    * score = density*0.5 + header*0.3 + log1p(points)*0.01.
    */
  def scoreCandidate(
      block: Array[Array[String]],
      headerConfidence: Double,
      minDataRows: Int,
      densityThreshold: Double = DensityThreshold): Double = {
    val rows = block.length
    if (rows < 1 || block(0).length < 1) return -1.0
    val cols = block(0).length
    val points = block.iterator.map(_.count(isContentCell)).sum.toLong
    scoreFromStats(rows, cols, points, block(0), headerConfidence,
      minDataRows, densityThreshold)
  }

  /** The score formula from rectangle-level stats — the ONE scorer both
    * tiers call, so they rank identically by construction. `points` and
    * `firstRow` are over the bounding-box RECTANGLE (including cells of
    * other components inside it), exactly like the reference's slice
    * (etl.py:386).
    */
  def scoreFromStats(
      rows: Int, cols: Int, points: Long, firstRow: Array[String],
      headerConfidence: Double, minDataRows: Int,
      densityThreshold: Double): Double = {
    if (rows < 1 || cols < 1) return -1.0
    val density = points.toDouble / (rows.toLong * cols)
    if (density < densityThreshold / 2) return -1.0

    // first row: nonNull excludes detection tokens AND '' (etl.py:287);
    // distinct counts RAW strings (pandas .astype(str).nunique()).
    val first = firstRow.map(v => if (v == null) "nan" else v) // pandas str(NaN)
    val firstNonNull = first.count(v => v.nonEmpty && !Nulls.detectionTokens.contains(v) && !v.matches("^\\s*$"))
    val firstDistinct = first.distinct.length
    var headerScore = 0.0
    var plausible = false
    if (firstNonNull > 0 &&
      firstDistinct.toDouble / firstNonNull >= headerConfidence * 0.8 &&
      firstDistinct > 0) {
      val numericCount = first.count(v => scala.util.Try(v.trim.toDouble).isSuccess)
      if (numericCount.toDouble / firstNonNull < 0.4) { headerScore += 0.4; plausible = true }
      else if (firstDistinct == first.length) { headerScore += 0.3; plausible = true }
      else headerScore += 0.1
    }
    val dataRows = if (plausible) rows - 1 else rows
    if (dataRows < minDataRows) return -1.0

    density * 0.5 + headerScore * 0.3 + math.log1p(points.toDouble) * 0.01
  }

  /** Distributed connected components over grid cells — the scale tier.
    *
    * Input: a Grid; output: (row, col, component) for every content
    * cell, where `component` is the min linearized cell id of the
    * component. Works by compressing each row into horizontal runs
    * (consecutive content cells), then running min-label propagation
    * with pointer jumping over the run-overlap graph. Runs shrink the
    * problem from O(cells) to O(row-segments); each iteration is two
    * shuffles; convergence is O(log(components diameter)) because label
    * values jump through the current minimum, not one hop at a time.
    */
  def connectedComponentsDistributed(grid: Grid): DataFrame = {
    val spark = grid.df.sparkSession
    import spark.implicits._

    // run ids pack (row, startCol) into one long with a 1e9 column base;
    // silent id collisions above that would merge unrelated components
    require(grid.nCols < 1000000000,
      s"grid has ${grid.nCols} columns; run-id encoding supports < 1e9")

    val cellCols = grid.dataCols
    // long-form content cells: (row, col)
    val cells = grid.df
      .select(col("_row").as("r"),
        posexplode(array(cellCols.map(col): _*)).as(Seq("c", "v")))
      .where(Nulls.isContent(col("v")))
      .select($"r", $"c".cast("long").as("c"))

    // horizontal runs: (r, cStart, cEnd, runId)
    val w = Window.partitionBy($"r").orderBy($"c")
    val runs = cells
      .withColumn("brk", when($"c" - lag($"c", 1, -2).over(w) =!= 1, 1).otherwise(0))
      .withColumn("grp", sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"r", $"grp")
      .agg(min($"c").as("c1"), max($"c").as("c2"))
      .withColumn("run", $"r" * 1000000000L + $"c1") // unique, order-preserving
      .select($"r", $"c1", $"c2", $"run")
      .cache()

    // edges between runs on adjacent rows with 8-connectivity overlap
    // (diagonal contact ⇒ intervals expanded by 1 must intersect)
    val a = runs.select($"r".as("ra"), $"c1".as("a1"), $"c2".as("a2"), $"run".as("runA"))
    val b = runs.select($"r".as("rb"), $"c1".as("b1"), $"c2".as("b2"), $"run".as("runB"))
    val edges = a.join(b, $"rb" === $"ra" + 1 &&
        $"b1" <= $"a2" + 1 && $"b2" >= $"a1" - 1)
      .select($"runA", $"runB")

    // min-label propagation + pointer jumping until fixpoint
    var labels = runs.select($"run", $"run".as("label"))
    val sym = edges.select($"runA".as("x"), $"runB".as("y"))
      .union(edges.select($"runB".as("x"), $"runA".as("y")))
      .cache()
    var changed = 1L
    while (changed > 0) {
      // neighbor minimum
      val viaNeighbors = sym.join(labels, $"y" === $"run")
        .groupBy($"x").agg(min($"label").as("nlabel"))
      val stepped = labels.join(viaNeighbors, $"run" === $"x", "left")
        .select($"run", least(coalesce($"nlabel", $"label"), $"label").as("label"))
      // pointer jump: label ← label's label; checkpointing truncates
      // the lineage so each iteration replans a constant-size DAG
      // instead of an ever-growing one. Reliable checkpoint when a
      // checkpoint dir is configured (executor loss mid-loop would
      // otherwise lose localCheckpoint blocks with no lineage to
      // recompute — the failure mode that matters on preemptible
      // clusters); executor-local otherwise (single-node/test).
      val jumpedPlan = stepped.as("s")
        .join(stepped.select($"run".as("pr"), $"label".as("plabel")), $"s.label" === $"pr", "left")
        .select($"run", least(coalesce($"plabel", $"s.label"), $"s.label").as("label"))
      val jumped =
        if (spark.sparkContext.getCheckpointDir.isDefined) jumpedPlan.checkpoint(true)
        else jumpedPlan.localCheckpoint(true)
      changed = jumped.as("n").join(labels.as("o"), "run")
        .where($"n.label" =!= $"o.label").count()
      labels = jumped
    }

    // the iteration is done (labels is a materialized localCheckpoint);
    // release the loop-only caches so repeated invocations in a
    // long-lived session don't accumulate executor blocks — the final
    // expansion below recomputes `runs` once, narrowly
    sym.unpersist()
    runs.unpersist()

    // expand runs back to cells with their component label
    runs.join(labels, "run")
      .select($"r", $"c1", $"c2", $"label")
      .withColumn("c", explode(sequence($"c1", $"c2")))
      .select($"r".as("row"), $"c".as("col"), $"label".as("component"))
  }

  /** Candidate bounding box + the rectangle statistics the scorer needs,
    * as produced by the fully-distributed tier.
    */
  final case class Candidate(
      r1: Int, c1: Int, r2: Int, c2: Int,
      points: Long, firstRow: Array[String])

  /** Fully-distributed detection: CC labels → per-component bounding
    * boxes and content counts → size/density filters → per-block
    * first-row statistics — every step a DataFrame aggregation; only the
    * O(candidates) score/greedy-select step runs on the driver (same
    * arithmetic as the driver tier, so both tiers select identical
    * tables). Returns coords + scores; callers slice the grid lazily.
    */
  def findTablesDistributedCoords(
      grid: Grid,
      minRows: Int = MinTableRows,
      minCols: Int = MinTableCols,
      densityThreshold: Double = DensityThreshold,
      headerConfidence: Double = HeaderConfidence): Seq[(String, Int, Int, Int, Int, Double)] = {
    val spark = grid.df.sparkSession
    import spark.implicits._

    val cc = connectedComponentsDistributed(grid).cache()

    // bounding boxes, size-filtered (density is a RECTANGLE property —
    // computed below from raw cells, like the reference's slice)
    val boxes = cc.groupBy($"component")
      .agg(min($"row").as("r1"), min($"col").as("c1"),
        max($"row").as("r2"), max($"col").as("c2"))
      .filter($"r2" - $"r1" + 1 >= minRows && $"c2" - $"c1" + 1 >= minCols)

    // rectangle stats per surviving box from the RAW grid: content count
    // over the whole rectangle (cells of OTHER components inside the box
    // count too — exactly the reference's bbox slice, etl.py:386) plus
    // the first row's raw values for the header heuristic
    val cellCols = grid.dataCols
    val rawCells = grid.df
      .select(col("_row").as("row"),
        posexplode(array(cellCols.map(col): _*)).as(Seq("col", "v")))
      .select($"row", $"col".cast("long").as("col"), $"v")
    val stats = boxes.join(rawCells,
        $"row".between($"r1", $"r2") && $"col".between($"c1", $"c2"))
      .groupBy($"component", $"r1", $"c1", $"r2", $"c2")
      .agg(
        count(when(Nulls.isContent($"v"), 1)).as("rectPoints"),
        collect_list(when($"row" === $"r1", struct($"col", $"v"))).as("fr"))
      // density pre-filter (etl.py:388–394) BEFORE the collect: a huge
      // sparse grid can have millions of size-passing noise components,
      // and only the density survivors are O(candidates) driver data
      .filter($"rectPoints".cast("double") /
        (($"r2" - $"r1" + 1) * ($"c2" - $"c1" + 1)) >= densityThreshold)

    val candidates = stats.orderBy($"component").collect().map { r =>
      val firstRow = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("fr"))
        .sortBy(_.getLong(0)).map(x => x.getString(1)).toArray
      Candidate(r.getAs[Long]("r1").toInt, r.getAs[Long]("c1").toInt,
        r.getAs[Long]("r2").toInt, r.getAs[Long]("c2").toInt,
        r.getAs[Long]("rectPoints"), firstRow)
    }
    cc.unpersist()

    // driver-side: the SAME scorer as the driver tier + greedy select
    val minDataRows = minDataRowsFor(minRows)
    val scored = candidates.toSeq.flatMap { cd =>
      val rows = cd.r2 - cd.r1 + 1
      val cols = cd.c2 - cd.c1 + 1
      val density = cd.points.toDouble / (rows.toLong * cols)
      if (density < densityThreshold) None // pre-filter (etl.py:388–394)
      else {
        val score = scoreFromStats(rows, cols, cd.points, cd.firstRow,
          headerConfidence, minDataRows, densityThreshold)
        if (score > -0.5) Some((cd, score)) else None
      }
    }.sortBy(-_._2)

    val accepted = scala.collection.mutable.ArrayBuffer.empty[(Candidate, Double)]
    for ((cd, score) <- scored) {
      val overlaps = accepted.exists { case (o, _) =>
        cd.r1 <= o.r2 && cd.r2 >= o.r1 && cd.c1 <= o.c2 && cd.c2 >= o.c1
      }
      if (!overlaps) accepted += cd -> score
    }
    accepted.toSeq.zipWithIndex.map { case ((cd, score), i) =>
      (s"table_${i + 1}", cd.r1, cd.c1, cd.r2, cd.c2, score)
    }
  }
}
