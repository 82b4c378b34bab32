package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial joins over point sets — the geo face of the
  * same scale discipline as the LSH/IVF stack: candidates come from an
  * EQUI-join on spatial grid cells (a point meets only the 3×3 cell
  * neighborhood that can contain matches at the query radius), then an
  * exact distance verify — never an all-pairs theta join.
  *
  * Geometry runs in integer micro-degrees end to end: coordinates are
  * BIGINT micro-degrees, cell ids are integer divisions, and the
  * distance test compares exact integer squared distances — so every
  * pair decision is bit-replayable by a plain-SQL oracle (no trig in
  * the adjudicated path). The metric is planar degree-space distance;
  * production geodesy swaps the verify to haversine (and sizes cells
  * by the cos(lat)-shrunk longitude span) without touching the
  * bucketing shape, which is the part that matters at scale.
  *
  * Scale shape: cells are radius-sized, so candidate volume is
  * output-bound (each point joins its ~9-cell neighborhood, expected
  * occupancy n·r²/area); the join shuffles on cell ids (8-byte keys);
  * a skewed hot cell (city center) salts exactly like any hot join
  * key ([[Skew]]).
  */
object Geo {

  /** Deterministic synthetic coordinates for an integer-keyed table —
    * a ~111 km × 85 km box ([40°, 41°] × [−74°, −73°], micro-degree
    * resolution). A single multiplicative hash of SEQUENTIAL ids puts
    * every point on a 1-D lattice (measured: 19 radius pairs at sf0.01
    * vs ~350 expected uniform — the same lattice trap the r07 LSH
    * planes hit), so each axis runs the 31-bit xorshift-multiply mix
    * the SimHash oracle already replays in SQL: x ^= x>>13;
    * x = x·1103515245 mod 2^31; x ^= x>>17. All intermediates stay
    * < 2^62, exact BIGINT on both engines. Stands in for the lat/lon
    * columns a real corpus would carry.
    */
  def syntheticPoints(df: DataFrame, idCol: String): DataFrame = {
    def mix(mult: Long, add: Long): Column = {
      val v1 = (col(idCol).cast("bigint") * lit(mult) + lit(add)) %
        lit(2147483648L)
      val x1 = v1.bitwiseXOR(shiftright(v1, 13))
      val v3 = (x1 * lit(1103515245L)) % lit(2147483648L)
      v3.bitwiseXOR(shiftright(v3, 17))
    }
    df.select(
      col(idCol).cast("bigint").as("id"),
      (lit(40000000L) + mix(2654435761L, 97L) % lit(1000001L))
        .as("lat_micro"),
      (lit(-74000000L) + mix(2246822519L, 31L) % lit(1000001L))
        .as("lon_micro"))
  }

  /** All pairs within `radiusMicro` micro-degrees (planar): grid cells
    * of side `radiusMicro`, candidates from the 3×3 neighbor-cell
    * equi-join, exact integer verify `Δlat² + Δlon² ≤ r²`. Each point
    * occupies ONE cell, so a pair meets on exactly one (dx, dy) offset
    * — no post-join dedup needed. Both axes are shifted positive
    * before the cell division so truncating integer division IS floor
    * division on both engines (also for southern-hemisphere /
    * western-hemisphere inputs).
    *
    * Returns (id_a, id_b, dist2, dist_deg) with id_a < id_b;
    * `dist_deg` = √dist2 / 1e6 (one correctly-rounded sqrt of an exact
    * integer — bit-identical cross-engine).
    */
  // `div`, not `/`: Spark's / is double division, and a
  // correctly-rounded-up quotient would land points in the wrong cell.
  // BOTH axes are shifted positive before the truncating div —
  // truncation toward zero is floor division only on non-negatives;
  // an unshifted southern-hemisphere lat would make cell 0 span
  // (−r, r), double-width, silently inflating candidates.
  private def cellify(points: DataFrame, radiusMicro: Long): DataFrame =
    points.select(col("id"), col("lat_micro"), col("lon_micro"),
      expr(s"(lat_micro + 90000000L) div ${radiusMicro}L").as("cx"),
      expr(s"(lon_micro + 180000000L) div ${radiusMicro}L").as("cy"))

  /** The 9-offset probe side: each point re-keyed to every neighbor
    * cell that could hold a match at the query radius.
    */
  private def probeSide(points: DataFrame, radiusMicro: Long): DataFrame = {
    val offsets = points.sparkSession.range(0, 9)
      .select(expr("id div 3 - 1").as("dx"), expr("id % 3 - 1").as("dy"))
    cellify(points, radiusMicro).crossJoin(broadcast(offsets))
      .select(col("id").as("id_b"), col("lat_micro").as("lat_b"),
        col("lon_micro").as("lon_b"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
  }

  private def d2: Column =
    (col("lat_micro") - col("lat_b")) * (col("lat_micro") - col("lat_b")) +
      (col("lon_micro") - col("lon_b")) * (col("lon_micro") - col("lon_b"))

  def radiusPairs(points: DataFrame, radiusMicro: Long): DataFrame = {
    val r = lit(radiusMicro)
    cellify(points, radiusMicro)
      .join(probeSide(points, radiusMicro), Seq("cx", "cy"))
      .filter(col("id") < col("id_b") && d2 <= r * r)
      .select(col("id").as("id_a"), col("id_b"), d2.as("dist2"),
        (sqrt(d2.cast("double")) / lit(1000000.0)).as("dist_deg"))
  }

  /** Incremental face of [[radiusPairs]] —
    * [[graft.ext.Dedup.spanDedupAgainstHistory]]'s two-input
    * convention on the geo modality: for a batch of NEW points against
    * an accepted historical point set, report every in-radius pair the
    * batch introduces — batch-internal pairs (id_a < id_b, `origin =
    * 'batch'`) and new-vs-history pairs (id_a = new id, `origin =
    * 'history'`). History×history pairs were reported when THOSE
    * batches arrived, so each pair is reported exactly once across any
    * batch split — the composition property a streaming geofence /
    * proximity-dedup pipeline needs.
    *
    * Scale shape: both legs are the same neighbor-cell equi-join; the
    * history side ships only the cells the batch's probe keys touch —
    * at 100 TB, bucket the stored history by cell id so batch probes
    * co-locate without reshuffling it.
    */
  def radiusPairsAgainstHistory(newPts: DataFrame, histPts: DataFrame,
      radiusMicro: Long): DataFrame = {
    val r = lit(radiusMicro)
    val inBatch = radiusPairs(newPts, radiusMicro)
      .select(col("id_a"), col("id_b"), col("dist2"), col("dist_deg"),
        lit("batch").as("origin"))
    // the id != id_b guard: at-least-once delivery can re-deliver a
    // point id already in history; without it the point pairs with its
    // own historical copy at distance 0 — a spurious proximity alert
    val vsHist = cellify(newPts, radiusMicro)
      .join(probeSide(histPts, radiusMicro), Seq("cx", "cy"))
      .filter(col("id") =!= col("id_b") && d2 <= r * r)
      .select(col("id").as("id_a"), col("id_b"), d2.as("dist2"),
        (sqrt(d2.cast("double")) / lit(1000000.0)).as("dist_deg"),
        lit("history").as("origin"))
    inBatch.unionByName(vsHist)
  }

  /** Nearest neighbor within `radiusMicro` for every point that has
    * one: the symmetrized radius pairs ranked by (dist2, neighbor id).
    * The classic bounded-radius kNN that rides the same grid join —
    * points in empty neighborhoods simply produce no row (no unbounded
    * global search at scale).
    */
  def nearestWithin(points: DataFrame, radiusMicro: Long): DataFrame = {
    val pairs = radiusPairs(points, radiusMicro)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nn_id"),
        col("dist2"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nn_id"),
        col("dist2")))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("dist2"), col("nn_id"))
    sym.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"), col("nn_id"), col("dist2"),
        (sqrt(col("dist2").cast("double")) / lit(1000000.0)).as("dist_deg"))
  }

  /** Per-cell density profile at an arbitrary cell size — the
    * aggregation face of the same grid (hot-cell discovery for salting
    * decisions, coverage maps): one exact groupBy on the cell id.
    */
  def cellDensity(points: DataFrame, cellMicro: Long): DataFrame =
    points.groupBy(
        expr(s"(lat_micro + 90000000L) div ${cellMicro}L").as("cx"),
        expr(s"(lon_micro + 180000000L) div ${cellMicro}L").as("cy"))
      .agg(count(lit(1)).cast("bigint").as("n_points"),
        min(col("id")).cast("bigint").as("min_id"))

  // ---- geodesic face -----------------------------------------------

  /** Mean-sphere Earth radius in meters (the haversine convention). */
  val EarthRadiusM = 6371000.0
  private val DegToRad = math.Pi / 180.0

  /** The EWMA-pow canonicalization: every transcendental output is
    * rounded to DECIMAL(20,12) (shortest-string semantics on the Spark
    * side, VARCHAR roundtrip in the oracle) so a ≤1-ulp sin/cos/asin
    * difference between the JVM and DuckDB's libm can never flip a
    * pair decision.
    */
  private def canon(c: Column): Column =
    c.cast("decimal(20,12)").cast("double")

  /** Geodesic cell sizing: the exact degree spans a great-circle
    * radius `radiusMeters` can cover, conservatively, anywhere with
    * |lat| ≤ `maxAbsLatMicro`.
    *
    *  - latitude: Δφ_rad ≤ r/R exactly, so the lat cell is
    *    ceil(r·180/(π·R) · 1e6) micro-degrees;
    *  - longitude: from haversine, sin(d/2R) ≥ cos(φmax)·sin(Δλ/2),
    *    so Δλ ≤ 2·asin(sin(r/2R)/cos(φmax)) — the EXACT bound (no
    *    small-angle approximation), degenerating to a single
    *    360°-wide cell when the band reaches the pole.
    *
    * cos(lat)-scaled cells are what make the grid correct at high
    * latitude: at 60° a fixed-degree cell is 2× too wide east-west.
    */
  private[ext] def geodesicCells(radiusMeters: Double,
      maxAbsLatMicro: Long): (Long, Long) = {
    require(radiusMeters > 0, "radius must be positive")
    require(maxAbsLatMicro > 0 && maxAbsLatMicro < 90000000L,
      "maxAbsLatMicro must be in (0, 90 deg)")
    val latCell = math.ceil(radiusMeters / (DegToRad * EarthRadiusM) * 1e6)
      .toLong.max(1L)
    val s = math.sin(radiusMeters / (2.0 * EarthRadiusM)) /
      math.cos(maxAbsLatMicro / 1e6 * DegToRad)
    val lonCell =
      if (s >= 1.0) 360000000L
      else math.ceil(2.0 * math.asin(s) / DegToRad * 1e6).toLong.max(1L)
    (latCell, lonCell)
  }

  /** Number of EQUAL longitude cells on the full 360° ring, each at
    * least `lonCellMicro` wide: floor(360°/span). Equal widths are
    * what make the ±180° wrap sound — with a truncating `div` by the
    * span, the LAST cell before the seam is narrower than the rest,
    * so two points < span apart could straddle TWO cell boundaries
    * and the ±1 probe would miss them; dividing the ring into nLon
    * equal (rational-width ≥ span) cells restores the "adjacent cells
    * or same cell" guarantee everywhere, including across the seam.
    */
  private[ext] def nLonCells(lonCellMicro: Long): Long =
    if (lonCellMicro >= 360000000L) 1L else 360000000L / lonCellMicro

  // cy = floor((lon + 180°) · nLon / 360°) mod nLon: the ring id in
  // [0, nLon). The multiply stays exact BIGINT (≤ 3.6e8 · 3.6e8 ≈
  // 1.3e17 < 2^63); the outer pmod folds lon = +180° (cy = nLon) onto
  // cy = 0, which IS the same meridian.
  private def cellifyGeo(points: DataFrame, latCell: Long,
      nLon: Long): DataFrame =
    points.select(col("id"), col("lat_micro"), col("lon_micro"),
      expr(s"(lat_micro + 90000000L) div ${latCell}L").as("cx"),
      pmod(expr(s"((lon_micro + 180000000L) * ${nLon}L) div 360000000L"),
        lit(nLon)).as("cy"))

  /** Canonicalized haversine distance in meters between micro-degree
    * coordinate pairs. Every step is a fixed sequence of IEEE double
    * ops on canonicalized transcendentals, so both engines compute
    * bit-identical distances — the pair decision `dist ≤ r` replays.
    */
  // ONE formula for both haversine variants, parameterized by the
  // per-trig transform (canon vs identity) — the winnowPrints shared-
  // builder rule: the guard-band soundness argument below requires the
  // twins to never drift, so there is nothing to keep in sync.
  private def haversineWith(f: Column => Column)(
      latA: Column, lonA: Column, latB: Column, lonB: Column): Column = {
    def rad(c: Column) =
      c.cast("double") / lit(1000000.0) * lit(DegToRad)
    val sdLat = f(sin((rad(latA) - rad(latB)) / lit(2.0)))
    val sdLon = f(sin((rad(lonA) - rad(lonB)) / lit(2.0)))
    val h = sdLat * sdLat +
      f(cos(rad(latA))) * f(cos(rad(latB))) * sdLon * sdLon
    lit(2.0 * EarthRadiusM) * f(asin(sqrt(h)))
  }

  private[ext] def haversineM(latA: Column, lonA: Column,
      latB: Column, lonB: Column): Column =
    haversineWith(canon)(latA, lonA, latB, lonB)

  /** Plain-double haversine — the cheap PREFILTER twin of
    * [[haversineM]]: identical formula without the decimal(20,12)
    * canonicalization of each trig output. The canonicalization is
    * what makes the pair decision replay bit-for-bit across engines,
    * but it costs ~10× the trig itself (measured: 3M candidates score
    * in 1.1 s plain vs 11.8 s canonicalized); candidates are filtered
    * here against radius + [[CanonGuardM]] first and only the tiny
    * survivor set pays for the canonical distance that decides and is
    * emitted.
    */
  private[ext] def haversinePlainM(latA: Column, lonA: Column,
      latB: Column, lonB: Column): Column =
    haversineWith(identity)(latA, lonA, latB, lonB)

  /** Guard band for the plain-vs-canonical haversine gap. Worst-case
    * bound: rounding the asin output alone to 12 decimals shifts the
    * distance by up to 2R·5e-13 ≈ 6.4 µm, and propagating the h-term
    * rounding through sqrt(h) (amplified at small h) contributes a
    * comparable amount — so the true gap bound is ~1e-5 m, a ~100×
    * margin under the 1 mm guard (NOT the >10³× a naive "rounding is
    * 5e-13 relative" reading suggests). Still comfortably sound:
    * `plain ≤ r + guard` can never exclude a pair the canonical
    * distance would admit. Any future radius/precision change must be
    * justified against the ~1e-5 m figure, not the optimistic one.
    */
  private[ext] val CanonGuardM = 0.001

  /** All pairs within `radiusMeters` great-circle meters — the
    * geodesic face of [[radiusPairs]]: identical 3×3 neighbor-cell
    * equi-join shape, but cells sized per-axis by [[geodesicCells]]
    * (cos(lat)-shrunk longitude span at the declared band limit) and
    * the verify is the canonicalized haversine instead of planar
    * integer distance.
    *
    * `maxAbsLatMicro` declares the band where cos(lat)-sized lon
    * cells are sound; points BEYOND it (the polar caps) are routed to
    * a dedicated coarse band: one lon-spanning cell per lat ring
    * (keyed by cx alone). Any true pair has |Δlat| ≤ latCell, hence
    * |Δcx| ≤ 1, so probing rings cx−1..cx+1 against the polar build
    * side covers every pair with a polar member — trans-band pairs
    * included. Only points with |lat| ≥ band − latCell can partner a
    * polar point, so the probe leg is filtered to that collar and the
    * whole polar leg is empty (and free) for mid-latitude data. The
    * cap ring is deliberately coarse (at |lat| > 66° a full ring is
    * ≤ 0.41× the equator; cap data is sparse in practice) — candidate
    * count within a cap ring is quadratic in that ring's population,
    * never in the corpus. Sizing rule for DENSE high-latitude
    * corpora: raise `maxAbsLatMicro` (cos-sized lon cells stay sound
    * at any declared band; ScaleBench's `geopolar` section measures
    * the trade) — the band limit widens every ring's lon cells by
    * 1/cos(bandLimit), so it is a corpus-level knob: set it just
    * above the data's dense latitude range and let the cap band hold
    * the sparse residue.
    *
    * Longitude cells WRAP at the antimeridian: the ring is divided
    * into [[nLonCells]] equal cells and probe offsets are taken
    * modulo that count, so a pair straddling ±180° meets in the
    * wrapped neighbor cell like any other pair (haversine itself is
    * periodic — sin(Δλ/2) already measures the short way around).
    * The probe's wrapped lon offsets are DEDUPLICATED before the
    * join: at nLon ≤ 2 the −1 and +1 offsets alias the same ring
    * cell, which would otherwise emit each seam pair twice.
    *
    * Returns (id_a, id_b, dist_m) with id_a < id_b.
    */
  def radiusPairsGeodesic(points: DataFrame, radiusMeters: Double,
      maxAbsLatMicro: Long = 66000000L): DataFrame = {
    val (latCell, lonCell) = geodesicCells(radiusMeters, maxAbsLatMicro)
    val nLon = nLonCells(lonCell)
    val inBand = points.filter(
      abs(col("lat_micro")) <= lit(maxAbsLatMicro))
    val dySet = Seq(-1L, 0L, 1L).map(d => ((d % nLon) + nLon) % nLon).distinct
    val offsets = points.sparkSession.range(0, 3L * dySet.length)
      .select(expr(s"id div ${dySet.length} - 1").as("dx"),
        element_at(array(dySet.map(lit): _*),
          (expr(s"id % ${dySet.length}") + 1).cast("int")).as("dy"))
    val probe = cellifyGeo(inBand, latCell, nLon)
      .crossJoin(broadcast(offsets))
      .select(col("id").as("id_b"), col("lat_micro").as("lat_b"),
        col("lon_micro").as("lon_b"),
        (col("cx") + col("dx")).as("cx"),
        pmod(col("cy") + col("dy"), lit(nLon)).as("cy"))
    val dist = haversineM(col("lat_micro"), col("lon_micro"),
      col("lat_b"), col("lon_b"))
    val distPlain = haversinePlainM(col("lat_micro"), col("lon_micro"),
      col("lat_b"), col("lon_b"))
    // plain prefilter first, canonical decision second: the And
    // short-circuits, so only candidates inside the guard band pay the
    // 10x decimal-canonicalized distance (which alone decides and is
    // emitted — output values are unchanged)
    val inBandPairs = cellifyGeo(inBand, latCell, nLon)
      .join(probe, Seq("cx", "cy"))
      .filter(col("id") < col("id_b") &&
        distPlain <= lit(radiusMeters + CanonGuardM) &&
        dist <= lit(radiusMeters))
      .select(col("id").as("id_a"), col("id_b"), dist.as("dist_m"))
    // ---- polar leg: one lon-spanning cell per lat ring beyond the
    // band. Build side = polar points keyed by cx; probe side = every
    // point within one latCell of the band edge (the only points that
    // can partner a polar point), probing rings cx−1..cx+1. A
    // polar×in-band pair appears exactly once (build must be polar);
    // a polar×polar pair appears in both orientations, so those keep
    // pid < id_b. Disjoint from the in-band leg (which requires BOTH
    // members in band), so the union is exact and dedup-free.
    val polar = points.filter(abs(col("lat_micro")) > lit(maxAbsLatMicro))
    val polarBuild = polar.select(col("id").as("pid"),
      col("lat_micro").as("lat_p"), col("lon_micro").as("lon_p"),
      expr(s"(lat_micro + 90000000L) div ${latCell}L").as("cx"))
    val collar = points.filter(
      abs(col("lat_micro")) >= lit(maxAbsLatMicro - latCell))
    val capProbe = collar.select(col("id").as("id_b"),
        col("lat_micro").as("lat_b"), col("lon_micro").as("lon_b"),
        expr(s"(lat_micro + 90000000L) div ${latCell}L").as("cx0"),
        (abs(col("lat_micro")) <= lit(maxAbsLatMicro)).as("b_in_band"))
      // explode, not a 3-row crossJoin: stays a generator inside
      // codegen and keeps the plan's single nested-loop budget for the
      // in-band offsets broadcast
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id_b"), col("lat_b"), col("lon_b"),
        (col("cx0") + col("dx")).as("cx"), col("b_in_band"))
    val pDist = haversineM(col("lat_p"), col("lon_p"),
      col("lat_b"), col("lon_b"))
    val pDistPlain = haversinePlainM(col("lat_p"), col("lon_p"),
      col("lat_b"), col("lon_b"))
    // NO forced ring exchange: an explicit repartition(col("cx")) here
    // measured 3-50x SLOWER — the by-ring shuffle is byte-tiny, so AQE
    // coalesces it to ~one partition and the (plain-prefiltered)
    // candidate scoring runs near-serially. The leg inherits the
    // input's partitioning instead; the per-ring quadratic candidate
    // fan-out happens INSIDE the broadcast-join match loop, so any
    // reasonably partitioned corpus parallelizes it, and the plain
    // prefilter (below) keeps the per-candidate cost at raw-trig level.
    val polarPairs = polarBuild
      .join(capProbe, Seq("cx"))
      .filter(col("pid") =!= col("id_b"))
      .filter(col("b_in_band") || col("pid") < col("id_b"))
      .filter(pDistPlain <= lit(radiusMeters + CanonGuardM) &&
        pDist <= lit(radiusMeters))
      .select(least(col("pid"), col("id_b")).as("id_a"),
        greatest(col("pid"), col("id_b")).as("id_b"), pDist.as("dist_m"))
    inBandPairs.unionByName(polarPairs)
  }
}
