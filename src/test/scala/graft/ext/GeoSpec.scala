package graft.ext

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

class GeoSpec extends SparkSuite {
  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("id", "lat_micro", "lon_micro")

  test("radiusPairs equals the naive quadratic join on random points") {
    val rnd = new Random(11)
    val n = 300
    val rows = (0L until n).map(i =>
      (i, 40000000L + rnd.nextInt(1000001),
        -74000000L + rnd.nextInt(1000001)))
    val r = 10000L
    val naive = (for {
      a <- rows; b <- rows if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet
    val got = Geo.radiusPairs(pts(rows: _*), r)
      .select("id_a", "id_b", "dist2")
      .as[(Long, Long, Long)].collect().toSet
    assert(naive.nonEmpty, "test corpus produced no pairs — not probative")
    assert(got === naive)
  }

  test("radiusPairs catches cross-cell neighbors and excludes far points") {
    // two points 1 micro-degree apart straddling a cell border, plus an
    // outlier exactly ON the radius (boundary is inclusive) and one just
    // past it
    val r = 1000L
    val df = pts(
      (1L, 40000999L, -73500000L), // cell (cx=40000, …)
      (2L, 40001000L, -73500000L), // next lat cell, distance 1
      (3L, 40001000L, -73499000L), // distance 1000 from id 2 — ON radius
      (4L, 40001000L, -73497999L)) // distance 1001 from id 3 — out
    val got = Geo.radiusPairs(df, r)
      .select("id_a", "id_b", "dist2")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L), (2L, 3L, 1000000L)))
  }

  test("nearestWithin picks the min-dist2 neighbor with id tie-break") {
    val r = 1000L
    val df = pts(
      (1L, 40500000L, -73500000L),
      (2L, 40500003L, -73500004L), // dist2 25 from 1
      (3L, 40500005L, -73500000L), // dist2 25 from 1 — tie, higher id
      (9L, 40900000L, -73900000L)) // isolated: no row
    val got = Geo.nearestWithin(df, r)
      .select("id", "nn_id", "dist2")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.find(_._1 == 1L).get === ((1L, 2L, 25L)))
    assert(!got.exists(_._1 == 9L))
    // 3's nearest is 2 (dist2 20 beats 1's 25)
    assert(got.find(_._1 == 3L).get === ((3L, 2L, 20L)))
  }

  test("the grid join is an equi-join — no cartesian in the plan") {
    val df = Geo.syntheticPoints(
      spark.range(0, 500).toDF("c_custkey"), "c_custkey")
    val plan = Geo.radiusPairs(df, 10000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the point-vs-point join must be the hash equi-join on cell ids;
    // the single permitted nested-loop is the constant 9-row offset
    // dimension fanning out the probe side
    assert(plan.contains("BroadcastHashJoin [cx"), plan)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n$plan")
  }

  test("radiusPairsAgainstHistory composes: batch splits cover each pair once") {
    val rnd = new Random(31)
    val rows = (0L until 200L).map(i =>
      (i, 40000000L + rnd.nextInt(300001), -74000000L + rnd.nextInt(300001)))
    val all = pts(rows: _*)
    val r = 20000L
    val full = Geo.radiusPairs(all, r)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full.nonEmpty)
    // batch 1 = ids < 100 (reported via plain radiusPairs when it
    // arrived), batch 2 = ids >= 100 against batch-1 history
    val b1 = pts(rows.filter(_._1 < 100): _*)
    val b2 = pts(rows.filter(_._1 >= 100): _*)
    val first = Geo.radiusPairs(b1, r)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val second = Geo.radiusPairsAgainstHistory(b2, b1, r)
      .select("id_a", "id_b", "origin").as[(Long, Long, String)].collect()
    val canon = second.map { case (a, b, _) =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    assert(second.length === canon.size, "a pair was reported twice")
    assert(first ++ canon === full,
      "batch composition must cover exactly the one-shot pair set")
    assert(second.exists(_._3 == "history") && second.exists(_._3 == "batch"))
  }

  test("radiusPairs southern/western hemisphere: cell 0 is not double-width") {
    // regression for the truncating-div bug: before the lat shift,
    // southern-hemisphere cell 0 spanned (−r, r) and cell semantics
    // were asymmetric vs the north — parity vs naive proves the grid
    // is sound below the equator too
    val rnd = new Random(17)
    val rows = (0L until 250L).map(i =>
      (i, -40500000L + rnd.nextInt(1000001),
        -74000000L + rnd.nextInt(1000001)))
    val r = 15000L
    val naive = (for {
      a <- rows; b <- rows if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1)).toSet
    val got = Geo.radiusPairs(pts(rows: _*), r)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty, "no pairs — not probative")
    assert(got === naive)
  }

  test("radiusPairsGeodesic matches the naive haversine join at high latitude") {
    // 74.5°N: cos(lat) ≈ 0.267, so a fixed-degree lon cell would be
    // ~3.7× too wide — this is exactly the regime the cos(lat) sizing
    // exists for. The naive reference recomputes haversine from
    // scratch (plain doubles, no canonicalization) and compares pair
    // SETS with a guard band around the radius so canonicalization
    // rounding (±1e-12 on trig outputs ⇒ sub-micrometer in distance)
    // cannot flip set membership.
    val rnd = new Random(23)
    val rows = (0L until 250L).map(i =>
      (i, 74000000L + rnd.nextInt(1000001),
        10000000L + rnd.nextInt(1000001)))
    val rM = 2000.0
    def hav(a: (Long, Long, Long), b: (Long, Long, Long)): Double = {
      val toRad = math.Pi / 180 / 1e6
      val (p1, l1) = (a._2 * toRad, a._3 * toRad)
      val (p2, l2) = (b._2 * toRad, b._3 * toRad)
      val sp = math.sin((p1 - p2) / 2)
      val sl = math.sin((l1 - l2) / 2)
      2 * Geo.EarthRadiusM * math.asin(math.sqrt(
        sp * sp + math.cos(p1) * math.cos(p2) * sl * sl))
    }
    val naive = (for {
      a <- rows; b <- rows if a._1 < b._1 if hav(a, b) <= rM
    } yield (a._1, b._1)).toSet
    val got = Geo.radiusPairsGeodesic(pts(rows: _*), rM,
        maxAbsLatMicro = 76000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(naive.size > 20, s"only ${naive.size} pairs — not probative")
    val boundary = (for {
      a <- rows; b <- rows if a._1 < b._1
      d = hav(a, b) if math.abs(d - rM) < 1e-3
    } yield (a._1, b._1)).toSet
    assert((got -- boundary) === (naive -- boundary))
  }

  test("radiusPairsGeodesic southern hemisphere parity") {
    val rnd = new Random(41)
    val rows = (0L until 200L).map(i =>
      (i, -60900000L + rnd.nextInt(800001),
        -70000000L + rnd.nextInt(800001)))
    val rM = 3000.0
    def hav(a: (Long, Long, Long), b: (Long, Long, Long)): Double = {
      val toRad = math.Pi / 180 / 1e6
      val sp = math.sin((a._2 - b._2) * toRad / 2)
      val sl = math.sin((a._3 - b._3) * toRad / 2)
      2 * Geo.EarthRadiusM * math.asin(math.sqrt(
        sp * sp + math.cos(a._2 * toRad) * math.cos(b._2 * toRad) * sl * sl))
    }
    val naive = (for {
      a <- rows; b <- rows if a._1 < b._1 if hav(a, b) <= rM
    } yield (a._1, b._1)).toSet
    val got = Geo.radiusPairsGeodesic(pts(rows: _*), rM,
        maxAbsLatMicro = 66000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty, "no pairs — not probative")
    assert(got === naive)
  }

  test("radiusPairsGeodesic routes polar points through the coarse cap band") {
    // points straddling the 66° band limit in BOTH hemispheres: before
    // r11 everything beyond |66°| was silently dropped from the pair
    // set — now trans-band (one member in band, one beyond) and
    // polar×polar pairs must all surface via the one-lon-cell cap ring
    val rnd = new Random(67)
    val north = (0L until 150L).map(i =>
      (i, 65800000L + rnd.nextInt(400001),
        10000000L + rnd.nextInt(400001)))
    val south = (150L until 300L).map(i =>
      (i, -65800000L - rnd.nextInt(400001),
        -120000000L + rnd.nextInt(400001)))
    val rows = north ++ south
    val rM = 2000.0
    def hav(a: (Long, Long, Long), b: (Long, Long, Long)): Double = {
      val toRad = math.Pi / 180 / 1e6
      val sp = math.sin((a._2 - b._2) * toRad / 2)
      val sl = math.sin((a._3 - b._3) * toRad / 2)
      2 * Geo.EarthRadiusM * math.asin(math.sqrt(
        sp * sp + math.cos(a._2 * toRad) * math.cos(b._2 * toRad) * sl * sl))
    }
    val naive = (for {
      a <- rows; b <- rows if a._1 < b._1 if hav(a, b) <= rM
    } yield (a._1, b._1)).toSet
    val transBand = naive.filter { case (i, j) =>
      val la = math.abs(rows(i.toInt)._2); val lb = math.abs(rows(j.toInt)._2)
      (la > 66000000L) != (lb > 66000000L)
    }
    val polarPolar = naive.filter { case (i, j) =>
      math.abs(rows(i.toInt)._2) > 66000000L &&
        math.abs(rows(j.toInt)._2) > 66000000L
    }
    assert(transBand.size > 5 && polarPolar.size > 5,
      s"fixture not probative: ${transBand.size} trans-band, " +
        s"${polarPolar.size} polar pairs")
    val got = Geo.radiusPairsGeodesic(pts(rows: _*), rM,
        maxAbsLatMicro = 66000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    val boundary = (for {
      a <- rows; b <- rows if a._1 < b._1
      d = hav(a, b) if math.abs(d - rM) < 1e-3
    } yield (a._1, b._1)).toSet
    assert((got.toSet -- boundary) === (naive -- boundary))
  }

  test("radiusPairsGeodesic finds near-pole pairs across all longitudes") {
    // within 0.05° of the north pole every meridian converges: two
    // points with lons 180° apart can sit a few hundred meters from
    // each other. The cap ring (one lon-spanning cell per lat ring)
    // must pair them even though any in-band lon bucketing would put
    // them maximally far apart.
    val rnd = new Random(89)
    val rows = (0L until 200L).map(i =>
      (i, 89950000L + rnd.nextInt(50001),
        -180000000L + rnd.nextInt(360000001)))
    val rM = 3000.0
    def hav(a: (Long, Long, Long), b: (Long, Long, Long)): Double = {
      val toRad = math.Pi / 180 / 1e6
      val sp = math.sin((a._2 - b._2) * toRad / 2)
      val sl = math.sin((a._3 - b._3) * toRad / 2)
      2 * Geo.EarthRadiusM * math.asin(math.sqrt(
        sp * sp + math.cos(a._2 * toRad) * math.cos(b._2 * toRad) * sl * sl))
    }
    val naive = (for {
      a <- rows; b <- rows if a._1 < b._1 if hav(a, b) <= rM
    } yield (a._1, b._1)).toSet
    val farLon = naive.filter { case (i, j) =>
      math.abs(rows(i.toInt)._3 - rows(j.toInt)._3) > 90000000L }
    assert(naive.size > 20 && farLon.size > 3,
      s"fixture not probative: ${naive.size} pairs, ${farLon.size} far-lon")
    val got = Geo.radiusPairsGeodesic(pts(rows: _*), rM,
        maxAbsLatMicro = 66000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    val boundary = (for {
      a <- rows; b <- rows if a._1 < b._1
      d = hav(a, b) if math.abs(d - rM) < 1e-3
    } yield (a._1, b._1)).toSet
    assert((got.toSet -- boundary) === (naive -- boundary))
  }

  test("radiusPairsGeodesic wraps the antimeridian at several latitudes") {
    // points straddling ±180°: lon drawn from [179.9°, 180.1°] and
    // values past 180° wrapped to (−180°, −179.9°] — before the ring
    // wrap these landed in cells 0 and nLon−1 (maximally NON-adjacent
    // ids) and every cross-seam pair was silently missed. The naive
    // haversine reference needs no special-casing: sin(Δλ/2) is
    // periodic, sin(359.8°/2) = sin(0.1°).
    def hav(a: (Long, Long, Long), b: (Long, Long, Long)): Double = {
      val toRad = math.Pi / 180 / 1e6
      val sp = math.sin((a._2 - b._2) * toRad / 2)
      val sl = math.sin((a._3 - b._3) * toRad / 2)
      2 * Geo.EarthRadiusM * math.asin(math.sqrt(
        sp * sp + math.cos(a._2 * toRad) * math.cos(b._2 * toRad) * sl * sl))
    }
    for ((latBase, seed) <- Seq((0L, 51), (59500000L, 53), (-45500000L, 57))) {
      val rnd = new Random(seed)
      val rows = (0L until 200L).map { i =>
        val lonRaw = 179900000L + rnd.nextInt(200001)
        val lon = if (lonRaw > 180000000L) lonRaw - 360000000L else lonRaw
        (i, latBase + rnd.nextInt(400001), lon)
      }
      val rM = 3000.0
      val naive = (for {
        a <- rows; b <- rows if a._1 < b._1 if hav(a, b) <= rM
      } yield (a._1, b._1)).toSet
      val crossSeam = naive.filter { case (ia, ib) =>
        val la = rows(ia.toInt)._3; val lb = rows(ib.toInt)._3
        math.abs(la - lb) > 180000000L
      }
      assert(crossSeam.nonEmpty, s"lat $latBase: no seam pairs — not probative")
      val got = Geo.radiusPairsGeodesic(pts(rows: _*), rM,
          maxAbsLatMicro = 66000000L)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // exclude knife-edge pairs where canonicalization rounding could
      // flip the ≤ r decision (the high-latitude test's guard band)
      val boundary = (for {
        a <- rows; b <- rows if a._1 < b._1
        d = hav(a, b) if math.abs(d - rM) < 1e-3
      } yield (a._1, b._1)).toSet
      assert((got -- boundary) === (naive -- boundary),
        s"lat $latBase: seam pairs mismatch")
    }
  }

  test("radiusPairsGeodesic emits no duplicates when lon offsets alias (tiny ring)") {
    // a 10000 km radius at a 66° band forces nLon = 2, where the −1
    // and +1 ring offsets alias the same cell — the offset dedup in
    // the probe side must keep each pair single
    val rows = Seq((0L, 100000L, 179990000L), (1L, 200000L, -179990000L),
      (2L, 0L, 100000000L))
    val got = Geo.radiusPairsGeodesic(pts(rows: _*), 10000000.0,
        maxAbsLatMicro = 66000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.size === got.toSet.size, s"duplicate pairs: $got")
    assert(got.toSet === Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("geodesicCells: lon cells widen with the band limit, exactly bounded") {
    val (lat1, lon1) = Geo.geodesicCells(1000.0, 1000000L)   // ~equator
    val (lat2, lon2) = Geo.geodesicCells(1000.0, 66000000L)  // 66°
    val (lat3, lon3) = Geo.geodesicCells(1000.0, 85000000L)  // near-polar
    assert(lat1 === lat2 && lat2 === lat3) // lat span is band-independent
    assert(lon1 < lon2 && lon2 < lon3)
    // at 66° the shrink factor is 1/cos(66°) ≈ 2.46
    assert(lon2 > (lat2 * 2.4).toLong && lon2 < (lat2 * 2.6).toLong)
    // a band reaching the pole degenerates to one global lon cell —
    // use a radius big enough that sin(r/2R)/cos(lat) ≥ 1
    val (_, lonPolar) = Geo.geodesicCells(500000.0, 89999999L)
    assert(lonPolar === 360000000L)
  }

  test("cellDensity counts every point exactly once") {
    val df = Geo.syntheticPoints(
      spark.range(0, 400).toDF("c_custkey"), "c_custkey")
    val dens = Geo.cellDensity(df, 50000L)
    assert(dens.agg(sum("n_points")).as[Long].head() === 400L)
    // 1°/0.05° = 21 cells per axis max (inclusive span)
    assert(dens.count() <= 21L * 21L)
  }
}
