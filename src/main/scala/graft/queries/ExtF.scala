package graft.queries

import org.apache.spark.sql.functions._
import graft.ext._
import H.t

/** Round-8 second wave: time-series analytics (gap-fill, ACF, CUSUM
  * changepoints) and grid-bucketed spatial joins — the monitoring and
  * geo primitives of a pipeline's operational surface, each fully
  * oracle-replayed (exact-decimal prefix/power sums; integer
  * micro-degree geometry).
  */
object ExtF {

  /** Calendar gap-fill ([[graft.ext.TimeSeries.gapFill]]) of per-
    * (event_type, user) daily value sums: ~60% of the 19,930 calendar
    * days at sf0.01 are gaps, every one forward-filled from the last
    * observed day and flagged. The oracle rebuilds the calendar with
    * generate_series and replays the ignore-nulls fill window — every
    * filled value adjudicates bit-for-bit (exact decimal → double).
    */
  val xTsGapfill = Q(
    "x_ts_gapfill",
    (s, dir) => TimeSeries.gapFill(t(s, dir, "events"),
        Seq("event_type" -> col("event_type"), "user_id" -> col("user_id")),
        col("ts"), col("value"))
      .orderBy(col("event_type"), col("user_id"), col("day")),
    Some("""WITH daily AS (SELECT event_type, user_id,
        strftime(ts, '%Y-%m-%d') AS day,
        CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(12,2)) AS x
      FROM events GROUP BY 1, 2, 3),
      span AS (SELECT event_type, user_id,
          MIN(CAST(day AS DATE)) AS d0, MAX(CAST(day AS DATE)) AS d1
        FROM daily GROUP BY 1, 2),
      cal AS (SELECT event_type, user_id,
          strftime(CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
            AS DATE), '%Y-%m-%d') AS day
        FROM span),
      j AS (SELECT c.event_type, c.user_id, c.day, d.x
        FROM cal c LEFT JOIN daily d
          ON d.event_type = c.event_type AND d.user_id = c.user_id
            AND d.day = c.day)
      SELECT event_type, user_id, day,
        CAST(last_value(x IGNORE NULLS) OVER (
            PARTITION BY event_type, user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS value_filled,
        x IS NULL AS is_gap
      FROM j ORDER BY event_type, user_id, day"""))

  /** Autocorrelation function ([[graft.ext.TimeSeries.acf]]) of per-
    * type daily volumes at lags 1..7 over the zero-filled calendar.
    * The oracle rebuilds the dense series, the exploded lag join, and
    * the raw power sums, then assembles the same double expression —
    * numpy-validated during construction (|Δ| < 1e-9 on every lag).
    */
  val xTsAcf = Q(
    "x_ts_acf",
    (s, dir) => TimeSeries.acf(t(s, dir, "events"), col("event_type"),
        col("ts"), col("value"), maxLag = 7)
      .orderBy(col("grp"), col("lag")),
    Some("""WITH daily AS (SELECT event_type AS grp,
        strftime(ts, '%Y-%m-%d') AS day,
        CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(12,2)) AS x
      FROM events GROUP BY 1, 2),
      span AS (SELECT grp, MIN(CAST(day AS DATE)) AS d0,
          MAX(CAST(day AS DATE)) AS d1
        FROM daily GROUP BY 1),
      cal AS (SELECT grp, d0,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS d
        FROM span),
      dense AS (SELECT c.grp, date_diff('day', c.d0, c.d) AS idx,
          COALESCE(dl.x, CAST(0 AS DECIMAL(12,2))) AS x
        FROM cal c LEFT JOIN daily dl
          ON dl.grp = c.grp AND CAST(dl.day AS DATE) = c.d),
      tot AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS DECIMAL(38,2)) AS s,
          CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ss
        FROM dense GROUP BY 1),
      lags AS (SELECT CAST(unnest(range(1, 8)) AS INTEGER) AS lag),
      shifted AS (SELECT grp, idx + lag AS idx, lag, x AS xb
        FROM dense CROSS JOIN lags),
      pairs AS (SELECT a.grp, b.lag,
          CAST(SUM(CAST(a.x * b.xb AS DECIMAL(38,4))) AS DECIMAL(38,4))
            AS sxy,
          CAST(SUM(a.x) AS DECIMAL(38,2)) AS sa,
          CAST(SUM(b.xb) AS DECIMAL(38,2)) AS sb,
          CAST(COUNT(*) AS BIGINT) AS m
        FROM dense a JOIN shifted b ON a.grp = b.grp AND a.idx = b.idx
        GROUP BY 1, 2)
      SELECT grp, lag, n,
        (CAST(sxy AS DOUBLE)
          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sa AS DOUBLE)
          - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sb AS DOUBLE)
          + CAST(m AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
        / (CAST(ss AS DOUBLE)
          - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS acf
      FROM pairs JOIN tot USING (grp)
      WHERE (CAST(ss AS DOUBLE)
          - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) > 0
      ORDER BY grp, lag"""))

  /** Two-sided CUSUM changepoint scores
    * ([[graft.ext.TimeSeries.cusum]], slack 300, threshold 1500 —
    * ~0.5σ/2.5σ of the sf0.01 daily series): the oracle replays the
    * prefix-sum closed form with the same stacked decimal windows; the
    * closed form was validated against the literal sequential
    * recurrence during construction (exact match on all 150 days,
    * 6 alarms at sf0.01).
    */
  val xTsCusum = Q(
    "x_ts_cusum",
    (s, dir) => TimeSeries.cusum(t(s, dir, "events"), col("event_type"),
        col("ts"), col("value"), slack = BigDecimal("300.00"),
        threshold = BigDecimal("1500.00"))
      .orderBy(col("grp"), col("day")),
    Some("""WITH daily AS (SELECT event_type AS grp,
        strftime(ts, '%Y-%m-%d') AS day,
        CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(12,2)) AS x
      FROM events GROUP BY 1, 2),
      tot AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS DECIMAL(30,2)) AS s
        FROM daily GROUP BY 1),
      base AS (SELECT d.grp, d.day, t.n,
          CAST(CAST(d.x * CAST(t.n AS DECIMAL(10,0)) AS DECIMAL(32,2))
            - t.s
            - CAST(CAST(t.n AS DECIMAL(10,0))
                * CAST(300.00 AS DECIMAL(10,2)) AS DECIMAL(30,2))
            AS DECIMAL(38,2)) AS yv,
          CAST(CAST(d.x * CAST(t.n AS DECIMAL(10,0)) AS DECIMAL(32,2))
            - t.s
            + CAST(CAST(t.n AS DECIMAL(10,0))
                * CAST(300.00 AS DECIMAL(10,2)) AS DECIMAL(30,2))
            AS DECIMAL(38,2)) AS zv,
          CAST(CAST(t.n AS DECIMAL(10,0))
            * CAST(1500.00 AS DECIMAL(10,2)) AS DECIMAL(30,2)) AS nh
        FROM daily d JOIN tot t USING (grp)),
      pq AS (SELECT grp, day, n, nh,
          CAST(SUM(yv) OVER win AS DECIMAL(38,2)) AS p,
          CAST(SUM(zv) OVER win AS DECIMAL(38,2)) AS q
        FROM base WINDOW win AS (PARTITION BY grp ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      /* LEAST/GREATEST would promote DECIMAL to DOUBLE in DuckDB
         (losing the exactness the whole construction is built on), so
         the clamp against 0 is a CASE */
      m AS (SELECT grp, day, n, nh, p, q,
          CAST(CASE WHEN MIN(p) OVER win < CAST(0 AS DECIMAL(38,2))
            THEN MIN(p) OVER win ELSE CAST(0 AS DECIMAL(38,2)) END
            AS DECIMAL(38,2)) AS minp,
          CAST(CASE WHEN MAX(q) OVER win > CAST(0 AS DECIMAL(38,2))
            THEN MAX(q) OVER win ELSE CAST(0 AS DECIMAL(38,2)) END
            AS DECIMAL(38,2)) AS maxq
        FROM pq WINDOW win AS (PARTITION BY grp ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT grp, day,
        CAST(p - minp AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_pos,
        CAST(maxq - q AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_neg,
        (p - minp) > nh OR (maxq - q) > nh AS alarm
      FROM m ORDER BY grp, day"""))

  /** The synthetic-point CTE both geo oracles share
    * ([[graft.ext.Geo.syntheticPoints]] in SQL — exact BIGINT
    * arithmetic, so every coordinate replays).
    */
  private val geoPtsCte: String =
    """raw AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
      gm AS (SELECT id,
          (id * 2654435761 + 97) % 2147483648 AS v1a,
          (id * 2246822519 + 31) % 2147483648 AS v1b
        FROM raw),
      /* 31-bit xorshift-multiply mix per axis (>>13 = //8192,
         >>17 = //131072 on non-negatives) — the SimHash replay's
         recipe; a plain multiplicative hash lattices sequential ids */
      gmm AS (SELECT id,
          xor((xor(v1a, v1a // 8192) * 1103515245) % 2147483648,
            ((xor(v1a, v1a // 8192) * 1103515245) % 2147483648)
              // 131072) AS v4a,
          xor((xor(v1b, v1b // 8192) * 1103515245) % 2147483648,
            ((xor(v1b, v1b // 8192) * 1103515245) % 2147483648)
              // 131072) AS v4b
        FROM gm),
      pts AS (SELECT id, 40000000 + v4a % 1000001 AS lat,
        -74000000 + v4b % 1000001 AS lon FROM gmm)"""

  /** Grid-bucketed radius self-join ([[graft.ext.Geo.radiusPairs]],
    * r = 0.01° over a 1°×1° box): the engine runs the 3×3 neighbor-
    * cell equi-join; the oracle runs the NAIVE quadratic join — an
    * independent implementation, so an adjudication hit proves the
    * bucketing loses no pair and invents none. All-integer geometry:
    * dist2 is exact, dist_deg one sqrt of it.
    */
  val xGeoRadiusPairs = Q(
    "x_geo_radius_pairs",
    (s, dir) => Geo.radiusPairs(
        Geo.syntheticPoints(t(s, dir, "customer"), "c_custkey"),
        radiusMicro = 10000L)
      .orderBy(col("id_a"), col("id_b")),
    bench = true,
    oracle = Some(s"""WITH $geoPtsCte
      SELECT a.id AS id_a, b.id AS id_b,
        (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) AS dist2,
        sqrt(CAST((a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) AS DOUBLE)) / 1000000.0
          AS dist_deg
      FROM pts a JOIN pts b ON a.id < b.id
      WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) <= 100000000
      ORDER BY id_a, id_b"""))

  /** Bounded-radius nearest neighbor ([[graft.ext.Geo.nearestWithin]]):
    * symmetrized grid pairs ranked by (dist2, neighbor id); again the
    * oracle takes the naive quadratic path with a window over ALL
    * in-radius neighbors.
    */
  val xGeoNearest = Q(
    "x_geo_nn",
    (s, dir) => Geo.nearestWithin(
        Geo.syntheticPoints(t(s, dir, "customer"), "c_custkey"),
        radiusMicro = 10000L)
      .orderBy(col("id")),
    Some(s"""WITH $geoPtsCte,
      cand AS (SELECT a.id, b.id AS nn_id,
          (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
        FROM pts a JOIN pts b ON a.id != b.id
        WHERE (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) <= 100000000),
      rk AS (SELECT id, nn_id, dist2,
          row_number() OVER (PARTITION BY id ORDER BY dist2, nn_id)
            AS rk
        FROM cand)
      SELECT id, nn_id, dist2,
        sqrt(CAST(dist2 AS DOUBLE)) / 1000000.0 AS dist_deg
      FROM rk WHERE rk = 1 ORDER BY id"""))

  /** Grid-cell density profile ([[graft.ext.Geo.cellDensity]]) at
    * 0.05° cells — the hot-cell discovery aggregate that sizes
    * salting for skewed spatial joins.
    */
  val xGeoCellDensity = Q(
    "x_geo_cell_density",
    (s, dir) => Geo.cellDensity(
        Geo.syntheticPoints(t(s, dir, "customer"), "c_custkey"),
        cellMicro = 50000L)
      .orderBy(col("cx"), col("cy")),
    Some(s"""WITH $geoPtsCte
      SELECT (lat + 90000000) // 50000 AS cx, (lon + 180000000) // 50000 AS cy,
        CAST(COUNT(*) AS BIGINT) AS n_points,
        CAST(MIN(id) AS BIGINT) AS min_id
      FROM pts GROUP BY 1, 2 ORDER BY cx, cy"""))

  /** MMR diversified re-ranking ([[graft.ext.Rank.mmrRerank]],
    * λ=0.7, 3 anchors, 12-candidate pools, k=5): the oracle unrolls
    * all five greedy rounds as CTEs — pool build, per-round
    * max-sim-to-selected aggregation (the nsel count re-derives
    * "not yet picked"), argmax with id tie-break — with every constant
    * CAST to DOUBLE so `(1 − 0.7)` lands on the same IEEE double in
    * both engines (DuckDB parses bare 0.7 as DECIMAL, whose exact 0.3
    * differs from 1.0−0.7 by one ulp).
    */
  val xMmrRerank: Q = {
    val (nA, pool, k) = (3, 12, 5)
    val lam = "CAST(0.7 AS DOUBLE)"
    val mu = s"(CAST(1 AS DOUBLE) - $lam)"
    val rounds = (2 to k).map { i =>
      s"""sc$i AS (SELECT c.qid, c.id, MAX(c.rel) AS rel,
          MAX(list_dot_product(c.v, s.v) / (c.nrm * s.nrm)) AS maxsim,
          COUNT(*) AS nsel
        FROM cands c JOIN selall${i - 1} s
          ON s.qid = c.qid AND c.id != s.id
        GROUP BY c.qid, c.id),
      pick$i AS (SELECT t.qid, t.id, c2.v, c2.nrm, t.rel, t.mmr,
          $i AS pick_rank
        FROM (SELECT qid, id, rel,
            $lam * rel - $mu * maxsim AS mmr,
            row_number() OVER (PARTITION BY qid
              ORDER BY $lam * rel - $mu * maxsim DESC, id) AS pk
          FROM sc$i WHERE nsel = ${i - 1}) t
        JOIN cands c2 ON c2.qid = t.qid AND c2.id = t.id
        WHERE t.pk = 1),
      selall$i AS (SELECT * FROM selall${i - 1}
        UNION ALL SELECT * FROM pick$i)"""
    }.mkString(",\n      ")
    Q("x_mmr_rerank",
      (s, dir) => Rank.mmrRerank(t(s, dir, "embeddings"), "vec_id",
          "embedding", nAnchors = nA, pool = pool, k = k, lambda = 0.7)
        .orderBy(col("qid"), col("pick_rank")),
      Some(s"""WITH nn0 AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      e AS (SELECT vec_id AS id, v, sqrt(list_dot_product(v, v)) AS nrm
        FROM nn0),
      anchors AS (SELECT id AS qid, v AS qv, nrm AS qn FROM e
        WHERE id < $nA),
      cands AS (SELECT qid, id, v, nrm, rel FROM (
          SELECT a.qid, b.id, b.v, b.nrm,
            list_dot_product(a.qv, b.v) / (a.qn * b.nrm) AS rel,
            row_number() OVER (PARTITION BY a.qid
              ORDER BY list_dot_product(a.qv, b.v) / (a.qn * b.nrm)
                DESC, b.id) AS rk
          FROM anchors a JOIN e b ON b.id != a.qid)
        WHERE rk <= $pool),
      selall1 AS (SELECT qid, id, v, nrm, rel,
          $lam * rel - $mu * CAST(0 AS DOUBLE) AS mmr, 1 AS pick_rank
        FROM (SELECT qid, id, v, nrm, rel,
            row_number() OVER (PARTITION BY qid
              ORDER BY $lam * rel - $mu * CAST(0 AS DOUBLE) DESC, id)
              AS pk
          FROM cands) WHERE pk = 1),
      $rounds
      SELECT qid, CAST(pick_rank AS INTEGER) AS pick_rank, id, rel,
        mmr AS mmr_score
      FROM selall$k ORDER BY qid, pick_rank"""))
  }

  /** Farthest-point k-center sampling
    * ([[graft.ext.Sampling.farthestPointSample]], k=6): the oracle
    * unrolls the greedy rounds — seed at min id, per-round incremental
    * `LEAST(mind, dist-to-new-pick)` update, argmax as ORDER BY mind
    * DESC, id LIMIT 1 — so every pick AND its selection distance (the
    * k-center coverage radius bound) adjudicate exactly.
    */
  val xFpsSample: Q = {
    val k = 6
    def distSql(a: String, b: String): String =
      s"1 - list_dot_product($a.v, $b.v) / ($a.nrm * $b.nrm)"
    val rounds = (2 to k).map { i =>
      val prev = if (i == 2) "cand1" else s"cand${i - 1}"
      val upd =
        s"""cand$i AS (SELECT c.id, c.v, c.nrm,
            LEAST(c.mind, ${distSql("c", "p")}) AS mind
          FROM ${if (i == 2) "cand1" else s"cand${i - 1}"} c, pick$i p
          WHERE c.id != p.id)"""
      s"""pick$i AS (SELECT id, v, nrm, mind FROM $prev
          ORDER BY mind DESC, id LIMIT 1)${if (i < k) ",\n      " + upd else ""}"""
    }.mkString(",\n      ")
    val unionArms = (2 to k).map(i =>
      s"SELECT $i AS pick_rank, id, mind AS sel_dist FROM pick$i")
      .mkString("\n      UNION ALL ")
    Q("x_fps_sample",
      (s, dir) => Sampling.farthestPointSample(t(s, dir, "embeddings"),
          "vec_id", "embedding", k = k)
        .orderBy(col("pick_rank")),
      Some(s"""WITH nn0 AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      e AS (SELECT vec_id AS id, v, sqrt(list_dot_product(v, v)) AS nrm
        FROM nn0),
      seed AS (SELECT id, v, nrm FROM e ORDER BY id LIMIT 1),
      cand1 AS (SELECT c.id, c.v, c.nrm, ${distSql("c", "s")} AS mind
        FROM e c, seed s WHERE c.id != s.id),
      $rounds
      SELECT CAST(pick_rank AS INTEGER) AS pick_rank, id, sel_dist FROM (
        SELECT 1 AS pick_rank, id, CAST(NULL AS DOUBLE) AS sel_dist
        FROM seed
        UNION ALL $unionArms)
      ORDER BY pick_rank"""))
  }

  /** HBOS outlier scoring ([[graft.ext.Stats.hbosOutliers]], 16 bins,
    * top-50) over (quantity, extendedprice, discount): the oracle
    * rebuilds the long format as a UNION ALL, the equal-width bins as
    * the identical double expression, the bin densities, and each
    * −ln(cnt/n) term through the VARCHAR-roundtrip canonicalization
    * ([[graft.ext.Stats.mutualInfo]]'s idiom) — every score and rank
    * adjudicates exactly.
    */
  val xHbosOutliers: Q = {
    val lnC = (e: String) =>
      s"CAST(CAST(CAST(ln(CAST($e AS DOUBLE)) AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE)"
    Q("x_hbos_outliers",
      (s, dir) => Stats.hbosOutliers(t(s, dir, "lineitem"),
          keys = Seq("okey" -> col("l_orderkey"),
            "lnum" -> col("l_linenumber")),
          features = Seq("qty" -> col("l_quantity"),
            "price" -> col("l_extendedprice"),
            "disc" -> col("l_discount")),
          bins = 16, topK = 50)
        .orderBy(col("rank")),
      Some(s"""WITH long AS (
        SELECT l_orderkey AS okey, l_linenumber AS lnum, 'qty' AS feat,
          CAST(l_quantity AS DECIMAL(12,2)) AS x FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price',
          CAST(l_extendedprice AS DECIMAL(12,2)) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'disc',
          CAST(l_discount AS DECIMAL(12,2)) FROM lineitem),
      stats AS (SELECT feat, MIN(x) AS mn, MAX(x) AS mx,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM long GROUP BY 1 HAVING MAX(x) > MIN(x)),
      binned AS (SELECT l.okey, l.lnum, l.feat, s.n,
          LEAST(CAST(FLOOR((CAST(l.x AS DOUBLE) - CAST(s.mn AS DOUBLE))
            / (CAST(s.mx AS DOUBLE) - CAST(s.mn AS DOUBLE)) * 16)
            AS BIGINT), 15) AS bin
        FROM long l JOIN stats s USING (feat)),
      dens AS (SELECT feat, bin, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM binned GROUP BY 1, 2),
      scored AS (SELECT okey, lnum,
          CAST(SUM(CAST(${lnC("b.n")} - ${lnC("d.cnt")}
            AS DECIMAL(30,14))) AS DOUBLE) AS score
        FROM binned b JOIN dens d USING (feat, bin)
        GROUP BY 1, 2)
      SELECT okey, lnum, score,
        CAST(row_number() OVER (ORDER BY score DESC, okey, lnum)
          AS BIGINT) AS rank
      FROM scored ORDER BY score DESC, okey, lnum LIMIT 50"""))
  }

  /** k-core decomposition ([[graft.ext.Graph.kCore]], k=5, 6 peel
    * rounds) of the shared synthetic blocked graph: 1,440 of 1,500
    * nodes survive at sf0.01 with the convergence certificate true
    * (min induced degree ≥ k ⇒ the output IS the exact 5-core). The
    * oracle unrolls every peel round and the final induced-degree
    * recompute — the recompute matters: certifying on the loop's
    * pre-peel degrees would be vacuous.
    */
  val xKCore: Q = {
    val (k, rounds) = (5, 6)
    // MATERIALIZED on ue and every alive_i: DuckDB re-inlines plain
    // CTEs per reference, and each e_i references alive_{i-1} TWICE
    // (both join legs) — the unrolled peel otherwise re-evaluates the
    // whole upstream chain 2^rounds times (10 s -> sub-second at
    // sf0.01, identical output)
    val peels = (1 to rounds).map { i =>
      val prev = s"alive${i - 1}"
      s"""e$i AS (SELECT u.src, u.dst FROM ue u
          JOIN $prev a ON a.node = u.src JOIN $prev b ON b.node = u.dst),
      deg$i AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM e$i GROUP BY 1),
      alive$i AS MATERIALIZED (SELECT node FROM deg$i WHERE d >= $k)"""
    }.mkString(",\n      ")
    Q("x_kcore",
      (s, dir) => Graph.kCore(ExtC.syntheticGraph(s, dir), "src", "dst",
          k = k, rounds = rounds)
        .orderBy(col("node")),
      Some(s"""${ExtC.graphCtes},
      ue AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
      alive0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM ue),
      $peels,
      ef AS (SELECT u.src, u.dst FROM ue u
        JOIN alive$rounds a ON a.node = u.src
        JOIN alive$rounds b ON b.node = u.dst),
      degf AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM ef GROUP BY 1),
      outc AS (SELECT a.node, CAST(COALESCE(f.d, 0) AS BIGINT) AS degree
        FROM alive$rounds a LEFT JOIN degf f USING (node)),
      cert AS (SELECT MIN(degree) >= $k AS conv FROM outc)
      SELECT node, degree, conv AS converged FROM outc, cert
      ORDER BY node"""))
  }

  /** Incremental geo pairs
    * ([[graft.ext.Geo.radiusPairsAgainstHistory]], odd ids as the new
    * batch vs even ids as history): batch-internal + new-vs-history
    * pairs, each reported exactly once across any batch split. The
    * oracle again takes the naive quadratic path for both legs.
    */
  /** The VARCHAR-roundtrip canonicalization every geodesic
    * transcendental routes through (the EWMA pow idiom).
    */
  private def cn(e: String): String =
    s"CAST(CAST(CAST($e AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE)"

  /** Conservative integer bounding-box join for the naive geo oracles
    * — PURE pruning ahead of the expensive VARCHAR-roundtrip trig, it
    * decides nothing: the bounds are DERIVED from the radius and the
    * oracle corpus's max |lat| with a 2x safety factor (dlat <= r/R;
    * dlon <= 2*asin(sin(r/2R)/cos(latMax)), exact — no small-angle
    * shortcut), and the lon delta is folded across the antimeridian.
    * One definition for all three oracles, so a future radius or
    * latitude-shift change cannot silently turn the "independent
    * naive oracle" into one that prunes true pairs.
    */
  private def geoBoxJoin(radiusM: Double, maxAbsLatDeg: Double): String = {
    val latBound = 2L * math.ceil(
      radiusM / graft.ext.Geo.EarthRadiusM / math.Pi * 180 * 1e6).toLong
    val halfSin = math.sin(radiusM / (2.0 * graft.ext.Geo.EarthRadiusM)) /
      math.cos(maxAbsLatDeg * math.Pi / 180)
    val lonBound =
      if (halfSin >= 1.0) 360000000L
      else 2L * math.ceil(
        2.0 * math.asin(halfSin) / math.Pi * 180 * 1e6).toLong
    s"""FROM rp a JOIN rp b ON a.id < b.id
          AND abs(a.lat - b.lat) <= $latBound
          AND least(abs(a.lon - b.lon),
            360000000 - abs(a.lon - b.lon)) <= $lonBound),"""
  }

  /** Geodesic radius pairs ([[graft.ext.Geo.radiusPairsGeodesic]],
    * r = 1 km, band limit 66°): the engine runs the per-axis-sized
    * neighbor-cell equi-join (cos(lat)-shrunk longitude cells); the
    * oracle runs the NAIVE quadratic haversine join — an independent
    * implementation, so a hash hit proves the geodesic bucketing
    * loses no pair and invents none. Every trig output is
    * canonicalized to DECIMAL(20,12) on both engines, so each pair's
    * `dist ≤ r` decision is bit-replayable despite JVM-vs-libm
    * last-ulp differences.
    */
  val xGeoRadiusPairsGeodesic = Q(
    "x_geo_radius_pairs_geodesic",
    (s, dir) => Geo.radiusPairsGeodesic(
        Geo.syntheticPoints(t(s, dir, "customer"), "c_custkey"),
        radiusMeters = 1000.0, maxAbsLatMicro = 66000000L)
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""WITH $geoPtsCte,
      rp AS (SELECT id, lat, lon,
          (CAST(lat AS DOUBLE) / 1000000.0) * 0.017453292519943295
            AS phi,
          (CAST(lon AS DOUBLE) / 1000000.0) * 0.017453292519943295
            AS lam
        FROM pts),
      cand AS (SELECT a.id AS id_a, b.id AS id_b,
          ${cn("sin((a.phi - b.phi) / 2.0)")} AS sdlat,
          ${cn("sin((a.lam - b.lam) / 2.0)")} AS sdlon,
          ${cn("cos(a.phi)")} AS ca,
          ${cn("cos(b.phi)")} AS cb
        ${geoBoxJoin(radiusM = 1000.0, maxAbsLatDeg = 66.5)}
      d AS (SELECT id_a, id_b, 12742000.0 *
          ${cn("asin(sqrt(sdlat * sdlat + ca * cb * sdlon * sdlon))")}
            AS dist_m
        FROM cand)
      SELECT id_a, id_b, dist_m FROM d WHERE dist_m <= 1000.0
      ORDER BY id_a, id_b"""))

  /** Antimeridian-straddling geodesic pairs: the synthetic box shifted
    * onto the ±180° seam (lon ∈ [179.6°, 180°] ∪ (−180°, −179.4°]),
    * same r = 1 km mining. The engine's ring-wrapped cells must find
    * every cross-seam pair; the NAIVE oracle needs no special-casing
    * because haversine's sin(Δλ/2) is periodic — an independent
    * implementation of the wrap, so a hash hit proves the seam
    * handling loses no pair and invents none.
    */
  val xGeoRadiusPairsAntimeridian = Q(
    "x_geo_radius_pairs_antimeridian",
    (s, dir) => {
      val base = Geo.syntheticPoints(t(s, dir, "customer"), "c_custkey")
      val shifted = base.select(col("id"), col("lat_micro"),
        when(col("lon_micro") + lit(253600000L) > lit(180000000L),
            col("lon_micro") + lit(253600000L) - lit(360000000L))
          .otherwise(col("lon_micro") + lit(253600000L)).as("lon_micro"))
      Geo.radiusPairsGeodesic(shifted, radiusMeters = 1000.0,
          maxAbsLatMicro = 66000000L)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH $geoPtsCte,
      sp AS (SELECT id, lat,
          CASE WHEN lon + 253600000 > 180000000
            THEN lon + 253600000 - 360000000
            ELSE lon + 253600000 END AS lon
        FROM pts),
      rp AS (SELECT id, lat, lon,
          (CAST(lat AS DOUBLE) / 1000000.0) * 0.017453292519943295
            AS phi,
          (CAST(lon AS DOUBLE) / 1000000.0) * 0.017453292519943295
            AS lam
        FROM sp),
      cand AS (SELECT a.id AS id_a, b.id AS id_b,
          ${cn("sin((a.phi - b.phi) / 2.0)")} AS sdlat,
          ${cn("sin((a.lam - b.lam) / 2.0)")} AS sdlon,
          ${cn("cos(a.phi)")} AS ca,
          ${cn("cos(b.phi)")} AS cb
        ${geoBoxJoin(radiusM = 1000.0, maxAbsLatDeg = 66.5)}
      d AS (SELECT id_a, id_b, 12742000.0 *
          ${cn("asin(sqrt(sdlat * sdlat + ca * cb * sdlon * sdlon))")}
            AS dist_m
        FROM cand)
      SELECT id_a, id_b, dist_m FROM d WHERE dist_m <= 1000.0
      ORDER BY id_a, id_b"""))

  /** Polar-band geodesic pairs: the synthetic box shifted UP onto the
    * 66° band limit (lat ∈ [65.5°, 66.5°]) so roughly half the points
    * land beyond the band — the engine must route them through the
    * dedicated coarse polar ring (one lon-spanning cell per lat ring)
    * and still find every polar×polar and trans-band pair. The NAIVE
    * quadratic oracle has no band concept at all, so a hash hit proves
    * the cap routing loses no pair and invents none (before r11 these
    * points were silently DROPPED from the pair set).
    */
  val xGeoRadiusPairsPolar = Q(
    "x_geo_radius_pairs_polar",
    (s, dir) => {
      val base = Geo.syntheticPoints(t(s, dir, "customer"), "c_custkey")
      val shifted = base.select(col("id"),
        (col("lat_micro") + lit(25500000L)).as("lat_micro"),
        col("lon_micro"))
      Geo.radiusPairsGeodesic(shifted, radiusMeters = 1000.0,
          maxAbsLatMicro = 66000000L)
        .orderBy(col("id_a"), col("id_b"))
    },
    bench = true,
    oracle = Some(s"""WITH $geoPtsCte,
      sp AS (SELECT id, lat + 25500000 AS lat, lon FROM pts),
      rp AS (SELECT id, lat, lon,
          (CAST(lat AS DOUBLE) / 1000000.0) * 0.017453292519943295
            AS phi,
          (CAST(lon AS DOUBLE) / 1000000.0) * 0.017453292519943295
            AS lam
        FROM sp),
      cand AS (SELECT a.id AS id_a, b.id AS id_b,
          ${cn("sin((a.phi - b.phi) / 2.0)")} AS sdlat,
          ${cn("sin((a.lam - b.lam) / 2.0)")} AS sdlon,
          ${cn("cos(a.phi)")} AS ca,
          ${cn("cos(b.phi)")} AS cb
        ${geoBoxJoin(radiusM = 1000.0, maxAbsLatDeg = 66.5)}
      d AS (SELECT id_a, id_b, 12742000.0 *
          ${cn("asin(sqrt(sdlat * sdlat + ca * cb * sdlon * sdlon))")}
            AS dist_m
        FROM cand)
      SELECT id_a, id_b, dist_m FROM d WHERE dist_m <= 1000.0
      ORDER BY id_a, id_b"""))

  val xGeoIncremental = Q(
    "x_geo_pairs_incremental",
    (s, dir) => {
      val pts = Geo.syntheticPoints(t(s, dir, "customer"), "c_custkey")
      Geo.radiusPairsAgainstHistory(
          pts.filter(col("id") % 2 === 1), pts.filter(col("id") % 2 === 0),
          radiusMicro = 10000L)
        .orderBy(col("origin"), col("id_a"), col("id_b"))
    },
    Some(s"""WITH $geoPtsCte,
      newp AS (SELECT * FROM pts WHERE id % 2 = 1),
      hist AS (SELECT * FROM pts WHERE id % 2 = 0),
      b AS (SELECT a.id AS id_a, b.id AS id_b,
          (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) AS dist2,
          'batch' AS origin
        FROM newp a JOIN newp b ON a.id < b.id
        WHERE (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) <= 100000000),
      h AS (SELECT a.id AS id_a, b.id AS id_b,
          (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) AS dist2,
          'history' AS origin
        FROM newp a JOIN hist b ON TRUE
        WHERE (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) <= 100000000)
      SELECT id_a, id_b, dist2,
        sqrt(CAST(dist2 AS DOUBLE)) / 1000000.0 AS dist_deg, origin
      FROM (SELECT * FROM b UNION ALL SELECT * FROM h)
      ORDER BY origin, id_a, id_b"""))

  /** Mann–Kendall trend test + Theil–Sen slope
    * ([[graft.ext.TimeSeries.trendTest]]): S and tie terms are exact
    * integers, each pairwise slope one double division of exact
    * operands, the median an averaged pair of order statistics, the
    * continuity-corrected z the same double expression — everything
    * adjudicates bit-for-bit.
    */
  val xTsTrend = Q(
    "x_ts_trend",
    (s, dir) => TimeSeries.trendTest(t(s, dir, "events"),
        col("event_type"), col("ts"), col("value"))
      .orderBy(col("grp")),
    Some("""WITH daily AS (SELECT event_type AS grp,
        strftime(ts, '%Y-%m-%d') AS day,
        CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(12,2)) AS x
      FROM events GROUP BY 1, 2),
      series AS (SELECT grp,
          CAST(row_number() OVER (PARTITION BY grp ORDER BY day) - 1
            AS BIGINT) AS i, x
        FROM daily),
      pairs AS (SELECT a.grp,
          CAST(sign(CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS sgn,
          CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS slope
        FROM series a JOIN series b ON a.grp = b.grp AND a.i < b.i),
      sagg AS (SELECT grp, CAST(SUM(sgn) AS BIGINT) AS s_stat,
          CAST(COUNT(*) AS BIGINT) AS npairs
        FROM pairs GROUP BY 1),
      nn AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n
        FROM daily GROUP BY 1),
      ties AS (SELECT grp,
          CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT grp, x, CAST(COUNT(*) AS BIGINT) AS t
          FROM daily GROUP BY 1, 2)
        WHERE t > 1 GROUP BY grp),
      ranked AS (SELECT grp, slope,
          CAST(row_number() OVER (PARTITION BY grp ORDER BY slope)
            AS BIGINT) AS rk
        FROM pairs),
      sen AS (SELECT r.grp,
          (MIN(r.slope) + MAX(r.slope)) / CAST(2 AS DOUBLE) AS sen_slope
        FROM ranked r JOIN sagg s ON s.grp = r.grp
        WHERE r.rk = (s.npairs + 1) // 2 OR r.rk = s.npairs // 2 + 1
        GROUP BY r.grp),
      vs AS (SELECT s.grp, s.s_stat, n.n,
          CAST(n.n * (n.n - 1) * (2 * n.n + 5)
            - COALESCE(t.tie_term, 0) AS DOUBLE) / CAST(18 AS DOUBLE)
            AS var_s
        FROM sagg s JOIN nn n ON n.grp = s.grp
        LEFT JOIN ties t ON t.grp = s.grp)
      SELECT v.grp, v.n, v.s_stat, v.var_s,
        CASE WHEN v.s_stat > 0
            THEN CAST(v.s_stat - 1 AS DOUBLE) / sqrt(v.var_s)
          WHEN v.s_stat < 0
            THEN CAST(v.s_stat + 1 AS DOUBLE) / sqrt(v.var_s)
          ELSE CAST(0 AS DOUBLE) END AS z,
        sen.sen_slope
      FROM vs v JOIN sen ON sen.grp = v.grp
      ORDER BY v.grp"""))

  /** Seasonal-naive MASE backtest
    * ([[graft.ext.TimeSeries.seasonalNaiveBacktest]], season 7):
    * absolute errors stay exact decimals, the two means and their
    * ratio are the same double expressions — bit-exact adjudication
    * over the zero-filled calendar.
    */
  val xTsMase = Q(
    "x_ts_mase",
    (s, dir) => TimeSeries.seasonalNaiveBacktest(t(s, dir, "events"),
        col("event_type"), col("ts"), col("value"), season = 7)
      .orderBy(col("grp")),
    Some("""WITH daily AS (SELECT event_type AS grp,
        strftime(ts, '%Y-%m-%d') AS day,
        CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(12,2)) AS x
      FROM events GROUP BY 1, 2),
      span AS (SELECT grp, MIN(CAST(day AS DATE)) AS d0,
          MAX(CAST(day AS DATE)) AS d1
        FROM daily GROUP BY 1),
      cal AS (SELECT grp, d0,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
            AS d
        FROM span),
      dense AS (SELECT c.grp, date_diff('day', c.d0, c.d) AS i,
          COALESCE(dl.x, CAST(0 AS DECIMAL(12,2))) AS x
        FROM cal c LEFT JOIN daily dl
          ON dl.grp = c.grp AND CAST(dl.day AS DATE) = c.d),
      j AS (SELECT a.grp, a.x, s7.x AS xs, s1.x AS x1
        FROM dense a
        LEFT JOIN dense s7 ON s7.grp = a.grp AND s7.i = a.i - 7
        LEFT JOIN dense s1 ON s1.grp = a.grp AND s1.i = a.i - 1),
      agg AS (SELECT grp,
          CAST(COUNT(xs) AS BIGINT) AS n_eval,
          CAST(SUM(abs(x - xs)) AS DECIMAL(38,2)) AS se,
          CAST(COUNT(x1) AS BIGINT) AS n1,
          CAST(SUM(abs(x - x1)) AS DECIMAL(38,2)) AS s1
        FROM j GROUP BY 1)
      SELECT grp, n_eval,
        CAST(se AS DOUBLE) / CAST(n_eval AS DOUBLE) AS mae_seasonal,
        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mae_naive,
        (CAST(se AS DOUBLE) / CAST(n_eval AS DOUBLE))
          / (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS mase
      FROM agg WHERE n_eval > 0 AND s1 > 0 ORDER BY grp"""))

  /** Cross-group quantile normalization
    * ([[graft.ext.Stats.quantileNormalize]]): every event value
    * re-expressed as the pooled distribution's value at the row's
    * within-group quantile — integer rank arithmetic end to end, so
    * all 10,000 rows adjudicate exactly. The engine's pooled ranks
    * come from the distributed range-partitioned numbering
    * ([[graft.ext.Rank.globalRowNumber]]), the oracle's from a plain
    * global window — an independent-implementation check of the
    * numbering itself.
    */
  val xQuantileNormalize = Q(
    "x_quantile_normalize",
    (s, dir) => Stats.quantileNormalize(t(s, dir, "events"),
        col("event_type"), col("event_id"), col("value"))
      .orderBy(col("grp"), col("id")),
    Some("""WITH base AS (SELECT event_type AS grp,
        CAST(event_id AS BIGINT) AS id,
        CAST(value AS DECIMAL(12,2)) AS v
      FROM events),
      pooled AS (SELECT CAST(row_number() OVER (ORDER BY v, id)
          AS BIGINT) AS prn, v AS norm_value
        FROM base),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
      wg AS (SELECT grp, id, v,
          CAST(row_number() OVER (PARTITION BY grp ORDER BY v, id)
            AS BIGINT) AS r,
          CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
        FROM base)
      SELECT w.grp, w.id, CAST(w.v AS DOUBLE) AS value, w.r, w.n,
        CAST(p.norm_value AS DOUBLE) AS norm_value
      FROM wg w CROSS JOIN nn
      JOIN pooled p ON p.prn = CASE WHEN w.n > 1
        THEN (w.r - 1) * (nn.nn - 1) // (w.n - 1) + 1
        ELSE (nn.nn + 1) // 2 END
      ORDER BY w.grp, w.id"""))

  /** Source-health monitoring capstone: one row per event source
    * joining every time-series detector this round shipped — CUSUM
    * alarm days + peak scores, Mann–Kendall z + Theil–Sen slope,
    * seasonal-naive MASE, lag-1 autocorrelation — the daily "which
    * ingest sources need a human" report a production pipeline pins
    * to a dashboard. The ORACLE composes the four already-adjudicated
    * oracle texts VERBATIM as subqueries (DuckDB WITH-in-subquery), so
    * the capstone's correctness inherits each component's rather than
    * re-deriving it — any drift in a component surfaces twice.
    */
  val xPipelineMonitor: Q = {
    def sub(q: Q): String = s"(${q.oracle.get})"
    Q("x_pipeline_monitor",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val cus = TimeSeries.cusum(ev, col("event_type"), col("ts"),
            col("value"), BigDecimal("300.00"), BigDecimal("1500.00"))
          .groupBy(col("grp"))
          .agg(count(lit(1)).cast("bigint").as("n_days"),
            sum(when(col("alarm"), 1L).otherwise(0L)).cast("bigint")
              .as("alarm_days"),
            max(col("cusum_pos")).as("max_cusum_pos"),
            max(col("cusum_neg")).as("max_cusum_neg"))
        val tr = TimeSeries.trendTest(ev, col("event_type"), col("ts"),
            col("value"))
          .select(col("grp"), col("z").as("trend_z"), col("sen_slope"))
        val ms = TimeSeries.seasonalNaiveBacktest(ev, col("event_type"),
            col("ts"), col("value"), season = 7)
          .select(col("grp"), col("mase"))
        val a1 = TimeSeries.acf(ev, col("event_type"), col("ts"),
            col("value"), maxLag = 1)
          .select(col("grp"), col("acf").as("acf1"))
        cus.join(tr, "grp").join(ms, "grp").join(a1, "grp")
          .orderBy(col("grp"))
      },
      Some(s"""SELECT c.grp, c.n_days, c.alarm_days, c.max_cusum_pos,
        c.max_cusum_neg, t.trend_z, t.sen_slope, m.mase, a.acf1
      FROM (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(SUM(CASE WHEN alarm THEN 1 ELSE 0 END) AS BIGINT)
            AS alarm_days,
          MAX(cusum_pos) AS max_cusum_pos,
          MAX(cusum_neg) AS max_cusum_neg
        FROM ${sub(xTsCusum)} GROUP BY grp) c
      JOIN (SELECT grp, z AS trend_z, sen_slope
        FROM ${sub(xTsTrend)}) t ON t.grp = c.grp
      JOIN (SELECT grp, mase FROM ${sub(xTsMase)}) m ON m.grp = c.grp
      JOIN (SELECT grp, acf AS acf1 FROM ${sub(xTsAcf)}
        WHERE lag = 1) a ON a.grp = c.grp
      ORDER BY c.grp"""))
  }

  /** Apriori frequent triples ([[graft.ext.Basket.frequentTriples]],
    * 200 part families, support ≥ 3): the engine runs the level-wise
    * per-basket prune; the oracle enumerates all per-basket triples
    * with only the final support filter — an independent
    * implementation, so adjudication proves the prune drops nothing
    * that qualifies and keeps nothing that doesn't.
    */
  val xBasketTriples = Q(
    "x_basket_triples",
    (s, dir) => Basket.frequentTriples(t(s, dir, "lineitem"),
        col("l_orderkey"), col("l_partkey") % 200, minSupport = 3L)
      .orderBy(col("item_a"), col("item_b"), col("item_c")),
    Some("""WITH li AS (SELECT DISTINCT l_orderkey AS txn,
        l_partkey % 200 AS item FROM lineitem),
      tot AS (SELECT CAST(COUNT(DISTINCT txn) AS BIGINT) AS n_txn
        FROM li),
      ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM li GROUP BY item),
      tr AS (SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
          CAST(COUNT(*) AS BIGINT) AS n_abc
        FROM li a JOIN li b ON a.txn = b.txn AND a.item < b.item
        JOIN li c ON a.txn = c.txn AND b.item < c.item
        GROUP BY 1, 2, 3 HAVING COUNT(*) >= 3)
      SELECT item_a, item_b, item_c, n_abc,
        CAST(n_abc AS DOUBLE) / CAST(n_txn AS DOUBLE) AS support,
        CAST(n_abc AS DOUBLE) * CAST(n_txn AS DOUBLE)
            * CAST(n_txn AS DOUBLE)
          / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)
            * CAST(ic2.n_item AS DOUBLE)) AS lift3
      FROM tr JOIN ic ia ON ia.item = tr.item_a
      JOIN ic ib ON ib.item = tr.item_b
      JOIN ic ic2 ON ic2.item = tr.item_c
      CROSS JOIN tot
      ORDER BY item_a, item_b, item_c"""))

  /** Gap-constrained sequential patterns
    * ([[graft.ext.Behavior.sequencePatterns]], window 5): pure
    * integer counts over total-ordered per-user streams; the lift's
    * slot-uniform null replays in SQL exactly.
    */
  val xSeqPatterns = Q(
    "x_seq_patterns",
    (s, dir) => Behavior.sequencePatterns(t(s, dir, "events"),
        "user_id", "ts", "event_type", "event_id", window = 5)
      .orderBy(col("type_a"), col("type_b")),
    Some("""WITH seq AS (SELECT user_id AS u, event_type AS et,
        CAST(row_number() OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS BIGINT) AS i
      FROM events),
      pairs AS (SELECT a.et AS type_a, b.et AS type_b
        FROM seq a JOIN seq b
          ON a.u = b.u AND b.i > a.i AND b.i <= a.i + 5),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_slots FROM pairs),
      ac AS (SELECT type_a, CAST(COUNT(*) AS BIGINT) AS n_a
        FROM pairs GROUP BY 1),
      bc AS (SELECT type_b, CAST(COUNT(*) AS BIGINT) AS n_b
        FROM pairs GROUP BY 1),
      ab AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM pairs GROUP BY 1, 2)
      SELECT ab.type_a, ab.type_b, ab.n_ab, ac.n_a, bc.n_b,
        CAST(ab.n_ab AS DOUBLE) * CAST(t.t_slots AS DOUBLE)
          / (CAST(ac.n_a AS DOUBLE) * CAST(bc.n_b AS DOUBLE)) AS lift
      FROM ab JOIN ac USING (type_a) JOIN bc USING (type_b)
      CROSS JOIN tot t
      ORDER BY type_a, type_b"""))

  /** Neyman-allocation stratified sampling
    * ([[graft.ext.Sampling.neymanSample]], budget 2000 over event
    * types): quotas ∝ n_h·σ_h from exact power sums, rank order from
    * the 31-bit xorshift id mix — every quota, rank, and keep flag
    * adjudicates exactly.
    */
  val xSampleNeyman = Q(
    "x_sample_neyman",
    (s, dir) => Sampling.neymanSample(t(s, dir, "events"),
        col("event_type"), col("event_id"), col("value"), budget = 2000L)
      .orderBy(col("h"), col("id")),
    Some("""WITH base AS (SELECT event_type AS h,
        CAST(event_id AS BIGINT) AS id,
        CAST(value AS DECIMAL(12,2)) AS x
      FROM events),
      stats AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_h,
          CAST(SUM(x) AS DECIMAL(38,2)) AS s,
          CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ss
        FROM base GROUP BY 1),
      /* VARCHAR roundtrip (the hbos lnC idiom) on EVERY decimal→double
         crossing, not just the sqrt output: DuckDB's direct
         decimal→double (int128→double, then /10^scale) double-rounds
         once the scaled integer exceeds 2^53, while the JVM's is
         correctly rounded — parsing the same exact decimal TEXT is
         correctly rounded on both, so the doubles (and every IEEE op
         after them) are bit-identical */
      wtab AS (SELECT h, n_h,
          CAST(CAST(sqrt(GREATEST(CAST(0 AS DOUBLE),
            CAST(n_h AS DOUBLE) * CAST(CAST(ss AS VARCHAR) AS DOUBLE)
              - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                * CAST(CAST(s AS VARCHAR) AS DOUBLE)))
            AS VARCHAR) AS DECIMAL(20,12)) AS w
        FROM stats),
      ws AS (SELECT CAST(SUM(w) AS DECIMAL(38,12)) AS wsd FROM wtab),
      quotas AS (SELECT h, n_h, CAST(CAST(w AS VARCHAR) AS DOUBLE) AS w_h,
          LEAST(n_h, CAST(floor(CAST(2000 AS DOUBLE)
            * CAST(CAST(w AS VARCHAR) AS DOUBLE)
            / CAST(CAST(wsd AS VARCHAR) AS DOUBLE)) AS BIGINT)) AS quota
        FROM wtab CROSS JOIN ws),
      mixed AS (SELECT h, id,
          xor((xor(v1, v1 // 8192) * 1103515245) % 2147483648,
            ((xor(v1, v1 // 8192) * 1103515245) % 2147483648) // 131072)
            AS mx
        FROM (SELECT h, id, (id * 2654435761 + 97) % 2147483648 AS v1
          FROM base)),
      ranked AS (SELECT h, id,
          CAST(row_number() OVER (PARTITION BY h ORDER BY mx, id)
            AS BIGINT) AS rank
        FROM mixed)
      SELECT r.h, r.id, q.n_h, q.w_h, q.quota, r.rank,
        r.rank <= q.quota AS kept
      FROM ranked r JOIN quotas q ON q.h = r.h
      ORDER BY r.h, r.id"""))

  /** Degree assortativity ([[graft.ext.Graph.degreeAssortativity]]) of
    * the shared blocked graph: the Pearson closed form over exact
    * BIGINT power sums — one row, bit-exact.
    */
  val xAssortativity = Q(
    "x_assortativity",
    (s, dir) => Graph.degreeAssortativity(
      ExtC.syntheticGraph(s, dir), "src", "dst"),
    Some(s"""${ExtC.graphCtes},
      ue AS (SELECT DISTINCT src, dst FROM edges),
      deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM ue GROUP BY 1),
      j AS (SELECT dx.d AS dx, dy.d AS dy
        FROM ue JOIN deg dx ON dx.node = ue.src
        JOIN deg dy ON dy.node = ue.dst),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
          CAST(SUM(dx * dy) AS BIGINT) AS sxy,
          CAST(SUM(dx * dx) AS BIGINT) AS sxx,
          CAST(SUM(dy * dy) AS BIGINT) AS syy
        FROM j)
      SELECT n, sx, sy, sxy,
        CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
          THEN CAST(n * sxy - sx * sy AS DOUBLE)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE))
          ELSE CAST(NULL AS DOUBLE) END AS assortativity
      FROM s"""))

  /** Item-item neighborhoods ([[graft.ext.Basket.itemNeighbors]],
    * 200 part families, co-count ≥ 3, top-5): Jaccard as an exact
    * rational of integer counts; ranks tie-broken on the neighbor id
    * adjudicate exactly.
    */
  val xItemNeighbors = Q(
    "x_item_neighbors",
    (s, dir) => Basket.itemNeighbors(t(s, dir, "lineitem"),
        col("l_orderkey"), col("l_partkey") % 200, minCo = 3L, k = 5)
      .orderBy(col("item"), col("rank")),
    Some("""WITH li AS (SELECT DISTINCT l_orderkey AS txn,
        l_partkey % 200 AS item FROM lineitem),
      ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM li GROUP BY item),
      co AS (SELECT a.item AS ia, b.item AS ib,
          CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM li a JOIN li b ON a.txn = b.txn AND a.item < b.item
        GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      sym AS (SELECT ia AS item, ib AS nbr, n_ab FROM co
        UNION ALL SELECT ib, ia, n_ab FROM co),
      sc AS (SELECT s.item, s.nbr, s.n_ab, ii.n_item AS n_i,
          ij.n_item AS n_j,
          CAST(s.n_ab AS DOUBLE)
            / CAST(ii.n_item + ij.n_item - s.n_ab AS DOUBLE) AS jaccard
        FROM sym s JOIN ic ii ON ii.item = s.item
        JOIN ic ij ON ij.item = s.nbr),
      rk AS (SELECT item, nbr, n_ab, n_i, n_j, jaccard,
          CAST(row_number() OVER (PARTITION BY item
            ORDER BY jaccard DESC, nbr) AS BIGINT) AS rank
        FROM sc)
      SELECT item, rank, nbr, n_ab, n_i, n_j, jaccard
      FROM rk WHERE rank <= 5 ORDER BY item, rank"""))

  /** REAL audio feature extraction
    * ([[graft.ext.Multimodal.audioFeatures]]): the JDK decodes the
    * synthetic PCM16 WAVs and the oracle predicts sample count, exact
    * Σs², channel-0 zero crossings (consecutive-frame sign flips via a
    * self-join on frame index), and the assembled RMS — entirely from
    * the id-derived sample formula. A wrong byte order, a dropped
    * sample, or a channel-interleave mistake in the decode walk all
    * break the hash.
    */
  val xMultimodalAudioFeatures = Q(
    "x_multimodal_audio_features",
    (s, dir) => Multimodal.audioFeatures(
      Multimodal.withSyntheticWav(t(s, dir, "documents"), "doc_id"), "id")
      .orderBy(col("id")),
    Some("""WITH p AS (SELECT doc_id AS id,
        1 + CAST(doc_id % 2 AS BIGINT) AS ch,
        200 + (doc_id * 13) % 800 AS frames
      FROM documents),
      s AS (SELECT id, ch, unnest(range(frames * ch)) AS j FROM p),
      v AS (SELECT id, ch, j,
        ((id * 7919 + j * 104729) % 65536) - 32768 AS sv FROM s),
      agg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_samples,
        CAST(SUM(sv * sv) AS BIGINT) AS sum_sq FROM v GROUP BY id),
      c0 AS (SELECT id, j // ch AS f, sv FROM v WHERE j % ch = 0),
      zc AS (SELECT a.id,
          CAST(SUM(CASE WHEN (a.sv > 0 AND b.sv < 0)
            OR (a.sv < 0 AND b.sv > 0) THEN 1 ELSE 0 END) AS BIGINT) AS z
        FROM c0 a JOIN c0 b ON b.id = a.id AND b.f = a.f + 1
        GROUP BY a.id)
      SELECT g.id, g.n_samples, g.sum_sq,
        CAST(COALESCE(z.z, 0) AS BIGINT) AS zero_crossings,
        sqrt(CAST(g.sum_sq AS DOUBLE) / CAST(g.n_samples AS DOUBLE))
          AS rms
      FROM agg g LEFT JOIN zc z ON z.id = g.id ORDER BY g.id"""))

  val queries: Seq[Q] = Seq(xTsGapfill, xTsAcf, xTsCusum, xTsTrend,
    xTsMase, xQuantileNormalize, xPipelineMonitor, xBasketTriples,
    xSeqPatterns, xSampleNeyman, xAssortativity, xItemNeighbors,
    xMultimodalAudioFeatures,
    xGeoRadiusPairs, xGeoNearest, xGeoCellDensity, xGeoIncremental,
    xGeoRadiusPairsGeodesic, xGeoRadiusPairsAntimeridian,
    xGeoRadiusPairsPolar,
    xMmrRerank, xFpsSample, xHbosOutliers, xKCore)
}
