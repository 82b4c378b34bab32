package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Behavior, Sampling, Stats, Text}
import graft.queries.H.t

/** Round-6 extension bank, second wave: statistical audits over model
  * scores and curated corpora ([[graft.ext.Stats]]), the Markov
  * transition matrix ([[graft.ext.Behavior.transitionMatrix]]), and the
  * token-entropy quality signal ([[graft.ext.Text.tokenEntropy]]) —
  * every query hash-exact against the DuckDB oracle.
  */
object ExtD {

  /** Tie-corrected ROC-AUC ([[graft.ext.Stats.rocAuc]]) of the event
    * value as a purchase predictor — the filter-model evaluation
    * primitive. The doubled-rank formulation keeps everything BIGINT
    * until one final double division, so AUC adjudicates exactly
    * (including the tie correction: 2-decimal values collide).
    */
  val xRocAuc = Q(
    "x_roc_auc",
    (s, dir) => Stats.rocAuc(t(s, dir, "events"), col("value"),
      col("event_type") === "purchase"),
    Some("""WITH base AS (SELECT value AS s,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events),
      g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c,
          CAST(SUM(y) AS BIGINT) AS p FROM base GROUP BY s),
      cum AS (SELECT s, c, p,
          CAST(SUM(c) OVER (ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cumc
        FROM g),
      sums AS (SELECT
          CAST(SUM(CAST(p AS HUGEINT) * (2 * CAST(cumc AS HUGEINT) - c + 1))
            AS HUGEINT) AS sum2r,
          CAST(SUM(p) AS BIGINT) AS pos,
          CAST(SUM(c) AS BIGINT) AS n
        FROM cum)
      SELECT pos AS n_pos, CAST(n - pos AS BIGINT) AS n_neg,
        /* VARCHAR roundtrip: hugeint→double is not guaranteed correctly
           rounded past 2^53; hugeint→varchar→double is (r11 d2d idiom) */
        CAST(CAST(sum2r - CAST(pos AS HUGEINT) * (pos + 1) AS VARCHAR) AS DOUBLE)
          / (CAST(2 AS DOUBLE) * CAST(pos AS DOUBLE)
             * CAST(n - pos AS DOUBLE)) AS auc
      FROM sums"""))

  /** First-order Markov transition matrix
    * ([[graft.ext.Behavior.transitionMatrix]]) over per-user event
    * sequences — next-event modeling / funnel-leak analysis. Counts
    * are integers; each probability is one double division of integer
    * operands.
    */
  val xMarkovTransitions = Q(
    "x_markov_transitions",
    (s, dir) => Behavior.transitionMatrix(t(s, dir, "events"),
      "user_id", "ts", "event_id")
      .orderBy(col("from_type"), col("to_type")),
    Some("""WITH seq AS (SELECT user_id, event_type,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS from_type
        FROM events),
      p AS (SELECT from_type, event_type AS to_type FROM seq
        WHERE from_type IS NOT NULL),
      c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM p GROUP BY from_type, to_type)
      SELECT from_type, to_type, n,
        CAST(n AS DOUBLE)
          / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
      FROM c ORDER BY from_type, to_type"""))

  /** Rolling integer-exact anomaly detection
    * ([[graft.ext.Stats.rollingAnomalies]]): per-type daily event
    * counts against the trailing 7-day window, flagged via the
    * denominator-cleared `(n·x − S)² > k²·(n·Q − S²)` test — no float
    * or sqrt ever enters the decision, so flags adjudicate exactly.
    */
  val xRollingAnomaly = Q(
    "x_rolling_anomaly",
    (s, dir) => Stats.rollingAnomalies(t(s, dir, "events"),
      col("event_type"), col("ts"), win = 7, k = 3)
      .orderBy(col("grp"), col("day")),
    Some("""WITH daily AS (SELECT event_type AS grp,
        strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
      w AS (SELECT grp, day, cnt,
          CAST(COUNT(*) OVER tw AS BIGINT) AS n_win,
          CAST(COALESCE(SUM(cnt) OVER tw, 0) AS BIGINT) AS s_win,
          CAST(COALESCE(SUM(cnt * cnt) OVER tw, 0) AS BIGINT) AS q_win
        FROM daily
        WINDOW tw AS (PARTITION BY grp ORDER BY day
          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT grp, day, cnt, n_win, s_win,
        (n_win = 7 AND
         (n_win * cnt - s_win) * (n_win * cnt - s_win) >
           9 * (n_win * q_win - s_win * s_win)) AS anomaly
      FROM w ORDER BY grp, day"""))

  /** Spearman rank correlation ([[graft.ext.Stats.spearman]]) between
    * document length and token count — the signal-redundancy check run
    * before combining quality filters. Centered doubled ranks keep all
    * three sums in BIGINT; the final ρ is double arithmetic on
    * identical operands (IEEE sqrt is correctly rounded in both
    * engines).
    */
  val xSpearmanQuality = Q(
    "x_spearman_quality",
    (s, dir) => Stats.spearman(t(s, dir, "documents"),
      col("n_chars"), size(split(col("text"), " "))),
    Some("""WITH base AS (SELECT n_chars AS x,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS y FROM documents),
      gx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY x),
      rx AS (SELECT x, CAST(2 * SUM(cnt) OVER (ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - cnt + 1 AS BIGINT) AS r2x FROM gx),
      gy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY y),
      ry AS (SELECT y, CAST(2 * SUM(cnt) OVER (ORDER BY y
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - cnt + 1 AS BIGINT) AS r2y FROM gy),
      np AS (SELECT CAST(COUNT(*) + 1 AS BIGINT) AS np1 FROM base),
      r AS (SELECT r2x - np1 AS cx, r2y - np1 AS cy
        FROM base JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN np)
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(CAST(SUM(cx * cy) AS BIGINT) AS DOUBLE)
          / (sqrt(CAST(CAST(SUM(cx * cx) AS BIGINT) AS DOUBLE))
             * sqrt(CAST(CAST(SUM(cy * cy) AS BIGINT) AS DOUBLE)))
          AS spearman_rho
      FROM r"""))

  /** Per-document token entropy ([[graft.ext.Text.tokenEntropy]]) —
    * the information-density quality signal; DECIMAL-canonicalized
    * logs and exact decimal sums make it hash-exact.
    *
    * Oracle subtlety: Spark's double→decimal cast rounds the double's
    * SHORTEST-STRING repr (HALF_UP), DuckDB rounds differently at
    * half-boundaries (2.6941537039845 → …984 vs Spark's …985, hit by
    * 2 of 500 docs) — so every canonicalization below round-trips
    * through VARCHAR (DuckDB's shortest-repr printer) to replicate
    * Spark's rounding exactly.
    */
  val xTokenEntropy = Q(
    "x_token_entropy",
    (s, dir) => Text.tokenEntropy(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH tok AS (SELECT doc_id,
        unnest(string_split(text, ' ')) AS tk FROM documents),
      tf AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok
        WHERE len(tk) > 0 GROUP BY doc_id, tk),
      agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          SUM(CAST(CAST(c AS DOUBLE)
            * CAST(CAST(CAST(ln(CAST(c AS DOUBLE)) AS VARCHAR)
                AS DECIMAL(20,12)) AS DOUBLE)
            AS DECIMAL(30,14))) AS s
        FROM tf GROUP BY doc_id)
      SELECT doc_id, n_tokens,
        CAST(CAST(CAST(
          CAST(CAST(CAST(ln(CAST(n_tokens AS DOUBLE)) AS VARCHAR)
            AS DECIMAL(20,12)) AS DOUBLE)
          - CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE)
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS token_entropy
      FROM agg ORDER BY doc_id"""))

  /** Gini coefficient ([[graft.ext.Stats.gini]]) of revenue across
    * customers — the dataset-concentration audit (same formula audits
    * per-domain token share in a training mix). Exact decimal
    * arithmetic end to end; one final double division.
    */
  val xGiniRevenue = Q(
    "x_gini_revenue",
    (s, dir) => Stats.gini(t(s, dir, "orders"),
      col("o_custkey"), col("o_totalprice")),
    Some("""WITH per AS (SELECT o_custkey AS e,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        FROM orders GROUP BY o_custkey),
      idx AS (SELECT e, v,
          CAST(row_number() OVER (ORDER BY v, e) AS BIGINT) AS i FROM per),
      sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(v) AS DECIMAL(25,2)) AS t,
          CAST(SUM(i * v) AS DECIMAL(25,2)) AS w
        FROM idx)
      SELECT n, CAST(t AS DOUBLE) AS total,
        CAST(CAST(CAST(2 AS DECIMAL(10,0)) * w
            - CAST(n + 1 AS DECIMAL(10,0)) * t AS DECIMAL(38,2)) AS DOUBLE)
          / CAST(CAST(CAST(n AS DECIMAL(10,0)) * t AS DECIMAL(38,2)) AS DOUBLE)
          AS gini
      FROM sums"""))

  /** k-anonymity audit ([[graft.ext.Stats.kAnonymityAudit]]) on
    * (nation, segment, account-balance bucket): quasi-identifier
    * combinations carried by fewer than 5 customers — the
    * re-identification screen run before a table is released as
    * training data.
    */
  val xKAnonymity = Q(
    "x_k_anonymity",
    (s, dir) => Stats.kAnonymityAudit(t(s, dir, "customer"),
      Seq(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000)).cast("bigint").as("bal_bucket")),
      k = 5)
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket")),
    Some("""SELECT c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, bal_bucket
      HAVING COUNT(*) < 5
      ORDER BY c_nationkey, c_mktsegment, bal_bucket"""))

  /** Two-sample KS statistic ([[graft.ext.Stats.ksTest]]) between
    * purchase and view value distributions — the distribution-shift
    * primitive. Denominator-cleared `max |cumA·nB − cumB·nA|` keeps
    * the max over BIGINTs; one final double division.
    */
  val xKsTest = Q(
    "x_ks_test",
    (s, dir) => {
      val ev = t(s, dir, "events")
      Stats.ksTest(ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"), col("value"))
    },
    Some("""WITH a AS (SELECT value AS v FROM events
        WHERE event_type = 'purchase'),
      b AS (SELECT value AS v FROM events WHERE event_type = 'view'),
      ga AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ca FROM a GROUP BY v),
      gb AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cb FROM b GROUP BY v),
      m AS (SELECT COALESCE(ga.v, gb.v) AS v,
          COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        FROM ga FULL OUTER JOIN gb ON ga.v = gb.v),
      cum AS (SELECT v,
          CAST(SUM(ca) OVER w AS BIGINT) AS cuma,
          CAST(SUM(cb) OVER w AS BIGINT) AS cumb
        FROM m WINDOW w AS (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
          CAST(SUM(cb) AS BIGINT) AS nb FROM m)
      SELECT na AS n_a, nb AS n_b,
        /* hugeint cross-products, double denominator — mirrors the
           engine's decimal ride (bigint wrapped at na*nb ~ 2^63);
           VARCHAR roundtrip for a correctly-rounded double past 2^53 */
        CAST(CAST(MAX(abs(CAST(cuma AS HUGEINT) * nb
            - CAST(cumb AS HUGEINT) * na)) AS VARCHAR) AS DOUBLE)
          / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_d
      FROM cum CROSS JOIN tot GROUP BY na, nb"""))

  /** Reliability-diagram bins ([[graft.ext.Stats.calibrationBins]])
    * of the event value as a purchase predictor — the calibration half
    * of model evaluation next to [[xRocAuc]]. Integer counts, exact
    * decimal score sums, two final divisions.
    */
  val xCalibration = Q(
    "x_calibration",
    (s, dir) => Stats.calibrationBins(t(s, dir, "events"), col("value"),
      col("event_type") === "purchase", binWidth = 50.0, nBins = 10)
      .orderBy(col("bin")),
    Some("""WITH base AS (SELECT least(floor(value / 50.0), 9) AS bin,
        value AS s,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events),
      g AS (SELECT CAST(bin AS BIGINT) AS bin,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(y) AS BIGINT) AS n_pos,
          CAST(CAST(SUM(CAST(s AS DECIMAL(10,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS sum_score
        FROM base GROUP BY 1)
      SELECT bin, n, n_pos,
        sum_score / CAST(n AS DOUBLE) AS mean_score,
        CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate
      FROM g ORDER BY bin"""))

  /** Pearson χ² independence audit
    * ([[graft.ext.Stats.chi2Independence]]) of nation × market
    * segment — the [[xBenford]] recipe against the product of the
    * marginals. Canonicalizations round-trip through VARCHAR so DuckDB
    * replicates Spark's shortest-string decimal rounding at
    * half-boundaries.
    */
  val xChi2Independence = Q(
    "x_chi2_independence",
    (s, dir) => Stats.chi2Independence(t(s, dir, "customer"),
      col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("x"), col("y")),
    Some("""WITH cells AS (SELECT c_nationkey AS x, c_mktsegment AS y,
        CAST(COUNT(*) AS BIGINT) AS o FROM customer GROUP BY 1, 2),
      rr AS (SELECT x, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY x),
      cc AS (SELECT y, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY y),
      nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
      SELECT x, y, o AS n_obs,
        CAST(CAST(CAST(
          CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS expected,
        CAST(CAST(CAST(
          (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
          * (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
          / (CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS chi2_term
      FROM cells JOIN rr USING (x) JOIN cc USING (y) CROSS JOIN nn
      ORDER BY x, y"""))

  /** Mutual information ([[graft.ext.Stats.mutualInfo]]) between
    * document language and source — the categorical feature-redundancy
    * audit. Logs of exact integer products, VARCHAR-canonicalized;
    * weighted sum in DECIMAL(30,14).
    */
  val xMutualInfo = Q(
    "x_mutual_info",
    (s, dir) => Stats.mutualInfo(t(s, dir, "documents"),
      col("lang"), col("source")),
    Some("""WITH cells AS (SELECT lang AS x, source AS y,
        CAST(COUNT(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2),
      rr AS (SELECT x, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY x),
      cc AS (SELECT y, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY y),
      nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
      terms AS (SELECT n, CAST(CAST(o AS DOUBLE) * (
            CAST(CAST(CAST(ln(CAST(o * n AS DOUBLE)) AS VARCHAR)
              AS DECIMAL(20,12)) AS DOUBLE)
          - CAST(CAST(CAST(ln(CAST(r * c AS DOUBLE)) AS VARCHAR)
              AS DECIMAL(20,12)) AS DOUBLE))
          AS DECIMAL(30,14)) AS term
        FROM cells JOIN rr USING (x) JOIN cc USING (y) CROSS JOIN nn)
      SELECT n,
        CAST(CAST(CAST(
          CAST(SUM(term) AS DOUBLE) / CAST(n AS DOUBLE)
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS mutual_info
      FROM terms GROUP BY n"""))

  /** CTE prefix replaying the keyed synthetic-PNG dHash pipeline
    * ([[graft.ext.Multimodal.withSyntheticPngKeyed]] +
    * [[graft.ext.Multimodal.dHash]]) in pure integer SQL: pixel
    * formula (incl. the single-sample perturbation on odd
    * generations), 9×8 grid sample, ITU-R 601 grayscale, adjacent
    * comparisons, row bytes. The Spark side decodes REAL PNG bytes via
    * ImageIO — the oracle predicts every bit from the formula, so a
    * lossy codec, color-profile drift, or sampling mismatch would all
    * break the hash compare. Exposes `hbytes` (id, y, byte).
    */
  private val dhashCtes = """WITH imgs AS (SELECT doc_id AS id,
        doc_id % 97 AS key,
        16 + (doc_id % 97) % 48 AS w,
        16 + ((doc_id % 97) * 7) % 48 AS h,
        ((doc_id // 97) % 2 = 1) AS pert
      FROM documents),
    gx AS (SELECT unnest(range(0, 9)) AS x),
    gy AS (SELECT unnest(range(0, 8)) AS y),
    px AS (SELECT id, x, y,
        CASE WHEN pert AND x = 4 AND y = 3
          THEN ((((x * w // 9) * 31 + (y * h // 8) * 17 + key) & 16777215)
                + 3158064) & 16777215
          ELSE ((x * w // 9) * 31 + (y * h // 8) * 17 + key) & 16777215
        END AS rgb
      FROM imgs CROSS JOIN gx CROSS JOIN gy),
    gr AS (SELECT id, x, y,
        (299 * ((rgb >> 16) & 255) + 587 * ((rgb >> 8) & 255)
          + 114 * (rgb & 255)) // 1000 AS gray
      FROM px),
    bits AS (SELECT a.id, a.y, a.x,
        CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
      FROM gr a JOIN gr b ON b.id = a.id AND b.y = a.y AND b.x = a.x + 1
      WHERE a.x < 8),
    hbytes AS (SELECT id, y,
        CAST(SUM(bit * (1 << (7 - x))) AS BIGINT) AS byte
      FROM bits GROUP BY id, y)"""

  /** Perceptual image hash over REAL decoded PNGs
    * ([[graft.ext.Multimodal.dHash]]): the oracle recomputes all 64
    * bits from the synthetic pixel formula and compares hex-for-hex
    * against what ImageIO read out of the actual bytes.
    */
  val xMultimodalPhash = Q(
    "x_multimodal_phash",
    (s, dir) => {
      import graft.ext.Multimodal
      Multimodal.withDHash(
        Multimodal.withSyntheticPngKeyed(t(s, dir, "documents"),
          "doc_id", 97), "id")
        .orderBy(col("id"))
    },
    Some(s"""$dhashCtes
      SELECT id, string_agg(printf('%02x', byte), '' ORDER BY y) AS dhash
      FROM hbytes GROUP BY id ORDER BY id"""))

  /** Perceptual near-duplicate image pairs
    * ([[graft.ext.Multimodal.phashPairs]]): banded pigeonhole
    * candidates + exact Hamming verify on the Spark side; the oracle
    * brute-forces every pair from the replayed hashes, so both recall
    * (pigeonhole) and precision (xor + bit_count) are adjudicated.
    * Exact duplicates (same key, same parity) land at Hamming 0,
    * perturbed twins at ≤ 2.
    */
  val xMultimodalPhashPairs = Q(
    "x_multimodal_phash_pairs",
    (s, dir) => {
      import graft.ext.Multimodal
      Multimodal.phashPairs(
        Multimodal.withDHash(
          Multimodal.withSyntheticPngKeyed(t(s, dir, "documents"),
            "doc_id", 97), "id"), maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""$dhashCtes,
      chunks AS (SELECT id, y // 2 AS j,
          CAST(SUM(byte * CASE WHEN y % 2 = 0 THEN 256 ELSE 1 END)
            AS BIGINT) AS cv
        FROM hbytes GROUP BY id, y // 2),
      pairs AS (SELECT a.id AS id_a, b.id AS id_b,
          CAST(SUM(bit_count(xor(a.cv, b.cv))) AS BIGINT) AS hamming
        FROM chunks a JOIN chunks b ON a.j = b.j AND a.id < b.id
        GROUP BY a.id, b.id)
      SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
      ORDER BY id_a, id_b"""),
    // r12: the decode path was the only major operator family with no
    // cross-round perf trace in BENCH artifacts — this query exercises
    // the full pipeline (synthetic PNG bytes → ImageIO decode → dHash
    // → banded pigeonhole pairs), so it's the representative headliner
    bench = true)

  /** Cross-video duplicate-frame detection (round 8) — the full video
    * half of perceptual dedup, end-to-end REAL: keyed LOSSLESS
    * BMP-in-AVI payloads ([[graft.ext.Multimodal.syntheticAviBmpKeyed]]
    * — frame key `(vid + f) mod 199` recurs across videos) are demuxed
    * by the RIFF walk, every frame's BMP is decoded by ImageIO and
    * dHashed, and frames within Hamming ≤ 3 pair up via the pigeonhole
    * band join. Frame identity is `vid·8 + frame_idx`. Because BMP is
    * lossless the oracle replays every pixel → every dHash bit → every
    * pair: a wrong chunk offset, pad byte, pixel, or grid sample
    * breaks the hash.
    */
  val xMultimodalFrameDups = Q(
    "x_multimodal_frame_dups",
    (s, dir) => {
      import graft.ext.Multimodal
      val frames = Multimodal.frameSample(
        Multimodal.withSyntheticAviKeyed(t(s, dir, "documents"),
          "doc_id", 199), "id", stride = 1)
      val hashed = Multimodal.withDHash(
        frames.select((col("id") * 8 + col("frame_idx")).as("id"),
          col("frame_payload").as("payload")), "id")
      Multimodal.phashPairs(hashed, maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH vids AS (SELECT doc_id AS vid,
        2 + CAST(doc_id % 6 AS BIGINT) AS nf FROM documents),
      fr AS (SELECT vid, unnest(range(nf)) AS f FROM vids),
      imgs AS (SELECT vid * 8 + f AS id, (vid + f) % 199 AS key,
          8 + ((vid + f) % 199) % 24 AS w,
          8 + (((vid + f) % 199) * 5) % 24 AS h
        FROM fr),
      gx AS (SELECT unnest(range(0, 9)) AS x),
      gy AS (SELECT unnest(range(0, 8)) AS y),
      px AS (SELECT id, x, y,
          ((x * w // 9) * 31 + (y * h // 8) * 17 + key) & 16777215 AS rgb
        FROM imgs CROSS JOIN gx CROSS JOIN gy),
      gr AS (SELECT id, x, y,
          (299 * ((rgb >> 16) & 255) + 587 * ((rgb >> 8) & 255)
            + 114 * (rgb & 255)) // 1000 AS gray
        FROM px),
      bits AS (SELECT a.id, a.y, a.x,
          CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
        FROM gr a JOIN gr b ON b.id = a.id AND b.y = a.y AND b.x = a.x + 1
        WHERE a.x < 8),
      hbytes AS (SELECT id, y,
          CAST(SUM(bit * (1 << (7 - x))) AS BIGINT) AS byte
        FROM bits GROUP BY id, y),
      chunks AS (SELECT id, y // 2 AS j,
          CAST(SUM(byte * CASE WHEN y % 2 = 0 THEN 256 ELSE 1 END)
            AS BIGINT) AS cv
        FROM hbytes GROUP BY id, y // 2),
      pairs AS (SELECT a.id AS id_a, b.id AS id_b,
          CAST(SUM(bit_count(xor(a.cv, b.cv))) AS BIGINT) AS hamming
        FROM chunks a JOIN chunks b ON a.j = b.j AND a.id < b.id
        GROUP BY a.id, b.id)
      SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
      ORDER BY id_a, id_b"""))
  // not a bench headliner: at sf0.1 the wall-clock is dominated by the
  // FIXTURE's per-frame BMP encodes (ImageIO write throughput), not by
  // the demux/hash/pair operators under test

  /** Exact triangle count ([[graft.ext.Graph.triangleCount]]) on the
    * shared synthetic blocked graph — degree-ordered compact-forward
    * on the Spark side, canonical i<j<k 3-way join in the oracle.
    * Pure integer counts.
    */
  val xTriangleCount = Q(
    "x_triangle_count",
    (s, dir) => graft.ext.Graph.triangleCount(
      ExtC.syntheticGraph(s, dir), "src", "dst"),
    Some(s"""${ExtC.graphCtes},
      ue AS (SELECT src, dst FROM edges WHERE src < dst GROUP BY src, dst),
      tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM ue e1 JOIN ue e2 ON e2.src = e1.dst
        JOIN ue e3 ON e3.src = e1.src AND e3.dst = e2.dst)
      SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
        CAST((SELECT COUNT(*) FROM ue) AS BIGINT) AS n_edges,
        (SELECT t FROM tri) AS n_triangles"""),
    bench = true)

  /** Adamic–Adar link prediction ([[graft.ext.Graph.adamicAdar]]) over
    * the same graph: 2-hop pairs scored `Σ 1/ln(deg w)` with only
    * integer degrees entering the log — canonicalized, decimal-summed,
    * hash-exact.
    */
  val xAdamicAdar = Q(
    "x_adamic_adar",
    (s, dir) => graft.ext.Graph.adamicAdar(
      ExtC.syntheticGraph(s, dir), "src", "dst", minCommon = 2L)
      .orderBy(col("u"), col("v")),
    Some(s"""${ExtC.graphCtes},
      de AS (SELECT src, dst FROM edges GROUP BY src, dst),
      deg AS (SELECT src AS w, CAST(COUNT(*) AS BIGINT) AS deg
        FROM de GROUP BY src),
      nb AS (SELECT dst AS w, src AS u FROM de),
      wedge AS (SELECT l.w, l.u AS u, r.u AS v
        FROM nb l JOIN nb r ON l.w = r.w AND l.u < r.u),
      sc AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common,
          SUM(CAST(CAST(1.0 AS DOUBLE)
            / CAST(CAST(ln(CAST(deg AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE)
            AS DECIMAL(30,14))) AS s
        FROM wedge JOIN deg USING (w) GROUP BY u, v)
      SELECT u, v, common, CAST(s AS DOUBLE) AS aa_score
      FROM sc WHERE common >= 2 ORDER BY u, v"""))

  /** Quality-aware survivor selection
    * ([[graft.ext.Dedup.qualitySurvivors]]): per near-dup cluster keep
    * the highest-scoring member (min-id tie-break), not the arbitrary
    * min-id — the curation-correct dedup. The oracle rebuilds the
    * transitive closure with a recursive CTE and replays the argmax as
    * a ranked window.
    */
  val xDedupSurvivors = Q(
    "x_dedup_survivors",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ext.Dedup.qualitySurvivors(docs, "doc_id",
        graft.ext.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
          k = 3, threshold = 0.5), col("n_chars"))
        .orderBy(col("cluster_id"))
    },
    Some("""WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(w)-1),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ix
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY da, db),
      pairs AS (SELECT da, db FROM inter
        JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
        WHERE CAST(ix AS DOUBLE)/(ca.n + cb.n - ix) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM pairs
        UNION SELECT db, da FROM pairs),
      reach(a, b) AS (SELECT a, b FROM edges
        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      lbl AS (SELECT a AS id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
      alldocs AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS q
        FROM documents),
      withc AS (SELECT d.doc_id,
          COALESCE(l.cluster_id, d.doc_id) AS cluster_id, q
        FROM alldocs d LEFT JOIN lbl l ON l.id = d.doc_id),
      rk AS (SELECT cluster_id, doc_id, q,
          row_number() OVER (PARTITION BY cluster_id
            ORDER BY q DESC, doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY cluster_id) AS nm
        FROM withc)
      SELECT cluster_id, CAST(nm AS BIGINT) AS n_members,
        doc_id AS survivor_id, q AS survivor_score
      FROM rk WHERE rn = 1 ORDER BY cluster_id"""))

  /** Kaplan–Meier time-to-conversion curve
    * ([[graft.ext.Stats.kaplanMeier]]): duration = days from a user's
    * first event to their first high-value purchase (value ≥ 200),
    * right-censored at the last observed event for the 118/150 users
    * who never convert. Log-space survival over exact integer risk
    * sets; the VARCHAR round-trip mirrors Spark's decimal rounding.
    */
  val xKaplanMeier = Q(
    "x_kaplan_meier",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val per = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      val fp = ev.filter(col("event_type") === "purchase" &&
          col("value") >= 200)
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
      val dur = per.join(fp, Seq("user_id"), "left").select(
        datediff(coalesce(col("tp"), col("t1")).cast("date"),
          col("t0").cast("date")).cast("long").as("dur"),
        col("tp").isNotNull.as("obs"))
      Stats.kaplanMeier(dur, col("dur"), col("obs")).orderBy(col("t"))
    },
    Some("""WITH per AS (SELECT user_id, min(ts) AS t0, max(ts) AS t1
        FROM events GROUP BY user_id),
      fp AS (SELECT user_id, min(ts) AS tp FROM events
        WHERE event_type = 'purchase' AND value >= 200 GROUP BY user_id),
      dur AS (SELECT
          CAST(date_diff('day', CAST(t0 AS DATE),
            CAST(COALESCE(tp, t1) AS DATE)) AS BIGINT) AS t,
          CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM per LEFT JOIN fp USING (user_id)),
      byt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS m,
          CAST(SUM(e) AS BIGINT) AS d FROM dur GROUP BY t),
      rsk AS (SELECT t, m, d,
          CAST(SUM(m) OVER (ORDER BY t DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
        FROM byt),
      evt AS (SELECT t, m, d, n,
          CASE WHEN d < n THEN
            CAST(CAST(CAST(ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE))
              AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) END AS term
        FROM rsk WHERE d > 0),
      cum AS (SELECT t, n, d, m,
          MAX(CASE WHEN d = n THEN 1 ELSE 0 END) OVER w AS wiped,
          SUM(CAST(term AS DECIMAL(30,14))) OVER w AS logs
        FROM evt WINDOW w AS (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT t, n AS n_risk, d AS n_events,
        CAST(m - d AS BIGINT) AS n_censored,
        CASE WHEN wiped = 1 THEN NULL
          ELSE CAST(logs AS DOUBLE) END AS log_survival
      FROM cum ORDER BY t"""))

  /** Market-basket association rules
    * ([[graft.ext.Basket.associationRules]]) over parts co-purchased
    * in one order: support, directional confidences, lift — every
    * metric one double division (or product per side) of exact integer
    * counts.
    */
  val xBasketRules = Q(
    "x_basket_rules",
    (s, dir) => graft.ext.Basket.associationRules(t(s, dir, "lineitem"),
      col("l_orderkey"), col("l_partkey"), minSupport = 2L)
      .orderBy(col("item_a"), col("item_b")),
    Some("""WITH li AS (SELECT DISTINCT l_orderkey AS txn,
        l_partkey AS item FROM lineitem),
      tot AS (SELECT CAST(COUNT(DISTINCT txn) AS BIGINT) AS n_txn FROM li),
      ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM li GROUP BY item),
      pr AS (SELECT a.item AS item_a, b.item AS item_b,
          CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM li a JOIN li b ON a.txn = b.txn AND a.item < b.item
        GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      SELECT item_a, item_b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
        CAST(n_ab AS DOUBLE) / CAST(n_txn AS DOUBLE) AS support,
        CAST(n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS conf_a_to_b,
        CAST(n_ab AS DOUBLE) / CAST(ib.n_item AS DOUBLE) AS conf_b_to_a,
        CAST(n_ab AS DOUBLE) * CAST(n_txn AS DOUBLE)
          / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)) AS lift
      FROM pr JOIN ic ia ON ia.item = pr.item_a
      JOIN ic ib ON ib.item = pr.item_b CROSS JOIN tot
      ORDER BY item_a, item_b"""))

  /** Population Stability Index ([[graft.ext.Drift.psi]]) between the
    * purchase and view value distributions — the model-monitoring
    * companion of [[xKsTest]] (same bins as [[xCalibration]]).
    */
  val xPsiDrift = Q(
    "x_psi_drift",
    (s, dir) => {
      val ev = t(s, dir, "events")
      graft.ext.Drift.psi(ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"), col("value"),
        binWidth = 50.0, nBins = 10)
    },
    Some("""WITH ob AS (SELECT CAST(least(floor(value / 50.0), 9) AS BIGINT)
          AS bin FROM events WHERE event_type = 'purchase'),
      nb AS (SELECT CAST(least(floor(value / 50.0), 9) AS BIGINT) AS bin
        FROM events WHERE event_type = 'view'),
      oc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS co FROM ob
        GROUP BY bin),
      nc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cn FROM nb
        GROUP BY bin),
      j AS (SELECT COALESCE(oc.bin, nc.bin) AS bin,
          COALESCE(co, 0) AS co, COALESCE(cn, 0) AS cn
        FROM oc FULL OUTER JOIN nc ON oc.bin = nc.bin),
      tot AS (SELECT CAST(SUM(co) AS BIGINT) AS n_old,
          CAST(SUM(cn) AS BIGINT) AS n_new,
          CAST(COUNT(*) AS BIGINT) AS v FROM j),
      terms AS (SELECT n_old, n_new, v,
          CAST((CAST(co + 1 AS DOUBLE) / CAST(n_old + v AS DOUBLE)
              - CAST(cn + 1 AS DOUBLE) / CAST(n_new + v AS DOUBLE))
            * CAST(CAST(ln(
                (CAST(co + 1 AS DOUBLE) / CAST(n_old + v AS DOUBLE))
                / (CAST(cn + 1 AS DOUBLE) / CAST(n_new + v AS DOUBLE)))
              AS DECIMAL(20,12)) AS DOUBLE)
            AS DECIMAL(20,12)) AS psi_term
        FROM j, tot)
      SELECT n_old, n_new, v AS n_bins,
        CAST(SUM(psi_term) AS DOUBLE) AS psi
      FROM terms GROUP BY n_old, n_new, v"""))

  /** Contamination-spread audit — the composition the individual
    * operators exist for: benchmark-contaminated docs
    * ([[graft.ext.Text.contamination]], 5-gram overlap with the eval
    * slice) seed a 2-hop BFS ([[graft.ext.Graph.bfsDistances]]) over
    * the textual-overlap graph
    * ([[graft.ext.Dedup.sharedShinglePairs]], ≥2 shared 3-grams), so
    * documents sharing verbatim phrases with contaminated docs — and
    * THEIR overlaps — are flagged too (the conservative transitive
    * decontamination). Self-edges keep isolated docs in the output
    * (harmless under min-propagation: d vs d+1). distance 0 =
    * directly contaminated, 1–2 = transitively tainted, −1 = clean.
    */
  val xContaminationSpread: Q = {
    val inf = Long.MaxValue
    val iters = (1 to 2).map { i =>
      s"""r$i AS (SELECT e.dst, MIN(d.d) + 1 AS nd
          FROM edges e JOIN d${i - 1} d ON d.node = e.src
          WHERE d.d <> $inf GROUP BY e.dst),
        d$i AS (SELECT d.node, least(d.d, COALESCE(r.nd, $inf)) AS d
          FROM d${i - 1} d LEFT JOIN r$i r ON r.dst = d.node)"""
    }.mkString(",\n")
    Q("x_contamination_spread",
      (s, dir) => {
        import graft.ext.{Dedup, Graph, Text}
        val docs = t(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") >= 20)
        val seeds = Text.contamination(corpus,
            docs.filter(col("doc_id") < 20), "text", "doc_id", n = 5)
          .filter(col("contaminated")).select(col("doc_id").as("seed"))
        val pairs = Dedup.sharedShinglePairs(corpus, "text", "doc_id",
          k = 3, minShared = 2L)
        val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .unionByName(pairs.select(col("doc_b").as("src"),
            col("doc_a").as("dst")))
          .unionByName(corpus.select(col("doc_id").as("src"),
            col("doc_id").as("dst")))
        Graph.bfsDistances(sym, "src", "dst", seeds, "seed", rounds = 2)
          .orderBy(col("node"))
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents),
        g5 AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
              || ' ' || w[i+4])) AS gram
          FROM d),
        eg AS (SELECT DISTINCT gram FROM g5 WHERE doc_id < 20),
        seeds AS (SELECT DISTINCT g5.doc_id FROM g5
          JOIN eg ON g5.gram = eg.gram WHERE g5.doc_id >= 20),
        sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w)-1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          FROM d WHERE doc_id >= 20),
        inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ix
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY da, db),
        prs AS (SELECT da, db FROM inter WHERE ix >= 2),
        corpus AS (SELECT doc_id FROM documents WHERE doc_id >= 20),
        edges AS (SELECT da AS src, db AS dst FROM prs
          UNION ALL SELECT db, da FROM prs
          UNION ALL SELECT doc_id, doc_id FROM corpus),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        d0 AS (SELECT node, CASE WHEN node IN (SELECT doc_id FROM seeds)
          THEN 0 ELSE $inf END AS d FROM nodes),
        $iters
        SELECT node, CASE WHEN d = $inf THEN -1 ELSE d END AS distance
        FROM d2 ORDER BY node"""))
  }

  /** Hybrid retrieval via reciprocal rank fusion
    * ([[graft.ext.Rank.rrfFuse]]): the BM25 top-20 (lexical) and the
    * embedding-cosine top-20 for query vector 0 (dense) fused by
    * `Σ 1/(60 + rank)` — the standard hybrid-search merge, no score
    * calibration needed. Both input rankings reuse adjudicated-green
    * machinery (the `x_text_bm25` scoring chain; the `vec_dot` cosine
    * whose doubles are bit-identical to DuckDB's sequential
    * `list_dot_product`), so the fused ORDER adjudicates exactly.
    */
  val xHybridRrf: Q = {
    import org.apache.spark.sql.expressions.Window
    Q("x_hybrid_rrf",
      (s, dir) => {
        import graft.ext.{Rank, Similarity, Text}
        val topW = Window.partitionBy(pmod(col("id"), lit(1)))
          .orderBy(col("sc").desc, col("id"))
        def top20(scored: org.apache.spark.sql.DataFrame) = scored
          .orderBy(col("sc").desc, col("id")).limit(20)
          .withColumn("rank", row_number().over(topW))
          .select(col("id"), col("rank"))
        val bm = top20(Text.bm25(t(s, dir, "documents"), "text", "doc_id",
            terms = Seq("dup", "vector", "stream"))
          .select(col("doc_id").as("id"), col("score").as("sc")))
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        val cos = top20(emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id").as("id"),
            (Similarity.dot(col("embedding"), col("qv")) /
              (Similarity.norm(col("embedding")) *
                Similarity.norm(col("qv")))).as("sc")))
        Rank.rrfFuse(Seq(bm, cos), "id", "rank", k = 60)
          .orderBy(col("rrf_score").desc, col("id"))
      },
      Some("""WITH b2 AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
          string_split(text, ' ') AS toks FROM documents),
        stats AS (SELECT count(*) AS n_docs,
          CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM b2),
        tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM (
            SELECT doc_id, dl, unnest(toks) AS term FROM b2)
          WHERE term IN ('dup', 'vector', 'stream') GROUP BY 1, 2, 3),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        contrib AS (SELECT doc_id,
          CAST((CAST(CAST(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5)) AS DECIMAL(20,12)) AS DOUBLE)
            * (CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
            / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
                * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
            AS DECIMAL(20,12)) AS c
          FROM tf JOIN dfreq USING (term), stats),
        sc AS (SELECT doc_id,
          CAST(CAST(SUM(c) AS DECIMAL(38,12)) AS DOUBLE) AS score
          FROM contrib GROUP BY 1),
        bmrank AS (SELECT doc_id AS id,
            CAST(row_number() OVER (ORDER BY score DESC, doc_id)
              AS INTEGER) AS rank
          FROM sc QUALIFY rank <= 20),
        e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
        cosr AS (SELECT vec_id, list_dot_product(v, q)
            / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q)))
            AS cs
          FROM e CROSS JOIN qv WHERE vec_id <> 0),
        crank AS (SELECT vec_id AS id,
            CAST(row_number() OVER (ORDER BY cs DESC, vec_id)
              AS INTEGER) AS rank
          FROM cosr QUALIFY rank <= 20),
        u AS (SELECT id, rank FROM bmrank
          UNION ALL SELECT id, rank FROM crank),
        f AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_lists,
            SUM(CAST(CAST(
              CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE)
                + CAST(rank AS DOUBLE))
              AS VARCHAR) AS DECIMAL(30,14))) AS s
          FROM u GROUP BY id)
        SELECT id, n_lists, CAST(s AS DOUBLE) AS rrf_score
        FROM f ORDER BY rrf_score DESC, id"""))
  }

  /** Trap: ROC-AUC under MASS ties — scores collapsed to 5 buckets, so
    * almost every rank is an average rank and `2·cum − c + 1` does all
    * the work. A naive rank (min or max instead of average) is off in
    * the third decimal here.
    */
  val xTrapAucTies = Q(
    "x_trap_auc_ties",
    (s, dir) => Stats.rocAuc(t(s, dir, "events"),
      floor(col("value") / 100), col("event_type") === "purchase"),
    Some("""WITH base AS (SELECT CAST(floor(value / 100) AS DOUBLE) AS s,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events),
      g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c,
          CAST(SUM(y) AS BIGINT) AS p FROM base GROUP BY s),
      cum AS (SELECT s, c, p,
          CAST(SUM(c) OVER (ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cumc
        FROM g),
      sums AS (SELECT
          CAST(SUM(CAST(p AS HUGEINT) * (2 * CAST(cumc AS HUGEINT) - c + 1))
            AS HUGEINT) AS sum2r,
          CAST(SUM(p) AS BIGINT) AS pos,
          CAST(SUM(c) AS BIGINT) AS n
        FROM cum)
      SELECT pos AS n_pos, CAST(n - pos AS BIGINT) AS n_neg,
        /* VARCHAR roundtrip: hugeint→double is not guaranteed correctly
           rounded past 2^53; hugeint→varchar→double is (r11 d2d idiom) */
        CAST(CAST(sum2r - CAST(pos AS HUGEINT) * (pos + 1) AS VARCHAR) AS DOUBLE)
          / (CAST(2 AS DOUBLE) * CAST(pos AS DOUBLE)
             * CAST(n - pos AS DOUBLE)) AS auc
      FROM sums"""))

  /** Trap: Kaplan–Meier with a WIPED-OUT final risk set — every
    * subject has an event and the longest duration's d equals its n,
    * so survival is exactly 0 there: the NULL log sentinel (not −inf,
    * not a crash, not a skipped row) is what adjudicates.
    */
  val xTrapKmWipeout = Q(
    "x_trap_km_wipeout",
    (s, dir) => Stats.kaplanMeier(
      t(s, dir, "customer").select((col("c_custkey") % 5).as("dur"),
        lit(true).as("obs")),
      col("dur"), col("obs")).orderBy(col("t")),
    Some("""WITH dur AS (SELECT CAST(c_custkey % 5 AS BIGINT) AS t, 1 AS e
        FROM customer),
      byt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS m,
          CAST(SUM(e) AS BIGINT) AS d FROM dur GROUP BY t),
      rsk AS (SELECT t, m, d,
          CAST(SUM(m) OVER (ORDER BY t DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
        FROM byt),
      evt AS (SELECT t, m, d, n,
          CASE WHEN d < n THEN
            CAST(CAST(CAST(ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE))
              AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) END AS term
        FROM rsk WHERE d > 0),
      cum AS (SELECT t, n, d, m,
          MAX(CASE WHEN d = n THEN 1 ELSE 0 END) OVER w AS wiped,
          SUM(CAST(term AS DECIMAL(30,14))) OVER w AS logs
        FROM evt WINDOW w AS (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT t, n AS n_risk, d AS n_events,
        CAST(m - d AS BIGINT) AS n_censored,
        CASE WHEN wiped = 1 THEN NULL
          ELSE CAST(logs AS DOUBLE) END AS log_survival
      FROM cum ORDER BY t"""))

  /** Trap: RRF with EXACT score ties — two mirrored rankings over ten
    * ids give id i and id 11−i identical fused sums (equal exact
    * decimals → equal doubles), so the output order is decided purely
    * by the (score desc, id) tie-break, which the oracle replays.
    */
  val xTrapRrfTie: Q = {
    import org.apache.spark.sql.expressions.Window
    Q("x_trap_rrf_tie",
      (s, dir) => {
        val base = t(s, dir, "customer").filter(col("c_custkey").between(1, 10))
          .select(col("c_custkey").as("id"))
        val w = Window.partitionBy(pmod(col("id"), lit(1)))
          .orderBy(col("id"))
        val a = base.withColumn("rank", row_number().over(w))
        val b = base.withColumn("rank", lit(11) - row_number().over(w))
        graft.ext.Rank.rrfFuse(Seq(a, b), "id", "rank", k = 60)
          .orderBy(col("rrf_score").desc, col("id"))
      },
      Some("""WITH base AS (SELECT c_custkey AS id FROM customer
          WHERE c_custkey BETWEEN 1 AND 10),
        a AS (SELECT id, CAST(row_number() OVER (ORDER BY id) AS INTEGER)
            AS rank FROM base),
        b AS (SELECT id,
            CAST(11 - row_number() OVER (ORDER BY id) AS INTEGER) AS rank
          FROM base),
        u AS (SELECT id, rank FROM a UNION ALL SELECT id, rank FROM b),
        f AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_lists,
            SUM(CAST(CAST(
              CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE)
                + CAST(rank AS DOUBLE))
              AS VARCHAR) AS DECIMAL(30,14))) AS s
          FROM u GROUP BY id)
        SELECT id, n_lists, CAST(s AS DOUBLE) AS rrf_score
        FROM f ORDER BY rrf_score DESC, id"""))
  }

  /** Time-aware EWMA smoothing ([[graft.ext.Stats.ewmaDaily]]) of
    * per-type daily volumes: real day gaps decay the weight, the
    * 14-day truncated kernel is part of the defined computation, and
    * the oracle replays every weighted term (pow canonicalized through
    * the VARCHAR round-trip).
    */
  val xEwmaDaily = Q(
    "x_ewma_daily",
    (s, dir) => Stats.ewmaDaily(t(s, dir, "events"), col("event_type"),
      col("ts"), alpha = 0.25, kernel = 14)
      .orderBy(col("grp"), col("day")),
    Some("""WITH daily AS (SELECT event_type AS grp,
        strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
      j AS (SELECT a.grp, a.day, a.cnt,
          date_diff('day', CAST(b.day AS DATE), CAST(a.day AS DATE))
            AS delta,
          b.cnt AS bc
        FROM daily a JOIN daily b ON a.grp = b.grp
        WHERE date_diff('day', CAST(b.day AS DATE), CAST(a.day AS DATE))
            >= 0
          AND date_diff('day', CAST(b.day AS DATE), CAST(a.day AS DATE))
            < 14),
      agg AS (SELECT grp, day, CAST(MAX(cnt) AS BIGINT) AS cnt,
          SUM(CAST(CAST(bc AS DOUBLE)
            * CAST(CAST(CAST(pow(CAST(0.75 AS DOUBLE),
                CAST(delta AS DOUBLE)) AS VARCHAR) AS DECIMAL(20,12))
              AS DOUBLE)
            AS DECIMAL(30,14))) AS s
        FROM j GROUP BY grp, day)
      SELECT grp, day, cnt,
        CAST(0.25 AS DOUBLE) * CAST(s AS DOUBLE) AS ewma
      FROM agg ORDER BY grp, day"""))

  /** RFM segmentation ([[graft.ext.Stats.rfm]]): recency / frequency /
    * monetary quintiles with deterministic tie-breaks — DuckDB's ntile
    * shares Spark's equal-buckets-extras-first definition, so segment
    * codes adjudicate exactly.
    */
  val xRfm = Q(
    "x_rfm",
    (s, dir) => Stats.rfm(t(s, dir, "orders"), col("o_custkey"),
      col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("cust")),
    Some("""WITH maxd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS as_of
        FROM orders),
      per AS (SELECT o_custkey AS cust,
          MAX(CAST(o_orderdate AS DATE)) AS last_order,
          CAST(COUNT(*) AS BIGINT) AS frequency,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(25,2))
            AS monetary
        FROM orders GROUP BY 1),
      s AS (SELECT cust,
          CAST(date_diff('day', last_order, as_of) AS BIGINT) AS recency,
          frequency, monetary
        FROM per CROSS JOIN maxd),
      sc AS (SELECT cust, recency, frequency,
          CAST(monetary AS DOUBLE) AS monetary,
          CAST(ntile(5) OVER (ORDER BY recency DESC, cust) AS BIGINT)
            AS r_score,
          CAST(ntile(5) OVER (ORDER BY frequency, cust) AS BIGINT)
            AS f_score,
          CAST(ntile(5) OVER (ORDER BY monetary, cust) AS BIGINT)
            AS m_score
        FROM s)
      SELECT cust, recency, frequency, monetary, r_score, f_score,
        m_score,
        r_score * 100 + f_score * 10 + m_score AS rfm_segment
      FROM sc ORDER BY cust"""))

  /** Water-filling mixture allocation
    * ([[graft.ext.Sampling.waterFill]]): equal target weights against
    * unequal domain caps at a budget that forces a 3-round saturation
    * cascade — small domains take their caps, the freed budget flows
    * to the rest. Pure BIGINT floor arithmetic; the oracle unrolls
    * every round.
    */
  val xMixtureWaterfill: Q = {
    val total = 26000L
    val rounds = 4
    def aggCte(i: Int, src: String) =
      s"""a$i AS (SELECT
          CAST(COALESCE(SUM(CASE WHEN sat THEN cap END), 0) AS BIGINT)
            AS used,
          CAST(COALESCE(SUM(CASE WHEN NOT sat THEN w END), 0) AS BIGINT)
            AS wsum
        FROM $src)"""
    def tentSql = s"""CASE WHEN wsum = 0 THEN cap
        ELSE (w * ($total - used)) // wsum END"""
    val iters = (1 to rounds).map { i =>
      s"""${aggCte(i, s"s${i - 1}")},
        s$i AS (SELECT domain, cap, w,
            sat OR ($tentSql) >= cap AS sat
          FROM s${i - 1} CROSS JOIN a$i)"""
    }.mkString(",\n")
    Q("x_mixture_waterfill",
      (s, dir) => {
        val caps = t(s, dir, "documents")
          .groupBy(col("source"))
          .agg(sum(size(split(col("text"), " "))).cast("long").as("cap"))
          .withColumn("w", lit(50L))
        Sampling.waterFill(caps, "source", "cap", "w", total, rounds)
          .orderBy(col("domain"))
      },
      Some(s"""WITH caps AS (SELECT source AS domain,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS cap,
          CAST(50 AS BIGINT) AS w
        FROM documents GROUP BY source),
        s0 AS (SELECT domain, cap, w, false AS sat FROM caps),
        $iters,
        ${aggCte(rounds + 1, s"s$rounds")}
        SELECT domain, cap, w, sat AS saturated,
          CAST(CASE WHEN sat THEN cap ELSE ($tentSql) END AS BIGINT)
            AS alloc
        FROM s$rounds CROSS JOIN a${rounds + 1} ORDER BY domain"""))
  }

  /** Tokenizer fertility by language ([[graft.ext.Text.lexTokenCount]]
    * over [[graft.ext.Text.wordCount]]): BPE-ish lexer tokens per
    * whitespace word — the tokenizer-efficiency audit (CJK text shows
    * its fertility blow-up immediately). Integer sums, one division.
    */
  val xTokenizerFertility = Q(
    "x_tokenizer_fertility",
    (s, dir) => t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(sum(Text.lexTokenCount(col("text"))).cast("bigint")
          .as("n_lex_tokens"),
        sum(Text.wordCount(col("text"))).cast("bigint").as("n_words"))
      .withColumn("fertility",
        col("n_lex_tokens").cast("double") / col("n_words").cast("double"))
      .orderBy(col("lang")),
    Some("""SELECT lang,
        CAST(SUM(len(regexp_extract_all(text,
          '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS n_lex_tokens,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        CAST(SUM(len(regexp_extract_all(text,
          '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS DOUBLE)
          / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS fertility
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** Cross-source duplication matrix: near-dup pair counts per
    * (source, source) — the provenance audit that finds mirror sites
    * and double-scraped feeds. Composition of
    * [[graft.ext.Dedup.ngramJaccardPairs]] with two source lookups.
    */
  val xDupSourceMatrix = Q(
    "x_dup_source_matrix",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.ext.Dedup.ngramJaccardPairs(docs, "text",
        "doc_id", k = 3, threshold = 0.5)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("doc_a"),
          col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"),
          col("source").as("sb")), "doc_b")
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).cast("bigint").as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents),
      sh AS (SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(w)-1),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ix
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY da, db),
      prs AS (SELECT da, db FROM inter
        JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
        WHERE CAST(ix AS DOUBLE)/(ca.n + cb.n - ix) >= 0.5),
      lab AS (SELECT p.da, p.db, x.source AS sa, y.source AS sb
        FROM prs p JOIN documents x ON x.doc_id = p.da
        JOIN documents y ON y.doc_id = p.db)
      SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
        CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM lab GROUP BY 1, 2 ORDER BY source_a, source_b"""))

  /** K-means cluster label purity: every vector assigned to its
    * nearest deterministic Lloyd centroid
    * ([[graft.ext.Similarity.lloydCentroids]], the fully-oracled
    * training), then per-cluster majority-label share — the intrinsic
    * clustering-quality audit against the embeddings' labels. The
    * oracle replays centroid training (all 5 rounds unrolled), the
    * assignment, and the majority vote.
    */
  val xClusterPurity = Q(
    "x_cluster_purity",
    (s, dir) => {
      import graft.ext.Similarity
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.lloydCentroids(emb, "vec_id", "embedding",
        nlist = 16, rounds = 5)
        .select(col("cid"), col("cv"),
          Similarity.norm(col("cv")).as("cn"))
      val base = emb.select(col("vec_id").as("nid"),
          col("embedding").as("nv"))
        .withColumn("nn", Similarity.norm(col("nv")))
      val assigned = Similarity.assignToCentroids(base, cents)
        .select(col("nid"), col("bucket"))
      val lab = emb.select(col("vec_id").as("nid"), col("label"))
      val cl = assigned.join(lab, "nid")
        .groupBy(col("bucket"), col("label"))
        .agg(count(lit(1)).cast("bigint").as("c"))
      import org.apache.spark.sql.expressions.Window
      val wTop = Window.partitionBy(col("bucket"))
        .orderBy(col("c").desc, col("label"))
      cl.withColumn("rk", row_number().over(wTop))
        .withColumn("n",
          sum(col("c")).over(Window.partitionBy(col("bucket")))
            .cast("bigint"))
        .filter(col("rk") === 1)
        .select(col("bucket").as("cluster_id"), col("n"),
          col("label").cast("bigint").as("top_label"),
          col("c").as("n_top"),
          (col("c").cast("double") / col("n").cast("double"))
            .as("purity"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""${ExtC.lloydCtes(nlist = 16, rounds = 5, dim = 64)},
      cent AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn
        FROM cent5),
      assigned AS (SELECT nid, bucket FROM (
          SELECT b.vec_id AS nid, c.cid AS bucket,
            row_number() OVER (PARTITION BY b.vec_id
              ORDER BY list_dot_product(b.v, c.cv)/(b.nrm*c.cn) DESC,
                c.cid) AS rk
          FROM e b CROSS JOIN cent c) WHERE rk = 1),
      lab AS (SELECT vec_id, label FROM embeddings),
      cl AS (SELECT bucket, label, CAST(COUNT(*) AS BIGINT) AS c
        FROM assigned JOIN lab ON lab.vec_id = nid GROUP BY 1, 2),
      top AS (SELECT bucket, label, c,
          row_number() OVER (PARTITION BY bucket
            ORDER BY c DESC, label) AS rk,
          CAST(SUM(c) OVER (PARTITION BY bucket) AS BIGINT) AS n
        FROM cl)
      SELECT bucket AS cluster_id, n, CAST(label AS BIGINT) AS top_label,
        c AS n_top, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS purity
      FROM top WHERE rk = 1 ORDER BY cluster_id"""))

  /** Personalized PageRank
    * ([[graft.ext.Graph.personalizedPageRank]]): random-walk proximity
    * to the every-250th-key seed set on the synthetic blocked graph —
    * the taint-propagation / related-items scorer. Fixed-point BIGINT
    * picoranks; the oracle unrolls all 10 iterations with the seeded
    * teleport, bit-for-bit.
    */
  val xPersonalizedPagerank: Q = {
    val iters = (1 to 10).map { i =>
      s"""c$i AS (SELECT e.dst,
          CAST(floor(CAST(r.pr AS DOUBLE) * CAST(1.0 AS DOUBLE) / o.ow)
            AS BIGINT) AS c
        FROM wedges e JOIN r${i - 1} r ON r.node = e.src
          JOIN outw o ON o.src = e.src),
      s$i AS (SELECT dst, SUM(c) AS sc FROM c$i GROUP BY dst),
      r$i AS (SELECT nodes.node,
          CAST(floor(
            CASE WHEN nodes.node % 250 = 0
              THEN (1.0 - 0.85) * 1e12 / (SELECT sn FROM ns)
              ELSE 0.0 END
            + 0.85 * CAST(COALESCE(s.sc, 0) AS DOUBLE)) AS BIGINT) AS pr
        FROM nodes LEFT JOIN s$i s ON s.dst = nodes.node)"""
    }.mkString(",\n")
    Q("x_personalized_pagerank",
      (s, dir) => {
        val seeds = t(s, dir, "customer")
          .filter(col("c_custkey") % 250 === 0)
          .select(col("c_custkey").as("seed"))
        graft.ext.Graph.personalizedPageRank(
          ExtC.syntheticGraph(s, dir).withColumn("w", lit(1.0)),
          "src", "dst", "w", seeds, "seed",
          damping = 0.85, iters = 10)
          .orderBy(col("node"))
      },
      Some(s"""${ExtC.graphCtes},
        wedges AS (SELECT src, dst, CAST(1.0 AS DOUBLE) AS w FROM edges),
        ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS sn FROM nodes
          WHERE node % 250 = 0),
        outw AS (SELECT src, SUM(w) AS ow FROM wedges GROUP BY src),
        r0 AS (SELECT node,
          CAST(CASE WHEN node % 250 = 0
            THEN floor(1e12 / (SELECT sn FROM ns)) ELSE 0 END AS BIGINT)
            AS pr
          FROM nodes),
        $iters
        SELECT node, CAST(pr AS DOUBLE) / 1e12 AS ppr
        FROM r10 ORDER BY node"""),
      bench = true)
  }

  /** Functional-dependency violation profiler
    * ([[graft.ext.Expect.fdViolations]]): does market segment determine
    * nation? (No — every segment maps to many nations; the counts are
    * the evidence.) The discovery half of schema inference; a
    * candidate FD holds iff the result is empty.
    */
  val xFdViolations = Q(
    "x_fd_violations",
    (s, dir) => graft.ext.Expect.fdViolations(t(s, dir, "customer"),
      Seq(col("c_mktsegment").as("segment")), col("c_nationkey"))
      .orderBy(col("_l0")),
    Some("""WITH pairs AS (SELECT c_mktsegment AS l0, c_nationkey AS r,
        CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2)
      SELECT l0 AS _l0, CAST(COUNT(*) AS BIGINT) AS n_rhs,
        CAST(SUM(n) AS BIGINT) AS n_rows
      FROM pairs GROUP BY l0 HAVING COUNT(*) > 1 ORDER BY l0"""))

  /** Right-to-be-forgotten cascade audit: deleting every 100th-key
    * customer must cascade through orders to lineitems, and afterwards
    * NO orphan may remain at either level — the deletion-propagation
    * invariant adjudicated as exact counts plus two zero-orphan
    * booleans the oracle recomputes itself. Pure semi/anti-join
    * composition (each level shuffles on its own key; parent key sets
    * broadcast when dimension-sized).
    */
  val xForgetCascade = Q(
    "x_forget_cascade",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val gone = cust.filter(col("c_custkey") % 100 === 7)
        .select(col("c_custkey"))
      val goneOrders = ord.join(gone, col("o_custkey") === col("c_custkey"),
        "left_semi")
      val keptOrders = ord.join(gone, col("o_custkey") === col("c_custkey"),
        "left_anti")
      val goneLi = li.join(goneOrders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      val keptLi = li.join(goneOrders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      val orphanOrders = keptOrders.join(gone,
        col("o_custkey") === col("c_custkey"), "left_semi")
      val orphanLi = keptLi.join(goneOrders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      gone.agg(count(lit(1)).cast("bigint").as("n_forgotten"))
        .crossJoin(goneOrders.agg(count(lit(1)).cast("bigint")
          .as("n_cascade_orders")))
        .crossJoin(goneLi.agg(count(lit(1)).cast("bigint")
          .as("n_cascade_lineitems")))
        .crossJoin(keptOrders.agg(count(lit(1)).cast("bigint")
          .as("n_kept_orders")))
        .crossJoin(orphanOrders.agg((count(lit(1)) === 0)
          .as("no_order_orphans")))
        .crossJoin(orphanLi.agg((count(lit(1)) === 0)
          .as("no_lineitem_orphans")))
    },
    Some("""WITH gone AS (SELECT c_custkey FROM customer
        WHERE c_custkey % 100 = 7),
      gone_orders AS (SELECT * FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM gone)),
      kept_orders AS (SELECT * FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM gone)),
      gone_li AS (SELECT * FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM gone_orders)),
      kept_li AS (SELECT * FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM gone_orders))
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM gone) AS n_forgotten,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM gone_orders)
          AS n_cascade_orders,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM gone_li)
          AS n_cascade_lineitems,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_orders)
          AS n_kept_orders,
        (SELECT COUNT(*) FROM kept_orders
          WHERE o_custkey IN (SELECT c_custkey FROM gone)) = 0
          AS no_order_orphans,
        (SELECT COUNT(*) FROM kept_li
          WHERE l_orderkey IN (SELECT o_orderkey FROM gone_orders)) = 0
          AS no_lineitem_orphans"""))

  /** Wilson score intervals ([[graft.ext.Stats.wilsonInterval]]) for
    * each event type's high-value rate — the confidence-aware
    * companion of plain rate columns (stays in [0,1] at small n and
    * extreme rates). Identical IEEE operand sequences on both engines;
    * bounds canonicalized once.
    */
  val xWilsonRates = Q(
    "x_wilson_rates",
    (s, dir) => Stats.wilsonInterval(t(s, dir, "events"),
      col("event_type"), col("value") >= 100, z = 1.96)
      .orderBy(col("grp")),
    Some("""WITH agg AS (SELECT event_type AS grp,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY 1)
      SELECT grp, n, x,
        CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        CAST(CAST(CAST(
          ((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
            + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
              / (CAST(2.0 AS DOUBLE) * CAST(n AS DOUBLE)))
           - CAST(1.96 AS DOUBLE) * sqrt(
              CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                * (CAST(1.0 AS DOUBLE)
                   - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                / (CAST(4.0 AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(n AS DOUBLE))))
          / (CAST(1.0 AS DOUBLE)
             + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
               / CAST(n AS DOUBLE))
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS ci_lo,
        CAST(CAST(CAST(
          ((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
            + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
              / (CAST(2.0 AS DOUBLE) * CAST(n AS DOUBLE)))
           + CAST(1.96 AS DOUBLE) * sqrt(
              CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                * (CAST(1.0 AS DOUBLE)
                   - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                / (CAST(4.0 AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(n AS DOUBLE))))
          / (CAST(1.0 AS DOUBLE)
             + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
               / CAST(n AS DOUBLE))
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS ci_hi
      FROM agg ORDER BY grp"""))

  /** Top-key skew report ([[graft.ext.Skew.topKeyReport]]) on the
    * lineitem supplier key — the measurement that decides whether a
    * salted join or AQE skew hint is warranted before the shuffle is
    * planned. Counts and shares exact; cumulative share sums in rank
    * order on both engines.
    */
  val xSkewReport = Q(
    "x_skew_report",
    (s, dir) => graft.ext.Skew.topKeyReport(t(s, dir, "lineitem"),
      col("l_suppkey"), topK = 20).orderBy(col("rank")),
    Some("""WITH c AS (SELECT l_suppkey AS key,
        CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
        CAST(COUNT(*) AS BIGINT) AS n_keys FROM c),
      top AS (SELECT key, n,
          CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
        FROM c QUALIFY rank <= 20)
      SELECT rank, key, n, n_keys,
        CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
        SUM(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
          OVER (ORDER BY rank
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_share
      FROM top CROSS JOIN tot ORDER BY rank"""))

  /** Embedding-centroid drift ([[graft.ext.Drift.embeddingDrift]])
    * between the even- and odd-id halves of the embeddings table: per
    * label, the cosine between mean directions — fixed-point BIGINT
    * dimension sums (the Lloyd trick), exact-decimal dot/norm
    * aggregates, one final canonicalized division.
    */
  val xEmbeddingDrift = Q(
    "x_embedding_drift",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ext.Drift.embeddingDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", "label")
        .orderBy(col("label"))
    },
    Some("""WITH base AS (SELECT vec_id, label,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      un AS (SELECT vec_id, label, v,
        sqrt(list_dot_product(v, v)) AS nrm FROM base),
      uo AS (SELECT label, list_transform(v, x -> x / nrm) AS uv
        FROM un WHERE nrm > 0 AND vec_id % 2 = 0),
      uw AS (SELECT label, list_transform(v, x -> x / nrm) AS uv
        FROM un WHERE nrm > 0 AND vec_id % 2 = 1),
      pp AS (SELECT unnest(range(1, 65)) AS p),
      /* sums as DECIMAL(25,0) of floor(x*1e9), not BIGINT of 1e12:
         Spark's long sum wrapped silently at ~9.2M rows/label, and at
         1e12 the squared-sum products nulled silently before any
         detectable overflow — at 1e9 the engine's first cliff is the
         whole-aggregate null (~1e9 rows/label) and this hugeint ride
         errors loudly at the same magnitudes */
      so AS (SELECT label, p,
          CAST(SUM(CAST(floor(uv[p] * 1e9) AS BIGINT)) AS DECIMAL(25,0)) AS s
        FROM uo CROSS JOIN pp GROUP BY 1, 2),
      sn AS (SELECT label, p,
          CAST(SUM(CAST(floor(uv[p] * 1e9) AS BIGINT)) AS DECIMAL(25,0)) AS s
        FROM uw CROSS JOIN pp GROUP BY 1, 2),
      j AS (SELECT so.label, so.s AS so_s, sn.s AS sn_s
        FROM so JOIN sn ON sn.label = so.label AND sn.p = so.p),
      ag AS (SELECT label,
          CAST(SUM(CAST(so_s AS DECIMAL(19,0)) * CAST(sn_s AS DECIMAL(19,0)))
            AS DECIMAL(38,0)) AS dp,
          CAST(SUM(CAST(so_s AS DECIMAL(19,0)) * CAST(so_s AS DECIMAL(19,0)))
            AS DECIMAL(38,0)) AS no,
          CAST(SUM(CAST(sn_s AS DECIMAL(19,0)) * CAST(sn_s AS DECIMAL(19,0)))
            AS DECIMAL(38,0)) AS nn
        FROM j GROUP BY 1),
      co AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_old
        FROM embeddings WHERE vec_id % 2 = 0 GROUP BY 1),
      cn AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM embeddings WHERE vec_id % 2 = 1 GROUP BY 1)
      SELECT ag.label, n_old, n_new,
        CAST(CAST(CAST(
          CAST(dp AS DOUBLE)
            / (sqrt(CAST(no AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE)))
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS drift_cosine
      FROM ag JOIN co ON co.label = ag.label
      JOIN cn ON cn.label = ag.label ORDER BY ag.label"""))

  /** Per-node clustering coefficient
    * ([[graft.ext.Graph.clusteringCoefficient]]) on the synthetic
    * blocked graph — triangles attributed to all three corners, then
    * `2t/(deg(deg−1))` per node. The oracle counts triangles by the
    * canonical i<j<k 3-way join and unnests the corners.
    */
  val xClusteringCoeff = Q(
    "x_clustering_coeff",
    (s, dir) => graft.ext.Graph.clusteringCoefficient(
      ExtC.syntheticGraph(s, dir), "src", "dst")
      .orderBy(col("node")),
    Some(s"""${ExtC.graphCtes},
      de AS (SELECT src, dst FROM edges GROUP BY src, dst),
      deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM de GROUP BY src),
      ue AS (SELECT src, dst FROM de WHERE src < dst),
      tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM ue e1 JOIN ue e2 ON e2.src = e1.dst
        JOIN ue e3 ON e3.src = e1.src AND e3.dst = e2.dst),
      corners AS (SELECT unnest([a, b, c]) AS node FROM tri),
      t AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS nt
        FROM corners GROUP BY node)
      SELECT deg.node, degree,
        CAST(COALESCE(nt, 0) AS BIGINT) AS n_triangles,
        CASE WHEN degree < 2 THEN CAST(0.0 AS DOUBLE)
          ELSE CAST(2.0 AS DOUBLE) * CAST(COALESCE(nt, 0) AS DOUBLE)
            / CAST(degree * (degree - 1) AS DOUBLE) END
          AS clustering_coeff
      FROM deg LEFT JOIN t ON t.node = deg.node ORDER BY deg.node"""))

  /** Top event-type trigram paths ([[graft.ext.Behavior]] family):
    * per-user consecutive 3-step sequences with counts and share — the
    * sankey/path-analysis primitive behind funnel exploration. Lead
    * pairing tie-broken by event id; integer counts, one division.
    */
  val xEventPaths = Q(
    "x_event_paths",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val paths = t(s, dir, "events")
        .select(col("event_type").as("s1"),
          lead(col("event_type"), 1).over(w).as("s2"),
          lead(col("event_type"), 2).over(w).as("s3"))
        .filter(col("s2").isNotNull && col("s3").isNotNull)
      val counts = paths.groupBy(col("s1"), col("s2"), col("s3"))
        .agg(count(lit(1)).cast("bigint").as("n"))
      counts
        .crossJoin(broadcast(counts.agg(sum(col("n")).as("total"))))
        .select(col("s1"), col("s2"), col("s3"), col("n"),
          (col("n").cast("double") / col("total").cast("double"))
            .as("share"))
        .orderBy(col("s1"), col("s2"), col("s3"))
    },
    Some("""WITH seq AS (SELECT event_type AS s1,
        lead(event_type, 1) OVER w AS s2,
        lead(event_type, 2) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      p AS (SELECT s1, s2, s3 FROM seq
        WHERE s2 IS NOT NULL AND s3 IS NOT NULL),
      c AS (SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n
        FROM p GROUP BY 1, 2, 3),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
      SELECT s1, s2, s3, n,
        CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
      FROM c CROSS JOIN tot ORDER BY s1, s2, s3"""))

  /** Hard-negative mining ([[graft.ext.Similarity.hardNegatives]]):
    * per anchor the 5 highest-cosine different-label vectors — the
    * contrastive-training negatives that matter. Cosines are
    * bit-identical to DuckDB's sequential list_dot_product (the proven
    * vec_dot pairing), so ranks adjudicate exactly.
    */
  val xHardNegatives = Q(
    "x_hard_negatives",
    (s, dir) => graft.ext.Similarity.hardNegatives(
      t(s, dir, "embeddings"), "vec_id", "embedding", "label", k = 5,
      acceptBroadcastBaseline = true) // oracle-anchor run on test SF
      .orderBy(col("qid"), col("rank")),
    Some("""WITH e AS (SELECT vec_id, label,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      nb AS (SELECT vec_id AS nid, label AS nl, v AS nv,
        sqrt(list_dot_product(v, v)) AS nn FROM e),
      qb AS (SELECT vec_id AS qid, label AS ql, v AS qv,
        sqrt(list_dot_product(v, v)) AS qn FROM e),
      sc AS (SELECT qid, ql, nid, nl,
          row_number() OVER (PARTITION BY qid
            ORDER BY list_dot_product(qv, nv) / (qn * nn) DESC, nid)
            AS rank
        FROM nb CROSS JOIN qb WHERE nl <> ql)
      SELECT qid, ql AS anchor_label, nid, nl AS negative_label,
        CAST(rank AS BIGINT) AS rank
      FROM sc WHERE rank <= 5 ORDER BY qid, rank"""))

  /** Deterministic random negatives
    * ([[graft.ext.Sampling.negativeSample]]): LCG-thinned candidate
    * pool + per-(anchor, candidate) LCG ranking, fully SQL-replayable
    * — the easy-negative companion of [[xHardNegatives]].
    */
  val xNegativeSample = Q(
    "x_negative_sample",
    (s, dir) => Sampling.negativeSample(t(s, dir, "embeddings"),
      "vec_id", "label", k = 4, thin = 5)
      .orderBy(col("anchor_id"), col("rank")),
    Some("""WITH pool AS (SELECT vec_id AS cid, label AS cl
        FROM embeddings
        WHERE (((vec_id % 2147483648) * 1103515245 + 12345)
          % 2147483648) % 5 = 0),
      a AS (SELECT vec_id AS aid, label AS al FROM embeddings),
      pairs AS (SELECT aid, al, cid, cl,
          (((aid * 1000003 + cid) % 2147483648) * 1103515245 + 12345)
            % 2147483648 AS k
        FROM a CROSS JOIN pool WHERE al <> cl),
      rk AS (SELECT aid, al, cid, cl,
          row_number() OVER (PARTITION BY aid ORDER BY k, cid) AS rank
        FROM pairs)
      SELECT aid AS anchor_id, al AS anchor_label,
        cid AS negative_id, cl AS negative_label,
        CAST(rank AS BIGINT) AS rank
      FROM rk WHERE rank <= 4 ORDER BY anchor_id, rank"""))

  /** Exact higher-moment profile ([[graft.ext.Stats.moments]]) of
    * event values per type: mean/variance/skewness/kurtosis from
    * exact decimal power sums; central-moment combinations are fixed
    * IEEE sequences replayed operand-for-operand by layered CTEs.
    */
  val xMoments = Q(
    "x_moments",
    (s, dir) => Stats.moments(t(s, dir, "events"), col("event_type"),
      col("value")).orderBy(col("grp")),
    Some("""WITH b AS (SELECT event_type AS grp,
        CAST(value AS DECIMAL(10,2)) AS v FROM events),
      pw AS (SELECT grp, v,
        CAST(CAST(v AS DECIMAL(19,2)) * CAST(v AS DECIMAL(19,2))
          AS DECIMAL(19,4)) AS v2 FROM b),
      pw2 AS (SELECT grp, v, v2,
        CAST(v2 * CAST(v AS DECIMAL(12,2)) AS DECIMAL(25,6)) AS v3
        FROM pw),
      pw3 AS (SELECT grp, v, v2, v3,
        CAST(v3 * CAST(v AS DECIMAL(12,2)) AS DECIMAL(30,8)) AS v4
        FROM pw2),
      agg AS (SELECT grp,
        CAST(COUNT(v) AS BIGINT) AS n,
        CAST(SUM(v) AS DECIMAL(38,2)) AS s1,
        CAST(SUM(CAST(v2 AS DECIMAL(30,4))) AS DECIMAL(38,4)) AS s2,
        CAST(SUM(CAST(v3 AS DECIMAL(32,6))) AS DECIMAL(38,6)) AS s3,
        CAST(SUM(CAST(v4 AS DECIMAL(34,8))) AS DECIMAL(38,8)) AS s4
        FROM pw3 GROUP BY 1),
      l1 AS (SELECT grp, n, s2, s3, s4,
          CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean
        FROM agg),
      l2 AS (SELECT grp, n, mean,
          CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean AS m2,
          CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(3.0 AS DOUBLE) * mean
              * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
            + CAST(2.0 AS DOUBLE) * mean * mean * mean AS m3,
          CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(4.0 AS DOUBLE) * mean
              * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
            + CAST(6.0 AS DOUBLE) * mean * mean
              * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
            - CAST(3.0 AS DOUBLE) * mean * mean * mean * mean AS m4
        FROM l1)
      SELECT grp, n,
        CAST(CAST(CAST(mean AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE)
          AS mean,
        CAST(CAST(CAST(m2 AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE)
          AS variance,
        CAST(CAST(CAST(m3 / (sqrt(m2) * m2) AS VARCHAR)
          AS DECIMAL(20,12)) AS DOUBLE) AS skewness,
        CAST(CAST(CAST(m4 / (m2 * m2) - CAST(3.0 AS DOUBLE) AS VARCHAR)
          AS DECIMAL(20,12)) AS DOUBLE) AS kurtosis
      FROM l2 ORDER BY grp"""))

  /** Cramér's V ([[graft.ext.Stats.cramersV]]) for nation × segment —
    * the one-row 0..1 association summary over the [[xChi2Independence]]
    * cells.
    */
  val xCramersV = Q(
    "x_cramers_v",
    (s, dir) => Stats.cramersV(t(s, dir, "customer"),
      col("c_nationkey"), col("c_mktsegment")),
    Some("""WITH cells AS (SELECT c_nationkey AS x, c_mktsegment AS y,
        CAST(COUNT(*) AS BIGINT) AS o FROM customer GROUP BY 1, 2),
      rr AS (SELECT x, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY x),
      cc AS (SELECT y, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY y),
      nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM rr) AS nr,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM cc) AS nc
        FROM cells),
      terms AS (SELECT n, nr, nc,
          CAST(CAST(
            (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
            AS VARCHAR) AS DECIMAL(20,12)) AS term
        FROM cells JOIN rr USING (x) JOIN cc USING (y) CROSS JOIN nn),
      st AS (SELECT n, nr, nc, SUM(term) AS chi2 FROM terms
        GROUP BY n, nr, nc)
      SELECT n, CAST(chi2 AS DOUBLE) AS chi2,
        CAST(CAST(CAST(
          sqrt(CAST(chi2 AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(least(nr - 1, nc - 1) AS DOUBLE)))
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS cramers_v
      FROM st"""))

  /** Day-of-week seasonality strength
    * ([[graft.ext.Stats.seasonalityStrength]]): ANOVA η² of daily
    * counts vs weekday per event type. The weekday is a grouping key
    * only, so Spark's 1–7 and DuckDB's 0–6 conventions partition
    * identically.
    */
  val xSeasonality = Q(
    "x_seasonality",
    (s, dir) => Stats.seasonalityStrength(t(s, dir, "events"),
      col("event_type"), col("ts")).orderBy(col("grp")),
    Some("""WITH daily AS (SELECT event_type AS grp,
        strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      dd AS (SELECT grp, x, dayofweek(CAST(day AS DATE)) AS dow
        FROM daily),
      byd AS (SELECT grp, dow, CAST(COUNT(*) AS BIGINT) AS nd,
          CAST(SUM(x) AS BIGINT) AS sd,
          CAST(SUM(x * x) AS BIGINT) AS qd
        FROM dd GROUP BY 1, 2),
      tot AS (SELECT grp, CAST(SUM(nd) AS BIGINT) AS n,
          CAST(SUM(sd) AS BIGINT) AS s, CAST(SUM(qd) AS BIGINT) AS q
        FROM byd GROUP BY 1),
      wm AS (SELECT b.grp, n, s, q,
          SUM(CAST(CAST(
            CAST(nd AS DOUBLE)
            * ((CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE))
               - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            * ((CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE))
               - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            AS VARCHAR) AS DECIMAL(30,12))) AS ssb
        FROM byd b JOIN tot t ON t.grp = b.grp GROUP BY 1, 2, 3, 4)
      SELECT grp, n AS n_days,
        CAST(CAST(CAST(
          CAST(ssb AS DOUBLE)
          / (CAST(q AS DOUBLE)
             - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s AS DOUBLE))
          AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS eta_sq
      FROM wm ORDER BY grp"""))

  /** Curation pipeline v2 — the capstone composition of this round's
    * operators: token-entropy quality filter (≥ 2.8 nats) →
    * quality-aware near-dup survivor selection (best n_chars per
    * cluster) → benchmark decontamination (5-gram overlap with the
    * eval slice) → water-filling token-budget allocation per source at
    * 90% of the surviving mass (tight enough that small sources
    * saturate and their budget cascades). One row per source with docs kept,
    * token cap, saturation flag, and allocated budget — every stage
    * replayed end-to-end by the oracle (entropy canonicalization,
    * recursive-CTE closure, ranked-window argmax, contamination join,
    * all four water-fill rounds).
    */
  val xPipelineCurateV2 = Q(
    "x_pipeline_curate_v2",
    (s, dir) => {
      import graft.ext.{Dedup, Sampling}
      val docs = t(s, dir, "documents")
      val ent = Text.tokenEntropy(docs, "text", "doc_id")
      // cache the two fan-out points (the train_prep lesson): quality
      // feeds the AllPairs join, the survivor argmax, AND the corpus
      // join; clean feeds the budget collect plus two aggregations —
      // uncached, the entropy→AllPairs→survivor→decontamination chain
      // re-ran once per consumer (~4x the whole pipeline)
      val quality = docs.join(ent.filter(col("token_entropy") >= 2.8)
        .select(col("doc_id")), "doc_id").cache()
      val pairs = Dedup.ngramJaccardPairs(quality, "text", "doc_id",
        k = 3, threshold = 0.5)
      val surv = Dedup.qualitySurvivors(quality, "doc_id", pairs,
        col("n_chars")).select(col("survivor_id").as("doc_id"))
      // corpus also fans out (contamination probe + clean anti-join);
      // uncached, the AllPairs+survivor chain upstream runs twice
      val corpus = quality.join(surv, "doc_id")
        .filter(col("doc_id") >= 20).cache()
      val cont = Text.contamination(corpus,
          docs.filter(col("doc_id") < 20), "text", "doc_id", n = 5)
        .filter(col("contaminated")).select(col("doc_id"))
      val clean = corpus.join(cont, Seq("doc_id"), "left_anti").cache()
      val caps = clean.groupBy(col("source"))
        .agg(sum(size(split(col("text"), " "))).cast("long").as("cap"))
        .withColumn("w", lit(50L))
      val total = caps.agg(sum(col("cap"))).collect()(0).getLong(0) * 9 / 10
      val alloc = Sampling.waterFill(caps, "source", "cap", "w", total,
        rounds = 4)
      val nd = clean.groupBy(col("source").as("domain"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"))
      // materialize the (tiny, per-source) result eagerly so the three
      // caches can be dropped HERE instead of lingering in the
      // CacheManager across the whole 300-query verify run / bench
      // suite (the r08 bench-creep suspect) — the pageRank pattern
      val out = alloc.join(nd, "domain")
        .select(col("domain"), col("n_docs"), col("cap"),
          col("saturated"), col("alloc"))
        .orderBy(col("domain"))
        .localCheckpoint(true)
      quality.unpersist()
      corpus.unpersist()
      clean.unpersist()
      out
    },
    Some("""WITH RECURSIVE d AS MATERIALIZED (SELECT doc_id, source, n_chars,
        string_split(text, ' ') AS tks FROM documents),
      tok AS (SELECT doc_id, unnest(tks) AS tk FROM d),
      tf AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok
        WHERE len(tk) > 0 GROUP BY doc_id, tk),
      ent AS (SELECT doc_id,
          CAST(CAST(CAST(
            CAST(CAST(CAST(ln(CAST(SUM(c) AS DOUBLE)) AS VARCHAR)
              AS DECIMAL(20,12)) AS DOUBLE)
            - CAST(SUM(CAST(CAST(c AS DOUBLE)
                * CAST(CAST(CAST(ln(CAST(c AS DOUBLE)) AS VARCHAR)
                    AS DECIMAL(20,12)) AS DOUBLE)
                AS DECIMAL(30,14))) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
            AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS e
        FROM tf GROUP BY doc_id),
      q AS (SELECT doc_id FROM ent WHERE e >= 2.8),
      sh AS (SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(tks)-1),
          i -> tks[i] || ' ' || tks[i+1] || ' ' || tks[i+2])) AS s
        FROM d WHERE doc_id IN (SELECT doc_id FROM q)),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ix
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY da, db),
      prs AS (SELECT da, db FROM inter
        JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
        WHERE CAST(ix AS DOUBLE)/(ca.n + cb.n - ix) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM prs
        UNION SELECT db, da FROM prs),
      reach(a, b) AS (SELECT a, b FROM edges
        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      lbl AS (SELECT a AS id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
      qd AS (SELECT d.doc_id, CAST(n_chars AS DOUBLE) AS qs
        FROM d WHERE doc_id IN (SELECT doc_id FROM q)),
      withc AS (SELECT qd.doc_id,
          COALESCE(l.cluster_id, qd.doc_id) AS cluster_id, qs
        FROM qd LEFT JOIN lbl l ON l.id = qd.doc_id),
      rk AS (SELECT cluster_id, doc_id, qs,
          row_number() OVER (PARTITION BY cluster_id
            ORDER BY qs DESC, doc_id) AS rn
        FROM withc),
      surv AS MATERIALIZED (SELECT doc_id FROM rk WHERE rn = 1),
      g5 AS MATERIALIZED (SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(tks) - 3),
          i -> tks[i] || ' ' || tks[i+1] || ' ' || tks[i+2] || ' '
            || tks[i+3] || ' ' || tks[i+4])) AS gram
        FROM d),
      eg AS (SELECT DISTINCT gram FROM g5 WHERE doc_id < 20),
      cont AS (SELECT DISTINCT g5.doc_id FROM g5
        JOIN eg USING (gram) WHERE g5.doc_id >= 20),
      /* MATERIALIZED hints (DuckDB re-inlines plain CTEs per
         reference): the water-fill rounds reference s3/s2/s1 TWICE
         each (2^4 expansion) and every (SELECT total FROM tt) re-ran
         the whole shingle-join + transitive-closure chain — 240 s at
         sf0.01; materializing the chain's midpoints makes it 0.4 s
         with identical output */
      clean AS MATERIALIZED (SELECT s.doc_id FROM surv s
        WHERE s.doc_id >= 20
          AND s.doc_id NOT IN (SELECT doc_id FROM cont)),
      caps AS MATERIALIZED (SELECT d.source AS domain,
          CAST(SUM(len(d.tks)) AS BIGINT) AS cap,
          CAST(50 AS BIGINT) AS wt
        FROM d JOIN clean c ON c.doc_id = d.doc_id GROUP BY 1),
      tt AS MATERIALIZED (SELECT CAST((SUM(cap) * 9) // 10 AS BIGINT) AS total
        FROM caps),
      s0 AS (SELECT domain, cap, wt, false AS sat FROM caps),
      a1 AS (SELECT
          CAST(COALESCE(SUM(CASE WHEN sat THEN cap END), 0) AS BIGINT)
            AS used,
          CAST(COALESCE(SUM(CASE WHEN NOT sat THEN wt END), 0) AS BIGINT)
            AS wsum FROM s0),
      s1 AS (SELECT domain, cap, wt, sat OR (CASE WHEN wsum = 0 THEN cap
          ELSE (wt * ((SELECT total FROM tt) - used)) // wsum END) >= cap
          AS sat FROM s0 CROSS JOIN a1),
      a2 AS (SELECT
          CAST(COALESCE(SUM(CASE WHEN sat THEN cap END), 0) AS BIGINT)
            AS used,
          CAST(COALESCE(SUM(CASE WHEN NOT sat THEN wt END), 0) AS BIGINT)
            AS wsum FROM s1),
      s2 AS (SELECT domain, cap, wt, sat OR (CASE WHEN wsum = 0 THEN cap
          ELSE (wt * ((SELECT total FROM tt) - used)) // wsum END) >= cap
          AS sat FROM s1 CROSS JOIN a2),
      a3 AS (SELECT
          CAST(COALESCE(SUM(CASE WHEN sat THEN cap END), 0) AS BIGINT)
            AS used,
          CAST(COALESCE(SUM(CASE WHEN NOT sat THEN wt END), 0) AS BIGINT)
            AS wsum FROM s2),
      s3 AS (SELECT domain, cap, wt, sat OR (CASE WHEN wsum = 0 THEN cap
          ELSE (wt * ((SELECT total FROM tt) - used)) // wsum END) >= cap
          AS sat FROM s2 CROSS JOIN a3),
      a4 AS (SELECT
          CAST(COALESCE(SUM(CASE WHEN sat THEN cap END), 0) AS BIGINT)
            AS used,
          CAST(COALESCE(SUM(CASE WHEN NOT sat THEN wt END), 0) AS BIGINT)
            AS wsum FROM s3),
      s4 AS (SELECT domain, cap, wt, sat OR (CASE WHEN wsum = 0 THEN cap
          ELSE (wt * ((SELECT total FROM tt) - used)) // wsum END) >= cap
          AS sat FROM s3 CROSS JOIN a4),
      a5 AS (SELECT
          CAST(COALESCE(SUM(CASE WHEN sat THEN cap END), 0) AS BIGINT)
            AS used,
          CAST(COALESCE(SUM(CASE WHEN NOT sat THEN wt END), 0) AS BIGINT)
            AS wsum FROM s4),
      nd AS (SELECT d.source AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM d JOIN clean c ON c.doc_id = d.doc_id GROUP BY 1)
      SELECT s4.domain, n_docs, cap, sat AS saturated,
        CAST(CASE WHEN sat THEN cap ELSE (CASE WHEN wsum = 0 THEN cap
          ELSE (wt * ((SELECT total FROM tt) - used)) // wsum END) END
          AS BIGINT) AS alloc
      FROM s4 CROSS JOIN a5 JOIN nd ON nd.domain = s4.domain
      ORDER BY s4.domain"""),
    bench = true)

  /** Order-independent table fingerprint
    * ([[graft.ext.Expect.tableFingerprint]]) of lineitem's key columns
    * — both engines compute the commutative SHA-256-prefix sum
    * independently and must land on the same decimal, digit for
    * digit: the cross-system reconciliation primitive.
    */
  val xTableFingerprint = Q(
    "x_table_fingerprint",
    (s, dir) => graft.ext.Expect.tableFingerprint(t(s, dir, "lineitem"),
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(CAST(SUM(CAST(CAST(concat('0x', substring(sha256(
          CAST(l_orderkey AS VARCHAR) || chr(31)
            || CAST(l_linenumber AS VARCHAR) || chr(31)
            || l_returnflag), 1, 15)) AS BIGINT) AS DECIMAL(19,0)))
          AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
      FROM lineitem"""))


  val queries: Seq[Q] = Seq(xRocAuc, xMarkovTransitions, xRollingAnomaly,
    xSpearmanQuality, xTokenEntropy, xGiniRevenue, xKAnonymity,
    xKsTest, xCalibration, xChi2Independence, xMutualInfo,
    xMultimodalPhash, xMultimodalPhashPairs, xMultimodalFrameDups,
    xTriangleCount, xAdamicAdar,
    xDedupSurvivors, xKaplanMeier, xBasketRules, xPsiDrift,
    xContaminationSpread, xHybridRrf, xTrapAucTies, xTrapKmWipeout,
    xTrapRrfTie, xEwmaDaily, xRfm, xMixtureWaterfill,
    xTokenizerFertility, xDupSourceMatrix, xClusterPurity,
    xPersonalizedPagerank, xFdViolations, xForgetCascade, xWilsonRates,
    xSkewReport, xEmbeddingDrift, xClusteringCoeff, xEventPaths,
    xHardNegatives, xNegativeSample, xMoments, xCramersV, xSeasonality,
    xPipelineCurateV2, xTableFingerprint)
}
