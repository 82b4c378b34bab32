package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.queries.H.t

/** Round-6 extension bank: the deterministic Lloyd's k-means IVF family
  * (closing the one rows-only query without an adjudicated twin) and
  * adversarial trap queries for the newest operators.
  */
object ExtC {

  /** Generated CTE prefix replaying [[Similarity.lloydCentroids]] for
    * the embeddings table: unit-normalize, first-`nlist` init, `rounds`
    * unrolled Lloyd rounds with fixed-point (1e12 BIGINT) element sums
    * and renormalized sum-direction updates — the same unrolled-oracle
    * technique as the PageRank CTEs (`x_pagerank_sources`). Exposes
    * `e` (vec_id, v, nrm) and `cent$rounds` (cid, cv).
    */
  def lloydCtes(nlist: Int, rounds: Int, dim: Int): String = {
    val head = s"""WITH nn0 AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM nn0),
      un AS (SELECT vec_id AS nid, list_transform(v, x -> x / nrm) AS uv
        FROM e WHERE nrm > 0),
      cent0 AS (SELECT nid AS cid, uv AS cv FROM un ORDER BY nid LIMIT $nlist),
      pp AS (SELECT unnest(range(1, ${dim + 1})) AS p)"""
    val iterations = (1 to rounds).map { i =>
      s"""a$i AS (SELECT nid, uv, cid FROM (
          SELECT un.nid, un.uv, c.cid,
            row_number() OVER (PARTITION BY un.nid
              ORDER BY list_dot_product(un.uv, c.cv) DESC, c.cid) AS rk
          FROM un CROSS JOIN cent${i - 1} c) WHERE rk = 1),
        s$i AS (SELECT cid, p,
            SUM(CAST(floor(uv[p] * 1e12) AS BIGINT)) AS sfx
          FROM a$i CROSS JOIN pp GROUP BY cid, p),
        v$i AS (SELECT cid, list(CAST(sfx AS DOUBLE) ORDER BY p) AS sv
          FROM s$i GROUP BY cid),
        w$i AS (SELECT cid,
            list_transform(sv, x -> x / sqrt(list_dot_product(sv, sv))) AS ncv
          FROM v$i WHERE sqrt(list_dot_product(sv, sv)) > 0),
        cent$i AS (SELECT c.cid, COALESCE(w.ncv, c.cv) AS cv
          FROM cent${i - 1} c LEFT JOIN w$i w ON w.cid = c.cid)"""
    }.mkString(",\n")
    s"$head,\n$iterations"
  }

  /** IVF machinery suffix shared by the kmeans queries: centroid norms,
    * nearest-centroid assignment of the RAW vectors, nprobe probing for
    * the `vec_id < 10` query set, candidate ranking — mirrors
    * [[Similarity.ivfTopK]] exactly (same structure as the green
    * `x_ann_ivf_recall` oracle, with `cent$rounds` as the codebook).
    */
  def ivfCtes(rounds: Int, nprobe: Int, k: Int): String =
    s"""cent AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn
        FROM cent$rounds),
      assigned AS (SELECT nid, nv, nn2, bucket FROM (
          SELECT b.vec_id AS nid, b.v AS nv, b.nrm AS nn2, c.cid AS bucket,
            row_number() OVER (PARTITION BY b.vec_id
              ORDER BY list_dot_product(b.v, c.cv)/(b.nrm*c.cn) DESC, c.cid) AS rk
          FROM e b CROSS JOIN cent c) WHERE rk = 1),
      q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      probes AS (SELECT qid, qv, qn, bucket FROM (
          SELECT q.qid, q.qv, q.qn, c.cid AS bucket,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY list_dot_product(q.qv, c.cv)/(q.qn*c.cn) DESC, c.cid) AS rk
          FROM q CROSS JOIN cent c) WHERE rk <= $nprobe),
      ivf AS (SELECT qid, nid, rank FROM (
          SELECT p.qid, a.nid,
            CAST(row_number() OVER (PARTITION BY p.qid
              ORDER BY list_dot_product(p.qv, a.nv)/(p.qn*a.nn2) DESC, a.nid)
              AS INTEGER) AS rank
          FROM probes p JOIN assigned a
            ON p.bucket = a.bucket AND a.nid != p.qid)
        WHERE rank <= $k)"""

  /** Recall@5 of the Lloyd-k-means IVF path against brute force,
    * computed inside Spark as one deterministic row; the oracle replays
    * centroid training AND both retrieval paths end-to-end — no
    * hard-coded constants, so the check holds at any SF.
    */
  val xAnnIvfKmeansRecall = Q(
    "x_ann_ivf_kmeans_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val cents = Similarity.lloydCentroids(emb, "vec_id", "embedding",
        nlist = 16, rounds = 5)
      val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select(col("qid"), col("nid"))
      val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
          centroids = Some(cents))
        .select(col("qid"), col("nid"))
      val nQ = q.agg(countDistinct(col("vec_id")).as("n_queries"))
      val nBf = bf.agg(count(lit(1)).as("n_bf"))
      val nHits = ivf.join(bf, Seq("qid", "nid")).agg(count(lit(1)).as("n_hits"))
      nQ.crossJoin(nBf).crossJoin(nHits)
        .select(
          col("n_queries").cast("bigint").as("n_queries"),
          col("n_hits").cast("bigint").as("n_hits"),
          (col("n_hits").cast("double") / col("n_bf").cast("double"))
            .as("recall_at_5"))
    },
    Some(s"""${lloydCtes(nlist = 16, rounds = 5, dim = 64)},
      ${ivfCtes(rounds = 5, nprobe = 4, k = 5)},
      bf AS (SELECT qid, nid FROM (
          SELECT q.qid, b.vec_id AS nid,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY list_dot_product(q.qv, b.v)/(q.qn*b.nrm) DESC, b.vec_id) AS rank
          FROM q CROSS JOIN e b WHERE b.vec_id != q.qid)
        WHERE rank <= 5)
      SELECT CAST((SELECT count(*) FROM q) AS BIGINT) AS n_queries,
        CAST((SELECT count(*) FROM ivf JOIN bf USING (qid, nid)) AS BIGINT) AS n_hits,
        CAST((SELECT count(*) FROM ivf JOIN bf USING (qid, nid)) AS DOUBLE)
          / (SELECT count(*) FROM bf) AS recall_at_5"""))

  /** REAL image decode adjudicated end-to-end: each doc gets a genuine
    * synthetic PNG whose dimensions are a pure function of doc_id
    * ([[graft.ext.Multimodal.withSyntheticPng]]); decode reads the
    * dimensions back with the JDK's ImageIO — so the oracle predicts
    * (width, height) from doc_id and a decode that didn't actually
    * parse the PNG can't match.
    */
  val xMultimodalDecodeReal = Q(
    "x_multimodal_decode_real",
    (s, dir) => {
      import graft.ext.Multimodal
      Multimodal.decode(
        Multimodal.withSyntheticPng(t(s, dir, "documents"), "doc_id"), "id")
        .orderBy(col("id"))
    },
    Some("""SELECT doc_id AS id,
        CAST(16 + doc_id % 48 AS INTEGER) AS width,
        CAST(16 + (doc_id * 7) % 48 AS INTEGER) AS height,
        CAST(1 AS INTEGER) AS n_frames, 'png' AS format
      FROM documents ORDER BY id"""))

  /** REAL resize adjudicated end-to-end: synthetic PNGs are rescaled to
    * fit 24×24 ([[graft.ext.Multimodal.fitDims]] — integer-truncated,
    * aspect-preserving), then the OUTPUT payloads are re-decoded, so
    * the asserted dimensions come out of the re-encoded PNG bytes, not
    * the metadata columns. The oracle replays the integer fit math
    * (w·maxH ≤ h·maxW reduces to w ≤ h at square 24×24).
    */
  val xMultimodalResizeReal = Q(
    "x_multimodal_resize_real",
    (s, dir) => {
      import graft.ext.Multimodal
      val resized = Multimodal.resize(
        Multimodal.withSyntheticPng(t(s, dir, "documents"), "doc_id"), "id",
        maxW = 24, maxH = 24)
      Multimodal.decode(resized, "id").orderBy(col("id"))
    },
    Some("""WITH dims AS (SELECT doc_id AS id,
          16 + doc_id % 48 AS w, 16 + (doc_id * 7) % 48 AS h
        FROM documents)
      SELECT id,
        CAST(CASE WHEN w <= 24 AND h <= 24 THEN w
             WHEN w <= h THEN greatest(1, (w * 24) // h)
             ELSE 24 END AS INTEGER) AS width,
        CAST(CASE WHEN w <= 24 AND h <= 24 THEN h
             WHEN w <= h THEN 24
             ELSE greatest(1, (h * 24) // w) END AS INTEGER) AS height,
        CAST(1 AS INTEGER) AS n_frames, 'png' AS format
      FROM dims ORDER BY id"""))

  /** TRAP: incremental CDC where deletes arrive a batch BEFORE their
    * inserts. Batch 1 carries deletes (v3, every 3rd key) and updates
    * (v2, every 4th); batch 2 carries the base inserts (v1, ALL keys)
    * and late high-version updates (v4, every 9th) that must resurrect
    * previously-deleted rows. Correct only if tombstones persist in
    * state across the batch boundary: dropping them would let the v1
    * inserts resurrect every deleted key, keeping them but ignoring
    * versions would block the v4 resurrections.
    */
  val xTrapCdcDeleteFirst = Q(
    "x_trap_cdc_delete_first",
    (s, dir) => {
      import graft.streaming.CdcStream
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("pk"), col("o_totalprice").as("price"))
      val b1 = o.filter(col("pk") % 3 === 0)
        .select(col("pk"), lit(3L).as("version"), lit("delete").as("op"),
          lit(null).cast("double").as("price"))
        .unionByName(o.filter(col("pk") % 4 === 0)
          .select(col("pk"), lit(2L).as("version"), lit("update").as("op"),
            (col("price") + 100.0).as("price")))
      val b2 = o.select(col("pk"), lit(1L).as("version"),
          lit("insert").as("op"), col("price"))
        .unionByName(o.filter(col("pk") % 9 === 0)
          .select(col("pk"), lit(4L).as("version"), lit("update").as("op"),
            (col("price") + 200.0).as("price")))
      val state = H.tempStateDir("cdctrap") + "/state"
      CdcStream.applyBatch(b1, state, "pk", "version", "op")
      CdcStream.applyBatch(b2, state, "pk", "version", "op")
        .orderBy(col("pk"))
    },
    Some("""WITH base AS (SELECT o_orderkey AS pk, o_totalprice AS price
        FROM orders)
      SELECT pk,
        CAST(CASE WHEN pk % 9 = 0 THEN 4
             WHEN pk % 4 = 0 THEN 2 ELSE 1 END AS BIGINT) AS version,
        CASE WHEN pk % 9 = 0 THEN 'update'
             WHEN pk % 4 = 0 THEN 'update' ELSE 'insert' END AS op,
        CASE WHEN pk % 9 = 0 THEN price + 200.0
             WHEN pk % 4 = 0 THEN price + 100.0 ELSE price END AS price
      FROM base WHERE pk % 9 = 0 OR pk % 3 <> 0
      ORDER BY pk"""))

  /** TRAP: winsorized mean over a massively TIED discrete domain
    * (user_id mod 7 → seven plateaus) at quartile clips — the exact
    * place where two engines' quantile interpolation conventions could
    * silently diverge: (n−1)·p lands inside tie plateaus or exactly
    * between two of them depending on group size.
    */
  val xTrapWinsorTies = Q(
    "x_trap_winsor_ties",
    (s, dir) => graft.ext.Robust.winsorizedMean(
      t(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 7).cast("double").as("value")),
      col("event_type"), col("value"), 0.25, 0.75)
      .orderBy(col("grp")),
    Some("""WITH base AS (SELECT event_type AS grp,
        CAST(user_id % 7 AS DOUBLE) AS v FROM events),
      bounds AS (SELECT grp, quantile_cont(v, 0.25) AS lo,
        quantile_cont(v, 0.75) AS hi FROM base GROUP BY grp)
      SELECT base.grp, CAST(COUNT(*) AS BIGINT) AS n,
        max(bounds.lo) AS lo, max(bounds.hi) AS hi,
        CAST(CAST(SUM(CAST(least(greatest(v, bounds.lo), bounds.hi)
          AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS winsorized_mean
      FROM base JOIN bounds ON base.grp = bounds.grp
      GROUP BY base.grp ORDER BY base.grp"""))

  /** TRAP: nearest-in-time join where EVERY left row has right
    * neighbors at exactly ±3 s — the documented tie convention
    * (equidistant → earlier right row) decides every single output —
    * and even-keyed users additionally carry TWO simultaneous backward
    * rows (same timestamp, different values) to pin the
    * max-value-among-simultaneous winner.
    */
  val xTrapNearestTie = Q(
    "x_trap_nearest_tie",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.groupBy(col("user_id")).agg(min(col("ts")).as("ts"))
      val rBack = base.select(col("user_id"),
        (col("ts") - expr("INTERVAL 3 SECONDS")).as("rts"),
        (col("user_id") * 10 + 1).as("rv"))
      val rFwd = base.select(col("user_id"),
        (col("ts") + expr("INTERVAL 3 SECONDS")).as("rts"),
        (col("user_id") * 10 + 2).as("rv"))
      val rDup = base.filter(col("user_id") % 2 === 0)
        .select(col("user_id"),
          (col("ts") - expr("INTERVAL 3 SECONDS")).as("rts"),
          (col("user_id") * 10 + 9).as("rv"))
      graft.ext.AsOf.nearestJoin(base,
          rBack.unionByName(rFwd).unionByName(rDup),
          "user_id", "ts", "rts", "rv", "picked")
        .orderBy(col("user_id"))
    },
    Some("""WITH l AS (SELECT user_id, min(ts) AS ts FROM events
        GROUP BY user_id)
      SELECT user_id, ts,
        CAST(CASE WHEN user_id % 2 = 0 THEN user_id * 10 + 9
             ELSE user_id * 10 + 1 END AS BIGINT) AS picked,
        CAST(3000000 AS BIGINT) AS picked_gap_us
      FROM l ORDER BY user_id"""))

  /** Int8 embedding quantization ([[graft.ext.Quant]]): per-dim abs-max
    * calibration then a zero-shuffle encode; codes AND reconstruction
    * errors replayed exactly (plain IEEE + HALF_UP rounding on both
    * engines).
    */
  val xEmbedQuantize = Q(
    "x_embed_quantize",
    (s, dir) => {
      import graft.ext.Quant
      val emb = t(s, dir, "embeddings")
      Quant.quantizeInt8(emb, "vec_id", "embedding",
        Quant.calibrate(emb, "embedding"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      pp AS (SELECT unnest(range(1, 65)) AS p),
      cal AS (SELECT p, max(abs(v[p])) AS am FROM e CROSS JOIN pp GROUP BY p),
      sc AS (SELECT p, CASE WHEN am > 0 THEN 127.0 / am ELSE 0.0 END AS s
        FROM cal),
      q AS (SELECT vec_id, p, v[p] AS x, s,
          least(greatest(round(v[p] * s), -127.0), 127.0) AS c
        FROM e CROSS JOIN pp JOIN sc USING (p))
      SELECT vec_id,
        string_agg(CAST(CAST(c AS INTEGER) AS VARCHAR), ',' ORDER BY p) AS codes,
        CAST(SUM(CASE WHEN abs(round(x * s)) > 127 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped,
        CAST(CAST(max(CASE WHEN s > 0 THEN abs(x - c / s) ELSE abs(x) END)
          AS DECIMAL(20,12)) AS DOUBLE) AS max_err
      FROM q GROUP BY vec_id ORDER BY vec_id"""))

  /** Percentile-calibrated int8 quantization: range at the p99 of |x|
    * per dimension, so the top tail actually CLIPS — the
    * resolution-vs-saturation production trade [[xEmbedQuantize]]'s
    * abs-max variant never exercises. Clip counts and errors
    * adjudicate exactly (percentile ↔ quantile_cont interpolation
    * agreement is the proven winsorized-mean pattern).
    */
  val xEmbedQuantizeP99 = Q(
    "x_embed_quantize_p99",
    (s, dir) => {
      import graft.ext.Quant
      val emb = t(s, dir, "embeddings")
      Quant.quantizeInt8(emb, "vec_id", "embedding",
        Quant.calibratePercentile(emb, "embedding", 0.99))
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      pp AS (SELECT unnest(range(1, 65)) AS p),
      cal AS (SELECT p, quantile_cont(abs(v[p]), 0.99) AS am
        FROM e CROSS JOIN pp GROUP BY p),
      sc AS (SELECT p, CASE WHEN am > 0 THEN 127.0 / am ELSE 0.0 END AS s
        FROM cal),
      q AS (SELECT vec_id, p, v[p] AS x, s,
          least(greatest(round(v[p] * s), -127.0), 127.0) AS c
        FROM e CROSS JOIN pp JOIN sc USING (p))
      SELECT vec_id,
        string_agg(CAST(CAST(c AS INTEGER) AS VARCHAR), ',' ORDER BY p) AS codes,
        CAST(SUM(CASE WHEN abs(round(x * s)) > 127 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped,
        CAST(CAST(max(CASE WHEN s > 0 THEN abs(x - c / s) ELSE abs(x) END)
          AS DECIMAL(20,12)) AS DOUBLE) AS max_err
      FROM q GROUP BY vec_id ORDER BY vec_id"""))

  /** Fellegi–Sunter record linkage ([[graft.ext.Linkage]]): customers +
    * exact-duplicate clones (every 6th key, new surrogate key) scored
    * over (nation, segment)-blocked pairs on three field rules.
    * TPC-H names share a constant "Customer#0000" prefix that saturates
    * Jaro–Winkler, so the name comparison runs on REVERSED names (the
    * discriminating digits land in the prefix-boost window — fixture
    * conditioning, noted). Constant log-likelihood weights are
    * interpolated into the oracle verbatim, so scores and decisions
    * adjudicate exactly.
    */
  val xRecordLinkage: Q = {
    import graft.ext.Linkage.FieldRule
    // rules are built once so the SAME weight doubles feed both sides;
    // agree predicates are filled in below (they need the a/b aliases)
    val rName = FieldRule("name", lit(true), 0.95, 0.01)
    val rBal = FieldRule("bal_close", lit(true), 0.90, 0.02)
    val rBand = FieldRule("bal_band", lit(true), 0.85, 0.05)
    Q("x_record_linkage",
      (s, dir) => {
        graft.plans.GraftExtensions.ensure(s) // jaro_winkler
        // c_name_rev is computed ONCE PER RECORD (r19 optimization):
        // reverse() inside the pair rule re-allocated the reversed
        // string per blocked pair (2 allocations × ~1.2M pairs at
        // sf0.1) where ~17.5k per-record projections carry the same
        // information; the JW comparison itself is unchanged
        val cust = t(s, dir, "customer").select(col("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"), reverse(col("c_name")).as("c_name_rev"))
        val clones = cust.filter(col("c_custkey") % 6 === 0)
          .select((col("c_custkey") + 200000).as("c_custkey"),
            col("c_name"), col("c_nationkey"), col("c_acctbal"),
            col("c_mktsegment"), col("c_name_rev"))
        val rules = Seq(
          rName.copy(agree = call_function("jaro_winkler",
            col("a.c_name_rev"), col("b.c_name_rev")) >= 0.92),
          rBal.copy(agree =
            abs(col("a.c_acctbal") - col("b.c_acctbal")) <= 10.0),
          rBand.copy(agree =
            floor(col("a.c_acctbal") / 1000.0) === floor(col("b.c_acctbal") / 1000.0)))
        graft.ext.Linkage.scorePairs(cust.unionByName(clones), "c_custkey",
          Seq("c_nationkey", "c_mktsegment"), rules,
          upper = 8.0, lower = 0.0)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH base AS (SELECT c_custkey, c_name, c_nationkey,
            c_acctbal, c_mktsegment FROM customer),
        clones AS (SELECT c_custkey + 200000 AS c_custkey, c_name,
            c_nationkey, c_acctbal, c_mktsegment
          FROM base WHERE c_custkey % 6 = 0),
        recs AS (SELECT * FROM base UNION ALL SELECT * FROM clones),
        pairs AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
            jaro_winkler_similarity(reverse(a.c_name), reverse(b.c_name))
              >= 0.92 AS agree_name,
            abs(a.c_acctbal - b.c_acctbal) <= 10.0 AS agree_bal_close,
            floor(a.c_acctbal / 1000.0) = floor(b.c_acctbal / 1000.0)
              AS agree_bal_band
          FROM recs a JOIN recs b
            ON a.c_nationkey = b.c_nationkey
            AND a.c_mktsegment = b.c_mktsegment
            AND a.c_custkey < b.c_custkey),
        scored AS (SELECT *,
            -- literals CAST AS DOUBLE: a bare decimal literal is a
            -- DECIMAL in DuckDB and the sum would run in decimal
            -- arithmetic instead of the engine's IEEE double sum
            CAST(CAST(
              (CASE WHEN agree_name THEN CAST(${rName.agreeWeight} AS DOUBLE)
                    ELSE CAST(${rName.disagreeWeight} AS DOUBLE) END
               + CASE WHEN agree_bal_close THEN CAST(${rBal.agreeWeight} AS DOUBLE)
                      ELSE CAST(${rBal.disagreeWeight} AS DOUBLE) END)
               + CASE WHEN agree_bal_band THEN CAST(${rBand.agreeWeight} AS DOUBLE)
                      ELSE CAST(${rBand.disagreeWeight} AS DOUBLE) END
              AS DECIMAL(20,12)) AS DOUBLE) AS score
          FROM pairs)
        SELECT id_a, id_b, agree_name, agree_bal_close, agree_bal_band,
          score,
          CASE WHEN score >= 8.0 THEN 'match'
               WHEN score >= 0.0 THEN 'possible'
               ELSE 'non_match' END AS decision
        FROM scored ORDER BY id_a, id_b"""),
      bench = true)
  }

  /** Zipf's-law corpus fit ([[graft.ext.Text.zipfFit]]): OLS of
    * ln(freq) on ln(rank) for the top-200 terms; sums run in exact
    * decimals of decimal-canonicalized lns, so slope/intercept divide
    * identical operands on both engines.
    */
  val xZipfFit = Q(
    "x_zipf_fit",
    (s, dir) => graft.ext.Text.zipfFit(t(s, dir, "documents"), "text", 200),
    Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
        FROM documents),
      f AS (SELECT term, COUNT(*) AS freq FROM tok
        WHERE len(term) > 0 GROUP BY term),
      top AS (SELECT term, freq,
          row_number() OVER (ORDER BY freq DESC, term) AS r FROM f),
      pts AS (SELECT
          CAST(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE) AS lx,
          CAST(CAST(ln(CAST(freq AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE) AS ly
        FROM top WHERE r <= 200),
      sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(lx AS DECIMAL(30,14))) AS sx,
          SUM(CAST(ly AS DECIMAL(30,14))) AS sy,
          SUM(CAST(lx * lx AS DECIMAL(30,14))) AS sxx,
          SUM(CAST(lx * ly AS DECIMAL(30,14))) AS sxy
        FROM pts)
      SELECT n,
        CAST(CAST(
          (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          AS DECIMAL(20,12)) AS DOUBLE) AS zipf_slope,
        CAST(CAST(
          (CAST(sy AS DOUBLE) -
            ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            * CAST(sx AS DOUBLE)) / n
          AS DECIMAL(20,12)) AS DOUBLE) AS zipf_intercept
      FROM sums"""))

  /** Deterministic synthetic graph over customer keys (15 disjoint
    * 100-node blocks, 3 modular out-edges per node, undirected) —
    * shared fixture for the iterative graph operators; [[graphCtes]]
    * is its SQL replay (exposes `edges` and `nodes`).
    */
  private[queries] def syntheticGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val keys = t(s, dir, "customer").select(col("c_custkey").as("k"))
    val fwd = keys
      .select(col("k"), explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
      .select(col("k").as("src"),
        (expr("k div 100") * 100 +
          ((col("k") % 100) * 7 + col("j") * 13 + 1) % 100).as("dst"))
      .filter(col("src") =!= col("dst"))
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  private[queries] val graphCtes = """WITH ks AS (SELECT c_custkey AS k FROM customer),
      js AS (SELECT unnest(range(1, 4)) AS j),
      fwd AS (SELECT k AS src,
          (k // 100) * 100 + ((k % 100) * 7 + j * 13 + 1) % 100 AS dst
        FROM ks CROSS JOIN js),
      edges AS (SELECT src, dst FROM fwd WHERE src <> dst
        UNION ALL SELECT dst, src FROM fwd WHERE src <> dst),
      nodes AS (SELECT DISTINCT node FROM
        (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))"""

  /** Label-propagation community detection
    * ([[graft.ext.Graph.labelPropagation]]): the synthetic blocked
    * graph run for 4 synchronous rounds; the oracle unrolls every
    * round as generated CTEs — integer counts and min-tie-breaks only,
    * so communities adjudicate exactly.
    */
  val xLabelPropagation: Q = {
    val rounds = 4
    val head = s"$graphCtes,\n      l0 AS (SELECT node, node AS lbl FROM nodes)"
    val iters = (1 to rounds).map { i =>
      s"""c$i AS (SELECT e.dst, l.lbl, COUNT(*) AS cnt
          FROM edges e JOIN l${i - 1} l ON l.node = e.src
          GROUP BY e.dst, l.lbl),
        p$i AS (SELECT dst, lbl FROM (SELECT dst, lbl,
            row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, lbl) AS rk
          FROM c$i) WHERE rk = 1),
        l$i AS (SELECT l.node, COALESCE(p.lbl, l.lbl) AS lbl
          FROM l${i - 1} l LEFT JOIN p$i p ON p.dst = l.node)"""
    }.mkString(",\n")
    Q("x_label_propagation",
      (s, dir) => graft.ext.Graph.labelPropagation(
        syntheticGraph(s, dir), "src", "dst", rounds).orderBy(col("node")),
      Some(s"$head,\n$iters\nSELECT node, lbl AS community FROM l$rounds ORDER BY node"))
  }

  /** Multi-source BFS distances ([[graft.ext.Graph.bfsDistances]]):
    * every 250th key seeds distance 0 on the synthetic blocked graph;
    * 4 hops of pure integer min-propagation, unrolled by the oracle
    * round for round. Blocks without a seed stay at the −1 sentinel —
    * the k-hop reachability primitive (contamination-spread audits).
    */
  val xBfsDistances: Q = {
    val rounds = 4
    val inf = Long.MaxValue
    val iters = (1 to rounds).map { i =>
      s"""r$i AS (SELECT e.dst, MIN(d.d) + 1 AS nd
          FROM edges e JOIN d${i - 1} d ON d.node = e.src
          WHERE d.d <> $inf GROUP BY e.dst),
        d$i AS (SELECT d.node, least(d.d, COALESCE(r.nd, $inf)) AS d
          FROM d${i - 1} d LEFT JOIN r$i r ON r.dst = d.node)"""
    }.mkString(",\n")
    Q("x_bfs_distances",
      (s, dir) => {
        val seeds = t(s, dir, "customer")
          .filter(col("c_custkey") % 250 === 0)
          .select(col("c_custkey").as("seed"))
        graft.ext.Graph.bfsDistances(syntheticGraph(s, dir), "src", "dst",
          seeds, "seed", rounds).orderBy(col("node"))
      },
      Some(s"""$graphCtes,
        d0 AS (SELECT node,
          CASE WHEN node % 250 = 0 THEN 0 ELSE $inf END AS d FROM nodes),
        $iters
        SELECT node, CASE WHEN d = $inf THEN -1 ELSE d END AS distance
        FROM d$rounds ORDER BY node"""))
  }

  /** Linear multi-touch attribution
    * ([[graft.ext.Behavior.linearAttribution]]): every click inside
    * the 3-day lookback gets an equal value/n share of the purchase —
    * one row per (conversion, touch), the fractional companion of the
    * first/last-touch `x_attribution`. Credit is a plain double
    * division, replayed exactly.
    */
  val xAttributionLinear = Q(
    "x_attribution_linear",
    (s, dir) => graft.ext.Behavior.linearAttribution(t(s, dir, "events"),
      "user_id", "ts", "event_id", touchType = "click",
      convType = "purchase", lookback = "3 days")
      .orderBy(col("conv_id"), col("touch_id")),
    Some("""WITH conv AS (SELECT user_id, event_id AS conv_id,
        ts AS conv_ts, value FROM events WHERE event_type = 'purchase'),
      touch AS (SELECT user_id AS t_user, event_id AS touch_id,
        ts AS touch_ts FROM events WHERE event_type = 'click'),
      joined AS (SELECT user_id, conv_id, touch_id, touch_ts, value
        FROM conv JOIN touch ON user_id = t_user
          AND touch_ts <= conv_ts
          AND touch_ts >= conv_ts - INTERVAL 3 DAY)
      SELECT user_id, conv_id, touch_id, touch_ts,
        CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_touches,
        value / (COUNT(*) OVER (PARTITION BY conv_id)) AS credit
      FROM joined ORDER BY conv_id, touch_id"""))

  /** Benford's-law first-digit audit ([[graft.ext.Robust.benfordAudit]])
    * over order totals — the fabricated-data screen. Digits come from
    * the DECIMAL-canonicalized string (never a float log10), the
    * Benford probabilities are interpolated literals (CAST AS DOUBLE —
    * the record-linkage lesson), so expected counts and χ² terms
    * adjudicate exactly.
    */
  val xBenford: Q = {
    val cases = (1 to 9).map(d =>
      s"WHEN digit = '$d' THEN CAST(${math.log10(1 + 1.0 / d)} AS DOUBLE)")
      .mkString(" ")
    Q("x_benford",
      (s, dir) => graft.ext.Robust.benfordAudit(t(s, dir, "orders"),
        col("o_totalprice")).orderBy(col("digit")),
      Some(s"""WITH digits AS (SELECT regexp_extract(
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '[1-9]')
            AS digit FROM orders),
        d AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits
          WHERE digit <> '' GROUP BY digit),
        tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM d),
        w AS (SELECT digit, n_obs, n,
            CASE $cases ELSE CAST(0.0 AS DOUBLE) END AS p
          FROM d CROSS JOIN tot)
        SELECT digit, n_obs,
          CAST(CAST(CAST(n AS DOUBLE) * p AS DECIMAL(20,12)) AS DOUBLE)
            AS expected,
          CAST(CAST(((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p)
              * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p))
              / (CAST(n AS DOUBLE) * p) AS DECIMAL(20,12)) AS DOUBLE)
            AS chi2_term
        FROM w ORDER BY digit"""))
  }

  val queries: Seq[Q] = Seq(xAnnIvfKmeansRecall, xMultimodalDecodeReal,
    xMultimodalResizeReal, xTrapCdcDeleteFirst, xTrapWinsorTies,
    xTrapNearestTie, xEmbedQuantize, xEmbedQuantizeP99, xRecordLinkage,
    xZipfFit, xLabelPropagation, xBfsDistances, xAttributionLinear,
    xBenford)
}
