package graft.queries

import org.apache.spark.sql.functions._
import graft.ext._
import H.t

/** Round-9 second wave: the remaining first-class training-data
  * selection operators — margin-based bitext mining (CCMatrix/LASER),
  * DSIR hashed-n-gram importance resampling, token-balanced shard
  * assignment, and the l-diversity release screen.
  */
object ExtG {

  /** VARCHAR-roundtrip canonicalization (the EWMA pow idiom). */
  private def cn(e: String): String =
    s"CAST(CAST(CAST($e AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE)"

  /** Shared margin machinery in SQL over a candidate CTE
    * `p(id_a, id_b, cosc)` — mirrors
    * [[graft.ext.Similarity.marginFromCandidates]] step for step:
    * per-endpoint top-min(k, n) averages as exact decimal sums of
    * canonicalized cosines, the margin ratio, mutual-best ranks, and
    * the threshold filter.
    */
  private def marginTailCtes(k: Int, thr: String): String =
    s"""ra AS (SELECT id_a, id_b, cosc,
        row_number() OVER (PARTITION BY id_a ORDER BY cosc DESC, id_b)
          AS ra FROM p),
      rb AS (SELECT id_a, id_b, cosc,
        row_number() OVER (PARTITION BY id_b ORDER BY cosc DESC, id_a)
          AS rb FROM p),
      avga AS (SELECT id_a,
          CAST(CAST(SUM(CAST(cosc AS DECIMAL(20,12))) AS DECIMAL(38,12))
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_a
        FROM ra WHERE ra <= $k GROUP BY id_a),
      avgb AS (SELECT id_b,
          CAST(CAST(SUM(CAST(cosc AS DECIMAL(20,12))) AS DECIMAL(38,12))
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_b
        FROM rb WHERE rb <= $k GROUP BY id_b),
      mg AS (SELECT p.id_a, p.id_b, p.cosc,
          p.cosc / ((avg_a + avg_b) / 2.0) AS margin
        FROM p JOIN avga USING (id_a) JOIN avgb USING (id_b)
        WHERE (avg_a + avg_b) > 0),
      fa AS (SELECT id_a, id_b, cosc, margin,
          row_number() OVER (PARTITION BY id_a
            ORDER BY margin DESC, id_b) AS fa
        FROM mg),
      fb AS (SELECT id_a, id_b,
          row_number() OVER (PARTITION BY id_b
            ORDER BY margin DESC, id_a) AS fb
        FROM mg),
      mres AS (SELECT f.id_a, f.id_b, f.cosc AS cos, f.margin
        FROM fa f JOIN fb ON fb.id_a = f.id_a AND fb.id_b = f.id_b
        WHERE f.fa = 1 AND fb.fb = 1 AND f.margin >= $thr)"""

  private val exactCandCtes: String =
    """nn0 AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      e AS (SELECT vec_id AS id, v, sqrt(list_dot_product(v, v)) AS nrm
        FROM nn0),
      sa AS (SELECT id, v, nrm FROM e WHERE id % 2 = 0),
      sb AS (SELECT id, v, nrm FROM e WHERE id % 2 = 1),
      p AS (SELECT sa.id AS id_a, sb.id AS id_b,
          """ + // canonicalized cosine, the Spark-side canon() twin
      """CAST(CAST(CAST(list_dot_product(sa.v, sb.v) / (sa.nrm * sb.nrm)
            AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS cosc
        FROM sa CROSS JOIN sb)"""

  private def ivfCandCtes(nlist: Int, nprobe: Int): String =
    s"""nn0 AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      e AS (SELECT vec_id AS id, v, sqrt(list_dot_product(v, v)) AS nrm
        FROM nn0),
      sa AS (SELECT id, v, nrm FROM e WHERE id % 2 = 0),
      sb AS (SELECT id, v, nrm FROM e WHERE id % 2 = 1),
      cent AS (SELECT id AS cid, v AS cv, nrm AS cn2 FROM sb
        ORDER BY id LIMIT $nlist),
      assigned AS (SELECT nid, nv, nn2, bucket FROM (
          SELECT b.id AS nid, b.v AS nv, b.nrm AS nn2, c.cid AS bucket,
            row_number() OVER (PARTITION BY b.id
              ORDER BY list_dot_product(b.v, c.cv)/(b.nrm*c.cn2) DESC,
                c.cid) AS rk
          FROM sb b CROSS JOIN cent c) WHERE rk = 1),
      probes AS (SELECT qid, qv, qn, bucket FROM (
          SELECT q.id AS qid, q.v AS qv, q.nrm AS qn, c.cid AS bucket,
            row_number() OVER (PARTITION BY q.id
              ORDER BY list_dot_product(q.v, c.cv)/(q.nrm*c.cn2) DESC,
                c.cid) AS rk
          FROM sa q CROSS JOIN cent c) WHERE rk <= $nprobe),
      p AS (SELECT pr.qid AS id_a, a.nid AS id_b,
          CAST(CAST(CAST(list_dot_product(pr.qv, a.nv) / (pr.qn * a.nn2)
            AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS cosc
        FROM probes pr JOIN assigned a ON pr.bucket = a.bucket)"""

  /** Margin-based bitext/pair mining
    * ([[graft.ext.Similarity.marginPairs]], k = 4, threshold 1.0; even
    * vec_ids as side A, odd as side B — standing in for two languages'
    * sentence embeddings): the CCMatrix/LASER ratio-margin criterion
    * with mutual-best selection. The oracle replays cosines (VARCHAR-
    * canonicalized), exact-decimal k-NN averages, margins, both best
    * ranks, and the threshold — every mined pair adjudicates.
    */
  val xMarginMining = Q(
    "x_margin_mining",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.marginPairs(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0,
        // oracle-anchor run on the bounded test corpus — the opt-in
        // the brute face requires ([[marginPairsIvf]] is production)
        acceptBroadcastBaseline = true)
        .orderBy(col("id_a"))
    },
    Some(s"""WITH $exactCandCtes,
      ${marginTailCtes(4, "1.0")}
      SELECT id_a, id_b, cos, margin FROM mres ORDER BY id_a"""))

  /** IVF-bucketed margin mining
    * ([[graft.ext.Similarity.marginPairsIvf]]) — candidates and k-NN
    * averages restricted to probed buckets, the corpus-scale
    * approximation; deterministic first-16 centroids keep the whole
    * pipeline SQL-replayable (assignment, probing, candidate cosines,
    * margins, mutual best).
    */
  val xMarginMiningIvf = Q(
    "x_margin_mining_ivf",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.marginPairsIvf(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0)
        .orderBy(col("id_a"))
    },
    bench = true,
    oracle = Some(s"""WITH ${ivfCandCtes(16, 4)},
      ${marginTailCtes(4, "1.0")}
      SELECT id_a, id_b, cos, margin FROM mres ORDER BY id_a"""))

  /** Recall of the IVF-mined pairs against the exact miner — the
    * quantified cost of bucket-restricted candidates AND
    * bucket-restricted neighborhood averages (margins shift when the
    * average is over fewer neighbors, so this is a stricter test than
    * candidate recall alone). Both pipelines replay in SQL.
    */
  val xMarginMiningRecall = Q(
    "x_margin_mining_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val a = emb.filter(col("vec_id") % 2 === 0)
      val b = emb.filter(col("vec_id") % 2 === 1)
      val exact = Similarity.marginPairs(a, b, "vec_id", "embedding",
        k = 4, threshold = 1.0, acceptBroadcastBaseline = true)
        .select(col("id_a"), col("id_b"))
      val ivf = Similarity.marginPairsIvf(a, b, "vec_id", "embedding",
        k = 4, threshold = 1.0).select(col("id_a"), col("id_b"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(ivf.agg(count(lit(1)).as("n_ivf")))
        .crossJoin(ivf.join(exact, Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("n_hits")))
        .select(col("n_exact").cast("bigint").as("n_exact"),
          col("n_ivf").cast("bigint").as("n_ivf"),
          col("n_hits").cast("bigint").as("n_hits"),
          (col("n_hits").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
    },
    Some(s"""WITH $exactCandCtes,
      ${marginTailCtes(4, "1.0")},
      exres AS (SELECT id_a, id_b FROM mres),
      cent AS (SELECT id AS cid, v AS cv, nrm AS cn2 FROM sb
        ORDER BY id LIMIT 16),
      assigned AS (SELECT nid, nv, nn2, bucket FROM (
          SELECT b.id AS nid, b.v AS nv, b.nrm AS nn2, c.cid AS bucket,
            row_number() OVER (PARTITION BY b.id
              ORDER BY list_dot_product(b.v, c.cv)/(b.nrm*c.cn2) DESC,
                c.cid) AS rk
          FROM sb b CROSS JOIN cent c) WHERE rk = 1),
      probes AS (SELECT qid, qv, qn, bucket FROM (
          SELECT q.id AS qid, q.v AS qv, q.nrm AS qn, c.cid AS bucket,
            row_number() OVER (PARTITION BY q.id
              ORDER BY list_dot_product(q.v, c.cv)/(q.nrm*c.cn2) DESC,
                c.cid) AS rk
          FROM sa q CROSS JOIN cent c)
        WHERE rk <= 4),
      p2 AS (SELECT pr.qid AS id_a, a.nid AS id_b,
          CAST(CAST(CAST(list_dot_product(pr.qv, a.nv) / (pr.qn * a.nn2)
            AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS cosc
        FROM probes pr JOIN assigned a ON pr.bucket = a.bucket),
      ra2 AS (SELECT id_a, id_b, cosc,
        row_number() OVER (PARTITION BY id_a ORDER BY cosc DESC, id_b)
          AS ra FROM p2),
      rb2 AS (SELECT id_a, id_b, cosc,
        row_number() OVER (PARTITION BY id_b ORDER BY cosc DESC, id_a)
          AS rb FROM p2),
      avga2 AS (SELECT id_a,
          CAST(CAST(SUM(CAST(cosc AS DECIMAL(20,12))) AS DECIMAL(38,12))
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_a
        FROM ra2 WHERE ra <= 4 GROUP BY id_a),
      avgb2 AS (SELECT id_b,
          CAST(CAST(SUM(CAST(cosc AS DECIMAL(20,12))) AS DECIMAL(38,12))
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_b
        FROM rb2 WHERE rb <= 4 GROUP BY id_b),
      mg2 AS (SELECT p2.id_a, p2.id_b,
          p2.cosc / ((avg_a + avg_b) / 2.0) AS margin
        FROM p2 JOIN avga2 USING (id_a) JOIN avgb2 USING (id_b)
        WHERE (avg_a + avg_b) > 0),
      fa2 AS (SELECT id_a, id_b, margin,
          row_number() OVER (PARTITION BY id_a
            ORDER BY margin DESC, id_b) AS fa
        FROM mg2),
      fb2 AS (SELECT id_a, id_b,
          row_number() OVER (PARTITION BY id_b
            ORDER BY margin DESC, id_a) AS fb
        FROM mg2),
      ivfres AS (SELECT f.id_a, f.id_b
        FROM fa2 f JOIN fb2 ON fb2.id_a = f.id_a AND fb2.id_b = f.id_b
        WHERE f.fa = 1 AND fb2.fb = 1 AND f.margin >= 1.0)
      SELECT CAST((SELECT COUNT(*) FROM exres) AS BIGINT) AS n_exact,
        CAST((SELECT COUNT(*) FROM ivfres) AS BIGINT) AS n_ivf,
        CAST((SELECT COUNT(*) FROM ivfres i JOIN exres USING (id_a, id_b))
          AS BIGINT) AS n_hits,
        CAST((SELECT COUNT(*) FROM ivfres i JOIN exres USING (id_a, id_b))
          AS DOUBLE) / (SELECT COUNT(*) FROM exres) AS recall"""))

  /** The DSIR pipeline as reusable CTEs ending in
    * `keyed(doc_id, n_grams, weight, key)` — shared by the standalone
    * query and the selection-to-packing capstone.
    */
  private def dsirCtes: String =
    s"""d AS (SELECT doc_id,
        source IN ('src0', 'src1') AS tgt,
        string_split(text, ' ') AS w FROM documents),
      g AS (SELECT doc_id, tgt,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(w[i : i + 1],
              t -> CAST(len(t)*961 + ascii(t)*31 + ascii(t[-1]) AS BIGINT))),
            (a, x) -> (a*1000003 + x) % 2147483647) % 256 AS bucket
        FROM (SELECT doc_id, tgt, w, unnest(range(1, len(w))) AS i
          FROM d)),
      tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM g
        WHERE tgt GROUP BY 1),
      rc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM g
        WHERE NOT tgt GROUP BY 1),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g WHERE tgt),
      nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g WHERE NOT tgt),
      ratio AS (SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
          ${cn("ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE))")}
          - ${cn("ln(CAST(COALESCE(cr, 0) + 1 AS DOUBLE))")}
          + ${cn("ln(CAST(nr.n + 256 AS DOUBLE))")}
          - ${cn("ln(CAST(nt.n + 256 AS DOUBLE))")} AS delta
        FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket, nt, nr),
      per AS (SELECT doc_id,
          CAST(SUM(cnt) AS BIGINT) AS n_grams,
          CAST(CAST(SUM(CAST(CAST(cnt AS DOUBLE) * delta
            AS DECIMAL(30,14))) AS DECIMAL(38,14)) AS DOUBLE) AS weight
        FROM (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM g WHERE NOT tgt GROUP BY 1, 2) db
        JOIN ratio USING (bucket) GROUP BY doc_id),
      keyed AS (SELECT doc_id, n_grams, weight,
          weight + (- ${cn(
            "ln(-(" + cn("ln(CAST(((doc_id % 2147483648) * 1103515245" +
              " + 12345) % 2147483648 + 1 AS DOUBLE)" +
              " / 2147483649.0)") + "))")}) AS key
        FROM per)"""

  /** DSIR importance resampling
    * ([[graft.ext.Sampling.dsirSelect]], target = sources src0/src1,
    * 256 hash buckets, k = 50): hashed-bigram log-likelihood-ratio
    * weights + Gumbel top-k selection. The oracle replays bigram
    * construction, the rolling-fingerprint bucket hash, both bucket
    * models with add-1 smoothing (canonicalized lns of exact
    * integers), the exact-decimal per-doc sums, the LCG-derived Gumbel
    * noise, and the global rank — every selected doc, weight, and key
    * adjudicates.
    */
  val xDsirSelect = Q(
    "x_dsir_select",
    (s, dir) => Sampling.dsirSelect(t(s, dir, "documents"), "text",
        "doc_id", col("source").isin("src0", "src1"), k = 50,
        buckets = 256)
      .orderBy(col("sel_rank")),
    Some(s"""WITH $dsirCtes
      SELECT doc_id, n_grams, weight, key,
        CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
          AS sel_rank
      FROM keyed ORDER BY key DESC, doc_id LIMIT 50"""))

  /** Token-balanced shard assignment
    * ([[graft.ext.Sampling.shardAssign]], 8 shards): documents dealt
    * round-robin in (tokens DESC, id) order — the deterministic LPT
    * approximation; the oracle replays the global rank and the
    * per-shard totals.
    */
  val xShardAssign = Q(
    "x_shard_assign",
    (s, dir) => Sampling.shardAssign(t(s, dir, "documents"),
        col("doc_id"), size(split(col("text"), " ")).cast("long"),
        nShards = 8)
      .orderBy(col("shard")),
    Some("""WITH d AS (SELECT doc_id AS id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      FROM documents),
      r AS (SELECT id, toks,
          CAST(row_number() OVER (ORDER BY toks DESC, id) AS BIGINT)
            AS rn FROM d),
      ag AS (SELECT (rn - 1) % 8 AS shard,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(toks) AS BIGINT) AS token_sum
        FROM r GROUP BY 1),
      tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM d)
      SELECT shard, n_docs, token_sum,
        CAST(token_sum AS DOUBLE) / CAST(total AS DOUBLE) AS share
      FROM ag, tot ORDER BY shard"""))

  /** l-diversity audit ([[graft.ext.Stats.lDiversityAudit]], l = 7) on
    * (nation, segment) with the account-balance bucket as the
    * sensitive attribute — the k-anonymity companion: large groups
    * still leak when their sensitive values are homogeneous.
    */
  val xLDiversity = Q(
    "x_l_diversity",
    (s, dir) => Stats.lDiversityAudit(t(s, dir, "customer"),
        Seq(col("c_nationkey"), col("c_mktsegment")),
        floor(col("c_acctbal") / lit(1000)).cast("bigint"), l = 7)
      .orderBy(col("c_nationkey"), col("c_mktsegment")),
    Some("""SELECT c_nationkey, c_mktsegment,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
          AS BIGINT) AS n_sensitive
      FROM customer GROUP BY 1, 2
      HAVING COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 7
      ORDER BY c_nationkey, c_mktsegment"""))

  /** Mixed-language segmentation ([[graft.ext.Text.langSegments]],
    * 20-token blocks): consecutive same-language blocks merged into
    * segments via gaps-and-islands — the within-document face of
    * language ID. The oracle replays block slicing, the integer marker
    * scores, the island arithmetic, and the segment ranks.
    */
  val xTextLangSegments = Q(
    "x_text_lang_segments",
    (s, dir) => Text.langSegments(t(s, dir, "documents"), "text",
        "doc_id", window = 20)
      .orderBy(col("doc_id"), col("seg_idx")),
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents),
      blk AS (SELECT doc_id, w,
          unnest(range(0, ((len(w) - 1) // 20) + 1)) AS b
        FROM d),
      bt AS (SELECT doc_id, b,
          CAST(LEAST(len(w) - b * 20, 20) AS BIGINT) AS btoks,
          array_to_string(w[b * 20 + 1 : b * 20 + 20], ' ') AS btxt
        FROM blk),
      sc AS (SELECT doc_id, b, btoks,
          len(regexp_extract_all(btxt, '[^\x00-\x7f]'))*10 + 5 AS s_zh,
          len(list_filter(string_split(btxt,' '),
            t -> list_contains(['the','a','of','and'], t)))*10 + 4 AS s_en,
          len(list_filter(string_split(btxt,' '),
            t -> list_contains(['der','die','das','und'], t)))*10 + 3 AS s_de,
          len(list_filter(string_split(btxt,' '),
            t -> list_contains(['le','la','les','et'], t)))*10 + 2 AS s_fr,
          len(list_filter(string_split(btxt,' '),
            t -> list_contains(['el','los','las','y'], t)))*10 + 1 AS s_es
        FROM bt),
      lab AS (SELECT doc_id, b, btoks,
          CASE greatest(s_zh, s_en, s_de, s_fr, s_es) % 10
            WHEN 5 THEN 'zh' WHEN 4 THEN 'en' WHEN 3 THEN 'de'
            WHEN 2 THEN 'fr' ELSE 'es' END AS blang
        FROM sc),
      isl AS (SELECT doc_id, blang, btoks, b,
          b - row_number() OVER (PARTITION BY doc_id, blang ORDER BY b)
            AS isl
        FROM lab),
      seg AS (SELECT doc_id, blang AS lang, isl,
          CAST(MIN(b) * 20 AS BIGINT) AS start_token,
          CAST(SUM(btoks) AS BIGINT) AS n_tokens
        FROM isl GROUP BY 1, 2, 3)
      SELECT doc_id,
        CAST(row_number() OVER (PARTITION BY doc_id
          ORDER BY start_token) AS BIGINT) AS seg_idx,
        lang, start_token, n_tokens
      FROM seg ORDER BY doc_id, seg_idx"""))

  /** Selection-to-packing capstone: the DSIR top-50 feeds the
    * token-balanced shard dealer — "pick the target-domain-closest
    * documents, then lay them out in balanced training shards"
    * composed end to end. The oracle CHAINS the full DSIR replay into
    * the global-rank shard arithmetic, so a drift anywhere in either
    * stage cascades into every shard total.
    */
  val xPipelineSelectPack = Q(
    "x_pipeline_select_pack",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val sel = Sampling.dsirSelect(docs, "text", "doc_id",
        col("source").isin("src0", "src1"), k = 50, buckets = 256)
        .select(col("doc_id"))
      Sampling.shardAssign(docs.join(sel, "doc_id"), col("doc_id"),
          size(split(col("text"), " ")).cast("long"), nShards = 4)
        .orderBy(col("shard"))
    },
    Some(s"""WITH $dsirCtes,
      dsel AS (SELECT doc_id FROM keyed
        ORDER BY key DESC, doc_id LIMIT 50),
      dt AS (SELECT d0.doc_id AS id,
          CAST(len(string_split(d0.text, ' ')) AS BIGINT) AS toks
        FROM documents d0 JOIN dsel USING (doc_id)),
      r2 AS (SELECT id, toks,
          CAST(row_number() OVER (ORDER BY toks DESC, id) AS BIGINT)
            AS rn FROM dt),
      ag2 AS (SELECT (rn - 1) % 4 AS shard,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(toks) AS BIGINT) AS token_sum
        FROM r2 GROUP BY 1),
      tot2 AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM dt)
      SELECT shard, n_docs, token_sum,
        CAST(token_sum AS DOUBLE) / CAST(total AS DOUBLE) AS share
      FROM ag2, tot2 ORDER BY shard"""))

  /** Per-dimension whitening statistics
    * ([[graft.ext.Similarity.whitenStats]]) over the embeddings table —
    * the anisotropy audit + (mean, std) table a whitening projection
    * consumes; exact-decimal power sums make every mean and std
    * bit-replayable.
    */
  val xEmbedWhitenStats = Q(
    "x_embed_whiten_stats",
    (s, dir) => Similarity.whitenStats(t(s, dir, "embeddings"),
        "embedding")
      .orderBy(col("pos")),
    Some(s"""WITH t AS (SELECT
        unnest(range(len(embedding))) AS pos,
        unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
      FROM embeddings),
      cells AS (SELECT pos,
          CAST(CAST(CAST(x AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE)
            AS xdd
        FROM t),
      c2 AS (SELECT pos, CAST(xdd AS DECIMAL(20,12)) AS xd,
          CAST(CAST(CAST(xdd * xdd AS VARCHAR) AS DECIMAL(30,20))
            AS DECIMAL(30,20)) AS x2
        FROM cells),
      g AS (SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(xd) AS DECIMAL(38,12)) AS s,
          CAST(SUM(x2) AS DECIMAL(38,20)) AS ss
        FROM c2 GROUP BY 1)
      SELECT CAST(pos AS INTEGER) AS pos, n,
        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        ${cn("sqrt(GREATEST(CAST(0 AS DOUBLE)," +
          " (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)" +
          " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))")} AS std
      FROM g ORDER BY pos"""))

  val queries: Seq[Q] = Seq(xMarginMining, xMarginMiningIvf,
    xMarginMiningRecall, xDsirSelect, xShardAssign, xLDiversity,
    xTextLangSegments, xPipelineSelectPack, xEmbedWhitenStats)
}
