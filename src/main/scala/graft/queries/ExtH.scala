package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext._
import H.t

/** Round-10 operators: whitening APPLICATION (the transform the r09
  * stats table exists for) with a decision-impact twin, best-fit
  * sequence packing, and the incremental shard-assignment face.
  */
object ExtH {

  /** VARCHAR-roundtrip canonicalization (the EWMA pow idiom). */
  private def cn(e: String): String =
    s"CAST(CAST(CAST($e AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE)"

  /** The whitening-stats replay as reusable CTEs ending in
    * `wst(pos, mean, std)` — the x_embed_whiten_stats oracle's spine,
    * chained here into the transform so a drift anywhere in the stats
    * cascades into every whitened coordinate.
    */
  private val whitenCtes: String =
    s"""t0 AS (SELECT vec_id,
        unnest(range(len(embedding))) AS pos,
        unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
      FROM embeddings),
      cells AS (SELECT pos,
          CAST(CAST(CAST(x AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE)
            AS xdd
        FROM t0),
      c2 AS (SELECT pos, CAST(xdd AS DECIMAL(20,12)) AS xd,
          CAST(CAST(CAST(xdd * xdd AS VARCHAR) AS DECIMAL(30,20))
            AS DECIMAL(30,20)) AS x2
        FROM cells),
      g AS (SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(xd) AS DECIMAL(38,12)) AS s,
          CAST(SUM(x2) AS DECIMAL(38,20)) AS ss
        FROM c2 GROUP BY 1),
      wst AS (SELECT pos,
          CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
          ${cn("sqrt(GREATEST(CAST(0 AS DOUBLE)," +
            " (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)" +
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))" +
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))")} AS std
        FROM g)"""

  /** Whitening application
    * ([[graft.ext.Similarity.whitenApply]] over the
    * [[graft.ext.Similarity.whitenStats]] table): every coordinate of
    * every vector becomes (x − mean)/std. The oracle CHAINS the full
    * stats replay into the transform, so every whitened coordinate
    * adjudicates against the independently recomputed (mean, std).
    */
  val xEmbedWhitenApply = Q(
    "x_embed_whiten_apply",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val stats = Similarity.whitenStats(emb, "embedding")
      Similarity.whitenApply(emb, "embedding", stats)
        .select(col("vec_id"),
          posexplode(col("whitened")).as(Seq("pos", "w")))
        .orderBy(col("vec_id"), col("pos"))
    },
    Some(s"""WITH $whitenCtes
      SELECT t0.vec_id, CAST(t0.pos AS INTEGER) AS pos,
        CASE WHEN wst.std > 0
          THEN ${cn("(t0.x - wst.mean) / wst.std")}
          ELSE CAST(0.0 AS DOUBLE) END AS w
      FROM t0 JOIN wst ON t0.pos = wst.pos
      ORDER BY t0.vec_id, pos"""))

  /** Whitened-vs-raw decision impact: each vector's exact top-1
    * cosine neighbor under RAW coordinates vs under WHITENED
    * coordinates, summarized as an agreement rate — the measurement
    * that says whether the anisotropy repair actually moves retrieval
    * decisions on this corpus (the SemDeDup/ANN stack consumes
    * whitened vectors only if this shift is understood). Quadratic by
    * design: this is a recall/impact TWIN on the bounded test corpus
    * (the `x_ann_ivf_recall` convention), never a production path —
    * production re-runs the LSH/IVF pipelines on the whitened column.
    *
    * Both pipelines replay in SQL: cosines canonicalized to
    * DECIMAL(20,12), ranks broken by neighbor id.
    */
  /** The whitened-vector relation as CTEs ending in `wl(id, v)` —
    * the stats chain replayed into per-vector whitened coordinate
    * lists; shared by the recall twin and the whitened-LSH replays.
    */
  private val whitenedVecCtes: String =
    s"""$whitenCtes,
      wv AS (SELECT t0.vec_id, t0.pos,
          CASE WHEN wst.std > 0
            THEN ${cn("(t0.x - wst.mean) / wst.std")}
            ELSE CAST(0.0 AS DOUBLE) END AS w
        FROM t0 JOIN wst ON t0.pos = wst.pos),
      wl AS (SELECT vec_id AS id, list(w ORDER BY pos) AS v FROM wv
        GROUP BY 1)"""

  val xEmbedWhitenRecall = Q(
    "x_embed_whiten_recall",
    (s, dir) => {
      graft.plans.GraftExtensions.ensure(s)
      def canon(c: org.apache.spark.sql.Column) =
        c.cast("decimal(20,12)").cast("double")
      val emb = t(s, dir, "embeddings")
      val stats = Similarity.whitenStats(emb, "embedding")
      val wh = Similarity.whitenApply(emb, "embedding", stats)
      def top1(df: org.apache.spark.sql.DataFrame, vecCol: String) = {
        val e = df.select(col("vec_id").as("id"),
          Similarity.toDoubleVec(col(vecCol)).as("v"))
          .withColumn("nrm", Similarity.norm(col("v")))
        val w = Window.partitionBy(col("id"))
          .orderBy(col("cosC").desc, col("nid"))
        e.as("a").join(e.as("b"), col("a.id") =!= col("b.id"))
          .select(col("a.id").as("id"), col("b.id").as("nid"),
            canon(Similarity.dot(col("a.v"), col("b.v")) /
              (col("a.nrm") * col("b.nrm"))).as("cosC"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("id"), col("nid"))
      }
      val raw = top1(emb, "embedding")
      val whi = top1(wh, "whitened")
      raw.as("r").join(whi.as("w"), col("r.id") === col("w.id"))
        .agg(count(lit(1)).cast("bigint").as("n_vecs"),
          sum(when(col("r.nid") === col("w.nid"), 1L).otherwise(0L))
            .cast("bigint").as("n_same_top1"))
        .select(col("n_vecs"), col("n_same_top1"),
          (col("n_same_top1").cast("double") /
            col("n_vecs").cast("double")).as("agreement"))
    },
    Some(s"""WITH $whitenedVecCtes,
      wte AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM wl),
      rl AS (SELECT vec_id AS id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      re AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM rl),
      rt AS (SELECT id, nid FROM (
          SELECT a.id, b.id AS nid,
            row_number() OVER (PARTITION BY a.id ORDER BY
              ${cn("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")}
                DESC, b.id) AS rk
          FROM re a JOIN re b ON a.id <> b.id) WHERE rk = 1),
      wt AS (SELECT id, nid FROM (
          SELECT a.id, b.id AS nid,
            row_number() OVER (PARTITION BY a.id ORDER BY
              ${cn("list_dot_product(a.v, b.v) / (a.nrm * b.nrm)")}
                DESC, b.id) AS rk
          FROM wte a JOIN wte b ON a.id <> b.id) WHERE rk = 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        CAST(SUM(CASE WHEN rt.nid = wt.nid THEN 1 ELSE 0 END) AS BIGINT)
          AS n_same_top1,
        CAST(SUM(CASE WHEN rt.nid = wt.nid THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS agreement
      FROM rt JOIN wt ON rt.id = wt.id"""))

  /** Best-fit-decreasing packing ([[graft.ext.Sampling.packBestFit]],
    * seqLen = 64, one packer shard per source): every per-doc bin
    * assignment adjudicates against a recursive-CTE replay of the BFD
    * state machine (the oracle steps the per-group remaining-capacity
    * list one doc at a time), and each row carries the group's
    * fragmentation-vs-chunk comparison — BFD pays padding
    * (whole-doc bins) to buy zero small-doc splits, concat-and-chunk
    * ([[graft.ext.Sampling.packSequences]]) pays splits to buy
    * minimal padding.
    */
  val xPackBestFit = Q(
    "x_pack_best_fit",
    (s, dir) => {
      val S = 64L
      val docs = t(s, dir, "documents")
      // the assignment fans out three ways (summary, chunk window,
      // final join) — cache it so the groupByKey packer runs ONCE
      // (the dsirSelect fan-out convention; the harnesses clearCache
      // between queries)
      val asg = Sampling.packBestFit(docs, col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long"), seqLen = S)
        .withColumnRenamed("group", "grp")
        .cache()
      val summ = asg.groupBy("grp").agg(
        max(col("bin") + col("n_bins")).cast("bigint").as("n_bins_bfd"),
        sum(col("toks")).cast("bigint").as("grp_toks"),
        sum(col("n_bins") - 1).cast("bigint").as("n_splits_bfd"))
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("toks").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val chunk = asg.select(col("grp"), col("doc_id"), col("toks"))
        .withColumn("cum", sum(col("toks")).over(w))
        .groupBy("grp")
        .agg(sum(expr(s"(cum - 1) div $S") -
            expr(s"(cum - toks) div $S")).cast("bigint")
          .as("n_splits_chunk"))
      asg.join(summ, "grp").join(chunk, "grp")
        .select(col("grp"), col("doc_id"), col("toks"), col("bin"),
          col("n_bins"), col("n_bins_bfd"),
          (col("n_bins_bfd") * S - col("grp_toks")).cast("bigint")
            .as("padding_bfd"),
          col("n_splits_bfd"),
          expr(s"(grp_toks + ${S - 1}) div $S").cast("bigint")
            .as("n_seqs_chunk"),
          (expr(s"(grp_toks + ${S - 1}) div $S") * S - col("grp_toks"))
            .cast("bigint").as("padding_chunk"),
          col("n_splits_chunk"))
        .orderBy(col("grp"), col("doc_id"))
    },
    bench = true,
    oracle = Some(packBestFitOracle(64)))

  /** The recursive-CTE BFD replay: `st` steps each group's
    * remaining-capacity list one (tokens DESC, id)-ordered doc at a
    * time — best-fit = list_min of the fitting capacities,
    * list_position breaking ties at the lowest bin — so every bin id
    * the engine assigns is re-derived by an independent sequential
    * implementation.
    */
  /** The BFD replay core: from a caller-supplied `d(grp, doc_id,
    * toks)` CTE to `asg(grp, doc_id, toks, bin, n_bins)` + `summ`
    * (per-group bins/tokens/splits) — shared by the standalone packing
    * query (which adds the chunk-baseline comparison) and the
    * shard-then-pack capstone (which chains the deal replay in as
    * `d`).
    */
  private[queries] def packBfdCoreCtes(S: Long, dCte: String): String = {
    val fits = "list_min(list_filter(st.rem, x -> x >= s.toks))"
    s"""$dCte,
      small AS (SELECT grp, doc_id, toks,
          CAST(row_number() OVER (PARTITION BY grp
            ORDER BY toks DESC, doc_id) AS INTEGER) AS rn
        FROM d WHERE toks <= $S),
      st AS (
        SELECT grp, 0 AS i, CAST([] AS BIGINT[]) AS rem,
            CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS bin
          FROM (SELECT DISTINCT grp FROM small)
        UNION ALL
        SELECT s.grp, st.i + 1,
          CASE WHEN $fits IS NULL
            THEN list_append(st.rem, $S - s.toks)
            ELSE st.rem[1:list_position(st.rem, $fits) - 1]
              || [$fits - s.toks]
              || st.rem[list_position(st.rem, $fits) + 1:] END,
          s.doc_id,
          CAST(CASE WHEN $fits IS NULL THEN len(st.rem)
            ELSE list_position(st.rem, $fits) - 1 END AS BIGINT)
        FROM st JOIN small s ON s.grp = st.grp AND s.rn = st.i + 1),
      nb AS (SELECT grp, CAST(len(rem) AS BIGINT) AS nbins FROM (
          SELECT grp, rem, row_number() OVER (PARTITION BY grp
            ORDER BY i DESC) AS r FROM st) WHERE r = 1),
      asg_small AS (SELECT st.grp, st.doc_id, d.toks, st.bin,
          CAST(1 AS BIGINT) AS n_bins
        FROM st JOIN d ON d.grp = st.grp AND d.doc_id = st.doc_id
        WHERE st.i > 0),
      big AS (SELECT grp, doc_id, toks,
          row_number() OVER (PARTITION BY grp
            ORDER BY toks DESC, doc_id) AS brn,
          CAST((toks + $S - 1) // $S AS BIGINT) AS nb_doc
        FROM d WHERE toks > $S),
      asg_big AS (SELECT big.grp, big.doc_id, big.toks,
          COALESCE(nb.nbins, 0) + COALESCE(SUM(nb_doc) OVER (
            PARTITION BY big.grp ORDER BY brn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bin,
          nb_doc AS n_bins
        FROM big LEFT JOIN nb ON nb.grp = big.grp),
      asg AS (SELECT * FROM asg_small UNION ALL SELECT * FROM asg_big),
      summ AS (SELECT grp,
          CAST(MAX(bin + n_bins) AS BIGINT) AS n_bins_bfd,
          CAST(SUM(toks) AS BIGINT) AS grp_toks,
          CAST(SUM(n_bins - 1) AS BIGINT) AS n_splits_bfd
        FROM asg GROUP BY 1)"""
  }

  private def packBestFitOracle(S: Long): String = {
    val dCte = """d AS (
      SELECT source AS grp, doc_id,
        CAST(len(string_split(text,' ')) AS BIGINT) AS toks
      FROM documents)"""
    s"""WITH RECURSIVE ${packBfdCoreCtes(S, dCte)},
      ch AS (SELECT grp, toks,
          SUM(toks) OVER (PARTITION BY grp ORDER BY toks DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM d),
      chs AS (SELECT grp,
          CAST(SUM((cum - 1) // $S - (cum - toks) // $S) AS BIGINT)
            AS n_splits_chunk
        FROM ch GROUP BY 1)
      SELECT a.grp, a.doc_id, a.toks, a.bin, a.n_bins,
        s.n_bins_bfd,
        CAST(s.n_bins_bfd * $S - s.grp_toks AS BIGINT) AS padding_bfd,
        s.n_splits_bfd,
        CAST((s.grp_toks + $S - 1) // $S AS BIGINT) AS n_seqs_chunk,
        CAST(((s.grp_toks + $S - 1) // $S) * $S - s.grp_toks AS BIGINT)
          AS padding_chunk,
        c.n_splits_chunk
      FROM asg a JOIN summ s ON s.grp = a.grp JOIN chs c ON c.grp = a.grp
      ORDER BY a.grp, a.doc_id"""
  }

  /** Hyperplane-LSH near-dup over WHITENED vectors — the anisotropy
    * repair actually driving the dedup decision (the SemDeDup/SimCSE
    * motivation for computing the stats at all): whitenApply's output
    * is cast to float32 (the LSH kernel's input type; DuckDB mirrors
    * with CAST(... AS REAL)) and fed through the UNCHANGED
    * [[graft.ext.Similarity.cosineLshPairs]] pipeline. The oracle
    * chains the full whitening replay into the full splitmix64-plane
    * LSH replay — stats → transform → planes → signatures → bands →
    * Hamming prefilter → exact-cosine verify, every surviving pair
    * adjudicated end to end.
    */
  val xDedupEmbeddingWhitened = Q(
    "x_dedup_embedding_whitened",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val wh = Similarity.whitenApply(emb, "embedding",
          Similarity.whitenStats(emb, "embedding"))
        .select(col("vec_id"),
          col("whitened").cast("array<float>").as("embedding"))
      Similarity.cosineLshPairs(wh, "vec_id", "embedding",
          threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH $whitenedVecCtes,
      n AS (SELECT id AS vec_id,
          list_transform(v, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS v
        FROM wl),
      ${Ext.lshReplayTail("")}
      SELECT id_a, id_b FROM lsh ORDER BY id_a, id_b"""))

  /** Raw-vs-whitened LSH survivor comparison — the decision-impact
    * summary for the dedup face: both full pipelines run and the one
    * output row carries the pair counts and their Jaccard overlap.
    * The oracle runs BOTH complete replays side by side (the
    * name-prefixed [[Ext.lshReplayTail]] lets two plane/signature/
    * band/verify chains share one WITH), so a drift in either
    * pipeline, or in the whitening feeding the second, shifts the
    * adjudicated counts.
    */
  val xDedupEmbeddingWhitenedDiff = Q(
    "x_dedup_embedding_whitened_diff",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val wh = Similarity.whitenApply(emb, "embedding",
          Similarity.whitenStats(emb, "embedding"))
        .select(col("vec_id"),
          col("whitened").cast("array<float>").as("embedding"))
      // each lazy LSH plan is consumed twice (its count + the common-
      // pairs join) — cache both so each full pipeline runs ONCE (the
      // xPackBestFit fan-out convention)
      val raw = Similarity.cosineLshPairs(emb, "vec_id", "embedding",
        threshold = 0.45).cache()
      val whp = Similarity.cosineLshPairs(wh, "vec_id", "embedding",
        threshold = 0.45).cache()
      raw.agg(count(lit(1)).cast("bigint").as("n_raw"))
        .crossJoin(whp.agg(count(lit(1)).cast("bigint").as("n_whitened")))
        .crossJoin(raw.join(whp, Seq("id_a", "id_b"))
          .agg(count(lit(1)).cast("bigint").as("n_common")))
        .select(col("n_raw"), col("n_whitened"), col("n_common"),
          (col("n_common").cast("double") /
            (col("n_raw") + col("n_whitened") - col("n_common"))
              .cast("double")).as("jaccard"))
    },
    Some(s"""WITH $whitenedVecCtes,
      rn AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      ${Ext.lshReplayTail("r")},
      wn AS (SELECT id AS vec_id,
          list_transform(v, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS v
        FROM wl),
      ${Ext.lshReplayTail("w")},
      cmn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common
        FROM rlsh JOIN wlsh USING (id_a, id_b))
      SELECT
        CAST((SELECT COUNT(*) FROM rlsh) AS BIGINT) AS n_raw,
        CAST((SELECT COUNT(*) FROM wlsh) AS BIGINT) AS n_whitened,
        n_common,
        CAST(n_common AS DOUBLE) /
          CAST((SELECT COUNT(*) FROM rlsh)
            + (SELECT COUNT(*) FROM wlsh) - n_common AS DOUBLE) AS jaccard
      FROM cmn"""))

  /** One oracle batch step of the incremental shard deal: from state
    * `s{b}` (shard, n, ts), rank batch `doc_id % 3 = b` docs
    * (toks DESC, id), deal rank r to the shard at load-order position
    * (r−1) mod 4 + 1, and fold the deltas into `s{b+1}`.
    */
  private def shardBatchCtes(b: Int): String =
    s"""ord$b AS (SELECT shard,
        CAST(row_number() OVER (ORDER BY ts ASC, shard) AS INTEGER)
          AS pos
      FROM s$b),
      b$b AS (SELECT doc_id AS id, toks,
          row_number() OVER (ORDER BY toks DESC, doc_id) AS rn
        FROM d WHERE doc_id % 3 = $b),
      a$b AS (SELECT id, toks, o.shard
        FROM b$b JOIN ord$b o
          ON CAST(((rn - 1) % 4) + 1 AS INTEGER) = o.pos),
      t$b AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(toks) AS BIGINT) AS ts FROM a$b GROUP BY 1),
      s${b + 1} AS (SELECT s.shard, s.n + COALESCE(t.n, 0) AS n,
          s.ts + COALESCE(t.ts, 0) AS ts
        FROM s$b s LEFT JOIN t$b t ON t.shard = s.shard)"""

  /** Incremental shard assignment
    * ([[graft.streaming.ShardStream.applyBatch]], 4 shards, the
    * documents table arriving as three `doc_id mod 3` micro-batches
    * against a fresh crash-safe state dir): placed docs never move —
    * each batch deals its (tokens DESC, id)-ranked docs into the
    * currently-emptiest shards. The oracle replays all three deals as
    * chained CTEs (state totals → shard load order → rank join →
    * folded totals), so every batch's placement arithmetic cascades
    * into the final per-shard totals it adjudicates.
    */
  val xShardAssignIncremental = Q(
    "x_shard_assign_incremental",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"))
      val statePath = H.tempStateDir("graft_shard_state") + "/state"
      (0 until 3).foreach { b =>
        graft.streaming.ShardStream.applyBatch(
          docs.filter(pmod(col("doc_id"), lit(3)) === b),
          statePath, col("doc_id"), col("toks"), nShards = 4,
          batchId = b)
      }
      val st = graft.streaming.StateDir.readGenBefore(s, statePath, 3L).get
      st.crossJoin(broadcast(
          st.agg(sum(col("token_sum")).cast("bigint").as("total"))))
        .select(col("shard"), col("n_docs"), col("token_sum"),
          (col("token_sum").cast("double") / col("total").cast("double"))
            .as("share"))
        .orderBy(col("shard"))
    },
    Some(s"""WITH d AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      FROM documents),
      s0 AS (SELECT CAST(unnest(range(4)) AS BIGINT) AS shard,
        CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS ts),
      ${shardBatchCtes(0)},
      ${shardBatchCtes(1)},
      ${shardBatchCtes(2)}
      SELECT shard, n AS n_docs, ts AS token_sum,
        CAST(ts AS DOUBLE) / CAST((SELECT SUM(ts) FROM s3) AS DOUBLE)
          AS share
      FROM s3 ORDER BY shard"""))

  /** Shard-then-pack capstone: the documents corpus dealt into 4
    * token-balanced shards ([[graft.ext.Sampling.shardAssignDocs]] —
    * the per-doc face), then EACH SHARD packed whole-document by BFD
    * ([[graft.ext.Sampling.packBestFit]], seqLen 64) — "lay the corpus
    * out in balanced shards, then pack each shard's sequences" composed
    * end to end, the layout a continuously-ingesting training pipeline
    * ships ([[graft.streaming.ShardStream]] is the same deal rule per
    * batch). The oracle CHAINS the global-rank deal replay into the
    * per-shard recursive-CTE BFD replay, so a drift in either stage
    * cascades into every bin id and shard total it adjudicates.
    */
  val xPipelinePackShards = Q(
    "x_pipeline_pack_shards",
    (s, dir) => {
      val S = 64L
      val docs = t(s, dir, "documents")
      val dealt = Sampling.shardAssignDocs(docs, col("doc_id"),
        size(split(col("text"), " ")).cast("long"), nShards = 4)
      // two consumers (summary + final join) — same cache convention
      val asg = Sampling.packBestFit(dealt, col("shard"), col("id"),
          col("toks"), seqLen = S)
        .withColumnRenamed("group", "grp")
        .cache()
      val summ = asg.groupBy("grp").agg(
        max(col("bin") + col("n_bins")).cast("bigint").as("n_bins_bfd"),
        sum(col("toks")).cast("bigint").as("grp_toks"),
        sum(col("n_bins") - 1).cast("bigint").as("n_splits_bfd"))
      asg.join(summ, "grp")
        .select(col("grp"), col("doc_id"), col("toks"), col("bin"),
          col("n_bins"), col("n_bins_bfd"),
          (col("n_bins_bfd") * S - col("grp_toks")).cast("bigint")
            .as("padding_bfd"),
          col("n_splits_bfd"))
        .orderBy(col("grp"), col("doc_id"))
    },
    Some {
      val dealCte = """d AS (SELECT CAST(shard AS VARCHAR) AS grp,
          id AS doc_id, toks
        FROM (SELECT doc_id AS id, toks,
            (CAST(row_number() OVER (ORDER BY toks DESC, doc_id)
              AS BIGINT) - 1) % 4 AS shard
          FROM (SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
            FROM documents)))"""
      s"""WITH RECURSIVE ${packBfdCoreCtes(64, dealCte)}
      SELECT a.grp, a.doc_id, a.toks, a.bin, a.n_bins,
        s.n_bins_bfd,
        CAST(s.n_bins_bfd * 64 - s.grp_toks AS BIGINT) AS padding_bfd,
        s.n_splits_bfd
      FROM asg a JOIN summ s ON s.grp = a.grp
      ORDER BY a.grp, a.doc_id"""
    })

  /** One oracle batch step of the incremental packer: batch `bt = b`
    * docs continue the BFD from `fin{b−1}`'s remaining-capacity list
    * (list positions ARE bin ids — full and dedicated bins stay as
    * zero entries so the id space never shifts); small docs step the
    * recursive state, oversize docs take dedicated trailing ids, and
    * the batch's final list (with dedicated zeros appended) seeds the
    * next batch.
    */
  private def packBatchCtes(b: Int, S: Long): String = {
    val fits = "list_min(list_filter(st.rem, x -> x >= s.toks))"
    val seed =
      if (b == 0) "SELECT grp, CAST([] AS BIGINT[]) AS rem FROM grps"
      else s"SELECT grp, rem FROM fin${b - 1}"
    s"""small$b AS (SELECT grp, doc_id, toks,
        CAST(row_number() OVER (PARTITION BY grp
          ORDER BY toks DESC, doc_id) AS INTEGER) AS rn
      FROM d WHERE bt = $b AND toks <= $S),
      st$b AS (
        SELECT grp, 0 AS i, rem,
            CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS bin
          FROM ($seed)
        UNION ALL
        SELECT s.grp, st.i + 1,
          CASE WHEN $fits IS NULL
            THEN list_append(st.rem, $S - s.toks)
            ELSE st.rem[1:list_position(st.rem, $fits) - 1]
              || [$fits - s.toks]
              || st.rem[list_position(st.rem, $fits) + 1:] END,
          s.doc_id,
          CAST(CASE WHEN $fits IS NULL THEN len(st.rem)
            ELSE list_position(st.rem, $fits) - 1 END AS BIGINT)
        FROM st$b st JOIN small$b s ON s.grp = st.grp AND s.rn = st.i + 1),
      sfin$b AS (SELECT grp, rem FROM (
          SELECT grp, rem, row_number() OVER (PARTITION BY grp
            ORDER BY i DESC) AS r FROM st$b) WHERE r = 1),
      big$b AS (SELECT grp, doc_id, toks,
          row_number() OVER (PARTITION BY grp
            ORDER BY toks DESC, doc_id) AS brn,
          CAST((toks + $S - 1) // $S AS BIGINT) AS nb_doc
        FROM d WHERE bt = $b AND toks > $S),
      bigasg$b AS (SELECT big$b.grp, doc_id, toks,
          CAST(len(sf.rem) AS BIGINT) + COALESCE(SUM(nb_doc) OVER (
            PARTITION BY big$b.grp ORDER BY brn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bin,
          nb_doc AS n_bins
        FROM big$b JOIN sfin$b sf ON sf.grp = big$b.grp),
      fin$b AS (SELECT sf.grp,
          sf.rem || COALESCE(z.zs, CAST([] AS BIGINT[])) AS rem
        FROM sfin$b sf LEFT JOIN (
          SELECT grp, list_transform(range(CAST(SUM(nb_doc) AS BIGINT)),
            x -> CAST(0 AS BIGINT)) AS zs
          FROM big$b GROUP BY grp) z ON z.grp = sf.grp),
      asg$b AS (SELECT grp, doc_id, bin, CAST(1 AS BIGINT) AS n_bins,
          CAST($b AS BIGINT) AS batch
        FROM st$b WHERE i > 0
        UNION ALL
        SELECT grp, doc_id, bin, n_bins, CAST($b AS BIGINT) AS batch
        FROM bigasg$b)"""
  }

  /** Incremental packing ([[graft.streaming.PackStream.applyBatch]],
    * seqLen 64, group = source, the documents table arriving as three
    * `doc_id mod 3` micro-batches against a fresh crash-safe bin
    * state): placed docs never move and full bins never reopen — each
    * batch continues the BFD from the persisted open bins. The oracle
    * replays all three batches as CHAINED recursive CTEs (each batch's
    * final remaining-capacity list, dedicated zeros appended, seeds
    * the next), so every placement across the whole stream
    * adjudicates, including the cross-batch refills of inherited open
    * bins.
    */
  val xPackIncremental = Q(
    "x_pack_incremental",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"))
      val statePath = H.tempStateDir("graft_pack_state") + "/state"
      (0 until 3).map { b =>
        graft.streaming.PackStream.applyBatch(
            docs.filter(pmod(col("doc_id"), lit(3)) === b),
            statePath, col("source"), col("doc_id"), col("toks"),
            seqLen = 64, batchId = b)
          .withColumn("batch", lit(b.toLong))
      }.reduce(_.unionByName(_))
        .select(col("group").as("grp"), col("doc_id"), col("toks"),
          col("bin"), col("n_bins"), col("batch"))
        .orderBy(col("grp"), col("doc_id"))
    },
    Some(s"""WITH RECURSIVE d AS (SELECT source AS grp, doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        doc_id % 3 AS bt
      FROM documents),
      grps AS (SELECT DISTINCT grp FROM d),
      ${packBatchCtes(0, 64)},
      ${packBatchCtes(1, 64)},
      ${packBatchCtes(2, 64)},
      au AS (SELECT * FROM asg0 UNION ALL SELECT * FROM asg1
        UNION ALL SELECT * FROM asg2)
      SELECT a.grp, a.doc_id, d.toks, a.bin, a.n_bins, a.batch
      FROM au a JOIN d ON d.grp = a.grp AND d.doc_id = a.doc_id
      ORDER BY a.grp, a.doc_id"""))

  val queries: Seq[Q] = Seq(xEmbedWhitenApply, xEmbedWhitenRecall,
    xDedupEmbeddingWhitened, xDedupEmbeddingWhitenedDiff,
    xPackBestFit, xShardAssignIncremental, xPipelinePackShards,
    xPackIncremental)
}
