package graft.queries

import org.apache.spark.sql.functions._
import H.t

/** Round-19 operators: the per-SEQUENCE provenance manifest over the
  * concat-and-chunk packing (the attention-mask/attribution contract)
  * and the mid-epoch resume cursor over the epoch-order family (the
  * deterministic restart contract).
  */
object ExtQ {

  /** Per-sequence provenance manifest
    * ([[graft.ext.Sampling.packManifest]], seqLen 64, grouped by
    * source, doc_id order): one row per (group, sequence, document)
    * span — which token range of each packed training sequence came
    * from which document, 0-based in-sequence offsets, end-exclusive.
    * This is the view a training loader needs to place attention-mask
    * boundaries and attribute an example back to its sources;
    * [[graft.ext.Sampling.packSequences]]' per-DOC seq_first/seq_last
    * cannot answer "what is inside sequence s" without it.
    *
    * Token conservation is adjudicated, not asserted: every row
    * carries its sequence's span SUM (`seq_toks`), the tail flag, and
    * `conserved` = (seq_toks = 64 OR tail) — non-tail sequences must
    * be exactly full because the group's stream positions are covered
    * gap-free, so any drift in the prefix-sum arithmetic flips a
    * value the hash sees. The oracle re-derives every span from the
    * same cumulative arithmetic (window sum → span explode → offset
    * clamps → per-sequence re-aggregation).
    *
    * Scale: one per-group ordered window (the packer's own shuffle) +
    * a bounded explode (n_splits + 1 rows per doc) + one
    * map-side-combinable per-(group, seq) aggregate joined back on
    * the explode's own key — no new shuffle class.
    */
  val xPackManifest = Q(
    "x_pack_manifest",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val m = graft.ext.Sampling.packManifest(docs, col("source"),
        col("doc_id"), size(split(col("text"), " ")).cast("long"),
        col("doc_id"), seqLen = 64L)
      // conservation columns via WINDOWS, not equi-joins: window
      // PARTITION BY treats a NULL group as its own partition in both
      // engines, while a join on grp would silently DROP every
      // NULL-group doc's manifest rows from the adjudicated output
      // (the Layout.epochOrder null-safe-group lesson; r19 review
      // fix — PackManifestSpec pins the NULL-group case)
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy(col("grp"), col("seq"))
      val wGrp = Window.partitionBy(col("grp"))
      m.withColumn("seq_toks",
          sum(col("span_toks")).over(wSeq).cast("bigint"))
        .withColumn("_mx", max(col("seq")).over(wGrp))
        .select(col("grp"), col("seq"), col("doc_id"),
          col("start_off"), col("end_off"), col("span_toks"),
          col("seq_toks"), (col("seq") === col("_mx")).as("is_tail"),
          (col("seq_toks") === lit(64L) || col("seq") === col("_mx"))
            .as("conserved"))
        .orderBy(col("grp"), col("seq"), col("doc_id"))
    },
    Some("""WITH md AS (SELECT source AS grp, doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS t
      FROM documents),
      mc AS (SELECT grp, doc_id, t,
          CAST(SUM(t) OVER (PARTITION BY grp ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM md),
      ms AS (SELECT grp, doc_id, t, cum,
          CAST(unnest(range((cum - t) // 64, (cum - 1) // 64 + 1))
            AS BIGINT) AS seq
        FROM mc),
      mm AS (SELECT grp, seq, doc_id,
          CAST(greatest(0, cum - t - seq * 64) AS BIGINT) AS start_off,
          CAST(least(64, cum - seq * 64) AS BIGINT) AS end_off
        FROM ms),
      mw AS (SELECT grp, seq, doc_id, start_off, end_off,
          CAST(SUM(end_off - start_off)
            OVER (PARTITION BY grp, seq) AS BIGINT) AS seq_toks,
          CAST(MAX(seq) OVER (PARTITION BY grp) AS BIGINT) AS mx
        FROM mm)
      SELECT grp, seq, doc_id, start_off, end_off,
        CAST(end_off - start_off AS BIGINT) AS span_toks,
        seq_toks, (seq = mx) AS is_tail,
        (seq_toks = 64 OR seq = mx) AS conserved
      FROM mw
      ORDER BY grp ASC NULLS FIRST, seq, doc_id"""))

  /** Mid-epoch resume cursor ([[graft.ext.Layout.epochResumeCursor]],
    * 8 consumers over the seed-42 epoch order): for each requested
    * (consumer, K), the exact sequence a crashed training rank
    * resumes at after consuming K sequences of its block, plus the
    * consumer-local cumulative token positions (skipped / remaining)
    * that make a token-budget resume the same lookup. The four
    * requests cover a mid-block skip, a zero skip (resume = the
    * block's first sequence), a near-tail skip, and an EXHAUSTED skip
    * (K past the block: NULL resume columns, all tokens skipped) — so
    * the boundary verdicts adjudicate, not just the happy path. The
    * oracle chains the FULL epoch-order replay, the global prefix
    * sums, the per-consumer manifest + token offsets, and the
    * first_pos + K lookup, so a drifted position, offset, or
    * cumulative sum anywhere moves a resume boundary and flips the
    * hash.
    */
  val xPackEpochResume = Q(
    "x_pack_epoch_resume",
    (s, dir) => {
      val (ordered, n) = graft.ext.Layout.epochOrderWithTotal(
        ExtP.epochSeqs(s, dir), "grp", "bin", seed = 42L)
      graft.ext.Layout.epochResumeCursor(ordered, n, nConsumers = 8,
          skips = Seq((2L, 10L), (5L, 0L), (7L, 70L), (1L, 100000L)))
        .orderBy(col("consumer"), col("skip_k"))
    },
    Some(s"""WITH RECURSIVE ${ExtP.epochBaseCtes},
      ecum AS (SELECT epoch_pos, grp, bin, n_toks,
          CAST(SUM(n_toks) OVER (ORDER BY epoch_pos
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum
        FROM epos),
      en AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM epos),
      ecc AS (SELECT e.*, CAST(((epoch_pos - 1) * 8)
            // (SELECT n FROM en) AS BIGINT) AS consumer
        FROM ecum e),
      eman AS (SELECT consumer, CAST(COUNT(*) AS BIGINT) AS n_seqs,
          CAST(MIN(epoch_pos) AS BIGINT) AS first_pos,
          CAST(SUM(n_toks) AS BIGINT) AS ctoks
        FROM ecc GROUP BY 1),
      emanf AS (SELECT c.consumer, COALESCE(m.n_seqs, 0) AS n_seqs,
          m.first_pos, COALESCE(m.ctoks, 0) AS ctoks
        FROM (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS consumer) c
        LEFT JOIN eman m ON m.consumer = c.consumer),
      eoff AS (SELECT consumer, n_seqs, first_pos, ctoks,
          CAST(COALESCE(SUM(ctoks) OVER (ORDER BY consumer
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS toff
        FROM emanf),
      ereq AS (SELECT CAST(c AS BIGINT) AS consumer,
          CAST(k AS BIGINT) AS skip_k
        FROM (VALUES (2, 10), (5, 0), (7, 70), (1, 100000)) t(c, k)),
      ehit AS (SELECT r.consumer, r.skip_k,
          e.epoch_pos AS resume_pos, e.grp AS resume_grp,
          e.bin AS resume_bin, CAST(e.n_toks AS BIGINT) AS resume_toks,
          e.gcum
        FROM ereq r JOIN eoff m USING (consumer)
        JOIN ecc e ON e.consumer = r.consumer
          AND e.epoch_pos = m.first_pos + r.skip_k)
      SELECT r.consumer, r.skip_k, m.n_seqs, h.resume_pos,
        h.resume_grp, h.resume_bin, h.resume_toks,
        CAST(COALESCE(h.gcum - h.resume_toks - m.toff, m.ctoks)
          AS BIGINT) AS skipped_toks,
        CAST(greatest(0, m.n_seqs - r.skip_k) AS BIGINT)
          AS remaining_seqs,
        CAST(m.ctoks - COALESCE(h.gcum - h.resume_toks - m.toff,
          m.ctoks) AS BIGINT) AS remaining_toks
      FROM ereq r JOIN eoff m USING (consumer)
      LEFT JOIN ehit h ON h.consumer = r.consumer
        AND h.skip_k = r.skip_k
      ORDER BY r.consumer, r.skip_k"""))

  /** The PHYSICAL epoch layout under the oracle gate
    * ([[graft.ext.Layout.writeEpochLayout]], 8 consumers, seed 42):
    * the query WRITES the per-consumer parquet layout, reads it back
    * FROM DISK, and adjudicates the read-back content — every
    * sequence's consumer directory, epoch position, identity, and
    * load — against the pure SQL replay of the permutation + the
    * consumer division. This is a strictly stronger gate than the
    * LayoutEpochSpec range check: a wrong row routed to the right
    * directory, a dropped column, or a partition-column type drift
    * (the read-back `consumer` is re-cast to BIGINT — partition
    * inference yields INT) all flip the hash, and the adjudicated
    * bytes provably survived a disk round-trip through the layout a
    * training loader would read.
    */
  val xPackEpochLayout = Q(
    "x_pack_epoch_layout",
    (s, dir) => {
      val (ordered, n) = graft.ext.Layout.epochOrderWithTotal(
        ExtP.epochSeqs(s, dir), "grp", "bin", seed = 42L)
      val out = H.tempStateDir("graft_epoch_layout") + "/epoch"
      graft.ext.Layout.writeEpochLayout(ordered, n, nConsumers = 8, out)
      s.read.parquet(out)
        .select(col("consumer").cast("bigint").as("consumer"),
          col("epoch_pos"), col("grp"), col("bin"), col("n_docs"),
          col("n_toks"), col("shuffle_key"))
        .orderBy(col("epoch_pos"))
    },
    Some(s"""WITH RECURSIVE ${ExtP.epochBaseCtes},
      en AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM epos)
      SELECT CAST(((epoch_pos - 1) * 8) // (SELECT n FROM en) AS BIGINT)
          AS consumer,
        epoch_pos, grp, bin, n_docs, n_toks, shuffle_key
      FROM epos ORDER BY epoch_pos"""))

  /** Shuffle-quality audit of the epoch order
    * ([[graft.ext.Layout.epochOrderAudit]], seed 42): the measured
    * "did the LCG permutation actually mix the sources?" verdict — the
    * observed adjacent same-group pair count against the EXACT
    * uniform-permutation expectation numerator Σ n_g(n_g−1) (E[same] =
    * that over N), plus the run structure (n_runs / max_run over
    * maximal same-group intervals) and the decimal-exact 2× verdict.
    * All integer arithmetic, so the whole audit is hash-exact; the
    * oracle re-derives adjacency via lag() and the segments via a
    * window prefix sum over the SAME epoch replay, while the engine
    * side uses successor/predecessor position equi-joins + the
    * distributed prefix sum (no corpus-wide window — PlanSpec-gated).
    */
  val xPackEpochAudit = Q(
    "x_pack_epoch_audit",
    (s, dir) => {
      val (ordered, n) = graft.ext.Layout.epochOrderWithTotal(
        ExtP.epochSeqs(s, dir), "grp", "bin", seed = 42L)
      graft.ext.Layout.epochOrderAudit(ordered, n)
    },
    Some(s"""WITH RECURSIVE ${ExtP.epochBaseCtes},
      gn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seqs FROM epos),
      ga AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n
        FROM epos GROUP BY 1),
      ge AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
          CAST(COALESCE(SUM(n * (n - 1)), 0) AS BIGINT) AS expected_num
        FROM ga),
      gl AS (SELECT epoch_pos, grp,
          lag(grp) OVER (ORDER BY epoch_pos) AS pg
        FROM epos),
      gobs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_adjacent,
          CAST(COALESCE(SUM(CASE WHEN grp IS NOT DISTINCT FROM pg
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS observed_same
        FROM gl WHERE epoch_pos > 1),
      gf AS (SELECT epoch_pos,
          CASE WHEN epoch_pos = 1 THEN 1
            WHEN grp IS NOT DISTINCT FROM pg THEN 0 ELSE 1 END AS flag
        FROM gl),
      gs AS (SELECT epoch_pos,
          SUM(flag) OVER (ORDER BY epoch_pos
            ROWS UNBOUNDED PRECEDING) AS seg
        FROM gf),
      gruns AS (SELECT seg, COUNT(*) AS len FROM gs GROUP BY 1),
      gr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_runs,
          CAST(MAX(len) AS BIGINT) AS max_run
        FROM gruns)
      SELECT n_seqs, n_groups, n_adjacent, observed_same, expected_num,
        CAST(expected_num // n_seqs AS BIGINT) AS expected_floor,
        n_runs, max_run,
        (CAST(observed_same AS DECIMAL(38,0)) * n_seqs <=
          CAST(expected_num AS DECIMAL(38,0)) * 2) AS mixed_ok
      FROM gn, ge, gobs, gr"""))

  /** Per-consumer block digests over the epoch order
    * ([[graft.ext.Layout.epochBlockDigests]], 8 consumers, blocks of
    * 16): the order-integrity checksum completing the resume-cursor
    * restart contract — the cursor computes WHERE to resume, the
    * digest lets the resumed rank VERIFY it reads the same sequences
    * in the same order (position is inside every digest term, so
    * swapping two adjacent sequences flips a value the hash sees).
    * Consumer and block are closed-form in the position (consumer c
    * starts at ⌈c·N/8⌉+1), so the oracle replays the whole thing —
    * permutation, division inverse, digest mix — as pure integer
    * arithmetic over the shared epoch CTEs.
    */
  val xPackEpochDigest = Q(
    "x_pack_epoch_digest",
    (s, dir) => {
      val (ordered, n) = graft.ext.Layout.epochOrderWithTotal(
        ExtP.epochSeqs(s, dir), "grp", "bin", seed = 42L)
      graft.ext.Layout.epochBlockDigests(ordered, n, nConsumers = 8,
          blockLen = 16L)
        .orderBy(col("consumer"), col("block"))
    },
    Some(s"""WITH RECURSIVE ${ExtP.epochBaseCtes},
      en AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM epos),
      dd AS (SELECT epoch_pos, n_toks, shuffle_key,
          CAST(((epoch_pos - 1) * 8) // (SELECT n FROM en) AS BIGINT)
            AS consumer
        FROM epos),
      db AS (SELECT *, (epoch_pos - 1) -
          ((consumer * (SELECT n FROM en) + 7) // 8) AS local
        FROM dd),
      dt AS (SELECT consumer, CAST(local // 16 AS BIGINT) AS block,
          epoch_pos, n_toks,
          ((epoch_pos % 2147483648)
            * ((shuffle_key * 97 + n_toks * 31 + 1) % 2147483648))
            % 2147483648 AS term
        FROM db),
      dagg AS (SELECT consumer, block, CAST(COUNT(*) AS BIGINT)
            AS n_seqs,
          CAST(MIN(epoch_pos) AS BIGINT) AS first_pos,
          CAST(MAX(epoch_pos) AS BIGINT) AS last_pos,
          CAST(SUM(n_toks) AS BIGINT) AS n_toks,
          CAST(SUM(term) % 2147483648 AS BIGINT) AS digest
        FROM dt GROUP BY 1, 2)
      SELECT c.consumer, a.block, COALESCE(a.n_seqs, 0) AS n_seqs,
        a.first_pos, a.last_pos, COALESCE(a.n_toks, 0) AS n_toks,
        a.digest
      FROM (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS consumer) c
      LEFT JOIN dagg a ON a.consumer = c.consumer
      ORDER BY 1, 2"""))

  /** Multi-epoch distinctness audit: the "a new epoch = a new seed"
    * claim adjudicated — the SAME packed corpus under seeds 42 and 43,
    * joined per sequence (null-safe on (grp, bin)), with the fixed
    * point count, total/max displacement, the PRESERVED-ADJACENCY
    * count (epoch-42 neighbor pairs still neighbors under epoch 43 —
    * the statistic that CAUGHT the r19 rotation flaw: under the
    * original additive-seed LCG every pair of seeds produced keys
    * differing by one constant, so "a new epoch" was the old epoch
    * ROTATED and 598/599 adjacent pairs survived; under the fixed
    * multiplicative-seed key 0 survive and the displacement sits at
    * the uniform-random N²/3), the `decorrelated` 10% verdict, and
    * the completeness verdicts (both orders are dense permutations of
    * the same set). The oracle derives the second permutation by
    * appending the seed-43 multiplier/offset CTEs to the SAME shared
    * epoch replay — one drifted tie-break or seed constant anywhere
    * moves a displacement and flips the hash.
    */
  val xPackEpochMulti = Q(
    "x_pack_epoch_multi",
    (s, dir) => {
      val seqs = ExtP.epochSeqs(s, dir).cache()
      val (o42, n) = graft.ext.Layout.epochOrderWithTotal(
        seqs, "grp", "bin", seed = 42L)
      val o43 = graft.ext.Layout.epochOrder(seqs, "grp", "bin",
        seed = 43L)
      val a = o42.select(col("grp").as("_ga"), col("bin").as("_ba"),
        col("epoch_pos").as("pa"))
      val b = o43.select(col("grp").as("_gb"), col("bin").as("_bb"),
        col("epoch_pos").as("pb"))
      // the per-sequence (position-in-42, position-in-43) map feeds
      // BOTH aggregates (global displacement + the successor join for
      // preserved adjacency) — pinned like the budget face's seqs
      val em = a.join(b,
          col("_ga") <=> col("_gb") && col("_ba") === col("_bb"))
        .select(col("pa"), col("pb")).cache()
      val agg = em.agg(count(lit(1)).cast("bigint").as("n_seqs"),
        sum(when(col("pa") === col("pb"), 1L).otherwise(0L))
          .cast("bigint").as("n_fixed"),
        sum(abs(col("pa") - col("pb"))).cast("bigint").as("sum_disp"),
        max(abs(col("pa") - col("pb"))).cast("bigint").as("max_disp"),
        (max(col("pa")) === lit(n) && max(col("pb")) === lit(n) &&
          count(lit(1)) === lit(n)).as("complete_both"),
        (sum(abs(col("pa") - col("pb"))) > 0).as("distinct_orders"))
      // epoch-42 successor pairs re-keyed to the predecessor position
      // (the epochOrderAudit join shape — never a corpus-wide window)
      val succ = em.select((col("pa") - 1).as("pa"),
        col("pb").as("_pbn"))
      val pre = em.join(succ, Seq("pa"))
        .agg(coalesce(sum(when(abs(col("_pbn") - col("pb")) === 1L, 1L)
          .otherwise(0L)), lit(0L)).cast("bigint").as("preserved_adj"))
      agg.crossJoin(pre)
        .withColumn("decorrelated",
          col("preserved_adj") * lit(10L) <= col("n_seqs") - 1)
    },
    Some(s"""WITH RECURSIVE ${ExtP.epochBaseCtes},
      fseed AS (SELECT ((43 % 2147483648) * 1103515245 + 12345)
          % 2147483648 AS s1),
      fseed2 AS (SELECT (s1 * 1103515245 + 12345) % 2147483648 AS s2,
          2 * (s1 % 1073741824) + 1 AS mult
        FROM fseed),
      fkey0 AS (SELECT e.grp, e.bin,
          ((SELECT mult FROM fseed2)
            * ((((gi * 1048576 + e.bin) % 2147483648)
              * 1103515245 + 12345) % 2147483648)
            + (SELECT s2 FROM fseed2)) % 2147483648 AS y0
        FROM eseq e JOIN egi ON egi.grp IS NOT DISTINCT FROM e.grp),
      fkey1 AS (SELECT grp, bin,
          (xor(y0, y0 // 32768) * 1103515245 + 12345)
            % 2147483648 AS y1
        FROM fkey0),
      ekey43 AS (SELECT grp, bin,
          (xor(y1, y1 // 8192) * 1103515245 + 12345)
            % 2147483648 AS k43
        FROM fkey1),
      epos43 AS (SELECT grp, bin,
          CAST(row_number() OVER (ORDER BY k43, grp NULLS FIRST, bin)
            AS BIGINT) AS pb
        FROM ekey43),
      em AS (SELECT a.epoch_pos AS pa, b.pb
        FROM epos a JOIN epos43 b
          ON a.grp IS NOT DISTINCT FROM b.grp AND a.bin = b.bin),
      emagg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seqs,
          CAST(SUM(CASE WHEN pa = pb THEN 1 ELSE 0 END) AS BIGINT)
            AS n_fixed,
          CAST(SUM(ABS(pa - pb)) AS BIGINT) AS sum_disp,
          CAST(MAX(ABS(pa - pb)) AS BIGINT) AS max_disp,
          (MAX(pa) = COUNT(*) AND MAX(pb) = COUNT(*)
            AND COUNT(*) = (SELECT COUNT(*) FROM epos))
            AS complete_both,
          (SUM(ABS(pa - pb)) > 0) AS distinct_orders
        FROM em),
      epre AS (SELECT CAST(COALESCE(SUM(CASE
            WHEN ABS(y.pb - x.pb) = 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS preserved_adj
        FROM em x JOIN em y ON y.pa = x.pa + 1)
      SELECT a.*, p.preserved_adj,
        (p.preserved_adj * 10 <= a.n_seqs - 1) AS decorrelated
      FROM emagg a, epre p"""))

  val queries: Seq[Q] = Seq(xPackManifest, xPackEpochResume,
    xPackEpochLayout, xPackEpochAudit, xPackEpochDigest, xPackEpochMulti)
}
