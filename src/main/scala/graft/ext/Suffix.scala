package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array prefix doubling — the exact-substring
  * dedup machinery of Lee et al. 2021 ("Deduplicating Training Data
  * Makes Language Models Better" builds SUFFIX ARRAYS to find every
  * duplicated substring; Manber & Myers 1993 for prefix doubling —
  * public literature), token-level over the whole corpus.
  *
  * Round k assigns every corpus position a RANK identifying its
  * length-2ᵏ token window exactly: rank₁ = group id of the token;
  * rank₂ₗ(p) = group id of the pair (rankₗ(p), rankₗ(p+L)). Group ids
  * are the group's MINIMUM global position — deterministic, dense
  * enough for identity (order preservation is not needed for
  * duplicate detection), and replayable in SQL as one window MIN.
  * Two length-L windows are equal IFF their level-L ranks are equal —
  * no hashing, no collisions, and the join keys are 16 BYTES AT ANY
  * SPAN LENGTH (vs materialized n-gram string keys growing with L,
  * and vs [[Dedup.spanDedupHashed]]'s 8-byte keys which admit hash
  * collisions; this is the suffix-array point at 100-TB span scales).
  *
  * Corpus layout: tokens are numbered globally in (doc, position)
  * order via [[Rank.globalRowNumber]] (range-partitioned two-job
  * numbering — never a single-partition window), with one UNIQUE
  * sentinel token between consecutive documents, so any window
  * crossing a document boundary contains a once-in-the-corpus token
  * and can never be part of a duplicate group. Positions whose window
  * runs off the corpus end take `−p` as the missing partner rank —
  * unique per position, same effect.
  *
  * Scale shape (100 TB): log₂(maxLen) rounds, each ONE narrow
  * equi-join on the 8-byte position key plus ONE exchange on the
  * (rank, partner) pair — all map-side combinable aggregations of
  * 2-long rows; the doc text never rides a shuffle after
  * tokenization. Each level is pinned (localCheckpoint) because it
  * feeds both the next round and its own report row — the measured
  * ExtK lesson: an unsevered 5-round lineage pays the re-planning
  * cliff.
  */
object Suffix {

  /** Globally numbered corpus positions: (p, _doc, _i, tok), with
    * one sentinel row (_i = Long.MaxValue) between consecutive docs.
    * p is 1-based, dense, in (doc, token-index) order.
    */
  private[ext] def positions(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).cast("long").as("_doc"),
        posexplode(Text.tokens(col(textCol))).as(Seq("_i", "tok")))
      .filter(length(col("tok")) > 0)
      .select(col("_doc"), col("_i").cast("long").as("_i"), col("tok"))
    // space-prefixed sentinel (the oracle's ' ' || doc_id): real tokens
    // come from a split on ' ', so none can contain a space — the
    // sentinel is collision-proof by construction
    val sentinels = docs.select(col(idCol).cast("long").as("_doc"),
      lit(Long.MaxValue).as("_i"),
      concat(lit(" "), col(idCol).cast("string")).as("tok"))
    Rank.globalRowNumber(toks.unionByName(sentinels),
        Seq(col("_doc"), col("_i")), out = "p")
      .select(col("p"), col("_doc"), col("_i"), col("tok"))
  }

  /** The dyadic rank ladder: (spanLen, ranks(p, rank)) for spanLen =
    * 1, 2, 4, …, maxLen (maxLen must be a power of two). Each level is
    * pinned eagerly (it feeds the next round AND the caller's
    * per-level consumption).
    *
    * `emitGsz` additionally carries each level's duplicate-group size
    * `gsz` — OPT-IN (r20): only [[dupProfile]] and [[topDupSpans]]
    * read it, and carrying it unconditionally widened every
    * corpus-sized level checkpoint of the excision/contamination
    * faces (the master chain's stage 8, the leak-depth ladder) by a
    * long column they never consume.
    */
  def dyadicRanks(docs: DataFrame, textCol: String, idCol: String,
      maxLen: Int = 32, emitGsz: Boolean = false)
      : (DataFrame, Seq[(Int, DataFrame)]) =
    dyadicRanksPinned(docs, textCol, idCol, maxLen, emitGsz,
      _.localCheckpoint(true))

  /** [[dyadicRanks]] with an injectable pin — `identity` lets the plan
    * tooling ([[graft.tools.OpPlan]]) capture a level's FULL physical
    * plan (the eager localCheckpoint otherwise hides every level
    * behind an opaque scan). Production callers always pin.
    */
  private[graft] def dyadicRanksPinned(docs: DataFrame, textCol: String,
      idCol: String, maxLen: Int, emitGsz: Boolean,
      pin: DataFrame => DataFrame): (DataFrame, Seq[(Int, DataFrame)]) = {
    require(maxLen >= 1 && Integer.bitCount(maxLen) == 1,
      "maxLen must be a power of two")
    val pos = pin(positions(docs, textCol, idCol))
    // group-min via a whole-partition window, MEASURED against the
    // "obvious" skew-safe alternative (groupBy(rank, partner).min +
    // join-back): at ×100 clone replication the combinable aggregate's
    // 32 concurrent partial hash maps over the mostly-DISTINCT key
    // space OOM'd (AGGREGATE_OUT_OF_MEMORY) and its join-back pushed a
    // second full-table exchange (+32% shuffle at ×10), while
    // WindowExec completed every scale: its per-group buffer is
    // bounded by the GROUP size (suffix groups are duplicate
    // multiplicities — small even under heavy cloning) and spills to
    // disk (ExternalAppendOnlyUnsafeRowArray) if a pathological group
    // ever isn't. One exchange per round, no driver state.
    // `gsz` (duplicate-group size) rides the SAME window buffer as the
    // group-min: count(*) over an unordered window partition is
    // computed from the partition the MIN already buffered. r20 fix of
    // the r19 shape: BOTH window functions are computed BEFORE the
    // rank column is overwritten — the r19 code replaced `rank` first
    // and then resolved the gsz window against the NEW rank, which is
    // a DIFFERENT partition spec, so every ladder level planned a
    // second Exchange+Sort+Window over the full rank table (measured:
    // the whole master-family A/B delta of r19; values were identical
    // because min-p is unique per group).
    val w1 = Window.partitionBy(col("tok"))
    val lvl1 = pos.withColumn("rank", min(col("p")).over(w1))
    var rank = pin(
      (if (emitGsz) lvl1.withColumn("gsz", count(lit(1)).over(w1))
          .select(col("p"), col("rank"), col("gsz"))
        else lvl1.select(col("p"), col("rank"))))
    val levels = Seq.newBuilder[(Int, DataFrame)]
    levels += 1 -> rank
    var len = 1
    while (len < maxLen) {
      val partner = rank.select((col("p") - len).as("p"),
        col("rank").as("_r2"))
      val wk = Window.partitionBy(col("rank"), col("_r2c"))
      val joined = rank.select(col("p"), col("rank"))
        .join(partner, Seq("p"), "left")
        .withColumn("_r2c", coalesce(col("_r2"), -col("p")))
      rank = pin(
        (if (emitGsz)
            joined.withColumn("_mn", min(col("p")).over(wk))
              .withColumn("gsz", count(lit(1)).over(wk))
              .select(col("p"), col("_mn").as("rank"), col("gsz"))
          else joined.withColumn("rank", min(col("p")).over(wk))
            .select(col("p"), col("rank"))))
      len *= 2
      levels += len -> rank
    }
    (pos, levels.result())
  }

  /** Exact window ranks at an ARBITRARY span length (not only powers
    * of two): for spanLen = 2ᵏ the dyadic ladder's last level; for
    * 2ᵏ < spanLen < 2ᵏ⁺¹ one extra combining round over the level-2ᵏ
    * ranks at offset spanLen − 2ᵏ — the two overlapping 2ᵏ-windows
    * [p, p+2ᵏ) and [p+off, p+off+2ᵏ) cover [p, p+spanLen) exactly
    * (off ≤ 2ᵏ), so pair equality ⟺ spanLen-window equality (the
    * sparse-table/RMQ overlap trick — Bender & Farach-Colton 2000,
    * public literature). Same group-min identity, same 16-byte key
    * discipline. Returns (positions, rank(p, rank)).
    */
  def ranksAt(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int): (DataFrame, DataFrame) = {
    require(spanLen >= 1, "spanLen must be >= 1")
    val k = Integer.highestOneBit(spanLen)
    // slim ladder (no gsz): none of ranksAt's consumers (the excision
    // faces, the contamination ladders) read group sizes — they group
    // or anti-join on the rank identity itself (r20)
    val (pos, levels) = dyadicRanks(docs, textCol, idCol, k)
    val base = levels.last._2
    if (k == spanLen) (pos, base)
    else {
      val off = spanLen - k
      val partner = base.select((col("p") - off).as("p"),
        col("rank").as("_r2"))
      val wo = Window.partitionBy(col("rank"), col("_r2c"))
      val rank = base.select(col("p"), col("rank"))
        .join(partner, Seq("p"), "left")
        .withColumn("_r2c", coalesce(col("_r2"), -col("p")))
        .withColumn("rank", min(col("p")).over(wo))
        .select(col("p"), col("rank"))
        .localCheckpoint(true)
      (pos, rank)
    }
  }

  /** Dyadic duplication profile: per span length 1, 2, …, maxLen, the
    * number of duplicate window groups and the number of positions
    * participating in one — the "how much duplication at each scale"
    * curve an exact-substring dedup run is sized by.
    */
  def dupProfile(docs: DataFrame, textCol: String, idCol: String,
      maxLen: Int = 32): DataFrame = {
    val (_, levels) = dyadicRanks(docs, textCol, idCol, maxLen,
      emitGsz = true)
    levels.map { case (len, rank) =>
      // per-level stats off the ladder's own gsz column (r19): the
      // group representative is the p = rank row, so both counts are
      // ONE map-side-combinable pass — the former per-level
      // groupBy(rank) re-aggregation of the whole rank table (a full
      // exchange per level) is retired. Identical values: #groups
      // with ≥2 members ≡ #representatives seeing gsz ≥ 2, and
      // positions in such groups ≡ rows with gsz ≥ 2.
      rank.agg(
          coalesce(sum(when(col("p") === col("rank") && col("gsz") >= 2,
            1L).otherwise(0L)), lit(0L)).cast("bigint")
            .as("n_dup_groups"),
          coalesce(sum(when(col("gsz") >= 2, 1L).otherwise(0L)),
            lit(0L)).cast("bigint").as("n_dup_positions"))
        .select(lit(len).as("span_len"), col("n_dup_groups"),
          col("n_dup_positions"))
    }.reduce(_.unionByName(_))
  }

  /** Top-k duplicated spans at exactly `spanLen` (a power of two):
    * occurrence count, first global position (the group id), and the
    * reconstructed span text — ranked by (occurrences DESC, first
    * position ASC). Reconstruction joins the bounded top-k back to
    * the position table on a broadcast range probe; duplicate groups
    * never contain sentinels or run off the corpus, so every span
    * reconstructs to exactly `spanLen` tokens.
    */
  def topDupSpans(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int = 32, k: Int = 20): DataFrame = {
    require(k > 0, "k must be positive")
    val (pos, levels) = dyadicRanks(docs, textCol, idCol, spanLen,
      emitGsz = true)
    val rank = levels.last._2
    // the ladder's gsz column IS the per-group occurrence count (r19):
    // selecting the representative row (p = rank) replaces the
    // full-table groupBy(rank) re-aggregation
    val top = rank
      .filter(col("p") === col("rank") && col("gsz") >= 2)
      .select(col("rank").as("first_pos"),
        col("gsz").cast("bigint").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("first_pos"))
      .limit(k) // TakeOrdered — never a global sort
      .withColumn("rnk", row_number().over(Window.orderBy(
        col("n_occurrences").desc, col("first_pos")))) // k rows only
    broadcast(top)
      .join(pos, pos("p") >= top("first_pos") &&
        pos("p") < top("first_pos") + spanLen)
      .groupBy(col("rnk"), col("n_occurrences"), col("first_pos"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok")), " ").as("span_text"))
      .select(col("rnk"), col("n_occurrences"), col("first_pos"),
        col("span_text"))
  }

  /** Exact duplicated-span EXCISION — the dedup ACTION of Lee et al.
    * 2021 (remove every later occurrence of a duplicated substring,
    * keep the first), at span length `spanLen`: every position whose
    * level-`spanLen` rank group has an earlier member (p ≠ rank —
    * the group id IS the earliest position, so first occurrences and
    * singletons both satisfy p = rank) marks its `spanLen`-token
    * window for removal; kept tokens rebuild each document. Where
    * marked windows overlap, the removal is their union (positions
    * are killed, not spans — deterministic and order-free). A doc
    * whose tokens are all excised survives as an empty text (the
    * spanDedup output convention: doc_id, deduped_text,
    * n_kept_tokens).
    *
    * vs [[Dedup.spanDedupHashed]]: same action shape — BOTH rank every
    * window by its minimal (doc, start) occurrence and kill covered
    * positions of every later occurrence, so on a collision-free run
    * the outputs are byte-identical (the registered
    * `x_pipeline_master_suffix` twin adjudicates exactly this inside
    * the master chain) — but the window
    * identity here is EXACT (rank equality, no hash collisions) and
    * the span length can grow without the key growing — the
    * suffix-array point at the 50-token spans Lee et al. excise.
    * Any spanLen ≥ 1 is accepted ([[ranksAt]]).
    *
    * Scale: the ladder's cost (log₂ spanLen keyed rounds) plus one
    * offsets explode over MARKED positions only (O(dup positions ·
    * spanLen)) and one anti-join on the 8-byte position key; rebuild
    * groups by doc.
    *
    * The measured trade vs the fingerprint face (ScaleBench
    * `suffixstage`, span 10, kept-token sums identical on all faces
    * at every scale): ×10 clones — hashed 7.5 s / 171 MiB shuffled,
    * raw exact 12.1 s / 498 MiB; ×40 — hashed 6.9 s / 589 MiB, raw
    * exact 47.0 s / 1872 MiB. The raw ladder degrades with clone
    * multiplicity (its per-round window MIN buffers whole duplicate
    * groups) — and [[exciseDupSpansExactFirst]] is the measured CURE:
    * ×10 7.8 s / 95 MiB, ×40 8.2 s / 225 MiB — content-bound (flat in
    * k), byte-equal to this face by construction
    * (`x_dedup_suffix_excise_first` rides the same oracle), and
    * BELOW the fingerprint face's shuffle volume at ×40. The r18
    * ×100 decision row settled the wall-time trade too: exact-first
    * 9.5 s / 445 MiB vs the fingerprint face's 11.7 s / 1311 MiB —
    * exactness is strictly cheaper at scale, and the master chain's
    * stage-8 DEFAULT flipped to the exact-first face
    * (`x_pipeline_master`, r18). This raw face remains the oracle
    * anchor.
    */
  def exciseDupSpans(docs: DataFrame, textCol: String, idCol: String,
      spanLen: Int = 32): DataFrame = {
    val (pos, rank) = ranksAt(docs, textCol, idCol, spanLen)
    val kill = rank.filter(col("p") =!= col("rank"))
      .select(explode(sequence(col("p"), col("p") + (spanLen - 1)))
        .as("p"))
      .distinct()
    val kept = pos.filter(col("_i") =!= Long.MaxValue)
      .join(kill, Seq("p"), "left_anti")
      .groupBy(col("_doc").as("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_kept_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ").as("deduped_text"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("deduped_text"), lit("")).as("deduped_text"),
        coalesce(col("n_kept_tokens"), lit(0L)).as("n_kept_tokens"))
  }

  /** [[exciseDupSpans]] behind the exact-first collapse — the
    * clone-robust face (the [[maxDupSpan]] doctrine applied to the
    * ACTION): identical texts collapse to their min-id representative
    * ([[Dedup.wholeDocReps]], digest keys), the ladder runs on
    * representatives only, and members are reconstructed CLOSED-FORM —
    * provably equal to the raw run:
    *
    *  - a non-rep member M is an exact clone of its rep R (earlier
    *    id ⇒ every position of R precedes every position of M in the
    *    global order), so every ≥`spanLen`-token window of M is a
    *    non-first duplicate and M's positions are fully covered —
    *    M emits ("", 0) when it has ≥ spanLen tokens, and its intact
    *    text when shorter (no windows exist to mark);
    *  - a rep's verdict is unchanged by dropping members: a window
    *    shared with a member is shared with its (identical) rep, and
    *    ranks are min-position — member positions are never anyone's
    *    first occurrence.
    *
    * Adjudicated by construction against the SAME text-keyed oracle
    * as the raw face (`x_dedup_suffix_excise_first`); ScaleBench
    * `suffixstage` measures the cure: the raw exact face degrades
    * with clone multiplicity (its per-round window MIN buffers whole
    * duplicate groups), the collapsed face is content-bound.
    */
  def exciseDupSpansExactFirst(docs: DataFrame, textCol: String,
      idCol: String, spanLen: Int = 32): DataFrame = {
    // NULL text coalesces to '' BEFORE digesting: sha2(NULL) is NULL
    // and an equi-join on a NULL digest matches nothing, so a NULL-text
    // doc would silently VANISH from the output — a parity break with
    // the raw face, which emits (doc_id, '', 0) for it. Under the
    // coalesce the doc rides the ''-digest group and reconstructs to
    // exactly that row (split('', ' ') = [''], filtered empty, the
    // short-member branch emits ('', 0)) — byte-equal to the raw face
    // on every input, NULLs included.
    val keyed = docs.select(col(idCol).cast("long").as("doc_id"),
      coalesce(col(textCol).cast("string"), lit("")).as("text"))
    val reps = Dedup.wholeDocReps(keyed, "text", "doc_id")
    val repOut = exciseDupSpans(reps, "text", "doc_id", spanLen)
      .withColumnRenamed("doc_id", "_rep_id")
    val members = keyed
      .select(col("doc_id"),
        sha2(col("text").cast("binary"), 256).as("text_digest"),
        col("text"))
      .join(reps.select(col("text_digest"),
        col("doc_id").as("_rep_id")), "text_digest")
    // non-empty tokens, mirroring the ladder's positions() filter and
    // the rebuild's separator convention (a short member with doubled
    // spaces round-trips through the same join-by-single-space)
    val toks = filter(split(col("text"), " "),
      t => length(t) > lit(0))
    members.join(repOut, "_rep_id")
      .select(col("doc_id"),
        when(col("doc_id") === col("_rep_id"), col("deduped_text"))
          .when(size(toks) >= spanLen, lit(""))
          .otherwise(concat_ws(" ", toks)).as("deduped_text"),
        when(col("doc_id") === col("_rep_id"), col("n_kept_tokens"))
          .when(size(toks) >= spanLen, lit(0L))
          .otherwise(size(toks).cast("long"))
          .as("n_kept_tokens"))
  }

  /** The minimal mismatch offset in [lo, hi) per (pa, pb) pair: one
    * bounded offsets explode + two keyed joins against the position
    * table + a map-side-combinable MIN. Pairs with no mismatch in the
    * range are ABSENT from the output (inner joins + filter).
    */
  private def minMismatch(pairs: DataFrame, pos: DataFrame,
      lo: Int, hi: Int, out: String): DataFrame =
    pairs.select(col("pa"), col("pb"),
        explode(sequence(lit(lo), lit(hi - 1))).as("o"))
      .join(pos.select(col("p").as("_xa"), col("tok").as("_ta")),
        col("pa") + col("o") === col("_xa"))
      .join(pos.select(col("p").as("_xb"), col("tok").as("_tb")),
        col("pb") + col("o") === col("_xb"))
      .filter(col("_ta") =!= col("_tb"))
      .groupBy(col("pa"), col("pb"))
      .agg(min(col("o")).cast("bigint").as(out))

  /** Per-pair exact LCP in [baseLen, maxExt], STAGED (r20): the former
    * single explode materialized (maxExt − baseLen) offset rows per
    * pair — ~156 per pair at the defaults — and joined them all
    * against the position table twice, while on real text almost
    * every pair mismatches within a few tokens of its shared base
    * window. Stage 1 resolves offsets [baseLen, 2·baseLen); only the
    * UNRESOLVED pairs (no mismatch yet — the long-LCP tail) explode
    * the remaining [2·baseLen, maxExt) range. Exactly the same value:
    * min(o) over the full range = the stage-1 min when one exists
    * (stage-2 offsets are all larger), else the stage-2 min, else no
    * mismatch → maxExt. The stage-1 result is pinned (pair-sized)
    * so stage 2's probe never re-runs stage 1. Measured on
    * x_quality_signals_full's leak-depth component: 14.0 → see
    * OPTIMIZATION_r20.md.
    *
    * Input pairs must be unique on (pa, pb); extra columns ride
    * through. Output: the input columns + `lcp`.
    */
  private[ext] def lcpStaged(pairs: DataFrame, pos: DataFrame,
      baseLen: Int, maxExt: Int): DataFrame = {
    val cut = math.min(2 * baseLen, maxExt)
    val m1 = minMismatch(pairs, pos, baseLen, cut, "_mo1")
    val withM1 = pairs.join(m1, Seq("pa", "pb"), "left")
    if (cut >= maxExt)
      withM1.withColumn("lcp", coalesce(col("_mo1"), lit(maxExt.toLong)))
        .drop("_mo1")
    else {
      val pinned = withM1.localCheckpoint(true)
      val unresolved = pinned.filter(col("_mo1").isNull)
        .select(col("pa"), col("pb"))
      val m2 = minMismatch(unresolved, pos, cut, maxExt, "_mo2")
      pinned.join(m2, Seq("pa", "pb"), "left")
        .withColumn("lcp",
          coalesce(col("_mo1"), col("_mo2"), lit(maxExt.toLong)))
        .drop("_mo1", "_mo2")
    }
  }

  /** Cross-corpus contamination DEPTH — the overlap-audit statistic of
    * the GPT-3/Pile decontamination reports (Brown et al. 2020 audit
    * 13-gram collisions; Lee et al. 2021 measure longest shared
    * substrings — public literature): for every non-eval document, the
    * EXACT length of its longest token span that also appears anywhere
    * in the eval slice, plus how many base windows collide. Fixed-n
    * decontamination ([[Text.contamination]]) answers "is there a
    * 5-gram hit"; this answers "HOW DEEP is the leak" — the signal an
    * audit ranks documents by.
    *
    * `evalPred` marks the eval rows of `docs` (one table, one position
    * numbering — SQL-replayable). Pairs = (corpus position, eval
    * position) sharing a level-`baseLen` rank ([[ranksAt]] — any
    * baseLen ≥ 1); each extends token-by-token to its first mismatch
    * (the [[maxDupSpan]] machinery), and the per-doc MAX is reported:
    * (doc_id, max_shared_span, n_base_hits, saturated) for docs with
    * ≥ 1 collision — `n_base_hits` counts the doc's DISTINCT colliding
    * base windows (an eval passage repeated m times in the eval slice
    * still counts its corpus window once — the aggregate is
    * COUNT(DISTINCT pa) over the pair set, r18: the pair COUNT(*)
    * inflated with eval-side multiplicity against this documented
    * semantic), and `saturated` is true when some pair hit `maxExt`
    * without mismatching (the span is understated; rerun with a larger
    * cap).
    *
    * Scale: pair volume is the CONTAMINATION volume (corpus windows ×
    * colliding eval windows — output-bound; the eval slice is small by
    * construction), never corpus-quadratic; extension is one bounded
    * offsets explode + two keyed joins; the per-doc MAX is map-side
    * combinable.
    */
  def contaminationSpanDepth(docs: DataFrame, textCol: String,
      idCol: String, evalPred: Column, baseLen: Int = 4,
      maxExt: Int = 160): DataFrame = {
    require(maxExt > baseLen, "maxExt must exceed baseLen")
    val (pos, rank) = ranksAt(docs, textCol, idCol, baseLen)
    val pd = pos.filter(col("_i") =!= Long.MaxValue)
      .select(col("p"), col("_doc"))
    val mem = docs.select(col(idCol).cast("long").as("_doc"),
      evalPred.as("_ev"))
    val ranked = rank.join(pd, "p").join(mem, "_doc")
    val a = ranked.filter(!col("_ev"))
      .select(col("rank"), col("p").as("pa"), col("_doc").as("doc_id"))
    val b = ranked.filter(col("_ev"))
      .select(col("rank"), col("p").as("pb"))
    val pairs = a.join(b, "rank")
      .select(col("doc_id"), col("pa"), col("pb"))
      .localCheckpoint(true) // two consumers: extension + the final lcp
    lcpStaged(pairs, pos, baseLen, maxExt)
      .groupBy(col("doc_id"))
      .agg(max(col("lcp")).cast("bigint").as("max_shared_span"),
        countDistinct(col("pa")).cast("bigint").as("n_base_hits"),
        coalesce(max(col("lcp")) === lit(maxExt.toLong), lit(false))
          .as("saturated"))
  }

  /** Top LEAKED spans — the per-span view of the overlap audit
    * ([[contaminationSpanDepth]] is the per-doc view): the k
    * `spanLen`-token windows present in BOTH the eval slice and the
    * corpus, ranked by corpus occurrence count — "which benchmark
    * passages leaked the most", with the reconstructed span text.
    * Output: (rnk, n_corpus_occurrences, n_corpus_docs, first_pos,
    * span_text), ties broken by first position.
    *
    * Scale: the rank groups are the [[ranksAt]] ladder's output
    * (16-byte identities at any length); the leaderboard is one
    * map-side-combinable aggregate over cross-set groups + a bounded
    * top-k ([[topDupSpans]]'s TakeOrdered + broadcast-reconstruction
    * shape).
    */
  def topLeakedSpans(docs: DataFrame, textCol: String, idCol: String,
      evalPred: Column, spanLen: Int = 4, k: Int = 20): DataFrame = {
    require(k > 0, "k must be positive")
    val (pos, rank) = ranksAt(docs, textCol, idCol, spanLen)
    val pd = pos.filter(col("_i") =!= Long.MaxValue)
      .select(col("p"), col("_doc"))
    val mem = docs.select(col(idCol).cast("long").as("_doc"),
      evalPred.as("_ev"))
    val g = rank.join(pd, "p").join(mem, "_doc")
      .groupBy(col("rank"))
      .agg(sum(when(col("_ev"), 1L).otherwise(0L)).as("_ne"),
        sum(when(!col("_ev"), 1L).otherwise(0L)).cast("bigint")
          .as("n_corpus_occurrences"),
        countDistinct(when(!col("_ev"), col("_doc"))).cast("bigint")
          .as("n_corpus_docs"))
      .filter(col("_ne") > 0 && col("n_corpus_occurrences") > 0)
    val top = g.select(col("rank").as("first_pos"),
        col("n_corpus_occurrences"), col("n_corpus_docs"))
      .orderBy(col("n_corpus_occurrences").desc, col("first_pos"))
      .limit(k) // TakeOrdered — never a global sort
      .withColumn("rnk", row_number().over(Window.orderBy(
        col("n_corpus_occurrences").desc, col("first_pos")))) // k rows
    broadcast(top)
      .join(pos, pos("p") >= top("first_pos") &&
        pos("p") < top("first_pos") + spanLen)
      .groupBy(col("rnk"), col("n_corpus_occurrences"),
        col("n_corpus_docs"), col("first_pos"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok")), " ").as("span_text"))
      .select(col("rnk"), col("n_corpus_occurrences"),
        col("n_corpus_docs"), col("first_pos"), col("span_text"))
  }

  /** EXACT longest duplicated token span — the Lee et al. headline
    * statistic ("the longest substring occurring twice"), not capped
    * at a dyadic length: every pair inside a level-`baseLen` duplicate
    * group shares at least `baseLen` tokens; extending each pair
    * token-by-token until the first mismatch (or `maxExt`) gives its
    * exact longest-common-prefix, and the corpus maximum is the
    * answer. Sentinels guarantee every extension hits a mismatch
    * before leaving its document (each doc ends in a once-in-the-
    * corpus token), so `maxExt` only needs to exceed the longest
    * document.
    *
    * Returns ONE row: (max_dup_len, n_pairs, n_pairs_at_max,
    * saturated) — NULL/0/NULL/false when the corpus has no duplicate
    * at `baseLen`. `saturated` is true when any pair's extension hit
    * the `maxExt` cap without finding a mismatch — max_dup_len then
    * UNDERSTATES the true statistic and the caller should rerun with
    * a cap exceeding the longest document's token count.
    *
    * Scale: the pair set is the VERIFICATION set (positions inside
    * duplicate groups — the LSH-verify class, output-bound not
    * corpus-bound); extension is one offsets explode over pairs
    * (O(pairs · maxExt) rows) and two keyed joins against the
    * position table; the mismatch MIN is map-side combinable.
    * CLONE CAVEAT (the exact-first doctrine): in-group pairs grow
    * QUADRATICALLY with duplicate multiplicity, so on a clone-heavy
    * corpus collapse exact duplicates first
    * ([[Dedup.wholeDocReps]] — identical docs contribute identical
    * spans, and their max is trivially the doc length); after the
    * collapse, multiplicities are content-bound (measured in
    * ScaleBench `maxlen` at ×10 clones: raw 13.9 s / 515 MiB
    * shuffled vs exact-first 6.8 s / 72.5 MiB — a 7× shuffle cut at
    * only ×10, and the gap is quadratic in k).
    */
  def maxDupSpan(docs: DataFrame, textCol: String, idCol: String,
      baseLen: Int = 32, maxExt: Int = 160): DataFrame = {
    require(maxExt > baseLen, "maxExt must exceed baseLen")
    val (pos, levels) = dyadicRanks(docs, textCol, idCol, baseLen)
    val rank = levels.last._2
    val pairs = rank.as("a").join(rank.as("b"),
        col("a.rank") === col("b.rank") && col("a.p") < col("b.p"))
      .select(col("a.p").as("pa"), col("b.p").as("pb"))
      .localCheckpoint(true) // two consumers: extension + the final lcp
    // staged (r20); pinned: the crossJoin'd max aggregate below and
    // the final aggregate both read lcp — unpinned, stage 2's
    // long-tail explode would run once per consumer
    val lcp = lcpStaged(pairs, pos, baseLen, maxExt).localCheckpoint(true)
    lcp.crossJoin(broadcast(lcp.agg(max(col("lcp")).as("_mx"))))
      .agg(max(col("lcp")).cast("bigint").as("max_dup_len"),
        count(lit(1)).cast("bigint").as("n_pairs"),
        sum(when(col("lcp") === col("_mx"), 1L).otherwise(0L))
          .cast("bigint").as("n_pairs_at_max"),
        coalesce(max(col("lcp")) === lit(maxExt.toLong), lit(false))
          .as("saturated"))
  }
}
