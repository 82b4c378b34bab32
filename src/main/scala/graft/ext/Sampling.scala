package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus resampling for training-data mixtures
  * (SURVEY.md §2.8 extension family).
  *
  * Domain/language reweighting ("mix 20% of the English crawl with all
  * of the low-resource languages") is a standard pretraining step. RNG
  * sampling is not reproducible across runs or engines, so selection
  * here is keyed on document CONTENT: a doc survives iff
  * `fp mod 1000 < ratePerMille(group)` where `fp` is the SQL-replayable
  * rolling fingerprint ([[Text.fingerprint]]). Re-run the pipeline on
  * re-partitioned, re-ordered, or incrementally-grown input and the
  * same documents are chosen — which also makes the sample stable under
  * retries and exactly-once sinks.
  *
  * Scale: pure per-row predicate over a broadcast-sized rate table
  * (O(#groups)) — narrow, codegen'd, no shuffle.
  */
object Sampling {

  /** Per-mille keep rate for a group column, from a static mixture map.
    * Groups absent from the map get `defaultPerMille`.
    */
  def mixtureRate(group: Column, ratesPerMille: Map[String, Int],
      defaultPerMille: Int = 1000): Column =
    ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, r)) => when(group === k, lit(r)).otherwise(acc)
    }

  /** Content-keyed Bernoulli-like selection at the group's rate. */
  def mixtureKeep(fp: Column, group: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int = 1000): Column =
    pmod(fp, lit(1000)) < mixtureRate(group, ratesPerMille, defaultPerMille)

  /** Filter to the sampled subset. */
  def mixtureResample(docs: DataFrame, fp: Column, group: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int = 1000): DataFrame =
    docs.filter(mixtureKeep(fp, group, ratesPerMille, defaultPerMille))

  /** Greedy per-group token budgeting ("take N tokens per domain"):
    * keep each group's prefix, in `order`, while the running token sum
    * stays within `budget`. Prefix semantics (not best-fit) so the
    * selection is a deterministic function of the order column — use a
    * content hash as the order for reproducible corpus draws, or a
    * recency column for freshest-first. The order column must be UNIQUE
    * within each group: with ties, rows inside a tie land in
    * partition-dependent positions and the cut point stops being
    * reproducible (the query surface orders by doc_id).
    *
    * One shuffle: the running sum is a per-group ordered window, so each
    * group sorts within its partition. Group cardinality is domains/
    * languages (small); a single giant group is bounded by the budget
    * itself — rows past the first overflow are discarded by the filter,
    * and at 100 TB you'd pre-prune with a cheap per-partition partial
    * cumsum bound before the exact window.
    */
  import org.apache.spark.sql.expressions.Window
  def tokenBudget(docs: DataFrame, group: Column, weight: Column,
      order: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_cum", sum(weight).over(w))
      .filter(col("_cum") <= budget)
      .drop("_cum")
  }

  /** Temperature-scaled mixture weights (the multilingual-pretraining
    * resampling formula, e.g. mBERT/XLM-R exponent smoothing): group g
    * gets sampling weight n_g^α / Σ n_h^α — α < 1 upweights small
    * domains relative to proportional sampling. α is fixed at 1/2
    * (sqrt) so every per-group term is a SINGLE correctly-rounded IEEE
    * operation (a general pow() is libm-dependent and would diverge
    * across engines); the Σ goes through 12-decimal rounding + exact
    * decimal addition so the total is order-independent (same
    * discipline as [[Text.bm25]] — a plain double sum over groups would
    * vary with aggregation order).
    *
    * Scale: one count aggregate (O(#groups) output), one broadcast of
    * the scalar total; weights attach to groups, not rows.
    */
  def temperatureWeights(docs: DataFrame, group: Column): DataFrame = {
    val cnt = docs.groupBy(group.as("group")).agg(count(lit(1)).as("n_docs"))
      .withColumn("term",
        sqrt(col("n_docs").cast("double")).cast("decimal(20,12)"))
    val tot = cnt.agg(
      sum(col("term")).cast("decimal(38,12)").cast("double").as("z"))
    cnt.crossJoin(broadcast(tot))
      .select(col("group"), col("n_docs"),
        (col("term").cast("double") / col("z")).as("weight"))
  }

  /** Sequence packing — the standard pretraining layout step: per
    * group (language/domain/shard), documents are concatenated in
    * `order` and the token stream is cut into fixed `seqLen` training
    * sequences. A document's tokens occupy stream positions
    * [cum − tokens, cum), so its first/last sequence ids are pure
    * arithmetic on the running sum — no iterative packer, no driver
    * loop, and (unlike first-fit bin packing, whose state cannot be
    * expressed as a window) the assignment is a closed-form function of
    * the ordered prefix sums, reproducible on any partitioning and
    * replayable by a plain-SQL oracle.
    *
    * Adds: `seq_first`, `seq_last` (0-based sequence ids the doc
    * touches), `n_splits` (= seq_last − seq_first: how many sequence
    * boundaries cut through the doc). One per-group ordered window
    * shuffle — same scale shape and unique-`order` requirement as
    * [[tokenBudget]].
    */
  def packSequences(docs: DataFrame, group: Column, tokens: Column,
      order: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_cum", sum(tokens).over(w))
      .withColumn("seq_first", floor((col("_cum") - tokens) / seqLen))
      .withColumn("seq_last", floor((col("_cum") - 1) / seqLen))
      .withColumn("n_splits", col("seq_last") - col("seq_first"))
      .drop("_cum")
  }

  /** Per-SEQUENCE provenance manifest over the [[packSequences]]
    * layout — the training-loader contract [[packSequences]]' per-DOC
    * view doesn't give: one row per (group, sequence, document) span,
    * i.e. exactly which token range of sequence `seq` came from which
    * document. A loader needs this view to place attention-mask
    * boundaries (no cross-document attention inside a packed
    * sequence) and to attribute a training example back to its source
    * docs.
    *
    * Everything is CLOSED FORM on the same ordered prefix sums: a doc
    * with running sum `cum` occupies stream positions [cum − t, cum),
    * so within sequence `seq` (covering [seq·L, (seq+1)·L)) its span
    * is `start_off = max(0, cum − t − seq·L)`,
    * `end_off = min(L, cum − seq·L)` (0-based, end-exclusive, in-
    * sequence offsets). The explode is bounded: a doc emits
    * `n_splits + 1` rows (its [[packSequences]] split count + 1), so
    * output volume is O(docs + total_tokens/L) — no new shuffle class
    * beyond the one per-group ordered window both packers already
    * pay.
    *
    * Token conservation holds by construction — non-tail sequences'
    * spans sum to exactly `seqLen` because the group's stream
    * positions are covered gap-free — and is therefore adjudicable:
    * the registered query emits per-sequence sums and tail flags so
    * any drift in the arithmetic flips a value, not just a row count.
    *
    * Same unique-`order` requirement as [[tokenBudget]]; token counts
    * must be ≥ 1 — a 0-token doc occupies no positions (its
    * seq_last = seq_first − 1 would make the span explode
    * ill-defined), so the guard FAILS LOUDLY (the [[bfdPlace]]
    * discipline) instead of emitting an engine-specific row.
    *
    * Returns (grp, seq, doc_id, start_off, end_off, span_toks).
    */
  def packManifest(docs: DataFrame, group: Column, id: Column,
      tokens: Column, order: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val t0 = tokens.cast("long")
    val t = when(t0.isNull || t0 < 1, raise_error(concat(
        lit("packManifest: doc "), id.cast("string"),
        lit(" has non-positive token count — token counts must be >= 1"))))
      .otherwise(t0)
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(group.as("grp"), id.cast("long").as("doc_id"),
        t.as("_t"), sum(t).over(w).as("_cum"))
      .withColumn("seq", explode(sequence(
        floor((col("_cum") - col("_t")) / seqLen),
        floor((col("_cum") - 1) / seqLen))))
      .select(col("grp"), col("seq").cast("long").as("seq"), col("doc_id"),
        greatest(lit(0L), col("_cum") - col("_t") - col("seq") * seqLen)
          .cast("long").as("start_off"),
        least(lit(seqLen), col("_cum") - col("seq") * seqLen)
          .cast("long").as("end_off"))
      .withColumn("span_toks", col("end_off") - col("start_off"))
  }

  /** Per-(group, bin) SEQUENCE stats over a [[packBestFit]] layout —
    * one row per training sequence with its doc/token load: the input
    * every epoch-layer operator consumes (`Layout.epochOrder` /
    * `epochShards` / `writeEpochLayout`, the registered x_pack_epoch_*
    * family, AND ScaleBench's epoch section — factored ONCE so the
    * scale rows can never drift from the registered construction; the
    * shared-CTE discipline, engine side). An OVERSIZED doc
    * (> seqLen tokens) spans ceil(t/seqLen) bins: its tokens spread
    * seqLen-per-bin with the remainder in the LAST (the r18 review
    * fix — crediting the whole doc to its starting bin made
    * continuation bins read as 0-token sequences and misstated every
    * manifest); `n_docs` counts docs STARTING in the bin. Every bin id
    * in [0, group total) is covered by construction (small bins open
    * on placement; oversize spans cover their own), so no range-fill
    * join is needed. Returns (grp, bin, n_docs, n_toks).
    */
  def packedBinStats(docs: DataFrame, group: Column, id: Column,
      tokens: Column, seqLen: Long): DataFrame = {
    val asg = packBestFit(docs, group, id, tokens, seqLen)
    asg.select(col("group").as("grp"), col("bin"), col("toks"),
        col("n_bins"),
        explode(sequence(lit(0L), col("n_bins") - 1)).as("_i"))
      .select(col("grp"), (col("bin") + col("_i")).as("bin"),
        when(col("_i") === 0, 1L).otherwise(0L).as("_d"),
        when(col("_i") < col("n_bins") - 1, lit(seqLen))
          .otherwise(col("toks") - (col("n_bins") - 1) * seqLen)
          .as("_t"))
      .groupBy(col("grp"), col("bin"))
      .agg(sum(col("_d")).cast("bigint").as("n_docs"),
        sum(col("_t")).cast("bigint").as("n_toks"))
  }

  /** Best-fit-decreasing sequence packing — the whole-document
    * alternative to [[packSequences]]: documents are NOT split across
    * training sequences; instead each group's docs are packed into
    * `seqLen`-capacity bins by the classic BFD heuristic (docs in
    * (tokens DESC, id) order; each goes to the fitting bin with the
    * SMALLEST remaining capacity, ties to the lowest bin index; no fit
    * opens a new bin). BFD trades padding for zero cross-document
    * splits — the "attention waste" axis concat-and-chunk ignores —
    * and is within 11/9·OPT + 1 bins of optimal (Johnson's classic
    * bound, public).
    *
    * Oversize docs (tokens > seqLen) cannot be packed whole no matter
    * the packer: each gets ceil(tokens/seqLen) DEDICATED bins appended
    * after the group's BFD bins (again (tokens DESC, id) order), so
    * its splits are the unavoidable minimum and the bin-id space stays
    * deterministic.
    *
    * Determinism: the assignment is a pure function of the sorted doc
    * list — reproducible across partitionings and replayable step by
    * step by a recursive-CTE oracle.
    *
    * Scale shape: one shuffle on `group`, then a per-group in-memory
    * BFD at O(n log n) via a TreeSet of (remaining, bin) — the
    * sequential stream a real packer runs per OUTPUT SHARD. A group
    * here is a packer shard, not a language: compose with
    * [[shardAssign]] (deal docs into worker-sized shards first, pack
    * each shard) so no group outgrows one task — the same contract as
    * any sort-within-group operator.
    *
    * Returns one row per doc: (group, doc_id, toks, bin, n_bins) —
    * `bin` the doc's first (for oversize: starting) 0-based bin in
    * the group, `n_bins` how many bins the doc occupies (1 unless
    * oversize).
    */
  /** One group's BFD placement pass — THE shared policy kernel for the
    * batch face ([[packBestFit]]: empty seed) and the streaming face
    * ([[graft.streaming.PackStream]]: persisted open bins + counter),
    * so the two can never drift on sort key, tightest-fit rule,
    * tie-break, or oversize handling. Docs are placed in (tokens DESC,
    * id) order: each ≤ seqLen doc takes the open bin with the smallest
    * remaining ≥ tokens (ties → lowest bin id) or opens a new bin at
    * the next id; oversize docs take ceil(t/seqLen) dedicated trailing
    * ids. Returns (doc id, toks, bin, n_bins) per doc.
    */
  private[graft] def bfdPlace(docs: Array[(Long, Long)], seqLen: Long,
      openBins: Iterable[(Long, Long)],
      next0: Long): Array[(Long, Long, Long, Long)] = {
    // non-positive token counts break the engine/oracle lockstep both
    // faces promise: a negative count INCREASES a bin's remaining past
    // seqLen, and a zero-token doc fits prior full bins in the SQL
    // replay but not in this TreeSet (full bins leave the set). Fail
    // loudly (the seqLen > 0 / nShards > 0 discipline) rather than
    // place it differently than the oracle would.
    docs.find(_._2 < 1).foreach { case (docId, t) =>
      throw new IllegalArgumentException(
        s"bfdPlace: doc $docId has non-positive token count $t — " +
          "token counts must be >= 1 (filter or fix upstream)")
    }
    val sorted = docs.sortBy(d => (-d._2, d._1))
    val (small, big) = sorted.partition(_._2 <= seqLen)
    // TreeSet of (remaining, bin): rangeFrom((t, MinValue)).head = the
    // fitting bin with least remaining, ties → lowest bin id
    val bins = scala.collection.mutable.TreeSet.empty[(Long, Long)]
    openBins.foreach(bins.add)
    var next = next0
    val packed = small.map { case (docId, t) =>
      val binId = bins.rangeFrom((t, Long.MinValue)).headOption match {
        case Some(b @ (r, i)) => bins.remove(b); bins.add((r - t, i)); i
        case None =>
          val i = next; next += 1; bins.add((seqLen - t, i)); i
      }
      (docId, t, binId, 1L)
    }
    val over = big.map { case (docId, t) =>
      val n = (t + seqLen - 1) / seqLen
      val row = (docId, t, next, n)
      next += n
      row
    }
    packed ++ over
  }

  def packBestFit(docs: DataFrame, group: Column, id: Column,
      tokens: Column, seqLen: Long,
      maxDocsPerGroup: Long = 8000000L): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(maxDocsPerGroup > 0, "maxDocsPerGroup must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(group.cast("string").as("group"),
        id.cast("long").as("id"), tokens.cast("long").as("toks"))
      .as[(String, Long, Long)]
    base.groupByKey(_._1).flatMapGroups { (g, it) =>
      // a group IS a packer shard and is materialized in one task
      // (BFD is inherently sequential within a shard) — a caller who
      // skips the shard-assignment composer and feeds one hot group
      // would otherwise hit a silent executor OOM at scale. Stream the
      // iterator into the array with a loud cap instead.
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      it.foreach { d =>
        require(buf.length < maxDocsPerGroup,
          s"packBestFit: group '$g' exceeds maxDocsPerGroup=" +
            s"$maxDocsPerGroup docs — one group is packed as a single " +
            "in-task array; pre-split the corpus into packer shards " +
            "with Sampling.shardAssignDocs (the intended composer) or " +
            "raise maxDocsPerGroup if the task memory truly allows it")
        buf += ((d._2, d._3))
      }
      bfdPlace(buf.toArray, seqLen, Nil, 0L)
        .iterator.map { case (docId, t, bin, n) => (g, docId, t, bin, n) }
    }.toDF("group", "doc_id", "toks", "bin", "n_bins")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, "A-ES"): each row gets key = ln(u)/w for a uniform
    * u ∈ (0,1); the k largest keys are the sample, and the inclusion
    * probabilities match successive weighted draws without replacement.
    *
    * RNG discipline (same reasoning as [[mixtureResample]]): u is not
    * random but a 31-bit LCG step of the row's id —
    * u = ((id·1103515245 + 12345) mod 2³¹ + 1) / (2³¹ + 1) — so the
    * sample is a pure function of (id, weight): reproducible across
    * runs, partitionings, and engines, and SQL-replayable. ln goes
    * through 12-decimal rounding (the [[Text.bm25]] determinism
    * discipline) so JVM/libm last-ulp differences can't flip a rank.
    *
    * Scale: key is a narrow per-row expression; the global top-k is
    * orderBy+limit, which Spark executes as TakeOrdered (per-partition
    * top-k, merge of k-row heaps on the driver) — no global sort, no
    * single-partition window, any corpus size.
    *
    * Output: (id, weight, sel_rank) for the k selected rows,
    * sel_rank 1..k in descending key order (ties broken by id).
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val m = lit(2147483648L) // 2^31
    // reduce the id into 31 bits BEFORE the multiply: the product then
    // tops out at 2^31·1103515245 ≈ 2.4e18 < Long.MaxValue, so the
    // arithmetic never overflows for any id (DuckDB would ERROR on
    // BIGINT overflow; Spark would wrap silently — both avoided)
    val r = pmod(pmod(id.cast("long"), m) * lit(1103515245L) + lit(12345L), m)
    val u = (r + lit(1L)).cast("double") / (m + lit(1L)).cast("double")
    val lnU = log(u).cast("decimal(20,12)").cast("double")
    val key = (lnU / weight.cast("double")).cast("decimal(20,12)").cast("double")
    df.select(id.as("id"), weight.cast("double").as("weight"), key.as("_key"))
      .orderBy(col("_key").desc, col("id"))
      .limit(k)
      // rank over the k-row result only — a bounded global window (k
      // rows by construction), never over the corpus
      .withColumn("sel_rank",
        row_number().over(Window.orderBy(col("_key").desc, col("id")))
          .cast("bigint"))
      .select(col("id"), col("weight"), col("sel_rank"))
  }

  /** Per-group A-ES weighted sampling ("k docs per language, weighted
    * by length"): same deterministic LCG keys as [[weightedSample]],
    * ranked within each group — the weighted form of quota/stratified
    * sampling. One per-group window shuffle (groups are
    * languages/domains: small count, any size each).
    */
  def weightedSampleByGroup(df: DataFrame, group: Column, id: Column,
      weight: Column, kPerGroup: Int): DataFrame = {
    require(kPerGroup > 0, "kPerGroup must be positive")
    val m = lit(2147483648L) // 2^31
    val r = pmod(pmod(id.cast("long"), m) * lit(1103515245L) + lit(12345L), m)
    val u = (r + lit(1L)).cast("double") / (m + lit(1L)).cast("double")
    val lnU = log(u).cast("decimal(20,12)").cast("double")
    val key = (lnU / weight.cast("double")).cast("decimal(20,12)").cast("double")
    df.select(group.as("grp"), id.as("id"),
        weight.cast("double").as("weight"), key.as("_key"))
      .withColumn("sel_rank", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("_key").desc, col("id")))
        .cast("bigint"))
      .filter(col("sel_rank") <= kPerGroup)
      .select(col("grp"), col("id"), col("weight"), col("sel_rank"))
  }

  /** Deterministic random-negative sampling for contrastive training:
    * per anchor, `k` DIFFERENT-label candidates chosen by the
    * SQL-replayable LCG key on the (anchor, candidate) pair — the easy
    * negatives that complement
    * [[graft.ext.Similarity.hardNegatives]]' hard ones. The candidate
    * pool is thinned FIRST by an LCG bucket filter (keep ~1/`thin` of
    * cross-label pairs), so the per-anchor ranking never sees the full
    * quadratic pair space; `thin` trades pool size against cost and is
    * part of the defined (replayable) semantics.
    */
  def negativeSample(df: DataFrame, idCol: String, labelCol: String,
      k: Int, thin: Int): DataFrame = {
    val m = lit(2147483648L)
    val a = df.select(col(idCol).cast("long").as("aid"),
      col(labelCol).as("al"))
    // global pool thin by a per-CANDIDATE LCG — the pool (~n/thin rows)
    // broadcasts, so no quadratic pair space ever materializes
    val poolKey = pmod(pmod(col("cid"), m) * lit(1103515245L) +
      lit(12345L), m)
    val pool = df.select(col(idCol).cast("long").as("cid"),
        col(labelCol).as("cl"))
      .filter(pmod(poolKey, lit(thin.toLong)) === 0)
    // per-PAIR LCG ranks the pool differently for every anchor
    val pairKey = pmod(pmod(col("aid") * lit(1000003L) + col("cid"), m) *
      lit(1103515245L) + lit(12345L), m)
    val w = Window.partitionBy(col("aid")).orderBy(col("_key"), col("cid"))
    a.crossJoin(broadcast(pool))
      .filter(col("al") =!= col("cl"))
      .withColumn("_key", pairKey)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("aid").as("anchor_id"), col("al").as("anchor_label"),
        col("cid").as("negative_id"), col("cl").as("negative_label"),
        col("rank").cast("bigint").as("rank"))
  }

  /** Water-filling token-budget allocation across domains: each domain
    * wants `w_d/Σw` of the `total` budget but can supply at most
    * `cap_d` tokens; saturated domains take their cap and their unused
    * share is redistributed among the rest — iterated a fixed `rounds`
    * times (each round can only saturate more domains, so `rounds` ≥
    * the cascade depth fixes the set; leftovers beyond that are a
    * documented property of fixed-round truncation, same discipline as
    * the other fixed-point operators). All arithmetic is BIGINT with
    * floor division, so allocations replay exactly as unrolled CTEs.
    *
    * This is the mixture-planning step BEFORE [[mixtureResample]] /
    * [[tokenBudget]]: it turns target weights + measured domain sizes
    * into feasible per-domain token budgets.
    *
    * Scale shape: the state is O(#domains) rows; each round is one
    * two-value aggregate broadcast back — nothing data-sized moves.
    */
  def waterFill(domains: DataFrame, domainCol: String, capCol: String,
      wCol: String, total: Long, rounds: Int = 4): DataFrame = {
    require(rounds > 0)
    var st = domains.select(col(domainCol).as("domain"),
        col(capCol).cast("long").as("cap"), col(wCol).cast("long").as("w"))
      .withColumn("sat", lit(false))
      .transform(Iter.pin)
    def agg(s: DataFrame) = s.agg(
      sum(when(col("sat"), col("cap")).otherwise(0L)).cast("long").as("used"),
      sum(when(!col("sat"), col("w")).otherwise(0L)).cast("long").as("wsum"))
    // the product rides in DECIMAL(38,0): token-scale budgets times
    // large weights overflow BIGINT and would wrap silently with ANSI
    // off; div on decimals is still exact integral division
    def tentative: org.apache.spark.sql.Column =
      when(col("wsum") === 0, col("cap"))
        .otherwise(expr(
          """cast((cast(w as decimal(19,0)) *
            |       cast(wtotal - used as decimal(19,0))) div
            |      cast(wsum as decimal(19,0)) as bigint)""".stripMargin))
    for (_ <- 1 to rounds) {
      st = st.crossJoin(broadcast(agg(st)))
        .withColumn("wtotal", lit(total))
        .withColumn("sat", col("sat") || tentative >= col("cap"))
        .select(col("domain"), col("cap"), col("w"), col("sat"))
        .transform(Iter.pin)
    }
    st.crossJoin(broadcast(agg(st)))
      .withColumn("wtotal", lit(total))
      .select(col("domain"), col("cap"), col("w"),
        col("sat").as("saturated"),
        when(col("sat"), col("cap")).otherwise(tentative)
          .cast("bigint").as("alloc"))
  }

  /** Cluster-balanced diversity sampling over an embedding column —
    * the coverage-preserving subset selection of the DataComp/SemDeDup
    * line of work: flat random sampling over-draws from dense semantic
    * regions, so quotas are allocated per embedding CLUSTER,
    * proportional to √(cluster size) (dense clusters are down-weighted,
    * sparse ones over-represented relative to their mass), and each
    * cluster contributes its most CENTRAL members first (highest cosine
    * to the centroid — the cluster's best exemplars, the SemDeDup
    * survivor convention).
    *
    * Deterministic end-to-end, same discipline as the IVF family:
    * first-`nlist` centroids by id, cosine-argmax assignment with id
    * tie-breaks, √-weights canonicalized to DECIMAL(20,12) and summed
    * exactly (float sum order would be partition-dependent), quota =
    * ⌊total·w/Σw⌋ computed in identical IEEE doubles both engines, so
    * the whole draw — assignment, quota, rank, keep flag — is
    * SQL-replayable.
    *
    * Scale shape: centroids broadcast (nlist·dim); assignment is the
    * one crossJoin-with-broadcast every IVF operator pays; quotas are
    * O(nlist) rows; the per-cluster rank is a window over the bucket
    * key — the only data-sized exchange.
    */
  /** `release = false` returns the LAZY plan and leaves the assignment
    * cache to the caller (the plan-gate / compose-further surface);
    * the default eagerly checkpoints the (narrow, O(n)-row) result and
    * unpersists the cache so nothing lingers in the CacheManager.
    */
  def diversitySample(emb: DataFrame, idCol: String, vecCol: String,
      total: Long, nlist: Int = 16, release: Boolean = true): DataFrame = {
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    val base = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nn", Similarity.norm(col("nv")))
    val centroidDf = base.orderBy(col("nid")).limit(nlist)
      .select(col("nid").as("cid"), col("nv").as("cv"))
      .select(col("cid"), col("cv"), Similarity.norm(col("cv")).as("cn"))
    val assigned = Similarity.assignToCentroids(base, centroidDf)
      // re-derive the winning similarity (identical operands to the
      // argmax, so bit-identical): rank-by-centrality needs it
      .join(broadcast(centroidDf), col("bucket") === col("cid"))
      .withColumn("csim",
        Similarity.dot(col("nv"), col("cv")) / (col("nn") * col("cn")))
      .select(col("nid"), col("bucket"), col("csim"))
      // fans out to sizes (→ wsum, quotas) AND the rank window —
      // uncached, the assignment crossJoin re-runs per consumer
      .cache()
    val sizes = assigned.groupBy(col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("nc"))
    val sqrtCanon = sqrt(col("nc").cast("double")).cast("decimal(20,12)")
    val wsum = sizes.agg(sum(sqrtCanon).cast("decimal(38,12)").as("ws"))
    val quotas = sizes.crossJoin(broadcast(wsum))
      .withColumn("quota", least(col("nc"),
        floor(lit(total).cast("double") * sqrtCanon.cast("double") /
          col("ws").cast("double")).cast("bigint")))
      .select(col("bucket").as("qb"), col("nc"), col("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("csim").desc, col("nid"))
    // eager checkpoint (O(n) narrow rows) so the assignment cache is
    // released on return instead of lingering for the session lifetime
    val out0 = assigned.withColumn("rank", row_number().over(w).cast("bigint"))
      .join(broadcast(quotas), col("bucket") === col("qb"))
      .select(col("nid").as("vec_id"), col("bucket"), col("nc"),
        col("quota"), col("rank"), (col("rank") <= col("quota")).as("kept"))
    if (!release) out0
    else {
      val out = out0.localCheckpoint(true)
      assigned.unpersist()
      out
    }
  }

  /** Neyman-allocation stratified sampling (Neyman 1934): a fixed
    * budget split across strata ∝ n_h·σ_h — variable strata get more
    * budget than uniform-proportional would give them, which minimizes
    * the variance of the pooled estimate. The identity
    * n_h·σ_h = √(n_h·Σx² − S²) keeps the weight computable from EXACT
    * decimal power sums (one sqrt of an exact double per stratum);
    * weights are canonicalized to DECIMAL(20,12) before the exact
    * weight-sum so no float aggregation order can leak in, and each
    * stratum's quota is ⌊budget·w_h/Σw⌋ capped at n_h — identical
    * IEEE arithmetic on both engines. Row selection inside a stratum
    * is rank over the 31-bit xorshift mix of the id (deterministic
    * "random" — the SimHash/geo recipe), tie-broken by id.
    *
    * Scale shape: one exact power-sum aggregate per stratum, an
    * O(#strata) broadcast of quotas, and one rank window per stratum —
    * the [[diversitySample]] shape with variance-aware quotas.
    */
  def neymanSample(df: DataFrame, stratum: Column, id: Column,
      value: Column, budget: Long): DataFrame = {
    val base = df.select(stratum.as("h"), id.cast("bigint").as("id"),
      value.cast("decimal(12,2)").as("x"))
    val stats = base.groupBy(col("h")).agg(
      count(lit(1)).cast("bigint").as("n_h"),
      sum(col("x")).cast("decimal(38,2)").as("s"),
      sum((col("x") * col("x")).cast("decimal(38,4)")).cast("decimal(38,4)")
        .as("ss"))
    // Every decimal→double crossing goes through the VARCHAR roundtrip
    // (CAST(CAST(d AS VARCHAR) AS DOUBLE)): both engines parse the same
    // exact decimal text to the correctly-rounded nearest double,
    // whereas DuckDB's direct decimal→double (int128→double, then
    // /10^scale) double-rounds once the scaled integer exceeds 2^53 —
    // w's 12-digit scale crosses that at any realistic corpus. With
    // identical doubles in, the products, sqrt, and floor are plain
    // IEEE ops — bit-identical on both engines.
    def d2d(c: Column) = c.cast("string").cast("double")
    // greatest(0, ·): a near-constant stratum can go epsilon-negative
    // in double rounding, and sqrt(−ε) = NaN would null the weight
    val w = sqrt(greatest(lit(0.0),
      col("n_h").cast("double") * d2d(col("ss")) -
        d2d(col("s")) * d2d(col("s"))))
      .cast("decimal(20,12)")
    val weighted = stats.withColumn("w", w)
    val wsum = weighted.agg(sum(col("w")).cast("decimal(38,12)").as("ws"))
    val quotas = weighted.crossJoin(broadcast(wsum))
      .select(col("h"), col("n_h"),
        d2d(col("w")).as("w_h"),
        least(col("n_h"),
          floor(lit(budget).cast("double") * d2d(col("w")) /
            d2d(col("ws"))).cast("bigint")).as("quota"))
    val mix = {
      val v1 = (col("id") * lit(2654435761L) + lit(97L)) % lit(2147483648L)
      val x1 = v1.bitwiseXOR(shiftright(v1, 13))
      val v3 = (x1 * lit(1103515245L)) % lit(2147483648L)
      v3.bitwiseXOR(shiftright(v3, 17))
    }
    val wRank = Window.partitionBy(col("h"))
      .orderBy(col("mx"), col("id"))
    base.withColumn("mx", mix)
      .withColumn("rank", row_number().over(wRank).cast("bigint"))
      .join(broadcast(quotas), "h")
      .select(col("h"), col("id"), col("n_h"), col("w_h"), col("quota"),
        col("rank"), (col("rank") <= col("quota")).as("kept"))
  }

  /** Farthest-point sampling (Gonzalez 1985 k-center greedy): pick k
    * vectors maximizing pairwise spread — seed at the min id, then
    * repeatedly take the point FARTHEST (cosine distance 1 − cos) from
    * everything selected so far, tie-broken by id. The classic coreset
    * selector for "cover the embedding space with k exemplars"
    * (training-subset seeding, eval-set design, cluster init); each
    * pick's distance at selection is the k-center coverage radius
    * bound after that round.
    *
    * The greedy recurrence unrolls as plan rounds with the INCREMENTAL
    * min-distance update: round i joins the candidate set with the ONE
    * new pick (a broadcast single row) and takes
    * `mind := least(mind, dist(·, pick))` — never re-scoring against
    * the whole selected set, so each round is one narrow map + one
    * argmax aggregate. The argmax is `max(struct(mind, −id))` (max
    * distance, then min id — exact on bit-identical doubles), which
    * the oracle replays as ORDER BY mind DESC, id LIMIT 1.
    *
    * Scale shape: k rounds × (one broadcast-1-row join + one all-reduce
    * argmax) over the candidate pool — O(k·n) distance evaluations
    * total, the textbook FPS cost; nothing quadratic, no data-sized
    * window. k is a small constant; the plan's self-referencing lineage
    * doubles per round (the MMR/Lloyd unroll trade-off), so keep
    * k ≲ 8 per call at this pool granularity.
    */
  def farthestPointSample(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    import graft.ext.Similarity.dot
    graft.plans.GraftExtensions.ensure(emb.sparkSession)
    val e = emb.select(col(idCol).cast("bigint").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val seedId = e.agg(min(col("id"))).first().getLong(0)
    val seed = e.filter(col("id") === seedId)
    def distTo(pv: Column, pn: Column): Column =
      lit(1.0) - dot(col("v"), pv) / (col("nrm") * pn)
    var picks = seed.select(col("id"), col("v"), col("nrm"),
      lit(1).as("pick_rank"), lit(Double.MaxValue).as("mind"))
    var cand = e.filter(col("id") =!= seedId)
      .crossJoin(broadcast(seed.select(col("v").as("pv"), col("nrm").as("pn"))))
      .select(col("id"), col("v"), col("nrm"),
        distTo(col("pv"), col("pn")).as("mind"))
    for (round <- 2 to k) {
      val top = cand
        .agg(max(struct(col("mind"), (-col("id")).as("nid"))).as("m"))
        .select(col("m.mind").as("pmind"), (-col("m.nid")).as("pid"))
      val pick = cand.join(broadcast(top), col("id") === col("pid"))
        .select(col("id"), col("v"), col("nrm"),
          lit(round).as("pick_rank"), col("pmind").as("mind"))
      picks = picks.unionByName(pick)
      // per-round pin (Iter.pin: reliable checkpoint() under the
      // session flag) — without it the k broadcast joins nest into one
      // exponential lineage
      if (round < k) cand = cand
        .crossJoin(broadcast(pick.select(col("v").as("pv"), col("nrm").as("pn"),
          col("id").as("pid"))))
        .filter(col("id") =!= col("pid"))
        .select(col("id"), col("v"), col("nrm"),
          least(col("mind"), distTo(col("pv"), col("pn"))).as("mind"))
        .transform(Iter.pin)
    }
    picks.select(col("pick_rank"), col("id"),
      when(col("pick_rank") === 1, lit(null).cast("double"))
        .otherwise(col("mind")).as("sel_dist"))
  }

  /** DSIR-style importance resampling (Xie et al., NeurIPS 2023 —
    * "Data Selection for Language Models via Importance Resampling",
    * the hashed-n-gram method behind domain-targeted pretraining-data
    * selection): each document is scored by the log-likelihood ratio
    * of a TARGET bucket model vs the RAW corpus model over hashed
    * BIGRAM features,
    *
    *   w(d) = Σ_{g ∈ bigrams(d)} [ln p̂_T(b(g)) − ln p̂_R(b(g))]
    *
    * with add-1 smoothing over `buckets` hash buckets, and the top-k
    * selection uses GUMBEL keys (weight + Gumbel noise), which is
    * exactly sampling-without-replacement ∝ exp(w) — the paper's
    * resampling step. The Gumbel noise is −ln(−ln u) of the LCG
    * uniform of the doc id (the [[weightedSample]] RNG discipline), so
    * the draw is a pure function of (id, corpus): reproducible across
    * runs/partitionings and SQL-replayable.
    *
    * Determinism: bucket log-ratios are differences of canonicalized
    * lns of EXACT integers; per-doc sums ride DECIMAL(30,14) (order-
    * free); both ln layers of the Gumbel are canonicalized.
    *
    * Scale shape: one gram explode (narrow), two bucket aggregates
    * whose key space is `buckets` (broadcast-sized), one broadcast
    * join back, one map-side-combinable per-doc sum, and a distributed
    * TakeOrdered top-k. Nothing data-sized is ever broadcast.
    *
    * Returns the k selected docs: (doc_id, n_grams, weight, key,
    * sel_rank).
    */
  def dsirSelect(docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, k: Int, buckets: Int = 256,
      release: Boolean = true): DataFrame = {
    require(k > 0 && buckets > 1)
    def canon(c: Column) = c.cast("decimal(20,12)").cast("double")
    def lnC(c: Column) = canon(log(c.cast("double")))
    // the bucketed gram table fans out five ways (two bucket models,
    // two gram totals, the per-doc sums) — cache for the computation,
    // release before returning the (k-row, eagerly-selected) result
    // the >= 2 guard matters: sequence(1, 0) is the DESCENDING array
    // [1, 0] in Spark (step defaults to -1 when start > stop), so an
    // unguarded single-token doc would emit two null "bigrams" that
    // inflate both gram totals and land in a spurious null bucket —
    // while the oracle's range(1, len(w)) is empty for the same doc
    val grams = docs.select(col(idCol).cast("long").as("doc_id"),
        isTarget.as("tgt"),
        explode(expr(
          "case when size(split(" + textCol + ", ' ')) >= 2 then " +
            "transform(sequence(1, size(split(" + textCol +
            ", ' ')) - 1), i -> concat(split(" + textCol +
            ", ' ')[i - 1], ' ', split(" + textCol + ", ' ')[i])) " +
            "else array() end"))
          .as("gram"))
      .withColumn("bucket", pmod(Text.fingerprint(col("gram")), lit(buckets)))
      .select(col("doc_id"), col("tgt"), col("bucket"))
      .cache()
    val tCnt = grams.filter(col("tgt")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("ct"))
    val rCnt = grams.filter(!col("tgt")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"))
    val nT = grams.filter(col("tgt")).count()
    val nR = grams.filter(!col("tgt")).count()
    // per-bucket smoothed log-ratio: all four ln arguments are exact
    // integers, so every term replays
    val ratio = tCnt.join(rCnt, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (lnC(coalesce(col("ct"), lit(0L)) + lit(1L)) -
          lnC(coalesce(col("cr"), lit(0L)) + lit(1L)) +
          lnC(lit(nR + buckets)) - lnC(lit(nT + buckets))).as("delta"))
    val perDoc = grams.filter(!col("tgt"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(ratio), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("bigint").as("n_grams"),
        sum((col("cnt").cast("double") * col("delta"))
          .cast("decimal(30,14)")).cast("decimal(38,14)")
          .cast("double").as("weight"))
    val m = lit(2147483648L)
    val r = pmod(pmod(col("doc_id"), m) * lit(1103515245L) + lit(12345L), m)
    val u = (r + lit(1L)).cast("double") / (m + lit(1L)).cast("double")
    val gumbel = -canon(log((-canon(log(u))).cast("double")))
    val out0 = perDoc
      .withColumn("key", col("weight") + gumbel)
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .withColumn("sel_rank", row_number().over(
        Window.orderBy(col("key").desc, col("doc_id"))).cast("bigint"))
      .select(col("doc_id"), col("n_grams"), col("weight"), col("key"),
        col("sel_rank"))
    // release = false keeps the lazy plan, cache to the caller (the
    // plan-gate surface — the diversitySample convention)
    if (!release) out0
    else {
      val out = out0.localCheckpoint(true)
      grams.unpersist()
      out
    }
  }

  /** Token-balanced training-shard assignment: documents ranked by
    * (token weight DESC, id) and dealt round-robin across `nShards` —
    * the deterministic longest-processing-time approximation that
    * keeps every shard's token mass within one max-document of the
    * mean (exactly replayable, unlike hash assignment which balances
    * only in expectation, or greedy best-fit whose state isn't a
    * window function). Returns one row per shard: doc count, token
    * sum, and the shard's share of the total.
    *
    * Scale shape: one global ordered rank — executed as a range-
    * partitioned sort (no single-partition window: uses
    * [[graft.ext.Rank.globalRowNumber]]) — then an O(nShards)
    * aggregate.
    */
  /** Per-document face of [[shardAssign]]: the same deterministic
    * (tokens DESC, id)-ranked round-robin deal, returning each doc's
    * placement (id, toks, shard) instead of the per-shard totals —
    * the form downstream per-shard operators ([[packBestFit]], the
    * writer) compose with.
    */
  def shardAssignDocs(docs: DataFrame, id: Column, tokens: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0)
    val base = docs.select(id.cast("long").as("id"),
      tokens.cast("long").as("toks"))
    Rank.globalRowNumber(base, Seq(col("toks").desc, col("id").asc))
      .withColumn("shard", pmod(col("rn") - 1, lit(nShards.toLong)))
      .select(col("id"), col("toks"), col("shard"))
  }

  def shardAssign(docs: DataFrame, id: Column, tokens: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0)
    val base = docs.select(id.cast("long").as("id"),
      tokens.cast("long").as("toks"))
    shardAssignDocs(docs, id, tokens, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("toks")).cast("bigint").as("token_sum"))
      .crossJoin(broadcast(base.agg(sum(col("toks")).cast("bigint")
        .as("total"))))
      .select(col("shard"), col("n_docs"), col("token_sum"),
        (col("token_sum").cast("double") / col("total").cast("double"))
          .as("share"))
  }
}
