package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Text}

/** Continuous-curation master — the streaming composition of the batch
  * master chain (`x_pipeline_master`, queries/ExtK.scala): every
  * micro-batch optionally opens with the batch master's URL/domain
  * blocklist cut (stage 0, per-doc pure — off unless a urlCol and
  * blocklist are passed), then runs the quality funnel (encoding →
  * Gopher → CCNet
  * fluency against a STATIC reference model), then the FULL dedup
  * ladder of the batch master: intra-document span removal
  * ([[graft.ext.Dedup.intraDocDedupHashed]], per-doc pure — the batch
  * chain's stage 5), the STATEFUL passes against the accumulated
  * corpus (paragraph-level
  * [[graft.ext.Dedup.paragraphDedupIncremental]], whole-doc
  * [[graft.ext.Dedup.minhashDedupIncremental]], corpus-wide span
  * excision [[graft.ext.Dedup.spanDedupIncremental]] + the
  * post-dedup length floor — the batch chain's stage 8), then
  * benchmark decontamination against a static eval set, and the
  * survivors are dealt into token-balanced shards
  * ([[ShardStream.applyBatch]]) and BFD-packed into training
  * sequences ([[PackStream.applyBatch]]) — raw crawl in, packed
  * training layout out, one batch at a time. The stage list now
  * matches the batch master's 0–11 chain stage for stage (shard
  * dealing replacing the batch chain's one-shot mixture balance —
  * the documented continuous-vs-batch divergence).
  *
  * Composition semantics, stage by stage (CurateStreamSpec proves each):
  *  - funnel + intra-doc dedup + decontamination verdicts are pure
  *    per-document functions
  *    of the static model/eval set, so ANY batch split reproduces the
  *    one-shot verdicts exactly (the [[FunnelStream]] contract; the
  *    registered `x_curate_stream_funnel` replay adjudicates the
  *    cumulative fold — intra-doc token attrition included — in
  *    chained SQL);
  *  - the dedup ladder honors ARRIVAL order (earlier batch wins, the
  *    incremental faces' documented convention) — for id-ordered
  *    splits this is the batch chain's earlier-occurrence-wins rule,
  *    with the state-survivor caveat on
  *    [[graft.ext.Dedup.paragraphDedupIncremental]]; the span stage
  *    rides [[graft.ext.Dedup.spanDedupIncremental]]'s proven
  *    batch-composition equivalence (id-ordered batches reproduce the
  *    one-shot [[graft.ext.Dedup.spanDedup]] exactly);
  *  - shard dealing and BFD packing are deterministic per batch given
  *    the inherited state but NOT equivalent to one-shot layout over
  *    the union — BFD is order-sensitive and placed docs never move
  *    (the [[PackStream]] price of never repacking). Bin validity and
  *    token conservation hold at any split.
  *
  * Crash story: every stage is generation-addressed on the SAME
  * foreachBatch id ([[StateDir]]; `batchTag` for the signature
  * states), so a replayed micro-batch re-reads each stage's pre-batch
  * generation and recomputes the IDENTICAL placements and report —
  * paired with the overwrite-per-batch sink the whole driver is
  * exactly-once end to end, whichever stage the failure interrupted.
  *
  * Scale shape (100 TB, continuous): funnel = narrow per-row passes +
  * O(vocab) model broadcasts; dedup states are signature-sized (never
  * text); shard/pack states are O(nShards + open bins). Nothing the
  * driver holds grows with the corpus, so the stream runs forever.
  */
object CurateStream {

  /** Curate one micro-batch end to end. Returns (packed placements —
    * doc_id, toks, shard, bin, n_bins — for THIS batch's survivors,
    * the attrition report row: per-batch and cumulative counts for
    * every doc-dropping stage plus the intra-doc and span stages'
    * token attrition). `bytesCol` is the raw "crawl
    * bytes" text the byte-level filters see; `rawCol` the clean text
    * that is scored, deduped, and packed (the funnel discipline).
    * `intraSpan`/`spanLen`/`minKeptTokens` are the batch master's
    * stage-5/8 parameters (3 / 10 / 20 there).
    */
  def applyBatch(batch: DataFrame, statePath: String, batchId: Long,
      modelDocs: DataFrame, cutLp: Double, cutId: Long,
      evalDocs: DataFrame, rawCol: String, bytesCol: String,
      idCol: String, paraTokens: Int = 20, minTokens: Int = 5,
      paraThreshold: Double = 0.8, wholeK: Int = 3,
      wholeThreshold: Double = 0.5, decontamN: Int = 5,
      nShards: Int = 4, seqLen: Long = 64L,
      urlCol: Option[String] = None,
      blockedDomains: Seq[String] = Nil,
      intraSpan: Int = 3, spanLen: Int = 10,
      minKeptTokens: Int = 20,
      domainStatePath: Option[String] = None,
      domainMinPassFrac: Double = 0.5,
      exactSpanState: Option[Boolean] = None,
      model: Option[Text.BigramLm] = None): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    import spark.implicits._

    // 0. URL/domain blocklist — the stage the BATCH master opens with
    // (its stage 1), per-doc pure like the funnel verdicts, so every
    // composition property below is untouched; blocked docs never
    // reach any state. Off unless a urlCol + blocklist are given
    // (existing callers unchanged).
    // the domain is computed as a filter EXPRESSION, never a named
    // column — a batch already carrying url_host/url_domain/... keeps
    // its own columns untouched (no reserved names to clobber).
    // NULL/unparseable urls normalize to '' BEFORE either cut (r18):
    // the static filter's NULL predicate used to DROP such a doc while
    // the learned anti-join's never-matching NULL key KEPT it — the
    // same malformed arrival must survive or die independently of
    // which blocklist is configured. '' is not a registrable domain,
    // so under the normalization both cuts KEEP it (a blocklist can
    // only remove known-bad domains).
    def domainOf(u: String): org.apache.spark.sql.Column =
      coalesce(graft.ext.Web.registeredDomain(
        graft.ext.Web.host(col(u))), lit(""))
    val inStatic = urlCol match {
      case Some(u) if blockedDomains.nonEmpty =>
        batch.filter(!domainOf(u).isin(blockedDomains: _*))
      case _ => batch
    }
    // LEARNED blocklist (the FineWeb move): when `domainStatePath`
    // names a [[DomainStream]] state, stage 0 also cuts every domain
    // whose ACCUMULATED pass fraction sits below `domainMinPassFrac`.
    // The read is generation-addressed at THIS batch id, so the
    // composed driver (DomainStream.applyBatch then applyBatch, SAME
    // batch ids) has each curation batch judged by the rollup of
    // strictly earlier batches — deterministic under crash replay
    // (batch b's own domain write never feeds its own verdict), with
    // batch 0 seeing no rollup yet. The cut is a LEFT ANTI join
    // against the O(blocked domains) slice — broadcast-sized in any
    // real crawl, never a driver collect.
    val inUrl = (urlCol, domainStatePath) match {
      case (Some(u), Some(p)) =>
        StateDir.readGenBefore(spark, p, batchId) match {
          case Some(st) =>
            val blocked = st.filter(
                col("n_pass").cast("double") / col("n_docs").cast("double")
                  < domainMinPassFrac)
              .select(col("url_domain").as("_graft_blk_domain"))
            inStatic.join(broadcast(blocked),
              domainOf(u) === col("_graft_blk_domain"),
              "left_anti")
          case None => inStatic
        }
      case _ => inStatic
    }

    // 1–3. quality funnel: per-doc pure verdicts vs the static model
    val enc = Text.encodingQuality(inUrl, bytesCol, idCol)
      .select(col("doc_id"), col("is_clean"))
    val gph = Text.gopherRules(inUrl, bytesCol, idCol)
      .select(col("doc_id"), col("pass"))
    // `model` (r20): a pre-trained pinned handle ([[Text.bigramLmTrain]]
    // on modelDocs) skips the per-batch re-training of the split-face
    // model — the fluency cutoff's one training is shared with every
    // batch score (identical values; the double-LM-training fix)
    val lp = (model match {
        case Some(m) => Text.bigramLogProbWith(inUrl, m, rawCol, idCol)
        case None => Text.bigramLogProbUnder(inUrl, modelDocs, rawCol, idCol)
      })
      .select(col("doc_id"), col("mean_logprob"))
    val fluent = col("mean_logprob").isNotNull &&
      (col("mean_logprob") > cutLp ||
        (col("mean_logprob") === cutLp && col("doc_id") <= cutId))
    val keep = enc.join(gph, "doc_id").join(lp, Seq("doc_id"), "left")
      .filter(col("is_clean") && col("pass") && fluent)
      .select(col("doc_id"))
    val screened = inUrl
      .select(col(idCol).cast("long").as("doc_id"),
        col(rawCol).cast("string").as("text"))
      .join(keep, "doc_id")

    // 4. intra-document span removal (the batch master's stage 5 —
    // per-doc pure, so it joins the order-free funnel prefix); pinned:
    // feeds the paragraph state pass AND its own report token sum
    val intra = Dedup.intraDocDedupHashed(screened, "text", "doc_id",
        span = intraSpan)
      .select(col("doc_id"), col("deduped_text").as("text"),
        col("n_kept_tokens"))
      .localCheckpoint(true)

    // 5. paragraph dedup vs the accumulated paragraph-signature state
    val para = Dedup.paragraphDedupIncremental(intra, "text", "doc_id",
      s"$statePath/para", paraTokens, minTokens, paraThreshold,
      batchTag = Some(batchId))
    val t2 = para.select(col("doc_id"), col("deduped_text").as("text"))

    // 6. whole-doc near-dup vs the accumulated doc-signature state
    val t3 = Dedup.minhashDedupIncremental(t2, "text", "doc_id",
      s"$statePath/whole", wholeK, wholeThreshold,
      batchTag = Some(batchId))

    // 7. corpus-wide span excision vs the accumulated window state +
    // the post-dedup length floor (the batch master's stage 8).
    // `exactSpanState = Some(true)` routes through the r18 EXACT-FIRST
    // incremental face (per-batch digest collapse + closed-form member
    // reconstruction, sha-256 content-addressed state keys — exact at
    // any span length, no 64-bit birthday bound; measured ScaleBench
    // `spanincr`: content-bound ~3.5 s / ~120 MiB per batch at ×10 AND
    // ×40 clones while the fingerprint face's shuffle grows
    // arrival-bound 64 → 239 MiB, state rows identical 215182 on both
    // faces); `Some(false)` forces the fingerprint face. The DEFAULT
    // (None, r19) AUTO-SELECTS: a FRESH state directory gets the
    // exact-first sha-256 face (the production-shape choice — the
    // kmode stamp makes a later mismatched resume fail loudly, so
    // auto-selecting on empty state is safe), while an EXISTING
    // directory keeps the face it was written with (a resumed fp64
    // stream stays fp64 — the two key domains are not
    // interchangeable, and a silent face switch would skip every
    // historical excision). Either face pins its own output before
    // the append.
    val spanExact = exactSpanState.getOrElse(
      Dedup.spanStateKeyMode(spark, s"$statePath/span") match {
        case None => true            // fresh state → exact sha-256
        case Some("sha256") => true
        case _ => false              // fp64 (or legacy long) → fingerprint
      })
    val spanned = (if (spanExact)
        Dedup.spanDedupIncrementalExactFirst(t3, "text", "doc_id",
          spanLen, s"$statePath/span", batchTag = Some(batchId))
      else Dedup.spanDedupIncremental(t3, "text", "doc_id",
        spanLen, s"$statePath/span", batchTag = Some(batchId),
        hashedState = true))
      .filter(col("n_kept_tokens") >= minKeptTokens)
      .select(col("doc_id"), col("deduped_text").as("text"),
        col("n_kept_tokens"))

    // 8. benchmark decontamination (static eval set, any n-gram hit
    // drops the doc — per-doc pure, like the funnel)
    val contam = Text.contamination(spanned, evalDocs, "text", "doc_id",
        n = decontamN)
      .filter(col("contaminated")).select("doc_id")
    val t4 = spanned.join(contam, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_kept_tokens").as("toks"))
      // pin: consumed by the shard deal AND the report counts, and the
      // deal must see a FIXED input (the incremental-state lesson)
      .localCheckpoint(true)

    // 9–10. continuous training layout: LPT shard deal, per-shard BFD
    val placed = ShardStream.applyBatch(t4, s"$statePath/shards",
      col("doc_id"), col("toks"), nShards, batchId)
    val packed = PackStream.applyBatch(placed, s"$statePath/bins",
      col("shard"), col("id"), col("toks"), seqLen, batchId)
      .select(col("doc_id"), col("toks"),
        col("group").cast("long").as("shard"), col("bin"), col("n_bins"))
      .localCheckpoint(true) // pin before the report state write

    // attrition report: per-batch stage counts + generation-addressed
    // cumulative fold (the FunnelStream state discipline)
    val sc = intra.agg(count(lit(1)).cast("bigint").as("n"),
      coalesce(sum(col("n_kept_tokens")), lit(0L)).cast("bigint")
        .as("tk")).head()
    val (cnt, bIntraToks) = (sc.getLong(0), sc.getLong(1))
    val bAll = batch.agg(count(lit(1)).cast("bigint")).head().getLong(0)
    val whole = t3.agg(count(lit(1)).cast("bigint")).head().getLong(0)
    val bSpan = spanned.agg(count(lit(1)).cast("bigint")).head().getLong(0)
    val pk = packed.agg(count(lit(1)).cast("bigint").as("n"),
      coalesce(sum(col("toks")), lit(0L)).cast("bigint").as("tk")).head()
    val (bDecon, bToks) = (pk.getLong(0), pk.getLong(1))
    // selectCountersOrZero: a pre-r17 state generation lacks
    // c_intra_tokens/c_span — fold them from 0 instead of throwing
    // (StateDir's widened-schema migration rule)
    val prior = StateDir.readGenBefore(spark, s"$statePath/report", batchId)
      .map(st => StateDir.selectCountersOrZero(st,
        Seq("c_arrived", "c_screened", "c_intra_tokens", "c_whole_doc",
          "c_span", "c_curated", "c_tokens")).head())
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .getOrElse((0L, 0L, 0L, 0L, 0L, 0L, 0L))
    val c = (prior._1 + bAll, prior._2 + cnt, prior._3 + bIntraToks,
      prior._4 + whole, prior._5 + bSpan, prior._6 + bDecon,
      prior._7 + bToks)
    StateDir.writeGen(
      Seq(c).toDF("c_arrived", "c_screened", "c_intra_tokens",
        "c_whole_doc", "c_span", "c_curated", "c_tokens"),
      s"$statePath/report", batchId)
    val report = Seq((batchId, bAll, cnt, bIntraToks, whole, bSpan,
        bDecon, bToks, c._1, c._2, c._3, c._4, c._5, c._6, c._7))
      .toDF("batch_id", "n_arrived", "n_screened", "n_intra_tokens",
        "n_whole_doc", "n_span", "n_curated", "n_tokens", "c_arrived",
        "c_screened", "c_intra_tokens", "c_whole_doc", "c_span",
        "c_curated", "c_tokens")
    (packed, report)
  }

  /** The readStream runner — foreachBatch wiring on the full curation
    * modality: packed placements and the report row land in per-batch
    * output partitions (overwrite = replay-idempotent); all stage
    * states fold under `statePath`.
    */
  def curateStream(docs: DataFrame, statePath: String, outPath: String,
      checkpoint: String, modelDocs: DataFrame, cutLp: Double,
      cutId: Long, evalDocs: DataFrame, rawCol: String, bytesCol: String,
      idCol: String, nShards: Int = 4, seqLen: Long = 64L,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      model: Option[Text.BigramLm] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (packed, report) = applyBatch(batch, statePath, batchId,
          modelDocs, cutLp, cutId, evalDocs, rawCol, bytesCol, idCol,
          nShards = nShards, seqLen = seqLen, model = model)
        packed.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        report.write.mode("overwrite")
          .parquet(s"$outPath/report/batch=$batchId")
        ()
      }
      .start()
}
