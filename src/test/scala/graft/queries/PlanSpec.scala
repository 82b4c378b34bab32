package graft.queries

import graft.SparkSuite

/** Physical-plan quality gates: these assert the plans we WANT, not
  * just plans that produce correct rows — pushdown, pruning, broadcast
  * selection, partial aggregation (the 100 TB checklist).
  */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).run(spark, dir).queryExecution.executedPlan.toString

  test("q6 pushes filters and prunes columns at the parquet scan") {
    val p = plan("q6_revenue_forecast")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      s"no pushed filters in:\n$p")
    // only the needed columns are read
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"scan reads unneeded columns: $readSchema")
  }

  test("q3 broadcasts the filtered dimension") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("q5 broadcasts nation/region") {
    val p = plan("q5_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q1 uses partial (map-side) aggregation") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_"),
      s"no partial aggregation in:\n$p")
  }

  test("q4 semi join stays a semi join (no row explosion)") {
    val p = plan("q4_semi_join")
    assert(p.contains("LeftSemi"), s"semi join lost:\n$p")
  }

  test("q7 anti join stays an anti join") {
    val p = plan("q7_anti_join")
    assert(p.contains("LeftAnti"), s"anti join lost:\n$p")
  }

  test("q2 top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q2_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$p")
  }

  test("q20 range join broadcasts the band table") {
    val p = plan("q20_range_join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"band table not broadcast:\n$p")
  }

  test("q35 correlated-subquery rewrite broadcasts the per-nation averages") {
    val p = plan("q35_correlated")
    assert(p.contains("BroadcastHashJoin"), s"nation averages not broadcast:\n$p")
  }

  test("q36 unpivot stays narrow (Expand, no pre-sort shuffle)") {
    val p = plan("q36_unpivot")
    assert(p.contains("Expand"), s"unpivot not an Expand:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"unpivot shuffles more than the final sort:\n$p")
  }

  test("near-dup candidate generation never degrades to a cartesian product") {
    for (name <- Seq("x_dedup_ngram_jaccard", "x_dedup_minhash_lsh",
        "x_dedup_simhash", "x_dedup_embedding_lsh", "x_dedup_winnow",
        "x_source_overlap")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
    }
  }

  test("near-dup pipelines stay within their shuffle budgets") {
    // the stage-collapse work (single-pass profiles, slim band joins)
    // is perf-critical: these budgets catch an accidental return to the
    // many-exchange shapes (ngram was 10+ exchanges before the rework)
    val budgets = Seq(
      "x_dedup_ngram_jaccard" -> 7,
      "x_dedup_minhash_lsh" -> 10,
      "x_dedup_embedding_lsh" -> 6,
      "q22_asof_join" -> 3)
    for ((name, budget) <- budgets) {
      val p = plan(name)
      val exchanges = p.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= budget,
        s"$name plans $exchanges exchanges (budget $budget):\n$p")
    }
  }

  test("corpus rankers broadcast the vocabulary-sized sides") {
    for (name <- Seq("x_text_tfidf", "x_text_bm25")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$name does not broadcast df/stats:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("pipeline composition stays at two data shuffles + sort") {
    val p = plan("x_pipeline_quality_filter")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 3, s"composition shuffles too much ($exchanges):\n$p")
  }

  test("curation pipeline: all signals narrow, two data shuffles + sort, no joins") {
    // quality + repetition (gram_stats) + decontamination (gram_overlap)
    // + mixture keep are ONE per-row projection; only exact-dedup
    // (text) and per-lang stats shuffle. A join appearing here means a
    // signal regressed to the join-back-by-doc_id shape.
    val p = plan("x_pipeline_curate")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 3, s"curation shuffles too much ($exchanges):\n$p")
    assert(!p.contains("Join"), s"curation grew a join:\n$p")
  }

  test("decontamination probes the eval grams via broadcast, never a shuffle join") {
    val p = plan("x_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval gram set not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus side shuffled for the probe:\n$p")
  }

  test("PII redaction is a narrow per-row pass (no shuffle except the output sort)") {
    val p = plan("x_pii_redact")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"redaction plans $exchanges exchanges:\n$p")
    assert(!p.contains("Join"), s"single-table redaction grew a join:\n$p")
  }

  test("repetition signals and mixture resampling stay within shuffle budgets") {
    // repetition: narrow gram_stats pass + output sort = 1;
    // mixture: per-row predicate + one lang agg + sort = 2
    for ((name, budget) <- Seq("x_text_repetition" -> 1, "x_sample_mixture" -> 2)) {
      val p = plan(name)
      val exchanges = p.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= budget,
        s"$name plans $exchanges exchanges (budget $budget):\n$p")
    }
  }

  test("behavior analytics shuffle once on user_id (plus output agg/sort)") {
    // funnel: chained per-user window minima must share ONE user_id
    // exchange (a per-stage shuffle or a join chain means the
    // fold-into-windows shape regressed); the only other exchange is
    // the final single-row aggregate. sessionize: lag + running sum +
    // landing/exit row_numbers all ride the same user_id exchange.
    for ((name, budget) <- Seq("q62_funnel" -> 2, "q64_sessionize" -> 2)) {
      val p = plan(name)
      val hashEx = p.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning"))
      val exchanges = p.linesIterator.count(_.contains("Exchange"))
      assert(hashEx <= 1, s"$name re-shuffles the user key ($hashEx):\n$p")
      assert(exchanges <= budget,
        s"$name plans $exchanges exchanges (budget $budget):\n$p")
      assert(!p.contains("Join"), s"$name grew a join:\n$p")
    }
  }

  test("grouped top-k aggregates partially and never windows the full input") {
    val p = plan("q68_group_topk")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"typed TopK aggregator not planned as an aggregate:\n$p")
    assert(p.contains("partial"), s"no partial (map-side) phase:\n$p")
    assert(!p.contains("Window"), s"top-k regressed to a window:\n$p")
  }

  test("weighted sampling plans TakeOrdered, never a global sort of the corpus") {
    val p = plan("x_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for A-ES top-k:\n$p")
  }

  test("round-5 interval/range joins never degrade to a cartesian product") {
    for (name <- Seq("x_scd2_lookup", "x_attribution")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name went cartesian:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
        || p.contains("ShuffledHashJoin"), s"$name lost its equi-join:\n$p")
    }
  }

  test("boilerplate removal: flag join broadcasts, doc re-assembly aggregates partially") {
    val p = plan("x_boilerplate")
    assert(p.contains("BroadcastHashJoin"),
      s"boilerplate flag set not broadcast:\n$p")
    assert(p.contains("partial"), s"no map-side partial phase:\n$p")
  }

  test("round-6 operators keep their scale shapes") {
    // record linkage: blocked equi-join, never a cartesian
    val link = plan("x_record_linkage")
    assert(!link.contains("CartesianProduct"),
      s"record linkage went cartesian:\n$link")
    assert(link.contains("SortMergeJoin") || link.contains("BroadcastHashJoin")
      || link.contains("ShuffledHashJoin"),
      s"record linkage lost its blocked equi-join:\n$link")

    // int8 encode: scales folded into literals — the encode pass itself
    // adds NO exchange beyond calibration's (pos-keyed) aggregate and
    // the output sort
    val q = plan("x_embed_quantize")
    val qEx = q.linesIterator.count(_.contains("Exchange"))
    assert(qEx <= 4, s"quantize encode plans $qEx exchanges:\n$q")

    // zipf fit: token count aggregates partially (map-side combine) and
    // the topR cut is a TakeOrdered, not a global sort of the vocab
    val z = plan("x_zipf_fit")
    assert(z.contains("partial"), s"zipf token count not partial:\n$z")
    assert(z.contains("TakeOrderedAndProject"),
      s"zipf topR is not a TakeOrdered:\n$z")
  }

  test("round-6 statistical audits keep their scale shapes") {
    // perceptual near-dup pairs: banded equi-join, never all-pairs
    val ph = plan("x_multimodal_phash_pairs")
    assert(!ph.contains("CartesianProduct"),
      s"phash pairs went cartesian:\n$ph")

    // basket rules: within-txn equi-join + partial pair counts; the
    // item-count side broadcasts back onto the (filtered) pairs
    val bk = plan("x_basket_rules")
    assert(!bk.contains("CartesianProduct"), s"basket went cartesian:\n$bk")
    assert(bk.contains("partial"), s"basket counts not partial:\n$bk")

    // triangle counting's joins are equi-joins on node/pair keys
    val tri = plan("x_adamic_adar")
    assert(!tri.contains("CartesianProduct"),
      s"wedge join went cartesian:\n$tri")

    // ROC-AUC: the only exchanges are the score groupBy and the
    // (deliberate, distinct-scores-sized) cumulative window
    val auc = plan("x_roc_auc")
    assert(auc.contains("partial"), s"AUC score counts not partial:\n$auc")
  }

  test("round-7 IVF hard negatives never go quadratic") {
    // the scale contract vs the brute-force baseline: no cartesian, no
    // broadcast of the embedding table — the only nested-loop joins are
    // the two 16-row centroid crossJoins, and candidates come from an
    // equi-join on bucket
    val p = plan("x_hard_negatives_ivf")
    assert(!p.contains("CartesianProduct"),
      s"IVF hard negatives went cartesian:\n$p")
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"$bnlj nested-loop joins (expected ≤2 centroid " +
      s"crossJoins):\n$p")
    assert(p.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("bucket")),
      s"bucket equi-join lost:\n$p")
  }

  test("round-7 span dedup keeps its scale shape") {
    // window ranking is a min-agg groupBy (partial aggregation absorbs
    // hot boilerplate windows map-side), candidates join on equi keys
    // only — no cartesian anywhere in the pipeline
    for (q <- Seq("x_dedup_span", "x_dedup_intra_doc")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q degraded to a non-equi join:\n$p")
      assert(p.contains("partial_min") || p.contains("partial min") ||
        p.linesIterator.exists(l => l.contains("HashAggregate") &&
          l.contains("min")),
        s"$q first-occurrence min lost partial aggregation:\n$p")
    }
  }

  test("round-8 hashed span dedup and LSH stage counts keep their scale shapes") {
    // fingerprint-keyed span dedup: the first-occurrence group must
    // STILL partial-aggregate (hot 8-byte keys combine map-side) and
    // stay equi-join-only; additionally the shuffled window key is the
    // bigint fingerprint, never the window text
    val p = plan("x_dedup_span_hashed")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"hashed span dedup degraded to a non-equi join:\n$p")
    assert(p.contains("partial_min") || p.contains("partial min") ||
      p.linesIterator.exists(l => l.contains("HashAggregate") &&
        l.contains("min")),
      s"hashed first-occurrence min lost partial aggregation:\n$p")
    assert(p.linesIterator.exists(l => l.contains("Exchange") &&
      l.contains("wkey")), s"fingerprint key not the shuffle key:\n$p")
    // stage-count instrumentation rides the same banded equi-join as
    // the pair query — instrumenting must not change the join shape
    val ps = plan("x_dedup_embedding_lsh_stages")
    assert(!ps.contains("CartesianProduct"),
      s"LSH stage counts planned a cartesian:\n$ps")
    assert(ps.contains("bit_count"),
      s"Hamming prefilter left the stage-count plan:\n$ps")
  }

  test("round-7 diversity sample and curate v3 keep their scale shapes") {
    // diversity sample: the only nested-loop joins are the nlist-row
    // centroid assignment crossJoin (cached, but its subtree prints
    // once per cache reference) and the 1-row wsum quota crossJoin —
    // each a bounded broadcast, never data×data. Since r09 the public
    // face eagerly checkpoints (cache-lifecycle hygiene), so the gate
    // inspects the LAZY plan via release = false
    val p = graft.ext.Sampling.diversitySample(
        graft.queries.H.t(spark, dir, "embeddings"),
        "vec_id", "embedding", total = 100L, nlist = 16, release = false)
      .orderBy(org.apache.spark.sql.functions.col("vec_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"diversity went cartesian:\n$p")
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 4, s"$bnlj nested-loop joins (expected <=4 bounded " +
      s"broadcasts):\n$p")
    assert(p.contains("vec_dot"), s"assignment lost the codegen'd kernel:\n$p")
    // curate v3: two chained span-dedup passes — equi-joins only.
    // The registered query eagerly checkpoints since r09, so the
    // SUBSTANTIVE join-shape gates live on the component tests
    // (spanDedupHashed / intraDocDedupHashed above); this remains as
    // a smoke check that the final report assembly stays non-cartesian
    val p3 = plan("x_pipeline_curate_v3")
    assert(!p3.contains("CartesianProduct") &&
      !p3.contains("BroadcastNestedLoopJoin"),
      s"curate v3 degraded to a non-equi join:\n$p3")
  }

  test("round-8 wave-2 operators keep their scale shapes") {
    // HBOS: the top-k must be a distributed TakeOrdered, not a global
    // sort or a full-corpus window funnel; the stats/density joins
    // broadcast their O(#features·bins) sides
    val ph = plan("x_hbos_outliers")
    assert(ph.contains("TakeOrderedAndProject"),
      s"hbos top-k is not TakeOrdered:\n$ph")
    assert(ph.contains("BroadcastHashJoin"),
      s"hbos lost the broadcast density join:\n$ph")
    // ACF: the lag fan-out is a 7-row broadcast; the lag join itself
    // must stay an equi-join on (grp, idx)
    val pa = plan("x_ts_acf")
    assert(!pa.contains("CartesianProduct"), s"acf went cartesian:\n$pa")
    // CUSUM: no join wider than the O(#groups) totals broadcast, and
    // the daily aggregate combines map-side
    val pc = plan("x_ts_cusum")
    assert(!pc.contains("CartesianProduct") &&
      !pc.contains("BroadcastNestedLoopJoin"),
      s"cusum degraded to a non-equi join:\n$pc")
    assert(pc.contains("partial_sum") || pc.contains("partial"),
      s"cusum daily aggregate lost map-side combine:\n$pc")
    // MMR / FPS: pool-bounded rounds — nothing may go cartesian
    // (the anchor fan-out is the one permitted bounded nested-loop)
    val pm = plan("x_mmr_rerank")
    assert(!pm.contains("CartesianProduct"), s"mmr went cartesian:\n$pm")
  }

  test("round-9 operators keep their scale shapes") {
    // IVF margin mining: candidates come from the bucket equi-join;
    // the only nested-loop joins are the two nlist-row centroid
    // broadcasts (assignment + probing), each printed once per cache
    // reference of the fanned-out candidate set — never data×data.
    // The public face eagerly checkpoints, so the gate inspects the
    // LAZY plan via release = false
    val embT = graft.queries.H.t(spark, dir, "embeddings")
    val pm = graft.ext.Similarity.marginPairsIvf(
        embT.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 0),
        embT.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0, release = false)
      .queryExecution.executedPlan.toString
    assert(!pm.contains("CartesianProduct"),
      s"margin IVF went cartesian:\n$pm")
    val bnlj = pm.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 6, s"$bnlj nested-loop joins (expected <=6: two " +
      s"centroid broadcasts x up-to-3 cache-subtree prints):\n$pm")
    assert(pm.contains("vec_dot"), s"margin IVF lost the kernel:\n$pm")
    // DSIR: the bucket ratio table joins back BROADCAST (its key space
    // is `buckets`), the top-k is distributed TakeOrdered, and nothing
    // data-sized is nested-looped. The public face eagerly checkpoints
    // (cache lifecycle), so the gate inspects the LAZY plan
    val pd = graft.ext.Sampling.dsirSelect(
        graft.queries.H.t(spark, dir, "documents"), "text", "doc_id",
        org.apache.spark.sql.functions.col("source")
          .isin("src0", "src1"), k = 50, buckets = 256, release = false)
      .queryExecution.executedPlan.toString
    assert(pd.contains("TakeOrderedAndProject"),
      s"dsir top-k is not TakeOrdered:\n$pd")
    assert(pd.contains("BroadcastHashJoin"),
      s"dsir lost the broadcast ratio join:\n$pd")
    assert(!pd.contains("CartesianProduct"), s"dsir went cartesian:\n$pd")
    // geodesic radius pairs: same neighbor-cell equi-join discipline
    // as the planar face — hash join on cell ids, no cartesian, the
    // single nested-loop is the 9-row offset dimension
    val pg = plan("x_geo_radius_pairs_geodesic")
    assert(!pg.contains("CartesianProduct"), s"geodesic went cartesian:\n$pg")
    assert(pg.contains("BroadcastHashJoin [cx"),
      s"geodesic lost the cell equi-join:\n$pg")
    assert(pg.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"unexpected nested-loops:\n$pg")
  }

  test("round-10 operators keep their scale shapes") {
    import org.apache.spark.sql.functions.{col, size, split}
    // antimeridian face: wrapping the ring must not cost the equi-join
    // shape — hash join on cell ids, no cartesian, the single
    // nested-loop is the ≤9-row offset dimension
    val pa = plan("x_geo_radius_pairs_antimeridian")
    assert(!pa.contains("CartesianProduct"),
      s"antimeridian went cartesian:\n$pa")
    assert(pa.contains("BroadcastHashJoin [cx"),
      s"antimeridian lost the cell equi-join:\n$pa")
    assert(pa.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"unexpected nested-loops:\n$pa")
    // whitenApply: the transform is collect-to-literal — the applied
    // plan must be a pure narrow map (no exchange, no join; the only
    // shuffle-bearing piece is the separate stats AGGREGATE)
    val embT = graft.queries.H.t(spark, dir, "embeddings")
    val stats = graft.ext.Similarity.whitenStats(embT, "embedding")
    val pw = graft.ext.Similarity.whitenApply(embT, "embedding", stats)
      .queryExecution.executedPlan.toString
    assert(!pw.contains("Exchange") && !pw.contains("Join"),
      s"whitenApply is not a narrow map:\n$pw")
    // packBestFit: exactly the one partition-by-group exchange feeding
    // the per-group sequential packer — no join, no extra shuffle
    val pp = graft.ext.Sampling.packBestFit(
        graft.queries.H.t(spark, dir, "documents"),
        col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long"), seqLen = 64)
      .queryExecution.executedPlan.toString
    assert(pp.contains("MapGroups"), s"packer lost its group stream:\n$pp")
    assert(pp.linesIterator.count(_.contains("Exchange")) <= 1,
      s"packer shuffles more than the group exchange:\n$pp")
    assert(!pp.contains("Join"), s"packer grew a join:\n$pp")
  }

  test("round-11 polar cap keeps the geodesic scale shape") {
    // polar face: routing the caps through the one-lon-cell ring must
    // not cost the equi-join shape — the polar leg joins on the lat
    // ring (cx) hash key, its ±1 ring probe is an EXPLODE (a generator,
    // not a join), so the plan's single nested-loop stays the in-band
    // offsets broadcast
    val pp = plan("x_geo_radius_pairs_polar")
    assert(!pp.contains("CartesianProduct"),
      s"polar face went cartesian:\n$pp")
    assert(pp.contains("BroadcastHashJoin [cx"),
      s"polar face lost the cell equi-join:\n$pp")
    assert(pp.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"unexpected nested-loops:\n$pp")
    assert(pp.contains("Generate explode"),
      s"polar ring probe should be an explode generator:\n$pp")
    // perplexity buckets: the global fluency ranking must be the
    // range-partitioned globalRowNumber bridge — never a Window, a
    // single-partition exchange, or a coalesce(1) (each a 100 TB
    // killer). The trailing orderBy contributes a rangepartitioning
    // line regardless, so the POSITIVE marker is the rank's RDD
    // bridge (Scan ExistingRDD) and the gate's teeth are the three
    // negative assertions.
    val pb = plan("x_quality_perplexity_buckets")
    assert(!pb.contains("Window"),
      s"perplexity ranking fell back to a Window:\n$pb")
    assert(!pb.contains("SinglePartition"),
      s"perplexity plan has a single-partition exchange:\n$pb")
    assert(!pb.contains("Coalesce"),
      s"perplexity plan coalesces partitions:\n$pb")
    assert(pb.contains("ExistingRDD"),
      s"perplexity ranking lost the globalRowNumber bridge:\n$pb")
  }

  test("round-12 operators keep their scale shapes") {
    // the three per-row quality signals must stay narrow: no joins, no
    // shuffle beyond the registration's own orderBy range exchange,
    // and a 2-column pruned scan
    for (q <- Seq("x_text_compression_ratio", "x_text_encoding_quality",
        "x_quality_gopher_rules")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      assert(p.linesIterator.count(_.contains("Exchange")) <= 1,
        s"$q shuffles beyond its orderBy:\n$p")
      val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!rs.contains("lang") && !rs.contains("source"),
        s"$q scans unneeded columns: $rs")
    }
    // paragraph dedup: the near-dup candidates must stay a band
    // equi-join (never all-pairs), and the per-doc damage report must
    // aggregate partially (map-side) before the doc_id shuffle
    val pd = plan("x_pipeline_paragraph_dedup")
    assert(!pd.contains("CartesianProduct"),
      s"paragraph dedup went cartesian:\n$pd")
    assert(!pd.contains("BroadcastNestedLoopJoin"),
      s"paragraph dedup grew a nested loop:\n$pd")
    assert(pd.contains("partial_collect_list") ||
      pd.contains("partial_count"),
      s"damage report lost partial aggregation:\n$pd")
    assert(!pd.contains("Window"),
      s"paragraph dedup fell back to a window:\n$pd")
  }

  test("round-17 operators keep their scale shapes") {
    // contamination depth: cross-set pairs come from a rank EQUI-join
    // (16-byte keys), extension from two position equi-joins — never a
    // cartesian, and the per-doc MAX aggregates partially
    val cd = plan("x_decontaminate_span_depth")
    assert(!cd.contains("CartesianProduct"),
      s"contamination depth went cartesian:\n$cd")
    assert(cd.contains("partial_max") || cd.contains("partial_"),
      s"contamination depth lost partial aggregation:\n$cd")
    // learned blocklist: the blocked-domain cut is a BROADCAST anti
    // join against the O(blocked) slice, never a shuffle of the corpus
    // on the domain key
    val lb = plan("x_pipeline_learned_blocklist")
    assert(lb.contains("BroadcastHashJoin") && lb.contains("LeftAnti"),
      s"learned blocklist cut is not a broadcast anti join:\n$lb")
    assert(!lb.contains("CartesianProduct"),
      s"learned blocklist went cartesian:\n$lb")
    // KN bucket agreement: two rank chains joined on doc_id — no
    // cartesian, no single-partition global window (the rank rides
    // globalRowNumber's range exchange)
    val ag = plan("x_quality_ppl_bucket_agreement")
    assert(!ag.contains("CartesianProduct"),
      s"bucket agreement went cartesian:\n$ag")
  }

  test("round-18 operators keep their scale shapes") {
    // epoch-order shuffle: the global position must ride the
    // range-partitioned globalRowNumber bridge — never a Window, a
    // single-partition exchange, or a coalesce(1). The trailing
    // orderBy contributes a rangepartitioning line regardless, so the
    // POSITIVE marker is the rank's RDD bridge (the perplexity-gate
    // convention).
    val eo = plan("x_pack_epoch_order")
    assert(!eo.contains("Window"),
      s"epoch order fell back to a Window:\n$eo")
    assert(!eo.contains("SinglePartition"),
      s"epoch order has a single-partition exchange:\n$eo")
    assert(!eo.contains("Coalesce"),
      s"epoch order coalesces partitions:\n$eo")
    assert(eo.contains("ExistingRDD"),
      s"epoch order lost the globalRowNumber bridge:\n$eo")
    // exact-first incremental excision: the registered face's visible
    // plan is the post-pin assembly (each incremental batch is
    // localCheckpoint-pinned inside the operator, the state-append
    // rule), so the gate here is the ASSEMBLY shape — the agreement
    // join must broadcast on the 8-byte doc key, never cartesian; the
    // inner per-batch shape (window-state equi-joins + partial
    // aggregation) is the already-gated spanDedup family plan
    val se = plan("x_dedup_span_incremental_exact_first")
    assert(!se.contains("CartesianProduct"),
      s"exact-first incremental went cartesian:\n$se")
    assert(se.contains("BroadcastHashJoin"),
      s"the agreement join lost its broadcast:\n$se")
    // the full sidecar assembles by doc_id equi-joins + an O(domains)
    // broadcast — no cartesian anywhere in ~25 signals
    val sf = plan("x_quality_signals_full")
    assert(!sf.contains("CartesianProduct"),
      s"full sidecar went cartesian:\n$sf")
  }

  test("round-19 epoch audits keep their scale shapes") {
    // shuffle-quality audit: adjacency rides successor/predecessor
    // position equi-joins and the run segments ride globalRunningSum's
    // RDD bridge — never a corpus-wide Window (the single-row
    // crossJoins of the final assembly are O(1)-row by construction)
    val au = plan("x_pack_epoch_audit")
    assert(!au.contains("Window"),
      s"epoch audit fell back to a Window:\n$au")
    assert(au.contains("ExistingRDD"),
      s"epoch audit lost the prefix-sum bridge:\n$au")
    // block digests: closed-form consumer/block arithmetic — one
    // projection + one partial-aggregating groupBy, no Window, no
    // manifest join; the empty-consumer range-fill join exists ONLY
    // on the cold N < nConsumers path, so the plan inspected here
    // (sf0.001, N >> 8) must be fill-free — any join below is the
    // upstream epochOrder's broadcast group join, not a digest-side
    // addition
    val dg = plan("x_pack_epoch_digest")
    assert(!dg.contains("Window"),
      s"epoch digest fell back to a Window:\n$dg")
    assert(dg.contains("partial_"),
      s"epoch digest lost partial aggregation:\n$dg")
    assert(!dg.contains("CartesianProduct"),
      s"epoch digest went cartesian:\n$dg")
  }

  test("whole-stage codegen covers the q1 pipeline") {
    // AQE prints codegen spans only in the FINAL plan — execute THIS
    // DataFrame's own queryExecution (a write would plan separately)
    val df = Registry.byName("q1_pricing_summary").run(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"))
    // toString renders codegen spans as "*(n) Operator"
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"no codegen spans:\n$p")
  }
}
