package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import graft.queries.{ExtI, H}

/** Composition proofs for the continuous-curation master
  * ([[CurateStream]] — funnel → intra-doc span dedup → paragraph
  * dedup → whole-doc dedup → corpus-wide span dedup + length floor →
  * decontaminate → shard → pack, all states generation-addressed):
  *
  *  1. arrival-order composition: the corpus driven through in three
  *     id-ordered micro-batches curates the SAME document set, token
  *     volume, and cumulative attrition as the single-batch run (the
  *     dedup ladder honors arrival order; id-ordered arrival IS the
  *     batch chain's earlier-occurrence-wins order) — while the BIN
  *     LAYOUT may differ (BFD is order-sensitive and placed docs never
  *     move, the documented [[PackStream]] divergence); bin validity
  *     and token conservation hold at any split;
  *  2. crash redelivery: replaying the last micro-batch reproduces its
  *     packed placements and report row exactly.
  */
class CurateStreamSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val seqLen = 64L

  private def freshState() =
    java.nio.file.Files.createTempDirectory("curatest").toString

  test("id-ordered batch splits curate the same corpus; replay is exact") {
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val evalDocs = docs.filter(col("doc_id") < 20)
    val arrivals = injected.filter(col("doc_id") >= 20)
    val nDocs = arrivals.count()

    def run(splits: Seq[org.apache.spark.sql.DataFrame])
        : (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row],
           String) = {
      val state = freshState()
      val out = splits.zipWithIndex.map { case (b, i) =>
        CurateStream.applyBatch(b, state, i.toLong, docs, cutLp, cutId,
          evalDocs, "text", "tinj", "doc_id", seqLen = seqLen)
      }
      (out.flatMap(_._1.collect()), out.map(_._2.head()), state)
    }

    // one-shot vs three id-ordered range batches (arrival order = id
    // order, the batch chain's earlier-occurrence-wins order)
    val (packed1, reports1, _) = run(Seq(arrivals))
    val cut1 = 20 + nDocs / 3
    val cut2 = 20 + 2 * nDocs / 3
    val (packed3, reports3, state3) = run(Seq(
      arrivals.filter(col("doc_id") < cut1),
      arrivals.filter(col("doc_id") >= cut1 && col("doc_id") < cut2),
      arrivals.filter(col("doc_id") >= cut2)))

    // same curated document set and token volume
    val set1 = packed1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val set3 = packed3.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set1 === set3,
      "id-ordered splits must curate the identical (doc, toks) set")
    // same cumulative attrition (the report's c_* columns, the new
    // intra-doc token and span-stage rows included)
    val last1 = reports1.last
    val last3 = reports3.last
    for (c <- Seq("c_arrived", "c_screened", "c_intra_tokens",
        "c_whole_doc", "c_span", "c_curated", "c_tokens"))
      assert(last3.getAs[Long](c) === last1.getAs[Long](c),
        s"$c must match the one-shot run")
    // per-batch counts sum to the cumulative row
    assert(reports3.map(_.getAs[Long]("n_curated")).sum ===
      last3.getAs[Long]("c_curated"))
    assert(reports3.map(_.getAs[Long]("n_intra_tokens")).sum ===
      last3.getAs[Long]("c_intra_tokens"))
    // the new stages are not vacuous at this SF: the final token
    // volume sits below the intra-stage volume (corpus-wide spans were
    // excised and/or decontamination fired); the span doc count can
    // only shrink from the whole-doc stage
    assert(last1.getAs[Long]("c_span") <= last1.getAs[Long]("c_whole_doc"))
    assert(last1.getAs[Long]("c_tokens") < last1.getAs[Long]("c_intra_tokens"),
      "span excision + floor + decontamination must remove tokens at this SF")

    // bin validity at any split: small-doc bins never exceed seqLen;
    // oversize docs take ceil(toks/seqLen) dedicated bins
    def checkBins(packed: Seq[org.apache.spark.sql.Row]): Unit = {
      val rows = packed.map(r => (r.getLong(2), r.getLong(3), r.getLong(1),
        r.getLong(4))) // (shard, bin, toks, n_bins)
      rows.filter(_._3 > seqLen).foreach { case (_, _, tk, nb) =>
        assert(nb === (tk + seqLen - 1) / seqLen) }
      rows.filter(_._4 == 1L).groupBy(t => (t._1, t._2))
        .foreach { case (_, g) => assert(g.map(_._3).sum <= seqLen) }
    }
    checkBins(packed1); checkBins(packed3)
    // BFD arrival-order divergence is allowed but bounded: same docs,
    // same tokens, possibly different layout — never lost or duplicated
    assert(packed1.map(_.getLong(0)).distinct.length === set1.size)
    assert(packed3.map(_.getLong(0)).distinct.length === set3.size)

    // crash redelivery: replaying the LAST micro-batch against its
    // generation-addressed states reproduces placements + report
    val (packedR, reportR) = CurateStream.applyBatch(
      arrivals.filter(col("doc_id") >= cut2), state3, 2L, docs, cutLp,
      cutId, evalDocs, "text", "tinj", "doc_id", seqLen = seqLen)
    val lastBatchPacked = packed3.drop(
      packed3.length - packedR.collect().length)
    assert(packedR.collect().map(_.toString).sorted.toSeq ===
      lastBatchPacked.map(_.toString).sorted.toSeq,
      "replayed batch must reproduce its packed placements")
    assert(reportR.head() === reports3.last,
      "replayed batch must reproduce its report row")
  }

  test("URL blocklist stage 0 equals pre-filtering the arrivals") {
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val evalDocs = docs.filter(col("doc_id") < 20)
    val withUrl = injected.withColumn("url", concat(lit("https://"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("bad-site.org"))
        .otherwise(lit("good-site.com")),
      lit("/d/"), col("doc_id")))
    val arrivals = withUrl.filter(col("doc_id") >= 20)

    // A: the stream applies the blocklist as stage 0
    val (packedA, reportA) = CurateStream.applyBatch(arrivals,
      freshState(), 0L, docs, cutLp, cutId, evalDocs, "text", "tinj",
      "doc_id", seqLen = seqLen, urlCol = Some("url"),
      blockedDomains = Seq("bad-site.org"))
    // B: the caller pre-filtered the same domain cut; no URL stage
    val (packedB, reportB) = CurateStream.applyBatch(
      arrivals.filter(pmod(col("doc_id"), lit(4)) =!= 0),
      freshState(), 0L, docs, cutLp, cutId, evalDocs, "text", "tinj",
      "doc_id", seqLen = seqLen)

    val setA = packedA.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val setB = packedB.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(setA === setB,
      "stage-0 blocklist must curate exactly the pre-filtered corpus")
    val ra = reportA.head(); val rb = reportB.head()
    for (c <- Seq("c_screened", "c_intra_tokens", "c_whole_doc",
        "c_span", "c_curated", "c_tokens"))
      assert(ra.getAs[Long](c) === rb.getAs[Long](c), s"$c must match")
    // arrivals are counted BEFORE the cut (the attrition convention:
    // n_arrived is what reached the pipeline, blocked included)
    assert(ra.getAs[Long]("n_arrived") > rb.getAs[Long]("n_arrived"))
    // and a doc from the blocked domain never reaches the output
    assert(!packedA.collect().map(_.getLong(0)).exists(_ % 4 == 0))
  }

  test("learned blocklist: stage 0 fed from DomainStream's rollup") {
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val evalDocs = docs.filter(col("doc_id") < 20)
    val withUrl = injected.withColumn("url", concat(lit("https://"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("spam-farm.org"))
        .otherwise(lit("good-site.com")),
      lit("/d/"), col("doc_id")))
    val arrivals = withUrl.filter(col("doc_id") >= 20)

    // batch 0 of the composed driver: the domain rollup learns that
    // spam-farm.org fails quality while good-site.com passes
    val domState = freshState() + "/dom"
    val seed = docs.filter(col("doc_id") < 20)
      .select(col("doc_id"),
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit("spam-farm.org"))
            .otherwise(lit("good-site.com")),
          lit("/s/"), col("doc_id")).as("url"),
        (pmod(col("doc_id"), lit(2)) =!= 0).as("pass"))
    val roll = DomainStream.applyBatch(seed, domState, "url", "pass",
      minPassFrac = 0.5, batchId = 0L).collect()
    assert(roll.exists(r => r.getString(0) == "spam-farm.org" &&
      r.getAs[Boolean]("blocked")))

    // A: curation batch 1 reads the accumulated rollup as stage 0
    val (packedA, _) = CurateStream.applyBatch(arrivals, freshState(), 1L,
      docs, cutLp, cutId, evalDocs, "text", "tinj", "doc_id",
      seqLen = seqLen, urlCol = Some("url"),
      domainStatePath = Some(domState))
    // B: the caller pre-filtered the learned verdict by hand
    val (packedB, _) = CurateStream.applyBatch(
      arrivals.filter(pmod(col("doc_id"), lit(4)) =!= 0), freshState(), 1L,
      docs, cutLp, cutId, evalDocs, "text", "tinj", "doc_id",
      seqLen = seqLen)
    val setA = packedA.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val setB = packedB.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(setA === setB,
      "the learned stage-0 cut must curate exactly the pre-filtered corpus")
    assert(!packedA.collect().map(_.getLong(0)).exists(_ % 4 == 0))

    // batch 0 of the composed driver sees NO rollup yet (generation-
    // addressed read before its own id) — the cut is off, not an error
    val (packed0, _) = CurateStream.applyBatch(arrivals, freshState(), 0L,
      docs, cutLp, cutId, evalDocs, "text", "tinj", "doc_id",
      seqLen = seqLen, urlCol = Some("url"),
      domainStatePath = Some(domState))
    assert(packed0.collect().map(_.getLong(0)).exists(_ % 4 == 0),
      "batch 0 must run un-cut: no earlier-generation rollup exists")
  }

  test("exact-first incremental excision: batch composition equals one-shot") {
    // the r18 face: per-batch digest collapse + closed-form member
    // reconstruction over the stateful span excision. Id-ordered
    // batches must reproduce the ONE-SHOT Dedup.spanDedup byte for
    // byte — under heavy cloning (members both across and within
    // batches), short docs, empty and NULL texts — in every state-key
    // mode; and a replayed latest batch must reproduce its rows.
    import graft.ext.Dedup
    val long = (1 to 9).map(i => s"W$i").mkString(" ")
    val other = (1 to 9).map(i => s"V$i").mkString(" ")
    val docs = (Seq(
      (20L, long), (21L, long), (22L, long),        // clones in batch 0
      (23L, s"pre $long post"),                      // shares the span
      (24L, "a b"), (25L, "a b"),                    // short clones
      (26L, ""), (27L, null.asInstanceOf[String]),   // degenerate texts
      (40L, long), (41L, other), (42L, other),       // batch-1 clones +
      (43L, "a b"),                                  // cross-batch clones
      (44L, s"x $other y"), (45L, "fresh words only here")))
      .toDF("doc_id", "text")
    val oneShot = Dedup.spanDedup(docs, "text", "doc_id", 4)
      .orderBy("doc_id").collect().toSeq
    for (mode <- Seq("sha256", "fp64", "text")) {
      val state = freshState() + s"/span_$mode"
      val out = Seq(docs.filter(col("doc_id") < 40),
          docs.filter(col("doc_id") >= 40)).zipWithIndex.map {
        case (b, i) => Dedup.spanDedupIncrementalExactFirst(b, "text",
          "doc_id", 4, state, batchTag = Some(i.toLong), stateKeys = mode)
      }
      val got = out.flatMap(_.orderBy("doc_id").collect()).sortBy(_.getLong(0))
      assert(got === oneShot,
        s"id-ordered exact-first incremental ($mode) must equal one-shot")
      // crash redelivery: same batch tag, same rows
      val replay = Dedup.spanDedupIncrementalExactFirst(
          docs.filter(col("doc_id") >= 40), "text", "doc_id", 4, state,
          batchTag = Some(1L), stateKeys = mode)
        .orderBy("doc_id").collect().toSeq
      assert(replay === out(1).orderBy("doc_id").collect().toSeq,
        s"replayed batch ($mode) must reproduce its output")
    }
    // and the fingerprint RAW incremental face agrees on the same split
    // (the audit the registered twin runs at corpus scale)
    val stateRaw = freshState() + "/span_raw"
    val raw = Seq(docs.filter(col("doc_id") < 40),
        docs.filter(col("doc_id") >= 40)).zipWithIndex.flatMap {
      case (b, i) => Dedup.spanDedupIncremental(b, "text", "doc_id", 4,
        stateRaw, batchTag = Some(i.toLong), hashedState = true)
        .orderBy("doc_id").collect()
    }.sortBy(_.getLong(0))
    assert(raw === oneShot, "fingerprint incremental face must also agree")
  }

  test("span-state key modes are guarded: a face flip fails loudly") {
    // the r18 review finding: resuming a span state written by one key
    // domain under another silently matched ZERO history keys
    // (under-deduplication) and mixed the state schema — the kmode
    // stamp now fails the batch instead
    import graft.ext.Dedup
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val state = freshState() + "/span_guard"
    Dedup.spanDedupIncremental(docs, "text", "doc_id", 3, state,
      batchTag = Some(0L), hashedState = true).collect()
    val e = intercept[IllegalArgumentException] {
      Dedup.spanDedupIncrementalExactFirst(docs, "text", "doc_id", 3,
        state, batchTag = Some(1L), stateKeys = "sha256").collect()
    }
    assert(e.getMessage.contains("key mode"),
      s"expected the key-mode guard, got: ${e.getMessage}")
    // and the raw face's own text/fp64 flip is caught too
    val e2 = intercept[IllegalArgumentException] {
      Dedup.spanDedupIncremental(docs, "text", "doc_id", 3, state,
        batchTag = Some(1L), hashedState = false).collect()
    }
    assert(e2.getMessage.contains("key mode"))
    // the SAME mode resumes fine
    Dedup.spanDedupIncremental(docs, "text", "doc_id", 3, state,
      batchTag = Some(1L), hashedState = true).collect()
  }

  test("legacy stampless STRING states are adjudicated by the 64-hex " +
      "value heuristic") {
    // the r18 residual: a pre-kmode state's text-vs-sha256 flip was
    // indistinguishable by type (both strings) and silently matched
    // zero history keys — the value heuristic now fails it loudly
    import graft.ext.Dedup
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    // fabricated legacy TEXT state (no kmode column, space-bearing keys)
    val stateT = freshState() + "/span_legacy_text"
    Seq(("a b c", -1L)).toDF("wkey", "batch").write.parquet(stateT)
    val e = intercept[IllegalArgumentException] {
      Dedup.spanDedupIncrementalExactFirst(docs, "text", "doc_id", 3,
        stateT, batchTag = Some(1L), stateKeys = "sha256").collect()
    }
    assert(e.getMessage.contains("heuristic"),
      s"expected the hex heuristic to fire, got: ${e.getMessage}")
    // the matching mode still resumes a legacy dir (appends stampless)
    Dedup.spanDedupIncremental(docs, "text", "doc_id", 3, stateT,
      batchTag = Some(1L), hashedState = false).collect()
    assert(!spark.read.parquet(stateT).columns.contains("kmode"),
      "legacy dirs stay stampless (homogeneous schema)")
    // fabricated legacy SHA-256-shaped state: uniform 64-hex keys
    val stateS = freshState() + "/span_legacy_sha"
    Seq(("a" * 64, -1L)).toDF("wkey", "batch").write.parquet(stateS)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.spanDedupIncremental(docs, "text", "doc_id", 3, stateS,
        batchTag = Some(1L), hashedState = false).collect()
    }
    assert(e2.getMessage.contains("heuristic"))
    // the resume-side probe reads the same inference
    assert(Dedup.spanStateKeyMode(spark, stateT).contains("text"))
    assert(Dedup.spanStateKeyMode(spark, stateS).contains("sha256"))
    assert(Dedup.spanStateKeyMode(spark,
      freshState() + "/never_written").isEmpty)
  }

  test("CurateStream exactSpanState face curates the identical corpus") {
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val evalDocs = docs.filter(col("doc_id") < 20)
    val arrivals = injected.filter(col("doc_id") >= 20)
    // Some(false) pins the fingerprint face explicitly — the r19 auto
    // default would otherwise pick the exact face on BOTH sides and
    // this equality would stop adjudicating anything
    val (packedA, reportA) = CurateStream.applyBatch(arrivals,
      freshState(), 0L, docs, cutLp, cutId, evalDocs, "text", "tinj",
      "doc_id", seqLen = seqLen, exactSpanState = Some(false))
    val (packedB, reportB) = CurateStream.applyBatch(arrivals,
      freshState(), 0L, docs, cutLp, cutId, evalDocs, "text", "tinj",
      "doc_id", seqLen = seqLen, exactSpanState = Some(true))
    assert(packedB.collect().map(_.toString).sorted.toSeq ===
      packedA.collect().map(_.toString).sorted.toSeq,
      "the exact-first span state must place the identical corpus")
    assert(reportB.head() === reportA.head(),
      "the exact-first span state must report the identical attrition")
  }

  test("span-state default auto-selects: fresh dir lands sha-256, a " +
      "resumed fp64 dir stays fp64, a forced flip still fails") {
    import graft.ext.Dedup
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val evalDocs = docs.filter(col("doc_id") < 20)
    val b0 = injected.filter(col("doc_id") >= 20 && col("doc_id") < 250)
    val b1 = injected.filter(col("doc_id") >= 250)

    // fresh state under the DEFAULT → the exact sha-256 face, and the
    // next default batch RESUMES it as sha-256 (auto matches the dir)
    val sFresh = freshState()
    CurateStream.applyBatch(b0, sFresh, 0L, docs, cutLp, cutId,
      evalDocs, "text", "tinj", "doc_id", seqLen = seqLen)._2.head()
    assert(Dedup.spanStateKeyMode(spark, s"$sFresh/span")
      .contains("sha256"), "a fresh dir must land sha-256 keys")
    val st = spark.read.parquet(s"$sFresh/span")
    assert(st.select(col("kmode")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("sha256"))
    assert(st.filter(!col("wkey").rlike("^[0-9a-f]{64}$")).count() == 0L,
      "sha-256 state keys are 64 lowercase hex chars")
    CurateStream.applyBatch(b1, sFresh, 1L, docs, cutLp, cutId,
      evalDocs, "text", "tinj", "doc_id", seqLen = seqLen)._2.head()
    assert(spark.read.parquet(s"$sFresh/span").select(col("kmode"))
      .distinct().collect().map(_.getString(0)).toSeq == Seq("sha256"),
      "the resumed default must stay sha-256")

    // a dir seeded FINGERPRINT stays fp64 under the default (no silent
    // face switch, no error)
    val sFp = freshState()
    CurateStream.applyBatch(b0, sFp, 0L, docs, cutLp, cutId, evalDocs,
      "text", "tinj", "doc_id", seqLen = seqLen,
      exactSpanState = Some(false))._2.head()
    assert(Dedup.spanStateKeyMode(spark, s"$sFp/span").contains("fp64"))
    CurateStream.applyBatch(b1, sFp, 1L, docs, cutLp, cutId, evalDocs,
      "text", "tinj", "doc_id", seqLen = seqLen)._2.head()
    assert(spark.read.parquet(s"$sFp/span").select(col("kmode"))
      .distinct().collect().map(_.getString(0)).toSeq == Seq("fp64"),
      "a resumed fp64 dir must stay fp64 under the default")

    // forcing the exact face onto the fp64 dir still fails loudly —
    // auto-selection removes no teeth from the kmode guard
    val e = intercept[IllegalArgumentException] {
      CurateStream.applyBatch(b1, sFp, 2L, docs, cutLp, cutId, evalDocs,
        "text", "tinj", "doc_id", seqLen = seqLen,
        exactSpanState = Some(true))._2.head()
    }
    assert(e.getMessage.contains("key mode"))
  }

  test("NULL urls survive stage 0 identically under both blocklist cuts") {
    // before r18 the static filter's NULL predicate DROPPED a NULL-url
    // doc while the learned anti-join KEPT it; both cuts now normalize
    // the domain to '' and KEEP it (a blocklist only removes known-bad
    // domains)
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val evalDocs = docs.filter(col("doc_id") < 20)
    // EVERY arrival carries a NULL url — under the pre-r18 static cut
    // the whole batch died on the NULL predicate, so survival at all
    // is the fix's signature
    val withUrl = injected.withColumn("url",
      when(lit(true), lit(null).cast("string")))
    val arrivals = withUrl.filter(col("doc_id") >= 20)

    // static cut (no domain actually blocked here beyond an unrelated
    // name — the NULL-url docs must pass through)
    val (packedS, _) = CurateStream.applyBatch(arrivals, freshState(), 0L,
      docs, cutLp, cutId, evalDocs, "text", "tinj", "doc_id",
      seqLen = seqLen, urlCol = Some("url"),
      blockedDomains = Seq("bad-site.org"))
    // learned cut fed a rollup that blocks an unrelated domain
    val domState = freshState() + "/dom"
    val seed = docs.filter(col("doc_id") < 20)
      .select(col("doc_id"),
        lit("https://spam-farm.org/s/1").as("url"), lit(false).as("pass"))
    DomainStream.applyBatch(seed, domState, "url", "pass",
      minPassFrac = 0.5, batchId = 0L).collect()
    val (packedL, _) = CurateStream.applyBatch(arrivals, freshState(), 1L,
      docs, cutLp, cutId, evalDocs, "text", "tinj", "doc_id",
      seqLen = seqLen, urlCol = Some("url"),
      domainStatePath = Some(domState))
    // the no-url-stage baseline: what survival SHOULD look like
    val (packedB, _) = CurateStream.applyBatch(arrivals, freshState(), 0L,
      docs, cutLp, cutId, evalDocs, "text", "tinj", "doc_id",
      seqLen = seqLen)
    val base = packedB.collect().map(_.getLong(0)).toSet
    val setS = packedS.collect().map(_.getLong(0)).toSet
    val setL = packedL.collect().map(_.getLong(0)).toSet
    assert(setS === base, "static cut must keep NULL-url docs")
    assert(setL === base, "learned cut must keep NULL-url docs")
    assert(base.nonEmpty,
      "some doc must survive curation for the test to bite")
  }

  test("curateStream runner: readStream wiring matches applyBatch") {
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val evalDocs = docs.filter(col("doc_id") < 20)
    val arrivals = injected.filter(col("doc_id") >= 20)

    val base = java.nio.file.Files.createTempDirectory("curaterun")
    val src = base.resolve("src").toString
    arrivals.write.parquet(s"$src/b0")
    val out = base.resolve("out").toString
    val q = CurateStream.curateStream(
      spark.readStream.schema(arrivals.schema).parquet(s"$src/*"),
      base.resolve("state").toString, out,
      base.resolve("ckpt").toString, docs, cutLp, cutId, evalDocs,
      "text", "tinj", "doc_id")
    q.awaitTermination(180000)

    val (refPacked, refReport) = CurateStream.applyBatch(arrivals,
      freshState(), 0L, docs, cutLp, cutId, evalDocs,
      "text", "tinj", "doc_id")
    val gotPacked = spark.read.parquet(s"$out/batch=0")
      .collect().map(_.toString).sorted.toSeq
    assert(gotPacked === refPacked.collect().map(_.toString).sorted.toSeq,
      "runner's per-batch packed output must equal applyBatch")
    val gotReport = spark.read.parquet(s"$out/report/batch=0").head()
    assert(gotReport === refReport.head(),
      "runner's report row must equal applyBatch")
  }
}
