package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import graft.queries.{ExtI, H}

/** Composition proof for the streaming quality funnel: driving the
  * corpus through in batches must SUM, stage by stage, to the one-shot
  * `x_pipeline_quality_funnel` row — and the replayed latest batch
  * must reproduce its report exactly (generation-addressed state).
  */
class FunnelStreamSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("funnel batches sum to the one-shot row; latest-batch replay is exact") {
    val docs = H.t(spark, dir, "documents")
    // the SAME injection the batch capstone screens (shared constants)
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val state = java.nio.file.Files.createTempDirectory("funnelst").toString

    def batchDf(b: Int) = injected.filter(pmod(col("doc_id"), lit(3)) === b)
    val reports = (0 to 2).map { b =>
      FunnelStream.applyBatch(batchDf(b), state, b.toLong, docs,
        cutLp, cutId, "text", "tinj", "doc_id").head()
    }

    val oneShot = ExtI.xPipelineQualityFunnel.run(spark, dir).head()
    def os(c: String): Long = oneShot.getAs[Long](c)
    // per-batch stage counts sum to the one-shot funnel row
    for ((c, i) <- Seq("n_all" -> 1, "n_encoding_clean" -> 2,
        "n_gopher_pass" -> 3, "n_fluent" -> 4))
      assert(reports.map(_.getLong(i)).sum == os(c),
        s"$c: batch splits do not sum to the one-shot row")
    // the final cumulative row IS the one-shot row
    val last = reports.last
    assert(last.getAs[Long]("c_all") == os("n_all"))
    assert(last.getAs[Long]("c_encoding_clean") == os("n_encoding_clean"))
    assert(last.getAs[Long]("c_gopher_pass") == os("n_gopher_pass"))
    assert(last.getAs[Long]("c_fluent") == os("n_fluent"))
    assert(last.getAs[Double]("survival_frac") ==
      oneShot.getAs[Double]("survival_frac"),
      "cumulative survival must equal the one-shot fraction exactly")

    // the intra-doc stage (r17) is per-doc pure, so its per-batch kept
    // token sums must also fold order-free to the one-shot pass over
    // the full fluent survivor set
    val encOk = graft.ext.Text.encodingQuality(injected, "tinj", "doc_id")
      .filter(col("is_clean")).select("doc_id")
    val gphOk = graft.ext.Text.gopherRules(injected, "tinj", "doc_id")
      .filter(col("pass")).select("doc_id")
    val bkOk = graft.ext.Text
      .perplexityBuckets(docs, "text", "doc_id", nBuckets = 3)
      .filter(col("bucket") < 2).select("doc_id")
    val oneIntra = graft.ext.Dedup.intraDocDedupHashed(
        docs.select(col("doc_id"), col("text"))
          .join(encOk, "doc_id").join(gphOk, "doc_id").join(bkOk, "doc_id"),
        "text", "doc_id", span = 3)
      .agg(coalesce(sum(col("n_kept_tokens")), lit(0L)).cast("bigint"))
      .head().getLong(0)
    assert(oneIntra > 0L, "intra stage must be non-vacuous at this SF")
    assert(reports.map(_.getAs[Long]("n_intra_tokens")).sum == oneIntra,
      "per-batch intra-kept token sums must fold to the one-shot pass")
    assert(last.getAs[Long]("c_intra_tokens") == oneIntra)

    // redelivery: replaying the LATEST batch re-reads the pre-batch
    // generation and reproduces the identical report row
    val replay = FunnelStream.applyBatch(batchDf(2), state, 2L, docs,
      cutLp, cutId, "text", "tinj", "doc_id").head()
    assert(replay == last, "replayed latest batch must reproduce its report")

    // fluency thresholding is the rank cut: member verdicts match the
    // bucket<2 set exactly (tie-straddle safe via the id tiebreak)
    val bucketSet = graft.ext.Text
      .perplexityBuckets(docs, "text", "doc_id", nBuckets = 3)
      .filter(col("bucket") < 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val thresholdSet = graft.ext.Text
      .bigramLogProbUnder(injected, docs, "text", "doc_id")
      .filter(col("mean_logprob") > cutLp ||
        (col("mean_logprob") === cutLp && col("doc_id") <= cutId))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(thresholdSet == bucketSet,
      "threshold replay must equal the rank-bucket verdict set")
  }

  test("pre-widening state generations resume: missing counters fold from 0") {
    // r17 widened the report state (c_intra_tokens); a stream resumed
    // against a state directory written by the pre-widening code must
    // fold the new counter from 0, not throw unresolved-column
    // (StateDir.selectCountersOrZero — the versioning rule)
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id")
    val state = java.nio.file.Files.createTempDirectory("funnelmig").toString

    def batchDf(b: Int) = injected.filter(pmod(col("doc_id"), lit(3)) === b)
    // run batch 0 with TODAY's code, then narrow its state generation
    // to the pre-r17 schema in place
    val r0 = FunnelStream.applyBatch(batchDf(0), state, 0L, docs,
      cutLp, cutId, "text", "tinj", "doc_id").head()
    val narrowed = spark.read.parquet(s"$state/g0")
      .select("c_all", "c_encoding_clean", "c_gopher_pass", "c_fluent")
      .localCheckpoint(true)
    StateDir.atomicOverwrite(narrowed, s"$state/g0")

    val r1 = FunnelStream.applyBatch(batchDf(1), state, 1L, docs,
      cutLp, cutId, "text", "tinj", "doc_id").head()
    // pre-existing counters folded from the old generation...
    assert(r1.getAs[Long]("c_all") ==
      r0.getAs[Long]("c_all") + r1.getAs[Long]("n_all"))
    assert(r1.getAs[Long]("c_fluent") ==
      r0.getAs[Long]("c_fluent") + r1.getAs[Long]("n_fluent"))
    // ...and the widened counter restarted from 0 (its pre-widening
    // value: nothing was ever accumulated under the old schema)
    assert(r1.getAs[Long]("c_intra_tokens") ==
      r1.getAs[Long]("n_intra_tokens"),
      "missing c_intra_tokens must default to 0, not fail the resume")
  }

  test("KN fluency face: the threshold replay equals the KN rank cut") {
    val docs = H.t(spark, dir, "documents")
    val injected = docs.select(col("doc_id"), col("text"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val (cutLp, cutId) = FunnelStream.fluencyCutoff(docs, "text", "doc_id",
      kn = true)
    val knBucketSet = graft.ext.Text
      .perplexityBucketsKn(docs, "text", "doc_id", nBuckets = 3)
      .filter(col("bucket") < 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val knThresholdSet = graft.ext.Text
      .bigramKneserNeyUnder(injected, docs, "text", "doc_id")
      .filter(col("mean_logprob") > cutLp ||
        (col("mean_logprob") === cutLp && col("doc_id") <= cutId))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(knThresholdSet == knBucketSet,
      "KN threshold replay must equal the KN rank-bucket verdict set")
    // and the one-batch fold under kn=true reports exactly that set
    val state = java.nio.file.Files
      .createTempDirectory("funnelkn").toString
    val row = FunnelStream.applyBatch(injected, state, 0L, docs,
      cutLp, cutId, "text", "tinj", "doc_id", kn = true).head()
    val encOk = graft.ext.Text.encodingQuality(injected, "tinj", "doc_id")
      .filter(col("is_clean")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val gphOk = graft.ext.Text.gopherRules(injected, "tinj", "doc_id")
      .filter(col("pass")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(row.getAs[Long]("n_fluent") ==
      (knBucketSet & encOk & gphOk).size.toLong)
  }
}
