package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Model, Phrase, Suffix, Text, Web}

/** Dev-only stage profiler for the x_quality_signals_full sidecar
  * (VERDICT r19 #3: the single most expensive gated query, unprofiled
  * beyond the logreg stage): times each component DataFrame of the
  * v3 ⋈ v2 assembly through the noop sink, cache cleared between laps,
  * then the full registered query. Mirrors Bench's session config.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.SignalsTime [reps]
  */
object SignalsTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.H.t(spark, dir, "documents")
    val evalDocs = docs.filter(col("doc_id") < 20)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[signals] $label%-22s ${ts.min}%6.2f s (min of $reps: " +
        ts.map(t => f"$t%.2f").mkString(", ") + ")")
    }
    // warmup
    Text.gopherRules(docs, "text", "doc_id")
      .write.format("noop").mode("overwrite").save()
    // v1 components
    time("gopher")(Text.gopherRules(docs, "text", "doc_id"))
    time("token_entropy")(Text.tokenEntropy(docs, "text", "doc_id"))
    time("ppl_buckets_jm")(Text.perplexityBuckets(docs, "text", "doc_id", 3))
    time("contamination")(Text.contamination(docs, evalDocs, "text",
      "doc_id", n = 5))
    // v3 extras
    time("repetition_loop")(Text.repetitionLoop(docs, "text", "doc_id"))
    time("encoding")(Text.encodingQuality(docs, "text", "doc_id"))
    time("compression")(Text.compressionRatio(docs, "text", "doc_id"))
    time("leak_depth_ladder")(Suffix.contaminationSpanDepth(docs, "text",
      "doc_id", col("doc_id") < 20, baseLen = 4))
    // v2 components (same parameters as ExtN.signalsV2Df)
    time("kn_lm")(Text.bigramKneserNey(docs, "text", "doc_id"))
    val gop = Text.gopherRules(docs, "text", "doc_id")
      .select(col("doc_id"), col("pass"))
    time("logreg_filter")(Model.logRegFilter(
      docs.join(gop.withColumnRenamed("pass", "label"), "doc_id"),
      "text", "doc_id", "label", dims = 64, iters = 30,
      step = "0.000200"))
    // the ExtN.tagPhrases list, copied (private[queries])
    time("phrase_tags")(Phrase.phraseMatch(docs, "text", "doc_id",
      Seq("batch batch", "batch batch batch", "table scan", "join order",
        "hash join", "spark", "the fast", "group query", "a a")))
    time("domain_rollup")(Web.domainQuality(
      docs.withColumn("url", graft.queries.ExtK.urlCol).join(gop, "doc_id"),
      "url", "pass", minPassFrac = 0.5))
    // the full registered query
    time("FULL v3 join v2")(
      graft.queries.Registry.byName("x_quality_signals_full").run(spark, dir))
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
