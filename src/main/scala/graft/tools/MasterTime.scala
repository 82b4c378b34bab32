package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext._
import graft.queries.H

/** Dev-only stage profiler for the x_pipeline_master chain: replicates
  * the capstone's stages with a wall-clock lap per stage so a budget
  * overrun is located from measurements, never guessed.
  */
object MasterTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      val t1 = System.nanoTime()
      println(f"[master] $name%-18s ${(t1 - t0) / 1e9}%6.2f s")
      t0 = t1
    }
    val all = H.t(spark, dir, "documents")
    val evalSet = all.filter(col("doc_id") < 20)
    val corpus = all.filter(col("doc_id") >= 20)
      .select(col("doc_id"), col("text"), col("source"), col("lang")).cache()
    corpus.count(); lap("corpus")
    val s1 = Web.withUrlParts(corpus.withColumn("url", concat(
        lit("https://"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("www.")).otherwise(lit("")),
        col("source"), lit("-site."),
        when(col("lang") === "en", lit("com")).otherwise(lit("org")),
        lit("/docs/"), col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("?ref="), col("source"))).otherwise(lit("")))), "url")
      .filter(!col("url_domain").isin("src3-site.com", "src3-site.org",
        "src7-site.com", "src7-site.org"))
      .select(col("doc_id"), col("text")).cache()
    s1.count(); lap("url")
    val encGarbage = concat(
      when(col("doc_id") % 7 === 0,
        expr("repeat('\uFFFD', cast(doc_id % 4 + 1 as int))"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("\u0007\u0001\u007F"))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit("\u0085\u0096"))
        .otherwise(lit("")))
    val gopherBait =
      when(col("doc_id") % 13 === 0, lit(" ### ... 123")).otherwise(lit(""))
    val inj = s1.select(col("doc_id"),
      concat(col("text"), encGarbage, gopherBait).as("tinj"))
    val encOk = Text.encodingQuality(inj, "tinj", "doc_id")
      .filter(col("is_clean")).select("doc_id")
    val s2 = s1.join(encOk, "doc_id").cache()
    s2.count(); lap("encoding")
    val gphOk = Text.gopherRules(inj, "tinj", "doc_id")
      .filter(col("pass")).select("doc_id")
    val s3 = s2.join(gphOk, "doc_id").cache()
    s3.count(); lap("gopher")
    val pplOk = Text.perplexityBuckets(all, "text", "doc_id", nBuckets = 3)
      .filter(col("bucket") < 2).select("doc_id")
    val s4 = s3.join(pplOk, "doc_id").cache()
    s4.count(); lap("fluency")
    val intra = Dedup.intraDocDedupHashed(s4, "text", "doc_id", span = 3)
      .cache()
    intra.count(); lap("intra")
    val t5 = intra.select(col("doc_id"), col("deduped_text").as("text"))
    val para = Dedup.paragraphDedup(t5, "text", "doc_id",
      paraTokens = 20, minTokens = 5, threshold = 0.8)
    lap("paragraph")
    val t6 = para.select(col("doc_id"), col("deduped_text").as("text"))
    val dupDocs = Dedup.ngramJaccardPairs(t6, "text", "doc_id",
        k = 3, threshold = 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    val s7 = t6.join(dupDocs, Seq("doc_id"), "left_anti").cache()
    s7.count(); lap("wholedoc")
    val g = Dedup.spanDedupHashed(s7, "text", "doc_id", span = 10).cache()
    g.count(); lap("span")
    val s8 = g.filter(col("n_kept_tokens") >= 20)
      .select(col("doc_id"), col("deduped_text").as("text"),
        col("n_kept_tokens"))
    val contam = Text.contamination(s8, evalSet, "text", "doc_id", n = 5)
      .filter(col("contaminated")).select("doc_id")
    val s9 = s8.join(contam, Seq("doc_id"), "left_anti").cache()
    s9.count(); lap("decon")
    val src9 = s9.join(corpus.select(col("doc_id"), col("source")), "doc_id")
    val mstat = src9.agg(count(lit(1)).cast("long").as("_n"),
      countDistinct(col("source")).cast("long").as("_k"))
    val s10 = src9
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .crossJoin(broadcast(mstat))
      .filter(col("_rn") <= expr("(_n * 12 + _k * 10 - 1) div (_k * 10)"))
      .select(col("doc_id"), col("text"), col("n_kept_tokens"),
        col("source")).cache()
    s10.count(); lap("mixture")
    val bins = Sampling.packBestFit(s10, col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long"), seqLen = 64L)
      .groupBy(col("group")).agg(max(col("bin") + col("n_bins")).as("gb"))
      .agg(coalesce(sum(col("gb")), lit(0L)).as("nb"))
    bins.collect(); lap("pack")
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
