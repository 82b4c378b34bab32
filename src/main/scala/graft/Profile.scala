package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity}

/** Dev profiling harness: step timings for the near-dup pipelines as
  * currently shaped (single-pass profiles + grouped verify). Not part
  * of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // unforked sbt run: Hadoop's shutdown hook fires after sbt unloads
    // the classloader and logs a spurious core-default.xml parse ERROR;
    // results are long since written by then — silence that logger
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.hadoop.conf.Configuration", org.apache.logging.log4j.Level.OFF)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()

    time("shingleIndex (narrow flatMap)") {
      Dedup.shingleIndex(docs, "text", "doc_id", 3).count()
    }
    time("ngramJaccardPairs end-to-end") {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5).count()
    }
    time("minhashLshPairs end-to-end") {
      Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 0.5).count()
    }
    time("simhashPairs end-to-end") {
      Dedup.simhashPairs(docs, "text", "doc_id", 3).count()
    }
    time("cosineLshPairs end-to-end") {
      Similarity.cosineLshPairs(emb, "vec_id", "embedding", 0.45).count()
    }
    time("bruteForceTopK (10 queries)") {
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5).count()
    }

    // stage-by-stage breakdown of the train-prep pipeline (replicates
    // the registered query's stages, materializing each)
    {
      import graft.ext.Text
      val scored = docs.select(
        col("doc_id"), col("text"),
        Text.langId(col("text")).as("lang"),
        Text.wordCount(col("text")).as("n_words"),
        (Text.stopwordCount(col("text")).cast("double") /
          Text.wordCount(col("text"))).as("stop_ratio"))
      val kept = scored.filter(col("n_words") >= 20 && col("stop_ratio") <= 0.5)
      val surv = kept.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"),
          max(col("lang")).as("lang"),
          max(col("n_words")).as("n_words"))
        .cache()
      time("train_prep: surv (score+filter+dedup)") { surv.count() }
      val pairs = Dedup.ngramJaccardPairs(surv, "text", "doc_id", 3, 0.5).cache()
      time("train_prep: ngram pairs on surv") { pairs.count() }
      val assigned = Dedup.leakageSafeSplit(surv, "doc_id", pairs).cache()
      time("train_prep: leakage-safe split") { assigned.count() }
      time("train_prep: leak audit + final agg") {
        val leaks = pairs
          .join(assigned.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
          .join(assigned.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
          .agg(coalesce(sum(when(col("sa") =!= col("sb"), 1).otherwise(0)), lit(0))
            .cast("bigint").as("leak_pairs"))
        assigned.groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"))
          .crossJoin(leaks).count()
      }
      spark.catalog.clearCache()
    }

    // headline-pipeline breakdown: 3 cold reps of the full registered
    // query (noop sink, cache cleared between reps, like Bench)
    for (rep <- 1 to 3) {
      time(s"x_pipeline_train_prep full (rep $rep)") {
        graft.queries.Registry.byName("x_pipeline_train_prep")
          .run(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }

    spark.stop()
    // all outputs are flushed/written; drop Hadoop's shutdown hooks so
    // they don't race sbt's (unforked) classloader/temp-jar cleanup
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
