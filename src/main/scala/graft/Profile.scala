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

    spark.stop()
    // all outputs are flushed/written; drop Hadoop's shutdown hooks so
    // they don't race sbt's (unforked) classloader/temp-jar cleanup
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
