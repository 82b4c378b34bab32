package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Sampling}
import graft.ext.Text

/** Dev probe: per-stage timings of the curate-v2 pipeline (the r08/r09
  * bench-creep investigation). Not part of the driver contract.
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      spark.catalog.clearCache()
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (rep <- 1 to 3) {
      time(s"rep$rep entropy") {
        Text.tokenEntropy(docs, "text", "doc_id")
          .filter(col("token_entropy") >= 2.8).count()
      }
      val quality = docs.join(Text.tokenEntropy(docs, "text", "doc_id")
        .filter(col("token_entropy") >= 2.8).select(col("doc_id")), "doc_id")
        .cache()
      time(s"rep$rep allpairs") {
        Dedup.ngramJaccardPairs(quality, "text", "doc_id", 3, 0.5).count()
      }
      val pairs = Dedup.ngramJaccardPairs(quality, "text", "doc_id", 3, 0.5)
      time(s"rep$rep survivors") {
        Dedup.qualitySurvivors(quality, "doc_id", pairs, col("n_chars")).count()
      }
      val surv = Dedup.qualitySurvivors(quality, "doc_id", pairs,
        col("n_chars")).select(col("survivor_id").as("doc_id"))
      val corpus = quality.join(surv, "doc_id")
        .filter(col("doc_id") >= 20).cache()
      time(s"rep$rep contamination") {
        Text.contamination(corpus, docs.filter(col("doc_id") < 20),
          "text", "doc_id", 5).filter(col("contaminated")).count()
      }
      quality.unpersist(); corpus.unpersist()
    }
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
