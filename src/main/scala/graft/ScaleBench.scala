package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Boiler, Dedup, Graph}

/** Dev scaling harness (SURVEY.md §6): replicate the sf0.1 documents
  * corpus k× with offset ids (every doc gains k−1 EXACT clones — the
  * worst case for dedup hot keys) and measure the operators whose
  * skew/lineage behavior is argued in the scale notes:
  * chunkDedup (hot segment keys), removeBoilerplate (per-source hot
  * segments), and fixed-point pageRank over synthetic graphs of
  * growing node count (per-round lineage cuts). Not part of the driver
  * contract.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.hadoop.conf.Configuration", org.apache.logging.log4j.Level.OFF)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      spark.catalog.clearCache()
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source")).cache()
    val nDocs = docs.count()

    /** k exact clones per doc, ids offset so they stay distinct;
      * repartitioned so the clone explosion is spread across cores, not
      * nested inside one input split.
      */
    def cloned(k: Int): DataFrame = docs
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .select((col("doc_id") * 1000 + col("rep")).as("doc_id"),
        col("text"), col("source"))
      .repartition(cpus.toInt)

    for (k <- Seq(10, 40, 100)) {
      val n = nDocs * k
      time(s"chunkDedup ${n} docs (x$k clones)") {
        Dedup.chunkDedup(cloned(k), "text", "doc_id", 20).count()
      }
      time(s"removeBoilerplate ${n} docs (x$k clones)") {
        Boiler.removeBoilerplate(cloned(k), "text", "doc_id", "source",
          20, 2).count()
      }
    }

    // pageRank over synthetic deterministic graphs: 10 out-edges per
    // node, weights 1..3, node count grows 10x across rows
    for (n <- Seq(50000L, 200000L, 500000L)) {
      val edges = spark.range(n).select(col("id").as("src"))
        .crossJoin(spark.range(10).select(col("id").as("j")))
        .select(col("src"),
          pmod(col("src") * 7 + col("j") * 1231, lit(n)).as("dst"),
          (col("j") % 3 + 1).cast("double").as("w"))
        .filter(col("src") =!= col("dst"))
      time(s"pageRank ${n} nodes / ${n * 10} edges (10 iters)") {
        Graph.pageRank(edges, "src", "dst", "w").count()
      }
    }

    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
