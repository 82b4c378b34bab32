package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MarginTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ext.Similarity.marginPairsIvf(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0).count()
      println(f"[mt] rep$rep ivf: ${(System.nanoTime()-t0)/1e9}%.2f s ($n pairs)")
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val m = graft.ext.Similarity.marginPairs(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0,
        // dev timing harness on the bounded test corpus — the brute
        // face's opt-in applies here by definition
        acceptBroadcastBaseline = true).count()
      println(f"[mt] rep$rep exact: ${(System.nanoTime()-t1)/1e9}%.2f s ($m pairs)")
      spark.catalog.clearCache()
    }
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
