package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only: write `.explain("formatted")` of OPERATOR-level plans
  * (library functions whose registered queries hide them behind eager
  * bridges/pins) to plans/<dir>/op_<name>_<suffix>.txt (dir defaults
  * to r20; SPARK_GRAFT_PLANS_DIR overrides) — the optimization
  * rounds' plan evidence for operator internals.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *          runMain graft.tools.OpPlan <suffix> <op> [op ...]
  */
object OpPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpPlan <suffix> <op> [op ...]")
    val suffix = args.head
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.H.t(spark, dir, "documents")
    def op(name: String): org.apache.spark.sql.DataFrame = name match {
      case "bigram_lm" =>
        graft.ext.Text.bigramLogProb(docs, "text", "doc_id")
      case "kn_lm" =>
        graft.ext.Text.bigramKneserNey(docs, "text", "doc_id")
      case "token_entropy" =>
        graft.ext.Text.tokenEntropy(docs, "text", "doc_id")
      case "dup_profile" =>
        graft.ext.Suffix.dupProfile(docs, "text", "doc_id", maxLen = 32)
      // one UNPINNED ladder level (identity pin): the eager
      // localCheckpoint otherwise hides each level's Window/Exchange
      // shape behind an opaque scan — this is the r20 gsz evidence
      case "suffix_level4_gsz" =>
        graft.ext.Suffix.dyadicRanksPinned(docs, "text", "doc_id", 4,
          emitGsz = true, identity)._2.last._2
      case "suffix_level4_slim" =>
        graft.ext.Suffix.dyadicRanksPinned(docs, "text", "doc_id", 4,
          emitGsz = false, identity)._2.last._2
      // one pagerank contribution round against the cached
      // pre-partitioned edge table — replicates the shipped loop body
      // of [[graft.ext.Graph.pageRank]] (r19's edge pre-partitioning,
      // evidence asked for by VERDICT r19 #9); the ranks pin carries a
      // placeholder pr (the plan shape is what's captured)
      case "pagerank_round" =>
        // same stand-in edge list as the before-side replica
        // (PagerankPlan in the 254c147 worktree) so the diff isolates
        // the cache partitioning, not the edge construction
        val cust = graft.queries.H.t(spark, dir, "customer")
        val edges = cust.select((col("c_custkey") % 500).as("src"),
          (col("c_custkey") % 731).as("dst"),
          org.apache.spark.sql.functions.lit(1.0).as("w"))
        val e = edges.select(col("src"), col("dst"),
            col("w").cast("double").as("w"))
          .repartition(col("src")).cache()
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst"))).distinct()
        val outw = e.groupBy(col("src"))
          .agg(org.apache.spark.sql.functions.sum(col("w")).as("ow"))
        val ranks = nodes.withColumn("pr",
          org.apache.spark.sql.functions.lit(1L)).localCheckpoint(true)
        import org.apache.spark.sql.functions.{floor, sum => fsum}
        e.join(ranks, e("src") === ranks("node")).join(outw, "src")
          .select(col("dst"),
            floor(col("pr").cast("double") * col("w") / col("ow"))
              .cast("bigint").as("c"))
          .groupBy(col("dst")).agg(fsum(col("c")).as("sc"))
      case other => sys.error(s"unknown op: $other")
    }
    val out = java.nio.file.Paths.get("plans",
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "r20"))
    java.nio.file.Files.createDirectories(out)
    for (n <- args.tail) {
      val txt = op(n).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(out.resolve(s"op_${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[opplan] wrote op_${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
