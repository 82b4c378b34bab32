package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only: write `.explain("formatted")` of OPERATOR-level plans
  * (library functions whose registered queries hide them behind eager
  * bridges/pins) to plans/r19/op_<name>_<suffix>.txt — the
  * optimization round's plan evidence for operator internals.
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
      case other => sys.error(s"unknown op: $other")
    }
    val out = java.nio.file.Paths.get("plans", "r19")
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
