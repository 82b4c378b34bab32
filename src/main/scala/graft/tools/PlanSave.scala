package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: write `.explain("formatted")` of named registry queries to
  * plans/<dir>/<query>_<suffix>.txt (dir defaults to r20;
  * SPARK_GRAFT_PLANS_DIR overrides) — the optimization rounds'
  * before/after plan evidence. Mirrors Bench's session config (same
  * shuffle partitions, split sizing, extensions) so the captured plans
  * are the plans the bench actually runs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *          runMain graft.tools.PlanSave <suffix> <query> [query ...]
  */
object PlanSave {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSave <suffix> <query> [query ...]")
    val suffix = args.head
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val out = java.nio.file.Paths.get("plans",
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "r20"))
    java.nio.file.Files.createDirectories(out)
    for (n <- args.tail) {
      val df = graft.queries.Registry.byName(n).run(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(out.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plansave] wrote ${n}_$suffix.txt (${txt.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
