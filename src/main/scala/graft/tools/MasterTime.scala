package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{ExtK, H}

/** Dev-only stage profiler for the x_pipeline_master chain: drives the
  * SAME shared builder the registered queries run ([[ExtK.masterStages]]
  * — never a re-inlined copy that could drift), caching + counting at
  * every pin with a wall-clock lap so a budget overrun is located from
  * measurements, never guessed.
  *
  * Usage: runMain graft.tools.MasterTime [sfDir] [exact|lsh]
  */
object MasterTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val lsh = args.lift(1).contains("lsh")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // cap AQE's explain-string re-render (nested cached stages
      // multiply the plan text — the ScaleBench master OOM)
      .config("spark.sql.maxPlanStringLength", "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      val t1 = System.nanoTime()
      println(f"[master] $name%-18s ${(t1 - t0) / 1e9}%6.2f s")
      t0 = t1
    }
    // laps are start-to-start, so the eager paragraph excision (which
    // runs while the builder constructs the stage, before the pin) is
    // charged to the paragraph_dedup lap correctly
    // suffixSpan8 = true mirrors the registered flagship since the r18
    // default flip (stage 8 = the exact-first suffix excision)
    val (stages, bins) = ExtK.masterStages(H.t(spark, dir, "documents"),
      lshWholeDoc = lsh,
      (name, df) => { val c = df.cache(); c.count(); lap(name); c },
      suffixSpan8 = true)
    bins.collect(); lap("pack")
    // the attrition rows themselves are near-free over the cached
    // stages, but run them so the profile covers the FULL query
    stages.foreach(st => st.df.agg(count(lit(1)), sum(st.tok)).collect())
    lap("report")
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
