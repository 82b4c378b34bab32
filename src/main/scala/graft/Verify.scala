package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional: extra args name specific queries (dev iteration; the
    // driver always calls with two args = full surface)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // fresh-dir semantics on a FULL run: a renamed/retired query from a
    // previous run into the same folder must never leave a ghost parquet
    // that a downstream compare counts as current (r11 judge hit a stale
    // x_fuzz_118 dir exactly this way). Targeted dev runs (extra args)
    // keep the rest of the dir so selfcheck over the named queries works.
    // returns false if anything survived the sweep — a silent residue
    // here is exactly the ghost-artifact class this hygiene exists to
    // kill, so callers must WARN loudly on false
    def rmTree(f: java.io.File): Boolean = {
      // map-then-forall, NOT a short-circuiting forall: one undeletable
      // child must not abandon the sweep of its siblings (best-effort
      // like the original foreach, but with the failure surfaced)
      val childrenOk =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
          .map(rmTree).forall(identity)
        else true
      (f.delete() || !f.exists()) && childrenOk
    }
    def rmQueryOut(name: String): Unit = {
      val d = new java.io.File(s"$outDir/$name")
      if (!rmTree(d) || d.exists())
        System.err.println(s"[verify] WARNING: could not fully remove " +
          s"$outDir/$name — a stale artifact may survive; treat this " +
          "query's compare as suspect")
    }
    if (only.isEmpty && !rmTree(new java.io.File(outDir)))
      System.err.println(s"[verify] WARNING: could not fully clear " +
        s"$outDir — stale artifacts may survive")
    new java.io.File(outDir).mkdirs()
    // per-query watchdog: one pathological query must cost at most its
    // timeout, never the whole artifact (the r10 driver gate recorded
    // {} — whatever the cause, a hang must degrade to ONE red row).
    // The worst single query measures ~10 s at sf0.01; 300 s is 30×.
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT", "300").toLong
    // daemon threads + a FRESH executor after every timeout: the
    // cancelled task's thread can linger while Spark unwinds its jobs,
    // and the next query must not queue behind it (a cascade of
    // spurious timeouts) or block JVM exit
    val daemonFactory = new java.util.concurrent.ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "verify-worker"); t.setDaemon(true); t
      }
    }
    def freshPool() =
      java.util.concurrent.Executors.newSingleThreadExecutor(daemonFactory)
    var pool = freshPool()
    var nOk, nFail = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val task = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          // job group set INSIDE the worker thread (thread-local) so a
          // timeout can cancel exactly this query's jobs
          spark.sparkContext.setJobGroup(s"verify-$name",
            s"verify $name", interruptOnCancel = true)
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try { task.get(timeoutSec, java.util.concurrent.TimeUnit.SECONDS); nOk += 1 }
      catch {
        case _: java.util.concurrent.TimeoutException =>
          nFail += 1
          // AndFutureJobs (Spark 4): a query timing out in DRIVER-side
          // planning has no active jobs yet — a plain cancelJobGroup
          // would miss the jobs it submits right after, and they would
          // run to completion on the shared executor behind every
          // subsequent query
          spark.sparkContext.cancelJobGroupAndFutureJobs(s"verify-$name")
          task.cancel(true)
          pool.shutdownNow()
          // the worker may have been cancelled BEFORE its own
          // mode("overwrite") delete ran — a previous run's parquet for
          // this query would then survive and a compare over a reused
          // outDir would read it as current. Remove it so the query
          // deterministically surfaces as MISSING-OUTPUT — but only
          // after giving the cancelled thread a bounded window to die:
          // an in-flight parquet commit racing the delete could
          // re-create the dir AFTER the sweep. If the thread outlives
          // the window (a truly hung query, far from any commit),
          // delete anyway and say so.
          val dead = pool.awaitTermination(15,
            java.util.concurrent.TimeUnit.SECONDS)
          if (!dead) System.err.println(s"[verify] $name worker still " +
            "alive after cancel — removing output anyway; if a late " +
            "commit re-creates the dir, its mtime will postdate this line")
          pool = freshPool()
          rmQueryOut(name)
          System.err.println(
            s"[verify] $name TIMED OUT after ${timeoutSec}s — " +
              "jobs cancelled, continuing with the next query")
        case e: java.util.concurrent.ExecutionException =>
          nFail += 1
          // the worker COMPLETED (exceptionally) — no write race here
          rmQueryOut(name)
          val c = Option(e.getCause).getOrElse(e)
          System.err.println(s"[verify] $name failed: ${c.getMessage}")
        case e: Throwable =>
          nFail += 1
          rmQueryOut(name)
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // per-query wall time on stderr: when a driver gate runs against
      // a time budget, this is the profile that says WHICH query to
      // trim (r10's correctness artifact came back empty — never again
      // without a trace)
      System.err.println(f"[verify] $name ${
        (System.nanoTime() - t0) / 1e9}%.1fs")
      // operators that cache intermediates (LSH profiles, curate
      // fan-outs, diversity assignment) must not accumulate across the
      // 265-query run — executor memory is shared with the next query
      spark.catalog.clearCache()
    }
    pool.shutdownNow()
    System.err.println(s"[verify] DONE ok=$nOk failed=$nFail")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // full registry manifest: selfcheck compares coverage against THIS,
    // not against whichever output dirs happen to exist — a rows-only
    // query that crashed (no output dir, no oracle key) must show up as
    // MISSING-OUTPUT, not silently vanish from the check
    val manifest = SparkEntry.queries.keys.toSeq.sorted
      .map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/queries.json"), manifest)
    spark.stop()
    // all outputs are flushed/written; drop Hadoop's shutdown hooks so
    // they don't race sbt's (unforked) classloader/temp-jar cleanup
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
