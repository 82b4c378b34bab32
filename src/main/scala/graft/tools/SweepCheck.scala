package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only wide differential sweep: DF-vs-SQL parity for seeds beyond
  * FuzzSpec's 80 (one-off shakeout; divergences become fixed seeds).
  */
object SweepCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.fuzz.FuzzGen.tables.foreach(t =>
      graft.queries.H.t(spark, dir, t.name).createOrReplaceTempView(t.name))
    val (lo, hi) = (args.headOption.map(_.toInt).getOrElse(81),
      args.lift(1).map(_.toInt).getOrElse(400))
    var bad = 0
    for (seed <- lo to hi) {
      val fc = graft.fuzz.FuzzGen.gen(seed)
      try {
        val viaDf = fc.run(spark, dir).collect().toSeq
        val viaSql = spark.sql(fc.sql).collect().toSeq
        // wave-9 candidate scan: which seeds carry the new constructs
        if (sys.env.contains("SPARK_GRAFT_SWEEP_W9") &&
            (fc.filterAgg.isDefined || fc.orderedAgg.isDefined ||
              fc.groupingSel))
          println(s"W9 seed=$seed rows=${viaDf.size} " +
            s"fa=${fc.filterAgg.isDefined} oa=${fc.orderedAgg.isDefined} " +
            s"gs=${fc.groupingSel}")
        // wave-14 candidate scan
        if (sys.env.contains("SPARK_GRAFT_SWEEP_W14") &&
            (fc.latWin || fc.caseExists.isDefined ||
              fc.frameExprOrd.isDefined))
          println(s"W14 seed=$seed rows=${viaDf.size} " +
            s"lw=${fc.latWin} ce=${fc.caseExists.isDefined} " +
            s"fe=${fc.frameExprOrd.isDefined}")
        if (viaDf != viaSql) {
          bad += 1
          println(s"DIVERGED seed=$seed df=${viaDf.size} sql=${viaSql.size}")
          println(fc.sql)
        }
      } catch { case e: Throwable =>
        bad += 1
        println(s"ERROR seed=$seed: ${e.getMessage.take(200)}")
        println(fc.sql)
        e.getStackTrace.take(8).foreach(f => println(s"  at $f"))
      }
      if (seed % 50 == 0) println(s"...$seed done")
    }
    println(s"sweep [$lo,$hi]: ${if (bad == 0) "ALL CLEAN" else s"$bad bad"}")
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
