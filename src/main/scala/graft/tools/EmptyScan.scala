package graft.tools
import org.apache.spark.sql.SparkSession
object EmptyScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    var n = 0
    for (seed <- (1 to 80) ++ graft.fuzz.FuzzGen.driverSeeds.filter(_ > 80)) {
      val fc = graft.fuzz.FuzzGen.gen(seed)
      val c = fc.run(spark, dir).count()
      if (c == 0) println(s"EMPTY seed=$seed having=${fc.havingSub.isDefined} lateral=${fc.lateralAgg.isDefined} kind=${fc.joinKind} shape=${fc.shape.getClass.getSimpleName}")
      else n += 1
    }
    println(s"nonEmpty=$n")
    spark.stop()
  }
}
