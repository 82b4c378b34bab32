package graft.tools
import org.apache.spark.sql.SparkSession
object SeedRows {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (s <- args.map(_.toInt))
      println(s"[rows] $s -> ${graft.fuzz.FuzzGen.gen(s).run(spark, "/root/testdata/sf0.01").count()}")
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
