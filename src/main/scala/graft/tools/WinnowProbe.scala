package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan probe (not committed). */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val prints = graft.ext.Text.withWinnowPrints(docs, "text", "_prints", 3, 4)
      .select(col("doc_id"), explode(col("_prints")).as("p"))
    val p = prints.queryExecution.optimizedPlan.toString
    println("nGenerate=" + p.linesIterator.count(_.contains("Generate")))
    println("nProject=" + p.linesIterator.count(_.contains("Project")))
    p.linesIterator.take(8).foreach(l => println(l.take(200)))
    spark.stop()
  }
}
