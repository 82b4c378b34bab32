package graft.io

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Storage-layout levers for the 100 TB design: bucketed co-located
  * joins (no exchange) and partition pruning at the scan.
  */
class LayoutSpec extends SparkSuite {

  test("bucketed tables join without a shuffle exchange") {
    // external tables at explicit paths: warehouse dir is a static conf
    val wh = Files.createTempDirectory("warehouse")
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", wh.resolve("li").toString)
      .mode("overwrite").saveAsTable("li_bucketed")
    spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", wh.resolve("ord").toString)
      .mode("overwrite").saveAsTable("ord_bucketed")

    // keep the join out of broadcast range so the bucketing is what
    // avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("partitioned writes prune partitions at the scan") {
    val out = Files.createTempDirectory("part").resolve("events").toString
    graft.queries.H.t(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val df = spark.read.parquet(out).filter(col("event_type") === "click")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter at the scan:\n$p")
    // and the predicate never appears as a post-scan data Filter
    assert(!p.linesIterator.exists(l => l.trim.startsWith("+- Filter") && l.contains("event_type")),
      s"partition predicate evaluated per-row instead of pruned:\n$p")
  }

  test("compaction collapses many small files into few, preserving rows") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("compact").resolve("t").toString
    val df = spark.range(0, 10000).withColumn("v", col("id") * 2)
    // simulate append-heavy ingest: 40 tiny files
    df.repartition(40).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 40)

    val nOut = graft.io.Sink.compact(spark, dir, targetBytes = 1L << 20)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == nOut && after < before, s"expected <$before files, got $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(sum(col("v"))).head().getLong(0) == (0L until 10000L).map(_ * 2).sum)
  }
}
