package graft.io

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Format coverage beyond parquet/csv/xlsx/json (§2.1) and the join
  * strategy-control levers a 100 TB tuner reaches for.
  */
class FormatSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("ORC roundtrip preserves schema, rows, and pushes filters") {
    val out = Files.createTempDirectory("orc").resolve("orders").toString
    val src = spark.read.parquet(s"$dir/orders.parquet")
    src.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val filtered = back.filter(col("o_orderkey") === 7L)
    filtered.collect()
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("o_orderkey"),
      s"ORC scan did not receive the pushed filter:\n$p")
  }

  test("zstd-compressed parquet writes read back identically") {
    val out = Files.createTempDirectory("zstd").resolve("t").toString
    val src = spark.read.parquet(s"$dir/lineitem.parquet").limit(1000)
    src.write.option("compression", "zstd").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.contains(".zstd.")), "zstd codec not applied")
  }

  test("schema evolution on read: mergeSchema unions batch schemas") {
    val out = Files.createTempDirectory("evolve").resolve("t").toString
    // batch 1: (id, a) — batch 2 adds column b
    spark.range(0, 5).select(col("id"), lit("x").as("a"))
      .write.parquet(s"$out/batch=1")
    spark.range(5, 10).select(col("id"), lit("y").as("a"), lit(7L).as("b"))
      .write.parquet(s"$out/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet == Set("id", "a", "b", "batch"))
    assert(merged.count() == 10)
    // rows from batch 1 surface null b, not an error
    assert(merged.filter(col("batch") === 1 && col("b").isNull).count() == 5)
  }

  test("observe() exposes pipeline metrics without a second pass") {
    import org.apache.spark.sql.Observation
    val obs = Observation("ingest_metrics")
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .observe(obs, count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).as("n_big"))
      .filter(col("o_orderstatus") === "O")
    val kept = df.count()
    val m = obs.get
    // metrics describe the FULL observed pass, not the filtered result
    assert(m("n_rows").asInstanceOf[Long] > kept)
    assert(m("n_big").asInstanceOf[Long] > 0L)
  }

  test("join strategy hints are honored (merge / shuffle_hash vs auto broadcast)") {
    val fact = spark.read.parquet(s"$dir/orders.parquet")
    val dim = spark.read.parquet(s"$dir/customer.parquet")
    def planOf(j: org.apache.spark.sql.DataFrame) =
      j.queryExecution.executedPlan.toString
    // small dim auto-broadcasts...
    val auto = planOf(fact.join(dim, col("o_custkey") === col("c_custkey")))
    assert(auto.contains("BroadcastHashJoin"))
    // ...unless the tuner pins sort-merge (e.g. to avoid driver memory)
    val merge = planOf(fact.join(dim.hint("merge"),
      col("o_custkey") === col("c_custkey")))
    assert(merge.contains("SortMergeJoin"), s"merge hint ignored:\n$merge")
    // ...or shuffled hash (build side fits per-partition, skip the sort)
    val shj = planOf(fact.join(dim.hint("shuffle_hash"),
      col("o_custkey") === col("c_custkey")))
    assert(shj.contains("ShuffledHashJoin"), s"shuffle_hash hint ignored:\n$shj")
  }
}
