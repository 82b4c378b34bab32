package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSuite {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val orders = spark.read.parquet(s"$dir/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$dir/customer.parquet")

  test("pruned join result == plain join result") {
    val dim = customer.filter(col("c_nationkey") === 3)
    val pruned = BloomJoin.prunedEquiJoin(orders, "o_custkey", dim, "c_custkey")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val plain = orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned == plain)
  }

  test("bloom actually prunes: the pre-filter passes few non-joining rows") {
    val dim = customer.filter(col("c_nationkey") === 3)
    val bloom = BloomJoin.buildBloom(dim, col("c_custkey"), 1 << 16, 3)
    val passed = orders
      .filter(BloomJoin.mightContain(col("o_custkey"), bloom, 1 << 16, 3))
      .count()
    val joining = orders.join(dim, col("o_custkey") === col("c_custkey")).count()
    val total = orders.count()
    assert(passed < total / 2,
      s"bloom passed $passed of $total rows — no pruning happened")
    assert(passed >= joining, "bloom must never drop a joining row")
  }

  test("plan shape: the bloom Filter sits on the fact scan below the join") {
    val dim = customer.filter(col("c_nationkey") === 3)
    val plan = BloomJoin.prunedEquiJoin(orders, "o_custkey", dim, "c_custkey")
      .queryExecution.executedPlan.toString
    val filterAt = plan.indexOf("xxhash64")
    val joinAt = plan.indexOf("Join")
    assert(filterAt >= 0, "bloom probe missing from physical plan")
    assert(joinAt >= 0 && joinAt < filterAt,
      "bloom Filter should appear beneath (after, in tree print) the join")
  }
}
