package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RankSpec extends SparkSuite {
  import spark.implicits._

  test("globalRowNumber matches the single-partition window reference") {
    val df = Seq(
      (1L, 30.0), (2L, 10.0), (3L, 30.0), (4L, 50.0), (5L, 20.0),
      (6L, 10.0), (7L, 40.0), (8L, 20.0), (9L, 60.0), (10L, 30.0))
      .toDF("id", "v")
    val got = Rank.globalRowNumber(df,
        Seq(col("v").desc, col("id")), out = "rn", numParts = 4)
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("id"))
    val want = df.select(col("id"),
        row_number().over(w).cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("globalRowNumber survives more partitions than rows (empty ranges)") {
    val df = Seq((1L, 2.0), (2L, 1.0), (3L, 3.0)).toDF("id", "v")
    val got = Rank.globalRowNumber(df, Seq(col("v"), col("id")),
        out = "rn", numParts = 8)
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  test("globalRowNumber assigns each rank exactly once on duplicates") {
    val df = Seq.tabulate(100)(i => (i.toLong, (i % 7).toDouble))
      .toDF("id", "v")
    val rns = Rank.globalRowNumber(df, Seq(col("v"), col("id")),
        out = "rn", numParts = 5)
      .select(col("rn")).collect().map(_.getLong(0)).sorted
    assert(rns === (1L to 100L).toArray)
  }

  test("globalRowNumber plan has no single-partition exchange") {
    val df = Seq.tabulate(50)(i => (i.toLong, (i * 13 % 11).toDouble))
      .toDF("id", "v")
    // the numbering path goes range-exchange → narrow maps; the trap
    // this operator exists to avoid is Exchange SinglePartition
    val parted = df.repartitionByRange(4, col("v"), col("id"))
      .sortWithinPartitions(col("v"), col("id"))
    val plan = parted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"))
    assert(!plan.contains("SinglePartition"))
  }

  test("rrfFuse sums reciprocal ranks across lists, exactly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val f = Rank.rrfFuse(Seq(a, b), "id", "rank", k = 60)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_lists"), r.getAs[Double]("rrf_score"))).toMap
    def t(r: Int) = BigDecimal(1.0 / (60.0 + r))
      .setScale(14, BigDecimal.RoundingMode.HALF_UP)
    assert(f(20L)._1 == 2, "id in both lists")
    assert(f(20L)._2 == (t(2) + t(1)).toDouble)
    assert(f(10L) == ((1L, t(1).toDouble)))
    // consensus beats a single first place: 20 outranks 10
    assert(f(20L)._2 > f(10L)._2)
  }
}
