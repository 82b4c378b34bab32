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

  test("globalRunningSum matches the single-partition window reference") {
    val df = Seq.tabulate(97)(i =>
        (i.toLong, ((i * 13) % 11).toDouble, ((i * 7) % 23 + 1).toLong))
      .toDF("id", "v", "tok")
    def run(parts: Int) = Rank.globalRunningSum(df,
        Seq(col("v"), col("id")), col("tok"), out = "cum",
        numParts = parts)
      .select(col("id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("id"))
      .rowsBetween(Long.MinValue, 0)
    val want = df.select(col("id"),
        sum(col("tok")).over(w).cast("long").as("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(4) === want, "prefix sums must equal the window reference")
    assert(run(9) === want, "the partition count must not change sums")
    // more partitions than rows: empty ranges contribute zero offsets
    val tiny = Seq((1L, 2.0, 5L), (2L, 1.0, 7L), (3L, 3.0, 11L))
      .toDF("id", "v", "tok")
    val got = Rank.globalRunningSum(tiny, Seq(col("v"), col("id")),
        col("tok"), out = "cum", numParts = 8)
      .select(col("id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 7L, 1L -> 12L, 3L -> 23L))
  }

  test("globalRunningSum fails loudly on NULL values (never folds 0)") {
    val df = Seq((1L, 1.0, java.lang.Long.valueOf(5L)),
        (2L, 2.0, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "v", "tok")
    val e = intercept[Exception] {
      Rank.globalRunningSum(df, Seq(col("v"), col("id")), col("tok"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq() else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL value column")),
      s"expected the loud NULL guard, got: ${msgs(e).mkString(" | ")}")
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

  test("mmrRerank matches a naive greedy reference") {
    val rnd = new scala.util.Random(5)
    val n = 40; val dim = 8
    val rows = (0L until n).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = rows.toDF("vec_id", "embedding")
    val (nA, pool, k, lam) = (2, 10, 4, 0.7)
    val got = Rank.mmrRerank(df, "vec_id", "embedding", nA, pool, k, lam)
      .select("qid", "pick_rank", "id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    // naive reference: exact greedy MMR per anchor, double arithmetic
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.indices.map(i => x(i).toDouble * y(i).toDouble).sum
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val byId = rows.toMap
    for (q <- 0L until nA) {
      val cand = rows.filter(_._1 != q)
        .map { case (i, v) => (i, cos(byId(q), v)) }
        .sortBy { case (i, r) => (-r, i) }.take(pool)
      var sel = Seq.empty[Long]
      for (_ <- 1 to k) {
        val remaining = cand.filterNot { case (i, _) => sel.contains(i) }
        val pick = remaining.map { case (i, r) =>
          val ms = if (sel.isEmpty) 0.0
            else sel.map(s => cos(byId(i), byId(s))).max
          (i, lam * r - (1.0 - lam) * ms)
        }.minBy { case (i, s) => (-s, i) }._1
        sel = sel :+ pick
      }
      assert(got(q) === sel, s"anchor $q")
    }
  }

  test("mmrRerank first pick is the relevance argmax and later picks diversify") {
    // anchor 0; items: 1 and 2 nearly parallel high-relevance, 3
    // orthogonal-ish lower relevance. MMR must take 1 then 3, not 1,2.
    val df = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0.9f, 0.11f, 0f)),
      (3L, Array(0.3f, 0f, 0.95f)))
      .toDF("vec_id", "embedding")
    val got = Rank.mmrRerank(df, "vec_id", "embedding",
        nAnchors = 1, pool = 3, k = 2, lambda = 0.5)
      .select("pick_rank", "id").as[(Int, Long)].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(got.head === 1L)
    assert(got(1) === 3L, "second pick should diversify away from 1/2")
  }
}
