package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingIncrementalSpec extends SparkSuite {

  import spark.implicits._

  test("weightedSample: deterministic under repartition, honors k, ranks consistent") {
    val df = (1L to 200L).map(i => (i, (i % 7 + 1) * 10)).toDF("id", "w")
    val a = Sampling.weightedSample(df, col("id"), col("w"), 20).collect()
    val b = Sampling.weightedSample(df.repartition(13), col("id"), col("w"), 20)
      .collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq,
      "selection changed under repartition")
    assert(a.length == 20)
    assert(a.map(_.getAs[Long]("sel_rank")).toSeq == (1L to 20L))
    // k > n degenerates to all rows
    val tiny = Sampling.weightedSample(df.limit(5), col("id"), col("w"), 20)
    assert(tiny.count() == 5)
  }

  test("weightedSample: heavy rows are strongly favored") {
    // 100 rows of weight 1 vs 10 rows of weight 1000 — A-ES should pick
    // mostly (not provably all) heavy rows into a k=10 sample
    val df = ((1L to 100L).map(i => (i, 1L)) ++
      (101L to 110L).map(i => (i, 1000L))).toDF("id", "w")
    val picked = Sampling.weightedSample(df, col("id"), col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    val heavy = picked.count(_ > 100L)
    assert(heavy >= 8, s"only $heavy of 10 picks were heavy-weight rows")
  }

  test("exactIncremental: in-batch and cross-batch duplicates both drop") {
    val hist = Seq((1L, "seen before"), (2L, "old content")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen before"),   // cross-batch dup → dropped
      (11L, "fresh a"),       // admitted
      (12L, "fresh a"),       // in-batch dup of 11 → folded into it
      (13L, "fresh b")        // admitted
    ).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch, hist, "text", "doc_id")
      .orderBy("survivor_id").collect()
    assert(out.map(_.getAs[Long]("survivor_id")).toSeq == Seq(11L, 13L))
    assert(out.head.getAs[Long]("n_batch_copies") == 2L)
  }

  test("waterFill saturates small domains and redistributes exactly") {
    import org.apache.spark.sql.functions.col
    // equal weights, budget 100: fair share 25; a (cap 10) saturates,
    // then share (100-10)/3 = 30; b (cap 30) saturates at round 2;
    // c and d split (100-40) = 30 each under caps 50/80
    val domains = Seq(("a", 10L), ("b", 30L), ("c", 50L), ("d", 80L))
      .toDF("dom", "cap").withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val r = Sampling.waterFill(domains, "dom", "cap", "w", total = 100L)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Boolean]("saturated"), x.getAs[Long]("alloc"))).toMap
    assert(r("a") == ((true, 10L)))
    assert(r("b") == ((true, 30L)))
    assert(r("c") == ((false, 30L)))
    assert(r("d") == ((false, 30L)))
    // never exceeds the budget, never exceeds a cap
    assert(r.values.map(_._2).sum <= 100L)
  }

  test("waterFill with ample budget gives every domain its cap") {
    import org.apache.spark.sql.functions.lit
    val domains = Seq(("a", 10L), ("b", 20L)).toDF("dom", "cap")
      .withColumn("w", lit(1L))
    val r = Sampling.waterFill(domains, "dom", "cap", "w", total = 1000L)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("alloc")).toMap
    assert(r == Map("a" -> 10L, "b" -> 20L))
  }
}
