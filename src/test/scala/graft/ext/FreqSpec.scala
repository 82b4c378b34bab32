package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FreqSpec extends SparkSuite {

  import spark.implicits._

  test("MG guarantee on an adversarial skewed stream") {
    // 3 heavy terms (1000 each) drowned in 5000 distinct singletons
    val n = 3 * 1000 + 5000
    val terms = (Seq.fill(1000)("hot1") ++ Seq.fill(1000)("hot2") ++
      Seq.fill(1000)("hot3") ++ (1 to 5000).map(i => s"rare$i"))
    val df = terms.toDF("term").repartition(16) // adversarial partitioning
    val k = 10
    val mg = Freq.heavyHitters(df, "term", k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mg.size <= k, s"sketch grew past k: ${mg.size}")
    for (h <- Seq("hot1", "hot2", "hot3")) {
      assert(mg.contains(h), s"$h (freq 1000 > n/(k+1)=${n / (k + 1)}) missing")
      assert(mg(h) >= 1000L - n / (k + 1),
        s"$h count ${mg(h)} under-estimates by more than n/(k+1)")
      assert(mg(h) <= 1000L, s"$h count ${mg(h)} OVER-estimates true 1000")
    }
  }

  test("exact-distribution input: sketch equals exact counts when m <= k") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("term")
    val mg = Freq.heavyHitters(df, "term", 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mg == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }
}
