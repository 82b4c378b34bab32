package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSuite {

  import spark.implicits._

  test("CM never underestimates; exact when no collisions possible") {
    val terms = (Seq.fill(100)("hot") ++ (1 to 50).map(i => s"t$i")).toDF("term")
    val sketch = Freq.countMin(terms, "term", width = 4096, depth = 4)
    val probe = Seq("hot", "t1", "t50").toDF("term")
    val est = Freq.cmEstimate(sketch, probe, "term", 4096, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 51 distinct terms into 4096 buckets x 4 rows: min-over-depth is
    // overwhelmingly collision-free; estimates must never be below true
    assert(est("hot") >= 100L && est("hot") <= 151L)
    assert(est("t1") >= 1L && est("t50") >= 1L)
  }

  test("sketch cells are mergeable: sum of shard sketches == whole sketch") {
    val all = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("term")
    val s1 = Freq.countMin(all.limit(50), "term", 64, 2)
    val s2 = Freq.countMin(all.exceptAll(all.limit(50)), "term", 64, 2)
    val merged = s1.unionByName(s2)
      .groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Freq.countMin(all, "term", 64, 2)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }
}
