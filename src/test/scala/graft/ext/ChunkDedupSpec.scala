package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ChunkDedupSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int) =
    Dedup.chunkDedup(rows.toDF("doc_id", "text"), "text", "doc_id", k)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("first occurrence survives, later occurrences are cut") {
    // k=2 segments: doc 1 = [a b][c d], doc 2 = [c d][e f] → doc 2
    // loses its first segment to doc 1's second
    val got = run(Seq(1L -> "a b c d", 2L -> "c d e f"), k = 2)
    assert(got === Array(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f")))
  }

  test("a fully duplicated document dedups to empty text") {
    val got = run(Seq(1L -> "a b c d", 2L -> "a b c d"), k = 2)
    assert(got === Array(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 0L, "")))
  }

  test("in-document repetition is also cut") {
    val got = run(Seq(1L -> "x y x y x y"), k = 2)
    assert(got === Array((1L, 3L, 1L, "x y")))
  }

  test("short document is one segment; survivors keep original order") {
    val got = run(Seq(
      1L -> "p q",
      2L -> "m n o p q r s t u v w z a b"), k = 4)
    // doc 2: [m n o p][q r s t][u v w z][a b] — no 4-token segment
    // equals doc 1's 2-token segment, so nothing is cut
    assert(got === Array(
      (1L, 1L, 1L, "p q"),
      (2L, 4L, 4L, "m n o p q r s t u v w z a b")))
  }

  test("dup_frac is the cut fraction") {
    val df = Seq(1L -> "a b c d", 2L -> "a b x x").toDF("doc_id", "text")
    val fracs = Dedup.chunkDedup(df, "text", "doc_id", 2)
      .orderBy(col("doc_id"))
      .collect().map(r => r.getAs[Double]("dup_frac"))
    assert(fracs === Array(0.0, 0.5))
  }
}
