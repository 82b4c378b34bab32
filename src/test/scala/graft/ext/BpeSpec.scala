package graft.ext

import graft.SparkSuite

class BpeSpec extends SparkSuite {

  import spark.implicits._

  test("learns the hand-computable merges of a tiny corpus") {
    // "low" x5, "lower" x2, "lowest" x1: pair (l,o) count 8 dominates;
    // then (lo,w) 8; then "low" complete at 5... classic Sennrich walk
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq("lowest")
    val out = Bpe.trainMerges(docs.toDF("text"), "text", merges = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1, "l o", "lo", 8L)))
    assert(out(1) == ((2, "lo w", "low", 8L)))
    // after "low": "low e" appears in lower+lowest = 3 (beats "e r" 2)
    assert(out(2) == ((3, "low e", "lowe", 3L)))
  }

  test("encode compresses with learned merges and respects word boundaries") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).toDF("text")
      .withColumn("doc_id", org.apache.spark.sql.functions.monotonically_increasing_id())
    val merges = Bpe.trainMerges(docs, "text", 2)
      .orderBy("step").collect().map(_.getString(1)).toSeq
    assert(merges == Seq("l o", "lo w"))
    // doc "low low": 6 symbols → 2 tokens ("low", "low"); the merge
    // must NOT bridge the double-space word boundary
    val one = Seq(("a", "low low")).toDF("k", "text")
      .withColumn("doc_id", org.apache.spark.sql.functions.lit(1L))
    val enc = Bpe.encode(one, "text", "doc_id", merges).collect().head
    assert(enc.getAs[Long]("n_symbols") == 6L)
    assert(enc.getAs[Long]("n_bpe_tokens") == 2L)
    assert(enc.getAs[Double]("compression") == 3.0)
  }

  test("merge application handles runs (a b a b) via the fixed passes") {
    // word "abab" x3: first merge (a,b) count 6 must merge BOTH
    // occurrences, giving pair (ab,ab) count 3 next round
    val docs = Seq.fill(3)("abab").toDF("text")
    val out = Bpe.trainMerges(docs, "text", merges = 2)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(out(0) == (("a b", 6L)))
    assert(out(1) == (("ab ab", 3L)))
  }
}
