package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The exact-first collapse face ([[Dedup.nearDupDropExactFirst]]) —
  * the clone-invariance lift the master chain's stage 7 runs on
  * (queries/ExtK.scala): identical texts collapse to one digest-keyed
  * representative BEFORE the pair face, and the removal verdict is
  * provably the raw pairwise rule's verdict on the full input.
  */
class ExactFirstSpec extends SparkSuite {
  import spark.implicits._

  // base corpus: a near-dup pair (3-gram j ≈ 0.78), an unrelated doc,
  // identical empty texts, identical sub-3-token texts (the
  // shingleIndex whole-text-fallback path)
  private val base = Seq(
    0L -> "the quick brown fox jumps over the lazy dog today",
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "completely different content about spark engines and data",
    3L -> "",
    4L -> "",
    5L -> "hi",
    6L -> "hi")

  // ×10 clone fixture: every text replicated under distinct ids, the
  // original id staying the group minimum (id*10 + rep)
  private def cloned(k: Int) = base.flatMap { case (id, text) =>
    (0 until k).map(rep => (id * 10 + rep, text))
  }.toDF("doc_id", "text")

  /** The raw pairwise verdict on the FULL input: any doc that is the
    * larger side of a qualifying pair drops (the definition the
    * collapse face must reproduce).
    */
  private def naiveDrops(df: org.apache.spark.sql.DataFrame): Set[Long] =
    Dedup.ngramJaccardPairs(df, "text", "doc_id", k = 3, threshold = 0.5)
      .select(col("doc_b")).distinct().as[Long].collect().toSet

  test("collapse is clone-invariant: reps = distinct texts at x10") {
    val reps = Dedup.wholeDocReps(cloned(10), "text", "doc_id")
    assert(reps.count() === base.map(_._2).distinct.size)
    // min-id representative per group, text carried through
    val got = reps.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toMap
    assert(got(0L) === base(0)._2)
    assert(got(30L) === "")
    assert(got(50L) === "hi")
  }

  test("verdict equals the raw pairwise rule on the x10 clone fixture") {
    val df = cloned(10).cache()
    val got = Dedup.nearDupDropExactFirst(df, "text", "doc_id",
      k = 3, threshold = 0.5).as[Long].collect().toSet
    assert(got === naiveDrops(df))
    // and the survivors are exactly the earliest doc of each near-dup
    // cluster: doc 0 (near-dup group incl. text 1's clones), doc 20
    // (unrelated), doc 30 (empties), doc 50 ("hi"s)
    val survivors = df.select(col("doc_id")).as[Long].collect().toSet -- got
    assert(survivors === Set(0L, 20L, 30L, 50L))
    df.unpersist()
  }

  test("LSH face agrees with the exact face on the clone fixture") {
    val df = cloned(10)
    val exact = Dedup.nearDupDropExactFirst(df, "text", "doc_id",
      k = 3, threshold = 0.5).as[Long].collect().toSet
    val lsh = Dedup.nearDupDropExactFirst(df, "text", "doc_id",
      k = 3, threshold = 0.5, lsh = true).as[Long].collect().toSet
    assert(lsh === exact)
  }

  test("incremental face: in-batch clone burst collapses, verdicts unchanged") {
    def run(collapse: Boolean): Set[Long] = {
      val state = java.nio.file.Files
        .createTempDirectory("exfirst_inc").toString + "/st"
      // batch 0: originals; batch 1: a x5 clone burst of batch 0's
      // survivors plus one fresh doc — clones must drop cross-batch,
      // the fresh doc must survive, with or without the collapse
      val b0 = base.toDF("doc_id", "text")
      Dedup.minhashDedupIncremental(b0, "text", "doc_id", state,
        k = 3, threshold = 0.5, batchTag = Some(0L),
        collapseExact = collapse)
      val b1 = base.flatMap { case (id, t) =>
        (1 to 5).map(r => (1000 + id * 10 + r, t))
      }.toDF("doc_id", "text")
        .unionByName(Seq(9999L ->
          "an entirely fresh document about streaming state generations")
          .toDF("doc_id", "text"))
      Dedup.minhashDedupIncremental(b1, "text", "doc_id", state,
        k = 3, threshold = 0.5, batchTag = Some(1L),
        collapseExact = collapse)
        .select(col("doc_id")).as[Long].collect().toSet
    }
    val withCollapse = run(collapse = true)
    assert(withCollapse === Set(9999L),
      "every clone of an earlier survivor must drop; the fresh doc survives")
    assert(run(collapse = false) === withCollapse,
      "exact-first collapse must not change the incremental verdict")
  }

  test("identical sub-k and empty texts dedup via the fallback shingle") {
    val df = Seq(1L -> "", 2L -> "", 7L -> "hi", 8L -> "hi", 9L -> "yo")
      .toDF("doc_id", "text")
    val got = Dedup.nearDupDropExactFirst(df, "text", "doc_id",
      k = 3, threshold = 0.5).as[Long].collect().toSet
    assert(got === Set(2L, 8L)) // later identicals drop; "yo" survives
  }
}
