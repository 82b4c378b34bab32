package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private def prints(texts: Seq[String], k: Int = 3, w: Int = 4) =
    texts.toDF("text")
      .select(Text.winnowPrints(col("text"), k, w).as("p"))
      .collect().map(_.getSeq[Long](0).toSet)

  test("winnowing guarantee: a shared k+w-1 token run yields a shared print") {
    // k=3, w=4 → any shared 6-token run must produce ≥1 shared print
    val shared = "alpha beta gamma delta epsilon zeta"
    val Array(a, b) = prints(Seq(
      s"one two $shared three four five six seven",
      s"nine ten eleven twelve $shared thirteen"))
    assert(a.intersect(b).nonEmpty,
      s"no shared print despite shared 6-token run: $a vs $b")
  }

  test("winnowing density: selects far fewer prints than grams") {
    val text = (1 to 200).map(i => s"w${i % 37}").mkString(" ")
    val n = prints(Seq(text)).head.size
    assert(n > 0 && n < 198, s"selected $n of 198 grams")
  }

  test("short documents: fewer grams than window → one print; fewer tokens than k → none") {
    val Array(oneWindow, none, exactK) =
      prints(Seq("a b c d", "a b", "a b c"))
    assert(oneWindow.size >= 1 && oneWindow.size <= 2)
    assert(none.isEmpty)
    assert(exactK.size === 1)
  }

  test("staged withWinnowPrints is value-identical to the single-Column form") {
    // the staged form exists purely to kill the O(n_windows x n_grams
    // x n_tokens) lambda re-evaluation — same algorithm, same output,
    // on boundary cases (short docs) and a real corpus slice alike
    val fixtures = Seq("a b", "a b c", "a b c d",
      (1 to 200).map(i => s"w${i % 37}").mkString(" "),
      "one two three four five six seven eight")
    val reference = prints(fixtures)
    val staged = Text.withWinnowPrints(fixtures.toDF("text"), "text",
        "p", k = 3, w = 4)
      .select("p").collect().map(_.getSeq[Long](0).toSet)
    assert(staged.toSeq === reference.toSeq)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val refCorpus = docs
      .select(col("doc_id"), Text.winnowPrints(col("text"), 3, 4).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val stagedCorpus = Text.withWinnowPrints(docs, "text", "p", 3, 4)
      .select("doc_id", "p")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(stagedCorpus === refCorpus)
  }

  test("digest-keyed exact dedup matches text-keyed survivors") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val byText = Dedup.exact(docs, "text", "doc_id")
      .select("survivor_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDigest = Dedup.exactByDigest(docs, "text", "doc_id")
      .select("survivor_id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byText === byDigest)
  }
}
