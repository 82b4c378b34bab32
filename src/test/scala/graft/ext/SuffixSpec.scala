package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Suffix-array prefix doubling: hand-walked rank ladder, equality of
  * every dyadic level with direct n-gram group counts, boundary
  * sentinels, partition independence.
  */
class SuffixSpec extends SparkSuite {
  import spark.implicits._

  test("dupProfile: hand-walked two-doc fixture") {
    val docs = Seq((1L, "a b a b"), (2L, "x a b y")).toDF("doc_id", "text")
    val prof = Suffix.dupProfile(docs, "text", "doc_id", maxLen = 4)
      .orderBy("span_len").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // len 1: a×3, b×3 duplicate; len 2: "a b"×3 (two in doc 1, one in
    // doc 2); len 4: nothing repeats
    assert(prof == Seq((1, 2L, 6L), (2, 1L, 3L), (4, 0L, 0L)))
  }

  test("topDupSpans reconstructs the duplicated window") {
    val docs = Seq((1L, "a b a b"), (2L, "x a b y")).toDF("doc_id", "text")
    val top = Suffix.topDupSpans(docs, "text", "doc_id", spanLen = 2, k = 5)
      .orderBy("rnk").collect()
    assert(top.length == 1)
    assert(top(0).getAs[Long]("n_occurrences") == 3L)
    assert(top(0).getAs[Long]("first_pos") == 1L)
    assert(top(0).getAs[String]("span_text") == "a b")
  }

  test("sentinels stop windows at document boundaries") {
    // "b | c" (end of doc 1 + start of doc 2) repeats inside doc 3 as
    // the literal bigram "b c" — the cross-boundary window must NOT
    // pair with it
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "b c b c"))
      .toDF("doc_id", "text")
    val prof = Suffix.dupProfile(docs, "text", "doc_id", maxLen = 2)
      .orderBy("span_len").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // len 2 duplicates: only "b c" at doc-3 positions (×2 would need
    // overlap: "b c b c" has "b c" at offsets 1 and 3 → one group of 2)
    assert(prof(1) == ((2, 1L, 2L)))
  }

  test("every dyadic level equals direct n-gram duplicate counts") {
    val docs = (0L until 60L).map { i =>
      val toks = (0 until 20).map(j => s"w${(i * 13 + j * j * 7) % 6}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val prof = Suffix.dupProfile(docs, "text", "doc_id", maxLen = 16)
      .orderBy("span_len").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (l <- Seq(1, 2, 4, 8, 16)) {
      val direct = docs
        .select(explode(Text.ngramArray(Text.tokens(col("text")), l)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .agg(count(lit(1)).cast("bigint").as("groups"),
          coalesce(sum(col("n")), lit(0L)).cast("bigint").as("positions"))
        .collect()(0)
      assert(prof(l) == ((direct.getLong(0), direct.getLong(1))),
        s"level $l must match direct $l-gram dup counts")
    }
  }

  test("exciseDupSpans removes later occurrences, keeps the first") {
    val docs = Seq((1L, "a b c d"), (2L, "x a b y"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = Suffix.exciseDupSpans(docs, "text", "doc_id", spanLen = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // "a b" occurs at global positions 1 (doc 1), 7 (doc 2), 11
    // (doc 3): the first occurrence survives, the later two kill
    // their 2-token windows
    assert(out == Seq(
      (1L, "a b c d", 4L),
      (2L, "x y", 2L),
      (3L, "", 0L)))
  }

  test("ranksAt: non-dyadic lengths equal direct n-gram duplicate counts") {
    val docs = (0L until 50L).map { i =>
      val toks = (0 until 17).map(j => s"w${(i * 11 + j * j * 5) % 7}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    for (l <- Seq(3, 5, 10, 12)) {
      val (_, rank) = Suffix.ranksAt(docs, "text", "doc_id", l)
      val got = rank.groupBy(col("rank"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .agg(count(lit(1)).cast("bigint"),
          coalesce(sum(col("n")), lit(0L)).cast("bigint"))
        .collect()(0)
      val direct = docs
        .select(explode(Text.ngramArray(Text.tokens(col("text")), l)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .agg(count(lit(1)).cast("bigint"),
          coalesce(sum(col("n")), lit(0L)).cast("bigint"))
        .collect()(0)
      assert((got.getLong(0), got.getLong(1)) ==
        ((direct.getLong(0), direct.getLong(1))),
        s"length-$l window ranks must match direct $l-gram dup counts")
    }
  }

  test("exciseDupSpans equals spanDedup at the master's non-dyadic span") {
    // the registered twin's contract in miniature: collision-free
    // fingerprints + exact ranks must produce byte-identical excision
    val docs = (0L until 80L).map { i =>
      val toks = (0 until 30).map { j =>
        if (i % 7 == 2 && j >= 10 && j < 22) s"shared${j}"
        else s"w${(i * 13 + j * 3) % 23}_$i"
      }
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val exact = Suffix.exciseDupSpans(docs, "text", "doc_id", spanLen = 10)
      .select(col("doc_id"), col("deduped_text"), col("n_kept_tokens"))
      .orderBy("doc_id").collect().toSeq
    val sliding = Dedup.spanDedup(docs, "text", "doc_id", span = 10)
      .select(col("doc_id"), col("deduped_text"), col("n_kept_tokens"))
      .orderBy("doc_id").collect().toSeq
    assert(exact === sliding,
      "rank-identity excision must reproduce sliding-window dedup")
  }

  test("maxDupSpan finds the exact non-dyadic longest duplicate") {
    // shared 6-token run "a b c d e f" inside different contexts: the
    // level-4 groups pair its windows, the extension walks past the
    // dyadic boundary to the exact length 6
    val docs = Seq((1L, "q a b c d e f x"), (2L, "z a b c d e f y"))
      .toDF("doc_id", "text")
    val out = Suffix.maxDupSpan(docs, "text", "doc_id",
      baseLen = 4, maxExt = 32).collect()(0)
    assert(out.getAs[Long]("max_dup_len") == 6L)
    // three window pairs ("a b c d", "b c d e", "c d e f"), one
    // achieves the max
    assert(out.getAs[Long]("n_pairs") == 3L)
    assert(out.getAs[Long]("n_pairs_at_max") == 1L)
    assert(!out.getAs[Boolean]("saturated"))
  }

  test("maxDupSpan flags saturation when a pair hits the maxExt cap") {
    // two identical 12-token docs, cap 8 < 12: every extension runs
    // out of budget before the sentinel mismatch — the statistic is
    // understated and the row must say so
    val text = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = Suffix.maxDupSpan(docs, "text", "doc_id",
      baseLen = 4, maxExt = 8).collect()(0)
    assert(out.getAs[Long]("max_dup_len") == 8L)
    assert(out.getAs[Boolean]("saturated"))
    // a cap past the doc length reports the exact answer, unsaturated
    val ok = Suffix.maxDupSpan(docs, "text", "doc_id",
      baseLen = 4, maxExt = 16).collect()(0)
    assert(ok.getAs[Long]("max_dup_len") == 12L)
    assert(!ok.getAs[Boolean]("saturated"))
  }

  test("maxDupSpan on a duplicate-free corpus is the NULL/0 row") {
    val docs = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val out = Suffix.maxDupSpan(docs, "text", "doc_id",
      baseLen = 2, maxExt = 8).collect()(0)
    assert(out.isNullAt(0) && out.getAs[Long]("n_pairs") == 0L)
    assert(!out.getAs[Boolean]("saturated"))
  }

  test("exciseDupSpansExactFirst equals the raw face under heavy cloning") {
    // clones of long docs (fully excised members), clones of SHORT
    // docs (< span tokens — intact members), an empty-text pair, and
    // unrelated docs sharing a span with a clone group
    val long = (1 to 6).map(i => s"L$i").mkString(" ")
    val docs = (Seq(
      (1L, long), (2L, long), (3L, long),      // long clone group
      (4L, "a b"), (9L, "a b"),                // short clone group
      (5L, ""), (6L, ""),                      // empty pair
      (7L, s"x y $long"),                      // shares the span, not a clone
      (8L, "p q r s t u v w")))                // clean
      .toDF("doc_id", "text")
    for (span <- Seq(3, 4)) {
      val raw = Suffix.exciseDupSpans(docs, "text", "doc_id", span)
        .orderBy("doc_id").collect().toSeq
      val first = Suffix.exciseDupSpansExactFirst(docs, "text", "doc_id", span)
        .orderBy("doc_id").collect().toSeq
      assert(first === raw,
        s"exact-first excision must equal the raw face at span $span")
    }
  }

  test("exciseDupSpansExactFirst keeps NULL-text docs (raw-face parity)") {
    // sha2(NULL) is NULL — before the r18 coalesce the digest join
    // silently DROPPED a NULL-text doc; the raw face emits ('', 0) for
    // it, and the collapsed face must too
    val long = (1 to 6).map(i => s"L$i").mkString(" ")
    val docs = Seq((1L, long), (2L, long), (3L, null.asInstanceOf[String]),
        (4L, ""), (5L, "p q r"))
      .toDF("doc_id", "text")
    val raw = Suffix.exciseDupSpans(docs, "text", "doc_id", 3)
      .orderBy("doc_id").collect().toSeq
    val first = Suffix.exciseDupSpansExactFirst(docs, "text", "doc_id", 3)
      .orderBy("doc_id").collect().toSeq
    assert(first.map(_.getLong(0)) === Seq(1L, 2L, 3L, 4L, 5L),
      "every doc, NULL text included, must appear exactly once")
    assert(first === raw, "NULL-text docs must reconstruct like the raw face")
  }

  test("contaminationSpanDepth: exact shared-span lengths, cross-set only") {
    // eval doc 1 carries "q w e r t"; eval doc 2 carries it TWICE
    // (n_base_hits counts DISTINCT corpus windows, so the eval-side
    // repetition must NOT inflate it — the r18 semantic); corpus doc
    // 10 shares exactly those 5 tokens; doc 12 is a clone of doc 10
    // (corpus-corpus duplication must NOT pair); doc 11 shares nothing
    val docs = Seq(
      (1L, "q w e r t y u i"),
      (2L, "mm q w e r t nn q w e r t"),
      (10L, "a b q w e r t z"),
      (11L, "f g h j k l zz xx"),
      (12L, "a b q w e r t z")).toDF("doc_id", "text")
    val out = Suffix.contaminationSpanDepth(docs, "text", "doc_id",
        evalPred = col("doc_id") < 10, baseLen = 4, maxExt = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    // two DISTINCT colliding base windows each ("q w e r" extends to
    // 5, "w e r t" to 4) even though each pairs with three eval
    // positions; doc 11 absent; eval docs never appear
    assert(out == Seq((10L, 5L, 2L, false), (12L, 5L, 2L, false)))
  }

  test("topLeakedSpans ranks eval windows by corpus occurrences") {
    // eval doc 1 carries "q w e r"; it appears twice in doc 10 and
    // once in doc 12 → 3 corpus occurrences over 2 docs; "w e r t"
    // appears only in doc 12 → 1/1; corpus-only dup spans (doc 11 ↔
    // 13) must NOT appear
    val docs = Seq(
      (1L, "q w e r t"),
      (10L, "q w e r x q w e r y"),
      (11L, "k l m n o p"),
      (12L, "z q w e r t z"),
      (13L, "k l m n o p")).toDF("doc_id", "text")
    val out = Suffix.topLeakedSpans(docs, "text", "doc_id",
        evalPred = col("doc_id") < 10, spanLen = 4, k = 10)
      .orderBy("rnk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getString(4))).toSeq
    assert(out == Seq(
      (1, 3L, 2L, "q w e r"),
      (2, 1L, 1L, "w e r t")))
  }

  test("contaminationSpanDepth flags saturation at the cap") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, shared), (20L, shared)).toDF("doc_id", "text")
    val out = Suffix.contaminationSpanDepth(docs, "text", "doc_id",
        evalPred = col("doc_id") < 10, baseLen = 4, maxExt = 8)
      .collect()(0)
    assert(out.getAs[Long]("max_shared_span") == 8L)
    assert(out.getAs[Boolean]("saturated"))
    val ok = Suffix.contaminationSpanDepth(docs, "text", "doc_id",
        evalPred = col("doc_id") < 10, baseLen = 4, maxExt = 16)
      .collect()(0)
    assert(ok.getAs[Long]("max_shared_span") == 12L)
    assert(!ok.getAs[Boolean]("saturated"))
  }

  test("dupProfile is partition-independent") {
    val docs = (0L until 30L)
      .map(i => (i, s"t${i % 4} t${(i * 3) % 5} t${i % 4} t${i % 2} t${i % 4}"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      Suffix.dupProfile(docs.repartition(parts), "text", "doc_id", maxLen = 8)
        .orderBy("span_len").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(1) == run(7))
  }
}
