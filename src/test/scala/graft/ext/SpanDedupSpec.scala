package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  private def runGlobal(rows: Seq[(Long, String)], span: Int) =
    Dedup.spanDedup(rows.toDF("doc_id", "text"), "text", "doc_id", span)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

  private def runIntra(rows: Seq[(Long, String)], span: Int) =
    Dedup.intraDocDedup(rows.toDF("doc_id", "text"), "text", "doc_id", span)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

  test("a straddling duplicated passage is excised wherever it reappears") {
    // doc 2 embeds doc 1's "b c d" mid-document: chunk dedup with
    // disjoint 3-token segments would MISS it (doc 2's segments are
    // [x b c][d y z]); stride-1 spans catch it at offset 1
    val got = runGlobal(Seq(1L -> "a b c d e", 2L -> "x b c d y z"), span = 3)
    assert(got(0) === ((1L, 5L, 5L, 0L, "a b c d e")))
    assert(got(1) === ((2L, 6L, 3L, 3L, "x y z")))
  }

  test("fully duplicated document dedups to empty; first occurrence wins") {
    val got = runGlobal(Seq(1L -> "a b c d", 2L -> "a b c d"), span = 2)
    assert(got === Array(
      (1L, 4L, 4L, 0L, "a b c d"),
      (2L, 4L, 0L, 4L, "")))
  }

  test("documents shorter than the span pass through unchanged") {
    val got = runGlobal(Seq(1L -> "a b", 2L -> "a b"), span = 3)
    assert(got === Array(
      (1L, 2L, 2L, 0L, "a b"),
      (2L, 2L, 2L, 0L, "a b")))
  }

  test("overlapping repeats inside one document collapse to the first span") {
    // "a a a a a": every length-2 window is "a a"; the window at
    // position 0 is the sole survivor. A position is removed when ANY
    // duplicate window covers it, so position 1 (covered by kept
    // window 0 AND duplicate window 1) is cut too — tokens 1..4 go,
    // leaving exactly "a".
    val got = runGlobal(Seq(1L -> "a a a a a"), span = 2)
    assert(got === Array((1L, 5L, 1L, 4L, "a")))
  }

  test("intra-doc scope cuts within-doc repeats but not cross-doc sharing") {
    val rows = Seq(1L -> "p q r s p q r t", 2L -> "p q r z")
    val intra = runIntra(rows, span = 3)
    // doc 1 repeats its own "p q r" at offset 4 → positions 4..6 cut;
    // doc 2 shares "p q r" with doc 1 but has no internal repeat
    assert(intra === Array(
      (1L, 8L, 5L, 3L, "p q r s t"),
      (2L, 4L, 4L, 0L, "p q r z")))
    // the global pass at the same span DOES cut doc 2's copy
    val global = runGlobal(rows, span = 3)
    assert(global(1) === ((2L, 4L, 1L, 3L, "z")))
  }

  test("incremental batches reproduce the one-shot global result") {
    val dir = java.nio.file.Files.createTempDirectory("spanstate").toString
    val state = s"$dir/windows"
    val rows = Seq(
      1L -> "a b c d e f", 2L -> "x b c d y z", 3L -> "p q r s t u",
      4L -> "m a b c d n", 5L -> "p q r s t u", 6L -> "fresh tokens only here x y")
    val oneShot = Dedup.spanDedup(rows.toDF("doc_id", "text"), "text",
      "doc_id", 3).orderBy(col("doc_id")).collect().toSeq
    val b1 = Dedup.spanDedupIncremental(
      rows.take(3).toDF("doc_id", "text"), "text", "doc_id", 3, state)
      .collect().toSeq
    val b2 = Dedup.spanDedupIncremental(
      rows.drop(3).toDF("doc_id", "text"), "text", "doc_id", 3, state)
      .collect().toSeq
    val incremental = (b1 ++ b2).sortBy(_.getLong(0))
    assert(incremental == oneShot)
    // doc 4 embeds doc 1's "a b c d" across the batch boundary and doc
    // 5 clones doc 3 — the history probe must have cut both
    val byId = incremental.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(4L) > 0 && byId(5L) == 6L && byId(6L) == 0L)
  }

  test("replayed batch with the same tag recomputes identical output") {
    val dir = java.nio.file.Files.createTempDirectory("spanstate2").toString
    val state = s"$dir/windows"
    val b1 = Seq(1L -> "a b c d e").toDF("doc_id", "text")
    val b2 = Seq(2L -> "z a b c d w").toDF("doc_id", "text")
    Dedup.spanDedupIncremental(b1, "text", "doc_id", 3, state,
      batchTag = Some(1L))
    val once = Dedup.spanDedupIncremental(b2, "text", "doc_id", 3, state,
      batchTag = Some(2L)).collect().toSeq
    val replayed = Dedup.spanDedupIncremental(b2, "text", "doc_id", 3, state,
      batchTag = Some(2L)).collect().toSeq
    assert(once == replayed)
    assert(once.head.getLong(3) == 4L) // "a b c d" excised vs history
  }

  test("matches an independent naive reference on random corpora") {
    // brute-force reference: materialize every window occurrence, rank
    // first occurrence by (doc, start), mark covered positions of every
    // later occurrence, rebuild — written against the SEMANTICS, not
    // the kernel's joins, so a join/agg bug can't hide
    def reference(docs: Seq[(Long, String)], span: Int)
        : Map[Long, (Long, Long, Long, String)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val windows = for {
        (id, tk) <- toks
        s <- 0 to tk.length - span
      } yield (tk.slice(s, s + span).mkString(" "), (id, s))
      val first = windows.groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
      val removed = scala.collection.mutable.Set[(Long, Int)]()
      for ((txt, occ) <- windows if first(txt) != occ; i <- 0 until span)
        removed += ((occ._1, occ._2 + i))
      toks.map { case (id, tk) =>
        val kept = tk.indices.filterNot(i => removed((id, i))).map(tk)
        id -> ((tk.length.toLong, kept.length.toLong,
          (tk.length - kept.length).toLong, kept.mkString(" ")))
      }.toMap
    }
    val vocab = Seq("a", "b", "c", "d", "e")
    for (seed <- 1 to 12; span <- Seq(2, 3)) {
      val rnd = new scala.util.Random(seed * 7919 + span)
      val docs = (0L until 8L).map { id =>
        id -> Seq.fill(6 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val expect = reference(docs, span)
      val got = Dedup.spanDedup(docs.toDF("doc_id", "text"), "text",
        "doc_id", span).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4)))).toMap
      assert(got == expect, s"seed=$seed span=$span")
    }
  }

  test("fingerprint-keyed variant matches the text-keyed path on random corpora") {
    val vocab = Seq("a", "b", "c", "d", "e", "longtokenvalue", "anotherlongone")
    for (seed <- 1 to 8; span <- Seq(2, 3)) {
      val rnd = new scala.util.Random(seed * 104729 + span)
      val docs = (0L until 10L).map { id =>
        id -> Seq.fill(5 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val text = Dedup.spanDedup(docs.toDF("doc_id", "text"), "text",
        "doc_id", span).orderBy(col("doc_id")).collect().toSeq
      val hashed = Dedup.spanDedupHashed(docs.toDF("doc_id", "text"), "text",
        "doc_id", span).orderBy(col("doc_id")).collect().toSeq
      assert(hashed == text, s"seed=$seed span=$span")
      val intraText = Dedup.intraDocDedup(docs.toDF("doc_id", "text"),
        "text", "doc_id", span).orderBy(col("doc_id")).collect().toSeq
      val intraHashed = Dedup.intraDocDedupHashed(docs.toDF("doc_id", "text"),
        "text", "doc_id", span).orderBy(col("doc_id")).collect().toSeq
      assert(intraHashed == intraText, s"intra seed=$seed span=$span")
    }
  }

  test("hashed-state incremental batches reproduce the one-shot global result") {
    val dir = java.nio.file.Files.createTempDirectory("spanstateh").toString
    val state = s"$dir/windows"
    val rows = Seq(
      1L -> "a b c d e f", 2L -> "x b c d y z", 3L -> "p q r s t u",
      4L -> "m a b c d n", 5L -> "p q r s t u", 6L -> "fresh tokens only here x y")
    val oneShot = Dedup.spanDedup(rows.toDF("doc_id", "text"), "text",
      "doc_id", 3).orderBy(col("doc_id")).collect().toSeq
    val b1 = Dedup.spanDedupIncremental(
      rows.take(3).toDF("doc_id", "text"), "text", "doc_id", 3, state,
      hashedState = true).collect().toSeq
    val b2 = Dedup.spanDedupIncremental(
      rows.drop(3).toDF("doc_id", "text"), "text", "doc_id", 3, state,
      hashedState = true).collect().toSeq
    assert((b1 ++ b2).sortBy(_.getLong(0)) == oneShot)
    // state rows are 8-byte fingerprints, not window text
    val st = spark.read.parquet(state)
    assert(st.schema("wkey").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("result is invariant under input partitioning") {
    val rows = (0L until 40L).map(i =>
      i -> (s"common passage tokens here ${i % 7} tail a b c d e f"))
    val df1 = rows.toDF("doc_id", "text").repartition(1)
    val df8 = rows.toDF("doc_id", "text").repartition(8)
    val a = Dedup.spanDedup(df1, "text", "doc_id", 4)
      .orderBy(col("doc_id")).collect().toSeq
    val b = Dedup.spanDedup(df8, "text", "doc_id", 4)
      .orderBy(col("doc_id")).collect().toSeq
    assert(a === b)
  }
}
