package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Per-sequence provenance manifest ([[Sampling.packManifest]]):
  * hand-computed spans, token conservation, agreement with
  * [[Sampling.packSequences]]' per-doc view, and the loud non-positive
  * token guard.
  */
class PackManifestSpec extends SparkSuite {
  import spark.implicits._

  // group "a": stream positions 0..74 (docs of 10, 60, 5 tokens);
  // group "b": a single 3-token doc — its own numbering from 0
  private def fixture = Seq(
    ("a", 1L, 10L), ("a", 2L, 60L), ("a", 3L, 5L),
    ("b", 9L, 3L)).toDF("g", "id", "t")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Sampling.packManifest(df, col("g"), col("id"), col("t"), col("id"),
        seqLen = 16L)
      .orderBy(col("grp"), col("seq"), col("doc_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("packManifest emits the hand-computed spans") {
    // doc 1 occupies [0,10), doc 2 [10,70), doc 3 [70,75); seqLen 16:
    // seq 0 = [0,16) → doc1 (0,10) + doc2 (10,16); seqs 1-3 all doc2
    // full; seq 4 = [64,75) → doc2 (0,6) + doc3 (6,11)
    assert(run(fixture).toSeq == Seq(
      ("a", 0L, 1L, 0L, 10L, 10L),
      ("a", 0L, 2L, 10L, 16L, 6L),
      ("a", 1L, 2L, 0L, 16L, 16L),
      ("a", 2L, 2L, 0L, 16L, 16L),
      ("a", 3L, 2L, 0L, 16L, 16L),
      ("a", 4L, 2L, 0L, 6L, 6L),
      ("a", 4L, 3L, 6L, 11L, 5L),
      ("b", 0L, 9L, 0L, 3L, 3L)))
  }

  test("non-tail sequences are exactly full (token conservation)") {
    val m = Sampling.packManifest(fixture, col("g"), col("id"), col("t"),
      col("id"), seqLen = 16L)
    val per = m.groupBy(col("grp"), col("seq"))
      .agg(sum(col("span_toks")).as("s"))
      .join(m.groupBy(col("grp")).agg(max(col("seq")).as("mx")), "grp")
      .collect()
    per.foreach { r =>
      val (seq, s, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (seq < mx) assert(s == 16L, s"non-tail seq $seq must be full")
    }
    // total conservation: span sums = input token sums
    assert(m.agg(sum(col("span_toks"))).head().getLong(0) == 78L)
  }

  test("manifest agrees with packSequences' per-doc seq_first/seq_last") {
    val perDoc = Sampling.packManifest(fixture, col("g"), col("id"),
        col("t"), col("id"), seqLen = 16L)
      .groupBy(col("doc_id"))
      .agg(min(col("seq")).as("f"), max(col("seq")).as("l"),
        count(lit(1)).as("n"))
    val ps = Sampling.packSequences(fixture, col("g"), col("t"),
        col("id"), seqLen = 16L)
      .select(col("id").as("doc_id"), col("seq_first"), col("seq_last"),
        col("n_splits"))
    val joined = perDoc.join(ps, "doc_id").collect()
    assert(joined.length == 4)
    joined.foreach { r =>
      assert(r.getLong(r.fieldIndex("f")) == r.getLong(r.fieldIndex("seq_first")))
      assert(r.getLong(r.fieldIndex("l")) == r.getLong(r.fieldIndex("seq_last")))
      assert(r.getLong(r.fieldIndex("n")) ==
        r.getLong(r.fieldIndex("n_splits")) + 1,
        "a doc emits n_splits + 1 manifest rows")
    }
  }

  test("NULL group names keep their spans and their own numbering") {
    // the Layout.epochOrder null-safe-group doctrine applies here too:
    // a NULL group is a real group (window PARTITION BY treats NULL as
    // its own partition), never silently dropped by an equi-join —
    // the registered query's conservation columns ride windows for
    // exactly this reason (r19 review fix)
    val docs = Seq((null.asInstanceOf[String], 1L, 20L),
        (null.asInstanceOf[String], 2L, 12L),
        ("a", 3L, 5L)).toDF("g", "id", "t")
    val m = Sampling.packManifest(docs, col("g"), col("id"), col("t"),
      col("id"), seqLen = 16L)
    val nullRows = m.filter(col("grp").isNull)
      .orderBy(col("seq"), col("doc_id")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // NULL group stream: doc1 [0,20) → seq0 (0,16) + seq1 (0,4);
    // doc2 [20,32) → seq1 (4,16)
    assert(nullRows.toSeq == Seq((0L, 1L, 0L, 16L), (1L, 1L, 0L, 4L),
      (1L, 2L, 4L, 16L)))
    // and the window-based conservation assembly sees the NULL group:
    // its non-tail sequence (seq 0) is exactly full
    import org.apache.spark.sql.expressions.Window
    val wSeq = Window.partitionBy(col("grp"), col("seq"))
    val conserved = m.withColumn("s", sum(col("span_toks")).over(wSeq))
      .filter(col("grp").isNull && col("seq") === 0L)
      .select(col("s")).distinct().collect()
    assert(conserved.map(_.getLong(0)).toSeq == Seq(16L))
  }

  test("a non-positive token count fails loudly, not engine-specifically") {
    val bad = Seq(("a", 1L, 10L), ("a", 2L, 0L)).toDF("g", "id", "t")
    val e = intercept[Exception] {
      Sampling.packManifest(bad, col("g"), col("id"), col("t"),
        col("id"), seqLen = 16L).collect()
    }
    assert(e.getMessage.contains("non-positive token count") ||
      Option(e.getCause).exists(_.getMessage
        .contains("non-positive token count")))
  }
}
