package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The deterministic epoch-order shuffle ([[Layout.epochOrder]]):
  * exact permutation semantics, the documented LCG formula, partition
  * independence, and seed sensitivity.
  */
class LayoutEpochSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = (for {
    g <- Seq("alpha", "beta", "gamma")
    b <- 0L until 40L
  } yield (g, b, b % 7, b * 3 + g.length)).toDF("grp", "bin", "n_docs", "n_toks")

  /** The scaladoc formula, computed locally — the r19
    * multiplicative-seed key with the two-round xorshift+LCG
    * finalizer: fin(mult(seed)·lcg(sid) + off(seed) mod 2^31).
    */
  private def reference(rows: Seq[(String, Long)], seed: Long)
      : Seq[(String, Long, Long)] = {
    val gi = rows.map(_._1).distinct.sorted.zipWithIndex
      .map { case (g, i) => g -> (i + 1L) }.toMap
    val m = 2147483648L
    val s1 = ((seed % m) * 1103515245L + 12345L) % m
    val s2 = (s1 * 1103515245L + 12345L) % m
    val mult = 2L * (s1 % 1073741824L) + 1L
    rows.map { case (g, b) =>
      val sid = gi(g) * 1048576L + b
      val inner = ((sid % m) * 1103515245L + 12345L) % m
      val y0 = (mult * inner + s2) % m
      val y1 = ((y0 ^ (y0 >> 15)) * 1103515245L + 12345L) % m
      val pk = ((y1 ^ (y1 >> 13)) * 1103515245L + 12345L) % m
      (g, b, pk)
    }.sortBy { case (g, b, pk) => (pk, g, b) }
      .map { case (g, b, pk) => (g, b, pk) }
  }

  test("epochOrder matches the documented LCG permutation exactly") {
    val out = Layout.epochOrder(fixture, "grp", "bin", seed = 42L)
      .orderBy(col("epoch_pos"))
      .select("grp", "bin", "shuffle_key", "epoch_pos")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ref = reference(out.map(r => (r._1, r._2)).sortBy(identity).toSeq, 42L)
    assert(out.map(_._4).toSeq == (1L to out.length).toSeq,
      "epoch positions must be dense 1..N")
    assert(out.map(r => (r._1, r._2, r._3)).toSeq == ref,
      "order and keys must equal the documented formula")
    // the permutation genuinely shuffles: not the (grp, bin) order
    assert(out.map(r => (r._1, r._2)).toSeq !=
      out.map(r => (r._1, r._2)).sortBy(identity).toSeq)
  }

  test("epochShards: contiguous balanced cover conserving docs and tokens") {
    val (ordered, total) = Layout.epochOrderWithTotal(fixture, "grp",
      "bin", seed = 42L)
    assert(total == 120L, "the rank pass must hand back the total for free")
    for (c <- Seq(1, 7, 8)) {
      val sh = Layout.epochShards(ordered, total, c).orderBy(col("consumer"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(sh.map(_._1).toSeq == (0L until c).toSeq,
        s"every consumer 0..${c - 1} must receive a block")
      // balanced: block sizes differ by at most one sequence
      assert(sh.map(_._2).max - sh.map(_._2).min <= 1, s"unbalanced at $c")
      // contiguous, gap-free cover of 1..N in consumer order
      val n = 120L
      assert(sh.head._3 == 1L && sh.last._4 == n)
      sh.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1)._3 == w(0)._4 + 1, "consumer ranges must be contiguous") }
      sh.foreach { case (_, ns, f, l, _, _) => assert(l - f + 1 == ns) }
      // conservation: docs and tokens sum to the corpus totals
      assert(sh.map(_._5).sum ==
        fixture.agg(sum(col("n_docs"))).head().getLong(0))
      assert(sh.map(_._6).sum ==
        fixture.agg(sum(col("n_toks"))).head().getLong(0))
    }
  }

  test("epochShards emits EVERY consumer's row when N < nConsumers") {
    // 3 sequences, 8 consumers: a launcher iterating ranks 0..7 must
    // find a manifest row for each — empties carry n_seqs 0, NULL
    // range bounds, zero sums (the r18 review fix: empty consumers
    // previously emitted nothing and non-empty ids looked sparse)
    val tiny = Seq(("a", 0L, 1L, 10L), ("a", 1L, 1L, 11L),
        ("b", 0L, 1L, 12L)).toDF("grp", "bin", "n_docs", "n_toks")
    val (ordered, n) = Layout.epochOrderWithTotal(tiny, "grp", "bin", 5L)
    val sh = Layout.epochShards(ordered, n, 8).orderBy(col("consumer"))
      .collect()
    assert(sh.map(_.getLong(0)).toSeq == (0L until 8L).toSeq,
      "all 8 consumers must have a manifest row")
    assert(sh.map(_.getLong(1)).sum == 3L, "3 sequences distributed")
    val empties = sh.filter(_.getLong(1) == 0L)
    assert(empties.length == 5)
    empties.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3), "empty range bounds are NULL")
      assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    }
  }

  test("epochOrder keeps NULL group names (null-safe group join)") {
    val docs = Seq((null.asInstanceOf[String], 0L, 1L, 10L),
        (null.asInstanceOf[String], 1L, 1L, 11L),
        ("alpha", 0L, 1L, 12L), ("alpha", 1L, 1L, 13L))
      .toDF("grp", "bin", "n_docs", "n_toks")
    val out = Layout.epochOrder(docs, "grp", "bin", seed = 7L)
      .orderBy(col("epoch_pos")).collect()
    assert(out.length == 4, "NULL-group sequences must not vanish")
    assert(out.map(_.getLong(out.head.fieldIndex("epoch_pos"))).toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("writeEpochLayout: per-consumer dirs hold exactly the manifest's " +
      "gap-free ranges") {
    val (ordered, total) = Layout.epochOrderWithTotal(fixture, "grp",
      "bin", seed = 42L)
    val out = java.nio.file.Files.createTempDirectory("layout_epoch")
      .toString + "/epoch"
    val manifest = Layout.writeEpochLayout(ordered, total, nConsumers = 8,
        out).orderBy(col("consumer")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var seen = 0L
    manifest.foreach { case (c, nSeqs, first, last) =>
      val dir = s"$out/consumer=$c"
      val pos = spark.read.parquet(dir).select(col("epoch_pos"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(pos == (first to last).toSeq,
        s"consumer $c directory must hold exactly its contiguous " +
          s"manifest range [$first, $last], gap-free")
      assert(pos.length == nSeqs)
      seen += nSeqs
    }
    assert(seen == total, "the union over directories is every sequence " +
      "exactly once")
    // the read-back layout carries the full epoch row (a loader needs
    // the sequence identity and load, not just positions)
    val cols = spark.read.parquet(out).columns.toSet
    assert(Set("grp", "bin", "n_docs", "n_toks", "shuffle_key",
      "epoch_pos", "consumer").subsetOf(cols))
  }

  test("epochResumeCursor matches a collected per-consumer reference, " +
      "including the exhausted case") {
    val (ordered, total) = Layout.epochOrderWithTotal(fixture, "grp",
      "bin", seed = 42L)
    val nC = 8
    // reference: collect the order, derive each consumer's block and
    // local cumulative tokens with plain Scala
    val rows = ordered.orderBy(col("epoch_pos"))
      .select("epoch_pos", "grp", "bin", "n_toks").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byC = rows.groupBy { case (p, _, _, _) => (p - 1) * nC / total }
    val skips = Seq((0L, 0L), (3L, 7L), (6L, 14L), (2L, 999L))
    val got = Layout.epochResumeCursor(ordered, total, nC, skips)
      .orderBy(col("consumer"), col("skip_k")).collect()
    assert(got.length == skips.length)
    got.foreach { r =>
      val c = r.getLong(0); val k = r.getLong(1)
      val block = byC(c).sortBy(_._1)
      assert(r.getLong(2) == block.length, "n_seqs")
      if (k < block.length) {
        val (pos, g, b, t) = block(k.toInt)
        assert(r.getLong(r.fieldIndex("resume_pos")) == pos)
        assert(r.getString(r.fieldIndex("resume_grp")) == g)
        assert(r.getLong(r.fieldIndex("resume_bin")) == b)
        assert(r.getLong(r.fieldIndex("resume_toks")) == t)
        assert(r.getLong(r.fieldIndex("skipped_toks")) ==
          block.take(k.toInt).map(_._4).sum)
        assert(r.getLong(r.fieldIndex("remaining_seqs")) == block.length - k)
        assert(r.getLong(r.fieldIndex("remaining_toks")) ==
          block.drop(k.toInt).map(_._4).sum)
      } else {
        assert(r.isNullAt(r.fieldIndex("resume_pos")), "exhausted = NULL")
        assert(r.isNullAt(r.fieldIndex("resume_grp")))
        assert(r.getLong(r.fieldIndex("skipped_toks")) ==
          block.map(_._4).sum, "exhausted skips the whole block")
        assert(r.getLong(r.fieldIndex("remaining_seqs")) == 0L)
        assert(r.getLong(r.fieldIndex("remaining_toks")) == 0L)
      }
    }
  }

  test("epochResumeCursor answers requests against EMPTY consumers " +
      "with the terminal row (N < nConsumers)") {
    // 3 sequences over 8 consumers: only 3 consumers own a block; a
    // rank whose consumer is empty must still get its row (n_seqs 0,
    // NULL resume, zero tokens) — an aggregate-only manifest silently
    // DROPPED the request at the join (r19 review fix)
    val tiny = Seq(("a", 0L, 1L, 10L), ("a", 1L, 1L, 11L),
        ("b", 0L, 1L, 12L)).toDF("grp", "bin", "n_docs", "n_toks")
    val (ordered, n) = Layout.epochOrderWithTotal(tiny, "grp", "bin", 5L)
    val nonEmpty = Layout.epochShards(ordered, n, 8)
      .filter(col("n_seqs") > 0).select(col("consumer"))
      .collect().map(_.getLong(0)).toSet
    val emptyC = (0L until 8L).find(!nonEmpty(_)).get
    val out = Layout.epochResumeCursor(ordered, n, 8,
        Seq((emptyC, 0L), (nonEmpty.head, 0L)))
      .orderBy(col("consumer"), col("skip_k")).collect()
    assert(out.length == 2, "every request must answer, empty consumers too")
    val er = out.find(_.getLong(0) == emptyC).get
    assert(er.getLong(er.fieldIndex("n_seqs")) == 0L)
    assert(er.isNullAt(er.fieldIndex("resume_pos")))
    assert(er.getLong(er.fieldIndex("skipped_toks")) == 0L)
    assert(er.getLong(er.fieldIndex("remaining_seqs")) == 0L)
    assert(er.getLong(er.fieldIndex("remaining_toks")) == 0L)
    val nr = out.find(_.getLong(0) == nonEmpty.head).get
    assert(!nr.isNullAt(nr.fieldIndex("resume_pos")))
  }

  test("epochOrderAudit matches hand-computed adjacency, expectation " +
      "and run structure") {
    val ord = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a"), (5L, "b"),
      (6L, "b")).toDF("epoch_pos", "grp")
    val r = Layout.epochOrderAudit(ord, 6L).collect().head
    assert(r.getLong(r.fieldIndex("n_seqs")) == 6L)
    assert(r.getLong(r.fieldIndex("n_groups")) == 2L)
    assert(r.getLong(r.fieldIndex("n_adjacent")) == 5L)
    // same-group adjacent pairs: (1,2)=a,a and (5,6)=b,b
    assert(r.getLong(r.fieldIndex("observed_same")) == 2L)
    // Σ n_g(n_g−1) = 3·2 + 3·2
    assert(r.getLong(r.fieldIndex("expected_num")) == 12L)
    assert(r.getLong(r.fieldIndex("expected_floor")) == 2L)
    // runs: aa | b | a | bb
    assert(r.getLong(r.fieldIndex("n_runs")) == 4L)
    assert(r.getLong(r.fieldIndex("max_run")) == 2L)
    assert(r.getBoolean(r.fieldIndex("mixed_ok")), "2·6 <= 2·12")
  }

  test("epochOrderAudit treats a NULL group as its own group") {
    val ord = Seq((1L, "a"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("epoch_pos", "grp")
    val r = Layout.epochOrderAudit(ord, 3L).collect().head
    assert(r.getLong(r.fieldIndex("n_groups")) == 2L)
    // the (NULL, NULL) adjacent pair IS a same-group pair
    assert(r.getLong(r.fieldIndex("observed_same")) == 1L)
    assert(r.getLong(r.fieldIndex("expected_num")) == 2L)
    assert(r.getLong(r.fieldIndex("n_runs")) == 2L)
    assert(r.getLong(r.fieldIndex("max_run")) == 2L)
  }

  test("epochBlockDigests: closed-form blocks cover the shards and the " +
      "digest is order-sensitive") {
    val (ordered, total) = Layout.epochOrderWithTotal(fixture, "grp",
      "bin", seed = 42L)
    val nC = 8
    val d = Layout.epochBlockDigests(ordered, total, nC, blockLen = 4L)
      .orderBy(col("consumer"), col("block")).collect()
    val sh = Layout.epochShards(ordered, total, nC).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // per consumer: dense block ids, non-tail blocks full, positions
    // tile the consumer's manifest range contiguously
    d.groupBy(_.getLong(0)).foreach { case (c, rows) =>
      val (nSeqs, first, last) = sh(c)
      val bs = rows.sortBy(_.getLong(1))
      assert(bs.map(_.getLong(1)).toSeq == (0L until bs.length).toSeq)
      assert(bs.map(_.getLong(2)).sum == nSeqs)
      bs.init.foreach(r => assert(r.getLong(2) == 4L, "non-tail full"))
      assert(bs.head.getLong(3) == first && bs.last.getLong(4) == last)
      bs.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1).getLong(3) == w(0).getLong(4) + 1, "contiguous") }
    }
    // hand formula for one block
    val m = 2147483648L
    val rows = ordered.orderBy(col("epoch_pos"))
      .select("epoch_pos", "shuffle_key", "n_toks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val c0first = (0L * total + nC - 1) / nC // = 0 → positions 1..4
    val hand = rows.filter(r => r._1 - 1 >= c0first && r._1 - 1 < c0first + 4)
      .map { case (p, k, t) => ((p % m) * ((k * 97L + t * 31L + 1L) % m)) % m }
      .sum % m
    assert(d.head.getLong(6) == hand, "digest must equal the documented mix")
    // order sensitivity: swapping two adjacent sequences' content
    // (same positions, swapped identity) must change the digest
    val swapped = rows.zipWithIndex.map {
      case ((p, k, t), 0) => (p, rows(1)._2, rows(1)._3)
      case ((p, k, t), 1) => (p, rows(0)._2, rows(0)._3)
      case ((p, k, t), _) => (p, k, t)
    }.toSeq.toDF("epoch_pos", "shuffle_key", "n_toks")
    val d2 = Layout.epochBlockDigests(swapped, total, nC, blockLen = 4L)
      .filter(col("consumer") === 0L && col("block") === 0L)
      .collect().head.getLong(6)
    assert(rows(0)._2 != rows(1)._2, "fixture: the two keys differ")
    assert(d2 != d.head.getLong(6),
      "a swapped pair inside a block must flip its digest")
  }

  test("consecutive seeds are decorrelated epochs, not rotations " +
      "(the r19 multiplicative-seed fix)") {
    def posMap(seed: Long) = Layout.epochOrder(fixture, "grp", "bin", seed)
      .select("grp", "bin", "epoch_pos").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p42 = posMap(42L); val p43 = posMap(43L)
    val o42 = p42.toSeq.sortBy(_._2).map(_._1)
    val n = o42.length
    // preserved adjacency: epoch-42 neighbors still neighbors in 43
    val preserved = o42.sliding(2).count { w =>
      w.length == 2 && math.abs(p43(w(0)) - p43(w(1))) == 1L }
    // the additive-seed LCG preserved n−2 of n−1 pairs (a rotation);
    // the multiplicative seed must break that lattice outright
    assert(preserved * 10 <= n - 1,
      s"consecutive-seed epochs still share $preserved/${n - 1} " +
        "adjacent pairs — the rotation flaw is back")
  }

  test("seed pairs differing by 2^30 are decorrelated too (the " +
      "same-multiplier pigeonhole case the finalizer closes)") {
    // seeds s and s + 2^30 shift s1 by exactly 2^30, so they SHARE the
    // odd multiplier — without the nonlinear finalizer their keys
    // differ by one constant and the epochs are rotations again
    // (review finding); the two xorshift+LCG rounds must hold these
    // pairs at the random-permutation adjacency level as well
    def posMap(seed: Long) = Layout.epochOrder(fixture, "grp", "bin", seed)
      .select("grp", "bin", "epoch_pos").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p42 = posMap(42L); val pHi = posMap(42L + 1073741824L)
    val o42 = p42.toSeq.sortBy(_._2).map(_._1)
    val n = o42.length
    val preserved = o42.sliding(2).count { w =>
      w.length == 2 && math.abs(pHi(w(0)) - pHi(w(1))) == 1L }
    assert(preserved * 10 <= n - 1,
      s"same-multiplier seed pair still shares $preserved/${n - 1} " +
        "adjacent pairs — the finalizer stopped mixing")
  }

  test("epochBlockDigests range-fills empty consumers with terminal " +
      "rows (N < nConsumers)") {
    val tiny = Seq(("a", 0L, 1L, 10L), ("a", 1L, 1L, 11L),
        ("b", 0L, 1L, 12L)).toDF("grp", "bin", "n_docs", "n_toks")
    val (ordered, n) = Layout.epochOrderWithTotal(tiny, "grp", "bin", 5L)
    val d = Layout.epochBlockDigests(ordered, n, nConsumers = 8,
        blockLen = 4L).orderBy(col("consumer")).collect()
    assert(d.map(_.getLong(0)).toSeq == (0L until 8L).toSeq,
      "all 8 consumers must have a digest row")
    assert(d.map(_.getLong(2)).sum == 3L, "3 sequences distributed")
    val empties = d.filter(_.getLong(2) == 0L)
    assert(empties.length == 5)
    empties.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(3) && r.isNullAt(4) &&
        r.isNullAt(6), "empty consumers carry NULL block/range/digest")
      assert(r.getLong(5) == 0L, "zero tokens")
    }
  }

  test("epochOrder is partition-independent and seed-sensitive") {
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Layout.epochOrder(df, "grp", "bin", seed).orderBy(col("epoch_pos"))
        .select("grp", "bin").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val a = run(fixture, 42L)
    val b = run(fixture.repartition(7, col("n_toks")), 42L)
    assert(a == b, "the epoch order must not depend on partitioning")
    val c = run(fixture, 43L)
    assert(a != c, "a new seed must produce a different epoch order")
    assert(a.sorted == c.sorted, "every seed is a permutation of the same set")
  }
}
