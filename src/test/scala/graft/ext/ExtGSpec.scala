package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-9 second-wave operators: margin mining, DSIR selection,
  * shard assignment, l-diversity.
  */
class ExtGSpec extends SparkSuite {
  import spark.implicits._

  test("marginPairs matches a naive reference and suppresses hubs") {
    val rnd = new Random(7)
    def vec(): Seq[Float] = Seq.fill(8)(rnd.nextGaussian().toFloat)
    // a hub on side B: highly similar to EVERYTHING on side A (a
    // centroid-ish vector) — raw-cosine best for several A vectors,
    // but its k-NN average is also high, so margin demotes it
    val aRows = (0L until 20L by 2).map(i => (i, vec()))
    val hub = Seq.fill(8)(0.5f)
    val bRows = (1L until 20L by 2).map(i => (i, vec())) :+ (99L, hub.toSeq)
    val a = aRows.toDF("vec_id", "embedding")
    val b = bRows.toDF("vec_id", "embedding")
    val got = Similarity.marginPairs(a, b, "vec_id", "embedding",
        k = 3, threshold = 0.0, acceptBroadcastBaseline = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // naive reference
    def canon(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val nx = math.sqrt(x.map(p => p.toDouble * p.toDouble).sum)
      val ny = math.sqrt(y.map(p => p.toDouble * p.toDouble).sum)
      canon(d / (nx * ny))
    }
    val allPairs = for { (ia, va) <- aRows; (ib, vb) <- bRows }
      yield (ia, ib, cos(va, vb))
    def avgTop(byKey: Map[Long, Seq[Double]], k: Int): Map[Long, Double] =
      byKey.map { case (id, cs) =>
        val top = cs.sorted.reverse.take(k)
        id -> top.sum / top.size
      }
    val avgA = avgTop(allPairs.groupBy(_._1).view
      .mapValues(_.map(_._3).toSeq).toMap, 3)
    val avgB = avgTop(allPairs.groupBy(_._2).view
      .mapValues(_.map(_._3).toSeq).toMap, 3)
    val margins = allPairs.map { case (ia, ib, c) =>
      (ia, ib, c / ((avgA(ia) + avgB(ib)) / 2.0))
    }
    val bestA = margins.groupBy(_._1).view.mapValues(ps =>
      ps.maxBy(p => (p._3, -p._2))._2).toMap
    val bestB = margins.groupBy(_._2).view.mapValues(ps =>
      ps.maxBy(p => (p._3, -p._1))._1).toMap
    val naive = margins.collect {
      case (ia, ib, _) if bestA(ia) == ib && bestB(ib) == ia => (ia, ib)
    }.toSet
    assert(naive.nonEmpty, "no mutual-best pairs — not probative")
    assert(got === naive)
    // the hub can win at most ONE mutual-best slot by construction
    assert(got.count(_._2 == 99L) <= 1)
  }

  test("marginPairsIvf agrees with the exact miner when every bucket is probed") {
    val rnd = new Random(11)
    def vec(): Seq[Float] = Seq.fill(8)(rnd.nextGaussian().toFloat)
    val a = (0L until 30L by 2).map(i => (i, vec())).toDF("vec_id", "embedding")
    val b = (1L until 30L by 2).map(i => (i, vec())).toDF("vec_id", "embedding")
    // nprobe = nlist ⇒ every candidate pair exists ⇒ identical output
    val exact = Similarity.marginPairs(a, b, "vec_id", "embedding",
      k = 3, threshold = 1.0, acceptBroadcastBaseline = true)
      .collect().toSet
    val ivf = Similarity.marginPairsIvf(a, b, "vec_id", "embedding",
      k = 3, threshold = 1.0, nlist = 4, nprobe = 4).collect().toSet
    assert(exact === ivf)
  }

  test("marginPairs brute face requires the broadcast opt-in") {
    val a = Seq((0L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val b = Seq((1L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.marginPairs(a, b, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("marginPairsIvf"))
  }

  test("hardNegatives brute face requires the broadcast opt-in") {
    val df = Seq((0L, Seq(1f, 0f), "a"), (1L, Seq(0f, 1f), "b"))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Similarity.hardNegatives(df, "vec_id", "embedding", "label", 2)
    }
    assert(e.getMessage.contains("hardNegativesIvf"))
  }

  test("margin guard drops candidates with a non-positive neighborhood average") {
    // every B vector is anti-correlated with every A vector, so each
    // endpoint's k-NN average is NEGATIVE — without the denominator
    // guard the strongly negative cosines would flip into large
    // positive margins and be "mined" as mutual-best pairs
    val a = Seq((0L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val b = Seq((1L, Seq(-1f, 0f)), (3L, Seq(-0.9f, -0.1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.marginPairs(a, b, "vec_id", "embedding",
      k = 2, threshold = 1.0, acceptBroadcastBaseline = true)
    assert(got.count() === 0L)
  }

  test("dsirSelect upweights target-like documents") {
    // target docs speak "alpha beta"; half the raw docs mimic them,
    // the other half speak "gamma delta" — DSIR weights must separate
    // the mimics from the rest (that IS the method)
    val docs = ((0L until 10L).map(i => (i, "alpha beta alpha beta alpha", true)) ++
      (10L until 20L).map(i => (i, "alpha beta alpha beta gamma", false)) ++
      (20L until 30L).map(i => (i, "gamma delta gamma delta gamma", false)))
      .toDF("doc_id", "text", "is_tgt")
    val sel = Sampling.dsirSelect(docs, "text", "doc_id", col("is_tgt"),
      k = 20, buckets = 64)
    val w = sel.select("doc_id", "weight").as[(Long, Double)]
      .collect().toMap
    val mimics = (10L until 20L).map(w)
    val offs = (20L until 30L).map(w)
    assert(mimics.min > offs.max,
      s"target-like docs must outweigh off-domain docs: $w")
    // target docs never appear in the selection pool
    assert(!w.keys.exists(_ < 10L))
  }

  test("dsirSelect: single-token docs emit no bigrams and distort nothing") {
    // sequence(1, 0) in Spark is the DESCENDING [1, 0] — before the
    // >= 2 guard a 1-token doc emitted two null "bigrams", inflating
    // the nT/nR totals (shifting EVERY doc's smoothed weight) and
    // populating a null hash bucket the oracle never sees
    val base = ((0L until 5L).map(i => (i, "alpha beta alpha", true)) ++
      (10L until 16L).map(i => (i, "alpha beta gamma", false)))
      .toDF("doc_id", "text", "is_tgt")
    val withSingles = base.unionByName(Seq(
        (50L, "lone", false), (51L, "solo", true))
      .toDF("doc_id", "text", "is_tgt"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.dsirSelect(df, "text", "doc_id", col("is_tgt"),
          k = 20, buckets = 64)
        .select("doc_id", "n_grams", "weight")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val without = run(base)
    val wSingle = run(withSingles)
    // the 1-token raw doc contributes zero grams: it is absent from
    // the pool, and no other doc's (n_grams, weight) moves
    assert(!wSingle.contains(50L) && !wSingle.contains(51L))
    assert(wSingle === without,
      s"single-token docs must not shift any weight: $wSingle vs $without")
  }

  test("shardAssign balances token mass within one max-document") {
    val rnd = new Random(3)
    val docs = (0L until 200L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(50))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sampling.shardAssign(docs, col("doc_id"),
      size(split(col("text"), " ")).cast("long"), nShards = 7)
      .collect()
    assert(out.length === 7)
    assert(out.map(_.getAs[Long]("n_docs")).sum === 200L)
    val sums = out.map(_.getAs[Long]("token_sum"))
    assert(sums.max - sums.min <= 50L,
      s"round-robin LPT must balance within one max doc: ${sums.toSeq}")
    val shares = out.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("langSegments splits a mixed-language document at block boundaries") {
    val en = Seq.fill(5)("the quick fox of and").mkString(" ") // 25 tokens
    val de = Seq.fill(4)("der hund und die katze").mkString(" ") // 20
    val doc = s"$en $de $en" // en(25) + de(20) + en(25) = 70 tokens
    // with 5-token blocks the language flips exactly at blocks 5 and 9
    val out = Text.langSegments(
        Seq((1L, doc)).toDF("doc_id", "text"), "text", "doc_id",
        window = 5)
      .orderBy(col("seg_idx"))
      .select("seg_idx", "lang", "start_token", "n_tokens")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq((1L, "en", 0L, 25L), (2L, "de", 25L, 20L),
      (3L, "en", 45L, 25L)), s"segments: $out")
    // single-language doc → one segment covering everything
    val one = Text.langSegments(
        Seq((2L, en)).toDF("doc_id", "text"), "text", "doc_id",
        window = 5)
      .select("lang", "n_tokens").as[(String, Long)].collect().toSeq
    assert(one === Seq(("en", 25L)))
  }

  test("whitenStats matches hand-computed per-dimension moments") {
    val vecs = Seq(
      (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(3.0f, 10.0f)),
      (3L, Seq(5.0f, 10.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.whitenStats(vecs, "embedding")
      .orderBy(col("pos"))
      .select("pos", "n", "mean", "std")
      .as[(Int, Long, Double, Double)].collect().toSeq
    // dim 0: mean 3, population std sqrt(8/3); dim 1: constant → std 0
    assert(out.map(_._1) === Seq(0, 1) && out.forall(_._2 == 3L))
    assert(math.abs(out(0)._3 - 3.0) < 1e-9)
    assert(math.abs(out(0)._4 - math.sqrt(8.0 / 3.0)) < 1e-9)
    assert(out(1)._3 === 10.0 && out(1)._4 === 0.0)
  }

  test("lDiversityAudit flags homogeneous groups, passes diverse ones") {
    val rows = Seq(
      ("g1", "x", 1L), ("g1", "x", 1L), ("g1", "x", 1L), // 1 distinct
      ("g2", "x", 1L), ("g2", "x", 2L), ("g2", "x", 3L)) // 3 distinct
      .toDF("qa", "qb", "sens")
    val out = Stats.lDiversityAudit(rows, Seq(col("qa"), col("qb")),
      col("sens"), l = 3).collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === "g1")
    assert(out(0).getAs[Long]("n") === 3L &&
      out(0).getAs[Long]("n_sensitive") === 1L)
  }
}
