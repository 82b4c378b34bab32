package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-10 operators: whitening application, best-fit packing. */
class ExtHSpec extends SparkSuite {
  import spark.implicits._

  test("whitenApply centers and scales per dimension; constant dims map to 0") {
    val vecs = Seq(
      (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(3.0f, 10.0f)),
      (3L, Seq(5.0f, 10.0f)))
      .toDF("vec_id", "embedding")
    val stats = Similarity.whitenStats(vecs, "embedding")
    val out = Similarity.whitenApply(vecs, "embedding", stats)
      .orderBy(col("vec_id"))
      .select(col("whitened")).as[Seq[Double]].collect()
    val sd = math.sqrt(8.0 / 3.0) // dim 0: mean 3, population std
    assert(out.length === 3)
    for ((row, x) <- out.zip(Seq(1.0, 3.0, 5.0))) {
      assert(math.abs(row.head - (x - 3.0) / sd) < 1e-9,
        s"dim0 of $x: ${row.head}")
      assert(row(1) === 0.0, "constant dimension must whiten to 0")
    }
    // whitened dims have mean 0, population std 1 (up to canon rounding)
    val d0 = out.map(_.head)
    assert(math.abs(d0.sum / 3) < 1e-9)
    assert(math.abs(d0.map(v => v * v).sum / 3 - 1.0) < 1e-9)
  }

  test("whitenApply fails loudly on a stats/vector dimension mismatch") {
    val vecs = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    // stats computed from a 1-dim corpus: covering [0..0] internally,
    // but too short for the 2-dim vectors — without the eval-time
    // guard zip_with silently zero-fills the tail
    val stats = Similarity.whitenStats(
      Seq((9L, Seq(1.0f))).toDF("vec_id", "embedding"), "embedding")
    val e = intercept[Exception] {
      Similarity.whitenApply(vecs, "embedding", stats).collect()
    }
    assert(e.getMessage.contains("whitenApply") ||
      Option(e.getCause).exists(_.getMessage.contains("whitenApply")))
    // and a gappy stats table (position filtered out) fails at call
    // time on the coverage require
    val gappy = Similarity.whitenStats(vecs, "embedding")
      .filter(col("pos") === 1)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.whitenApply(vecs, "embedding", gappy)
    }
    assert(e2.getMessage.contains("positions"))
  }

  test("packBestFit replays the BFD state machine on a known fixture") {
    // seqLen 10, tokens [7,6,4,3,3,2] in (toks DESC, id) order:
    //  7 → new bin 0 (rem 3); 6 → new bin 1 (rem 4);
    //  4 → best fit = bin 1 (rem 4 < no other fit) → rem 0;
    //  3 → bin 0 (rem 3) → rem 0; 3 → no fit → new bin 2 (rem 7);
    //  2 → bin 2 (rem 5)
    val docs = Seq((0L, 7L), (1L, 6L), (2L, 4L), (3L, 3L), (4L, 3L),
      (5L, 2L)).toDF("doc_id", "toks").withColumn("g", lit("a"))
    val got = Sampling.packBestFit(docs, col("g"), col("doc_id"),
        col("toks"), seqLen = 10)
      .select("doc_id", "bin", "n_bins").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(0L -> (0L, 1L), 1L -> (1L, 1L), 2L -> (1L, 1L),
      3L -> (0L, 1L), 4L -> (2L, 1L), 5L -> (2L, 1L)))
  }

  test("packBestFit rejects non-positive token counts loudly") {
    // a negative count would INCREASE a bin's remaining past seqLen
    // and a zero-token doc diverges from the SQL oracle's replay —
    // both faces share bfdPlace, so the guard covers the stream too
    val docs = Seq((0L, 5L), (1L, 0L))
      .toDF("doc_id", "toks").withColumn("g", lit("a"))
    val e = intercept[org.apache.spark.SparkException] {
      Sampling.packBestFit(docs, col("g"), col("doc_id"),
        col("toks"), seqLen = 10).collect()
    }
    assert(e.getMessage.contains("non-positive token count") ||
      Option(e.getCause).exists(_.getMessage != null) &&
        e.getCause.getMessage.contains("non-positive token count"))
  }

  test("packBestFit caps the per-group doc count loudly") {
    // a group is packed as one in-task array; a caller who skips the
    // shardAssignDocs composer must get a loud require, not a silent
    // executor OOM on a hot group
    val docs = spark.range(0, 100)
      .select(col("id").as("doc_id"), lit(3L).as("toks"),
        lit("hot").as("g"))
    val e = intercept[org.apache.spark.SparkException] {
      Sampling.packBestFit(docs, col("g"), col("doc_id"),
        col("toks"), seqLen = 10, maxDocsPerGroup = 50).collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("shardAssignDocs"), msg.take(400))
  }

  test("packBestFit picks the TIGHTEST fitting bin, not the first") {
    // the BFD-vs-FFD discriminator (brute-force-searched): tokens
    // [12,12,8,5,1,1] at seqLen 15 → b0 rem 3, b1 rem 3, b2=[8,5]
    // rem 2. Each 1-token doc fits all three bins; BEST-fit takes the
    // tightest (b2: rem 2→1→0) while first-fit would take b0 — so the
    // trailing docs pin the policy.
    val docs = Seq((0L, 12L), (1L, 12L), (2L, 8L), (3L, 5L), (4L, 1L),
      (5L, 1L)).toDF("doc_id", "toks").withColumn("g", lit("a"))
    val got = Sampling.packBestFit(docs, col("g"), col("doc_id"),
        col("toks"), seqLen = 15)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L,
      4L -> 2L, 5L -> 2L),
      s"the 1-token docs must take the tightest bin 2, not bin 0: $got")
  }

  test("packBestFit: oversize docs take dedicated trailing bins") {
    val docs = Seq((0L, 25L), (1L, 8L), (2L, 13L), (3L, 4L))
      .toDF("doc_id", "toks").withColumn("g", lit("x"))
    val got = Sampling.packBestFit(docs, col("g"), col("doc_id"),
        col("toks"), seqLen = 10)
      .select("doc_id", "bin", "n_bins").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // small: 8 → bin 0 (rem 2), 4 → no fit → bin 1 (rem 6)
    // big (toks DESC): 25 → bins 2..4 (3 bins), 13 → bins 5..6 (2)
    assert(got === Map(1L -> (0L, 1L), 3L -> (1L, 1L),
      0L -> (2L, 3L), 2L -> (5L, 2L)))
  }

  test("packBestFit matches an independent BFD simulation on random fixtures") {
    // naive reference: same policy, different implementation (linear
    // scan over a plain array instead of the TreeSet ceiling query)
    def naive(docs: Seq[(Long, Long)], s: Long): Map[Long, (Long, Long)] = {
      val sorted = docs.sortBy(d => (-d._2, d._1))
      val (small, big) = sorted.partition(_._2 <= s)
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      for ((id, t) <- small) {
        val fits = rem.zipWithIndex.filter(_._1 >= t)
        val idx =
          if (fits.isEmpty) { rem += s - t; rem.length - 1 }
          else {
            val best = fits.map(_._1).min
            val i = fits.filter(_._1 == best).map(_._2).min
            rem(i) -= t; i
          }
        out(id) = (idx.toLong, 1L)
      }
      var next = rem.length.toLong
      for ((id, t) <- big) {
        val n = (t + s - 1) / s
        out(id) = (next, n); next += n
      }
      out.toMap
    }
    for (seed <- Seq(5, 17, 101)) {
      val rnd = new scala.util.Random(seed)
      val s = 20L + rnd.nextInt(80)
      val docs = (0L until 150L).map(i => (i, 1L + rnd.nextInt(2 * s.toInt)))
      val got = Sampling.packBestFit(
          docs.toDF("doc_id", "toks").withColumn("g", lit("z")),
          col("g"), col("doc_id"), col("toks"), seqLen = s)
        .select("doc_id", "bin", "n_bins").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === naive(docs, s), s"seed $seed (seqLen $s) diverged")
    }
  }

  test("packBestFit is invariant under input partitioning and order") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 300L).map(i =>
      (i, 1L + rnd.nextInt(120), s"g${i % 3}"))
    val df1 = rows.toDF("doc_id", "toks", "g")
    val df2 = rows.reverse.toDF("doc_id", "toks", "g").repartition(7)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.packBestFit(df, col("g"), col("doc_id"), col("toks"),
          seqLen = 100)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val a = run(df1)
    val b = run(df2)
    assert(a === b)
    assert(a.size === 300)
    // every bin's load respects capacity: reconstruct per-bin sums of
    // packed (non-oversize) docs
    val binLoad = a.toSeq.filter(_._2._3 == 1L)
      .groupBy { case ((g, _), (_, bin, _)) => (g, bin) }
      .view.mapValues(_.map(_._2._1).sum)
    assert(binLoad.values.forall(_ <= 100L),
      s"overfull bin: ${binLoad.filter(_._2 > 100L)}")
  }
}
