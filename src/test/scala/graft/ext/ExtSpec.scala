package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Cross-checks for the non-oracle extension operators at sf0.001. */
class ExtSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("simhash pairs mostly agree with true near-dup pairs") {
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "text", "doc_id", hammingMax = 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty, "simhash found no pairs")
    // simhash scores bag-of-words similarity, not ordered 3-gram
    // Jaccard — a minority of extra pairs is expected, not a defect
    val precision = sim.intersect(jac).size.toDouble / sim.size
    assert(precision >= 0.7, s"simhash precision $precision vs jaccard truth")
  }

  test("xxh64 simhash variant finds near-dup structure consistent with the replayable default") {
    val sim60 = Dedup.simhashPairs(docs, "text", "doc_id", hammingMax = 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim64 = Dedup.simhashPairsXxh64(docs, "text", "doc_id", hammingMax = 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim64.nonEmpty, "xxh64 simhash found no pairs")
    // different token hashes → different signatures, but both rank the
    // same bag-of-words similarity: the pair sets must substantially
    // overlap (exact equality is NOT expected)
    val overlap = sim60.intersect(sim64).size.toDouble /
      math.min(sim60.size, sim64.size)
    assert(overlap >= 0.5, s"variant agreement $overlap (60-bit ${sim60.size} vs 64-bit ${sim64.size})")
  }

  test("simhash bucket-frequency guard: generous cutoff changes nothing, tight cutoff only removes") {
    val base = Dedup.simhashPairs(docs, "text", "doc_id", hammingMax = 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cutoff above every bucket width on this corpus → identical output
    val generous = Dedup.simhashPairs(docs, "text", "doc_id", hammingMax = 3,
      maxBucketFreq = Some(docs.count().toInt))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(generous == base, "no-op cutoff altered the result")
    // aggressive cutoff may drop candidates but can never invent pairs
    val tight = Dedup.simhashPairs(docs, "text", "doc_id", hammingMax = 3,
      maxBucketFreq = Some(2))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(base), "cutoff produced a pair the exhaustive search lacks")
  }

  test("minhash LSH equals exhaustive jaccard pairs on this data") {
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == jac)
  }

  test("IVF recall vs brute force is sane") {
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size == bf.size)
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall $recall too low") // nprobe=4/16 buckets
  }

  test("IVF hard negatives: same contract as brute force, sane recall") {
    val bf = Similarity.hardNegatives(emb, "vec_id", "embedding", "label", 5,
      acceptBroadcastBaseline = true)
    val ivf = Similarity.hardNegativesIvf(emb, "vec_id", "embedding", "label", 5)
    assert(ivf.columns.toSeq == bf.columns.toSeq)
    val bfSet = bf.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSet = ivf.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every anchor still gets k negatives (buckets hold plenty of
    // different-label rows on this corpus)
    assert(ivfSet.size == bfSet.size)
    // label contract: no negative shares its anchor's label
    assert(ivf.filter(col("anchor_label") === col("negative_label")).count() == 0)
    val recall = ivfSet.intersect(bfSet).size.toDouble / bfSet.size
    assert(recall >= 0.3, s"IVF hard-negative recall $recall too low")
  }

  test("k-means centroids beat first-n on queries outside the centroid set") {
    // queries DISJOINT from the first-16 ids: when a query IS a
    // centroid its own bucket is centered on itself and first-n recall
    // is artificially perfect — the unbiased comparison uses ids ≥ 100
    // (measured here: first-n 0.50, spherical k-means 0.64)
    val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 110)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val firstN = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.kmeansCentroids(emb, "embedding", nlist = 16)
    val km = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
      centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rFirst = firstN.intersect(bf).size.toDouble / bf.size
    val rKm = km.intersect(bf).size.toDouble / bf.size
    assert(rKm >= rFirst, s"k-means recall $rKm below first-n $rFirst")
    assert(rKm >= 0.3, s"k-means IVF recall $rKm too low")
  }

  test("deterministic Lloyd centroids: reproducible, and recall holds up") {
    val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 110)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c1 = Similarity.lloydCentroids(emb, "vec_id", "embedding", 16, 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // bit-exact reproducibility under a different input partitioning —
    // the property MLlib's k-means|| init lacks
    val c2 = Similarity.lloydCentroids(emb.repartition(7), "vec_id",
        "embedding", 16, 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(c1 == c2, "lloydCentroids not partition-invariant")
    val firstN = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lloyd = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
        centroids = Some(Similarity.lloydCentroids(emb, "vec_id",
          "embedding", 16, 5)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rFirst = firstN.intersect(bf).size.toDouble / bf.size
    val rLloyd = lloyd.intersect(bf).size.toDouble / bf.size
    assert(rLloyd >= rFirst, s"lloyd recall $rLloyd below first-n $rFirst")
    assert(rLloyd >= 0.3, s"lloyd IVF recall $rLloyd too low")
  }

  test("incremental minhash dedup: in-batch, cross-batch, and replay") {
    import spark.implicits._
    val state = java.nio.file.Files.createTempDirectory("dedupstate")
      .resolve("state").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val other = "one two three four five six seven eight nine ten eleven twelve"
    val b1 = Seq(1L -> base, 2L -> base.replace(" mu", " nu"), 3L -> other)
      .toDF("doc_id", "text")
    val s1 = Dedup.minhashDedupIncremental(b1, "text", "doc_id", state, 3, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == Set(1L, 3L), s"in-batch near-dup should drop doc 2: $s1")

    // batch 2: a near-dup of batch 1's survivor (drop) + something new (keep)
    val fresh = "red orange yellow green blue indigo violet black white gray pink teal"
    val b2 = Seq(10L -> base.replace("alpha ", "alpha2 "), 11L -> fresh)
      .toDF("doc_id", "text")
    val s2 = Dedup.minhashDedupIncremental(b2, "text", "doc_id", state, 3, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s2 == Set(11L), s"cross-batch near-dup should drop doc 10: $s2")

    // redelivery: replaying batch 2 finds its own signatures in state
    val s3 = Dedup.minhashDedupIncremental(b2, "text", "doc_id", state, 3, 0.5)
      .count()
    assert(s3 == 0, s"replayed batch must yield zero survivors, got $s3")
  }

  test("batch-tagged incremental dedup replays to the identical survivor set") {
    import spark.implicits._
    val state = java.nio.file.Files.createTempDirectory("dedupreplay")
      .resolve("state").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = Seq(1L -> base, 2L -> base.replace(" mu", " nu"),
      3L -> "one two three four five six seven eight nine ten eleven twelve")
      .toDF("doc_id", "text")
    val first = Dedup.minhashDedupIncremental(b, "text", "doc_id", state, 3, 0.5,
      batchTag = Some(7L)).select("doc_id").collect().map(_.getLong(0)).toSet
    // simulate foreachBatch redelivery: same batch, same tag — the
    // same-tag state rows must be ignored and the survivors identical
    val replay = Dedup.minhashDedupIncremental(b, "text", "doc_id", state, 3, 0.5,
      batchTag = Some(7L)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first == Set(1L, 3L) && replay == first,
      s"replay diverged: first=$first replay=$replay")
    // a LATER batch still sees batch 7's signatures
    val later = Dedup.minhashDedupIncremental(
      Seq(20L -> base.replace("alpha ", "alphaX ")).toDF("doc_id", "text"),
      "text", "doc_id", state, 3, 0.5, batchTag = Some(8L))
      .count()
    assert(later == 0, "later batch missed cross-batch state")
  }

  test("incremental embedding LSH dedup: in-batch, cross-batch, and replay") {
    import spark.implicits._
    val state = java.nio.file.Files.createTempDirectory("lshstate")
      .resolve("state").toString
    def v(xs: Float*): Seq[Float] = xs
    val e1 = v(1f, 0.01f, 0f, 0f)           // anchor
    val e1b = v(0.99f, 0.05f, 0.01f, 0f)    // near-dup of anchor
    val e2 = v(0f, 1f, 0f, 0f)              // orthogonal
    val b1 = Seq(1L -> e1, 2L -> e1b, 3L -> e2).toDF("vec_id", "embedding")
    val s1 = Similarity.cosineLshIncremental(b1, "vec_id", "embedding",
      state, threshold = 0.9).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(s1 == Set(1L, 3L), s"in-batch near-dup should drop vec 2: $s1")

    // batch 2: near-dup of a state survivor (drop) + genuinely new (keep)
    val b2 = Seq(10L -> v(0.98f, 0.02f, 0.05f, 0f),
      11L -> v(0f, 0f, 1f, 0f)).toDF("vec_id", "embedding")
    val s2 = Similarity.cosineLshIncremental(b2, "vec_id", "embedding",
      state, threshold = 0.9).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(s2 == Set(11L), s"cross-batch near-dup should drop vec 10: $s2")

    // redelivery without a tag: replay sees its own vectors in state
    val s3 = Similarity.cosineLshIncremental(b2, "vec_id", "embedding",
      state, threshold = 0.9).count()
    assert(s3 == 0, s"replayed batch must yield zero survivors, got $s3")

    // batch-tagged replay is idempotent
    val state2 = java.nio.file.Files.createTempDirectory("lshreplay")
      .resolve("state").toString
    val first = Similarity.cosineLshIncremental(b1, "vec_id", "embedding",
      state2, threshold = 0.9, batchTag = Some(7L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val replay = Similarity.cosineLshIncremental(b1, "vec_id", "embedding",
      state2, threshold = 0.9, batchTag = Some(7L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(first == Set(1L, 3L) && replay == first,
      s"tagged replay diverged: first=$first replay=$replay")

    // the pure face agrees with the stateful decisions
    val flags = Similarity.cosineLshAgainstHistory(b2, b1.filter($"vec_id" =!= 2L),
      "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(flags(10L) == ((false, true, false)), s"10 should die by history: $flags")
    assert(flags(11L) == ((false, false, true)), s"11 should survive: $flags")
  }

  test("incremental embedding LSH with int8 state: same decisions, 4x smaller rows") {
    import spark.implicits._
    def v(xs: Float*): Seq[Float] = xs
    val e1 = v(1f, 0.01f, 0f, 0f)
    val e1b = v(0.99f, 0.05f, 0.01f, 0f)
    val e2 = v(0f, 1f, 0f, 0f)
    val b1 = Seq(1L -> e1, 2L -> e1b, 3L -> e2).toDF("vec_id", "embedding")
    val b2 = Seq(10L -> v(0.98f, 0.02f, 0.05f, 0f),
      11L -> v(0f, 0f, 1f, 0f)).toDF("vec_id", "embedding")
    // coordinates are in [−1, 1] (normalized-embedding regime), so the
    // full int8 range is scale = 127; quantization moves each coord by
    // ≤ 1/254 — far inside the 0.9-threshold margin of this corpus
    val scale = Some(127.0)
    val state = java.nio.file.Files.createTempDirectory("lshint8")
      .resolve("state").toString
    val s1 = Similarity.cosineLshIncremental(b1, "vec_id", "embedding",
        state, threshold = 0.9, int8Scale = scale)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(s1 == Set(1L, 3L), s"int8 in-batch decisions diverged: $s1")
    val s2 = Similarity.cosineLshIncremental(b2, "vec_id", "embedding",
        state, threshold = 0.9, int8Scale = scale)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(s2 == Set(11L), s"int8 cross-batch decisions diverged: $s2")
    // state schema is int8 codes, not float vectors
    val st = spark.read.parquet(state)
    assert(st.schema("q").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType),
      st.schema.treeString)
    assert(!st.columns.contains("v"))
    // codes dequantize to within half a quantization step
    val err = st.select(col("id"),
        transform(col("q"), c => c.cast("double") / lit(127.0)).as("dq"))
      .join(b1.unionByName(b2).select(col("vec_id").as("id"),
        col("embedding")), Seq("id"))
      .select(aggregate(zip_with(col("dq"), col("embedding"),
        (a, b) => abs(a - b.cast("double"))), lit(0.0),
        (acc, x) => greatest(acc, x)).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(err <= 0.5 / 127.0 + 1e-9, s"dequantization error $err")
  }

  test("decode stub is deterministic and total") {
    val out = Multimodal.decode(
      Multimodal.withBinary(docs, "text", "doc_id"), "doc_id")
    assert(out.count() == docs.count())
    val again = Multimodal.decode(
      Multimodal.withBinary(docs, "text", "doc_id"), "doc_id")
    assert(out.exceptAll(again).isEmpty)
  }

  test("real PNG decode reads true pixel dimensions via ImageIO") {
    import spark.implicits._
    // fixture: genuine PNG bytes at known dims, plus a non-image payload
    val png = Multimodal.syntheticPng(37, 21, seed = 5L)
    assert(Multimodal.sniffFormat(png).contains("png"))
    assert(Multimodal.realDecode(png).contains((37, 21, 1, "png")))
    // corrupt header → fake fallback, never a crash
    assert(Multimodal.realDecode("hello".getBytes).isEmpty)
    val df = Seq((1L, png), (2L, "not an image".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.decode(df, "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    assert(out(1L) == ((37, 21, "png")), "real path must read true dims")
    val (fw, fh, _, ffmt) = Multimodal.fakeDecode("not an image".getBytes)
    assert(out(2L) == ((fw, fh, ffmt)), "non-image must take the fake path")
  }

  test("real resize rescales the actual payload, not just metadata") {
    import spark.implicits._
    val df = Seq((1L, Multimodal.syntheticPng(60, 30, 1L)), // wide: w-limited
      (2L, Multimodal.syntheticPng(20, 50, 2L)),            // tall: h-limited
      (3L, Multimodal.syntheticPng(10, 12, 3L)))            // already fits
      .toDF("doc_id", "payload")
    val resized = Multimodal.resize(df, "doc_id", maxW = 24, maxH = 24)
    // adjudicate from the OUTPUT payload bytes via a real re-decode
    val redecoded = Multimodal.decode(resized, "id")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(redecoded(1L) == ((24, 12)), "60x30 must scale to 24x12")
    assert(redecoded(2L) == ((9, 24)), "20x50 must scale to 9x24 (20*24/50)")
    assert(redecoded(3L) == ((10, 12)), "fitting image must pass through")
    assert(Multimodal.fitDims(60, 30, 24, 24) == ((24, 12)))
    assert(Multimodal.fitDims(20, 50, 24, 24) == ((9, 24)))
  }

  test("hardNegatives returns closest wrong-label vectors only") {
    import spark.implicits._
    // label 0: x-axis cluster; label 1: y-axis; anchor (1,0)'s hardest
    // wrong-label negative is the y-vector tilted toward x
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.5f, 0.8f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(df, "vec_id", "embedding", "label", 2,
      acceptBroadcastBaseline = true)
      .collect()
    assert(r.forall(x =>
      x.getAs[Int]("anchor_label") != x.getAs[Int]("negative_label")),
      "a negative shared the anchor's label")
    val anchor1 = r.filter(_.getAs[Long]("qid") == 1L)
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("nid")).toSeq
    assert(anchor1 == Seq(4L, 3L), s"got $anchor1")
  }

  test("negativeSample is deterministic, label-disjoint, and capped") {
    import spark.implicits._
    val df = (0L until 60L).map(i => (i, (i % 3).toInt))
      .toDF("vec_id", "label")
    val a = Sampling.negativeSample(df, "vec_id", "label", k = 3, thin = 2)
      .collect()
    assert(a.forall(x =>
      x.getAs[Int]("anchor_label") != x.getAs[Int]("negative_label")))
    assert(a.groupBy(_.getAs[Long]("anchor_id"))
      .forall(_._2.length <= 3), "k not respected")
    assert(a.nonEmpty)
    val b = Sampling.negativeSample(df.repartition(7), "vec_id", "label",
      k = 3, thin = 2).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet,
      "sampling changed under repartition")
  }

  test("sharedShinglePairs counts distinct shared k-grams with a floor") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e"),        // shingles: abc bcd cde
      (2L, "a b c d x"),        // shares abc bcd with 1
      (3L, "z a b c z2"),       // shares only abc with 1 and 2
      (4L, "q r s t u")).toDF("doc_id", "text")
    val two = Dedup.sharedShinglePairs(d, "text", "doc_id", 3, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(two.keySet == Set((1L, 2L)), s"got ${two.keySet}")
    assert(two((1L, 2L)) == 2L)
    val one = Dedup.sharedShinglePairs(d, "text", "doc_id", 3, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("qualitySurvivors keeps the best-scoring member, min-id on ties") {
    import spark.implicits._
    val d = Seq((1L, 10.0), (2L, 30.0), (3L, 20.0), (4L, 5.0), (5L, 5.0),
      (9L, 1.0)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.qualitySurvivors(d, "doc_id", pairs, col("q"))
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("survivor_id"),
          r.getAs[Double]("survivor_score"))).toMap
    assert(out.keySet == Set(1L, 4L, 9L))
    assert(out(1L) == ((3L, 2L, 30.0)), "highest score wins the cluster")
    assert(out(4L) == ((2L, 4L, 5.0)), "score tie falls back to min id")
    assert(out(9L) == ((1L, 9L, 1.0)), "singleton survives itself")
  }

  test("NaN guards: zero vectors and NaN scores never win dedup decisions") {
    import spark.implicits._
    // a zero vector's cosine is 0/0 = NaN, which Spark orders ABOVE
    // every threshold — ungated it pairs with everything / kills its
    // whole bucket; the norm guard excludes it from all cosine dedup
    val vecs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.99f, 0.1f)),
      (7L, Seq(0f, 0f))) // the zero vector
      .toDF("vec_id", "embedding")
    val brute = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding",
      threshold = 0.9, acceptQuadraticBaseline = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute === Set((1L, 2L)), s"zero vector must pair with nothing: $brute")
    val sem = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.9, nlist = 1)
      .filter(col("dropped")).select("vec_id").as[Long].collect().toSet
    assert(sem === Set(2L), s"zero vector must kill nothing: $sem")
    val lsh = graft.ext.Similarity.cosineLshPairs(vecs, "vec_id",
      "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!lsh.exists(p => p._1 == 7L || p._2 == 7L),
      s"zero vector must not survive LSH verify: $lsh")
    // a NaN quality score must never be crowned survivor
    val d = Seq((1L, 10.0), (2L, Double.NaN), (3L, 20.0))
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.qualitySurvivors(d, "doc_id", pairs, col("q"))
      .collect().map(r => r.getAs[Long]("survivor_id")).toSet
    assert(out === Set(3L), s"NaN must lose to every real score: $out")
  }

  test("simhashPairsXxh64 hammingMax=0: exact-signature pairs only") {
    import spark.implicits._
    // hammingMax = 0 makes chunkBits = 64, where the old (1L << 64)
    // mask wrapped to 0 and collapsed every doc into one bucket (a
    // silent O(n²) candidate join). With the full-width mask the path
    // is exercised end-to-end: only identical texts (identical
    // signatures) pair, at hamming 0.
    val base = docs.limit(30).select(col("doc_id"), col("text"))
    val dup = base.filter(col("doc_id") === base.select(min("doc_id"))
        .as[Long].head())
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val out = Dedup.simhashPairsXxh64(base.unionByName(dup), "text",
        "doc_id", hammingMax = 0)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect()
    assert(out.forall(_._3 == 0L), s"non-exact pair reported: ${out.toSeq}")
    assert(out.length === 1 && out.head._2 == out.head._1 + 100000L,
      s"exactly the planted duplicate must pair: ${out.toSeq}")
  }

  test("nearDupLabels converges on deep chains via pointer jumping") {
    import spark.implicits._
    // a 60-link chain needs 59 one-hop rounds — far past the 25-round
    // budget; pointer jumping converges in O(log n) and the loud
    // non-convergence require never fires
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val lbl = Dedup.nearDupLabels(chain)
      .select("lbl").distinct().as[Long].collect()
    assert(lbl.toSeq === Seq(0L), "one chain must collapse to one label")
  }

  test("WAV decode reads back exactly what the synthetic generator wrote") {
    // real javax.sound.sampled path: format fields and integer PCM
    // stats must match the generator's closed-form sample function
    val seed = 42L
    val wav = Multimodal.syntheticWav(11000, 2, 250, seed)
    val Some((rate, ch, bits, frames, durMs, sMin, sMax, sumAbs, src)) =
      Multimodal.realAudioDecode(wav)
    assert((rate, ch, bits, frames, src) == (11000, 2, 16, 250L, "wav"))
    assert(durMs == 250L * 1000 / 11000)
    val expected = (0 until 500).map(j =>
      ((seed * 7919L + j * 104729L) % 65536L) - 32768L)
    assert(sMin == expected.min && sMax == expected.max)
    assert(sumAbs == expected.map(math.abs).sum)
    // non-WAV bytes take the deterministic fake path
    assert(Multimodal.realAudioDecode("not audio".getBytes).isEmpty)
    val fake1 = Multimodal.fakeAudioDecode("not audio".getBytes)
    assert(fake1 == Multimodal.fakeAudioDecode("not audio".getBytes))
  }

  test("mp3 frame-header walk extracts what the generator encoded") {
    // 128 kbps (idx 9), 44100 Hz (idx 0), 5 frames
    val m = Multimodal.syntheticMp3(9, 0, 5, seed = 3L)
    assert(Multimodal.mp3Meta(m) === Some((128, 44100, 5L, 130L)),
      "duration = 5·1152000/44100 = 130 ms")
    // leading garbage before the first sync is scanned past
    assert(Multimodal.mp3Meta(Array[Byte](1, 2, 3) ++ m) ===
      Some((128, 44100, 5L, 130L)))
    // 320 kbps / 32000 Hz / 2 frames: a different stride per frame
    val m2 = Multimodal.syntheticMp3(14, 2, 2, seed = 9L)
    assert(Multimodal.mp3Meta(m2) === Some((320, 32000, 2L, 72L)))
    assert(Multimodal.mp3Meta("not audio at all".getBytes).isEmpty)
  }

  test("h264 SPS parse: Exp-Golomb fields, dimensions, de-escape") {
    assert(Multimodal.h264SpsMeta(Multimodal.syntheticH264Sps(31, 5, 4))
      === Some((66, 31, 80, 64)))
    // level 0 puts a 00 00 pair in the SPS header; inserting an
    // emulation-prevention 03 after it is a conforming escaped stream
    // the parser must de-escape back to the same fields
    val raw = Multimodal.syntheticH264Sps(0, 6, 5)
    assert(Multimodal.h264SpsMeta(raw) === Some((66, 0, 96, 80)))
    val escaped = raw.take(8) ++ Array(3.toByte) ++ raw.drop(8)
    assert(Multimodal.h264SpsMeta(escaped) === Some((66, 0, 96, 80)),
      "emulation-prevention byte must be dropped")
    assert(Multimodal.h264SpsMeta("not a NAL".getBytes).isEmpty)
    // a conforming-ESCAPED SPS whose first ue() field opens with a
    // 31-zero bit run (00 00 03 00 01 de-escapes to 00 00 00 01):
    // (1 << 31) is Int.MinValue, so an unguarded reader would return
    // Some(negative garbage) — the run cap must map it to None
    val overrun = Array[Byte](0, 0, 1, 0x67, 0x42, 0x00, 0x1f,
      0x00, 0x00, 0x03, 0x00, 0x01, 0xff.toByte, 0xff.toByte)
    assert(Multimodal.h264SpsMeta(overrun).isEmpty,
      "a 31+ zero Exp-Golomb run is malformed, not garbage dims")
  }

  test("audio features: Σs², RMS, and channel-0-only zero crossings") {
    val seed = 42L
    val wav = Multimodal.syntheticWav(11000, 2, 250, seed)
    val Some((n, sumSq, zc)) = Multimodal.realAudioFeatures(wav)
    val samples = (0 until 500).map(j =>
      ((seed * 7919L + j * 104729L) % 65536L) - 32768L)
    assert(n == 500L)
    assert(sumSq == samples.map(s => s * s).sum)
    // reference ZCR over channel 0 only (even indices in the
    // 2-channel interleave), strict sign flips
    val c0 = samples.zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
    val wantZc = c0.zip(c0.tail).count { case (a, b) =>
      (a > 0 && b < 0) || (a < 0 && b > 0)
    }
    assert(zc == wantZc.toLong, s"zc $zc != reference $wantZc")
    assert(Multimodal.realAudioFeatures("not audio".getBytes).isEmpty)
  }

  test("µ-law decode runs the JDK G.711 decompressor and matches the closed form") {
    // the formula the SQL oracle replays must equal the JDK codec's
    // table on every one of the 256 µ-law codes
    val allCodes = Array.tabulate(256)(_.toByte)
    val ref = {
      val wav = {
        val out = new java.io.ByteArrayOutputStream()
        def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
        def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
        out.write("RIFF".getBytes); le32(36 + 256); out.write("WAVE".getBytes)
        out.write("fmt ".getBytes); le32(16); le16(7); le16(1); le32(8000)
        le32(8000); le16(1); le16(8)
        out.write("data".getBytes); le32(256); out.write(allCodes); out.toByteArray
      }
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false), raw)
      val bs = pcm.readAllBytes()
      Array.tabulate(256)(i => (((bs(2 * i + 1) << 8) | (bs(2 * i) & 0xff)).toShort).toInt)
    }
    for (b <- 0 until 256)
      assert(Multimodal.ulawToPcm16(b) == ref(b), s"code $b diverges")

    // end-to-end: synthetic µ-law payload through realAudioDecode
    val ulaw = Multimodal.syntheticUlawWav(9000, 2, 300, 5L)
    val Some((rate, ch, bits, frames, _, sMin, sMax, sumAbs, src)) =
      Multimodal.realAudioDecode(ulaw)
    assert((rate, ch, bits, frames, src) == (9000, 2, 16, 300L, "ulaw"))
    val expected = (0 until 600).map(j =>
      Multimodal.ulawToPcm16(math.floorMod(5L * 7919L + j * 104729L, 256L).toInt).toLong)
    assert(sMin == expected.min && sMax == expected.max)
    assert(sumAbs == expected.map(math.abs).sum)
  }

  test("A-law decode matches the JDK table on all 256 codes and end-to-end") {
    val allCodes = Array.tabulate(256)(_.toByte)
    val ref = {
      val wav = {
        val out = new java.io.ByteArrayOutputStream()
        def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
        def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
        out.write("RIFF".getBytes); le32(36 + 256); out.write("WAVE".getBytes)
        out.write("fmt ".getBytes); le32(16); le16(6); le16(1); le32(8000)
        le32(8000); le16(1); le16(8)
        out.write("data".getBytes); le32(256); out.write(allCodes); out.toByteArray
      }
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false), raw)
      val bs = pcm.readAllBytes()
      Array.tabulate(256)(i => (((bs(2 * i + 1) << 8) | (bs(2 * i) & 0xff)).toShort).toInt)
    }
    for (b <- 0 until 256)
      assert(Multimodal.alawToPcm16(b) == ref(b), s"code $b diverges")

    val alaw = Multimodal.syntheticAlawWav(12000, 1, 400, 9L)
    val Some((rate, ch, bits, frames, _, sMin, sMax, sumAbs, src)) =
      Multimodal.realAudioDecode(alaw)
    assert((rate, ch, bits, frames, src) == (12000, 1, 16, 400L, "alaw"))
    val expected = (0 until 400).map(j =>
      Multimodal.alawToPcm16(math.floorMod(9L * 7919L + j * 104729L, 256L).toInt).toLong)
    assert(sMin == expected.min && sMax == expected.max)
    assert(sumAbs == expected.map(math.abs).sum)
  }

  test("AVI demux walks the RIFF container and recovers every JPEG frame") {
    val avi = Multimodal.syntheticAvi(5, 42L)
    assert(Multimodal.sniffAvi(avi))
    val frames = Multimodal.aviFrames(avi)
    assert(frames.length == 5, s"expected 5 frames, got ${frames.length}")
    // every extracted chunk is a decodable JPEG with the formula dims
    for ((f, i) <- frames.zipWithIndex) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null, s"frame $i not a decodable image")
      assert(img.getWidth == 16 + math.floorMod(42L + 11L * i, 32L).toInt)
      assert(img.getHeight == 16 + math.floorMod(7L * 42L + 5L * i, 32L).toInt)
    }
    // odd-length chunks must be padded: frame sizes vary, so at least
    // one synthetic AVI in a small sweep exercises the pad-byte path
    val padded = (0 until 8).map(s => Multimodal.syntheticAvi(3, s.toLong))
    assert(padded.forall(b => Multimodal.aviFrames(b).length == 3),
      "a padded chunk broke the walk")
    // non-AVI and truncated payloads degrade to empty, never throw
    assert(Multimodal.aviFrames("not a container".getBytes).isEmpty)
    assert(Multimodal.aviFrames(avi.take(40)).isEmpty)
  }

  test("dHash is stable under PNG re-encode and flips on content change") {
    // hash is a function of decoded PIXELS: byte-identical after a
    // lossless re-encode round-trip, different when content changes
    val png = Multimodal.syntheticPng(40, 32, seed = 9L)
    val h1 = Multimodal.dHash(png).get
    assert(h1.length == 16 && h1.matches("[0-9a-f]{16}"))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.dHash(bos.toByteArray).contains(h1),
      "re-encoded identical pixels must hash identically")
    // a uniform brightness shift (seed+1 adds +1 to every pixel) keeps
    // every gradient comparison — invariance is the POINT of dHash
    val shifted = Multimodal.syntheticPng(40, 32, seed = 10L)
    assert(Multimodal.dHash(shifted).contains(h1),
      "uniform brightness shift must not change a difference hash")
    // different geometry changes the sampling strides -> different bits
    val other = Multimodal.syntheticPng(32, 40, seed = 9L)
    assert(Multimodal.dHash(other).get != h1, "different content must differ")
    assert(Multimodal.dHash("not an image".getBytes).isEmpty)
  }

  test("phashPairs: keyed duplicates found, perturbed twins within 2 bits") {
    import spark.implicits._
    // ids 1,11,21 share key 1 (gens 0,1,2): gen1 is perturbed by one
    // sampled pixel; 5 has its own key and must pair with nothing
    val ids = Seq(1L, 11L, 21L, 5L).toDF("doc_id")
    val hashed = Multimodal.withDHash(
      Multimodal.withSyntheticPngKeyed(ids, "doc_id", mod = 10), "id")
    val pairs = Multimodal.phashPairs(hashed, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 11L), (1L, 21L), (11L, 21L)),
      s"got ${pairs.keySet}")
    assert(pairs((1L, 21L)) == 0L, "same parity generations are exact dups")
    assert(pairs((1L, 11L)) <= 2L, "perturbation touches at most 2 bits")
    assert(pairs((1L, 11L)) == pairs((11L, 21L)))
  }

  test("cosine LSH finds the exact all-pairs near-dups with no false positives") {
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.45, acceptQuadraticBaseline = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineLshPairs(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH produced a false positive despite exact verification")
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.5, s"LSH recall $recall vs exact all-pairs")
    }
  }

  test("semantic dedup kills are true near-dups and chain minima survive") {
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.45, acceptQuadraticBaseline = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Dedup.semanticDedup(emb, "vec_id", "embedding", 0.45).collect()
    assert(sem.length == emb.count(), "semantic dedup lost or duplicated rows")
    for (r <- sem if r.getBoolean(2)) {
      val (id, killer) = (r.getLong(0), r.getLong(3))
      assert(killer < id, s"killer $killer not a lower id than $id")
      assert(exact.contains((killer, id)),
        s"($killer,$id) dropped but not an exact near-dup pair")
    }
    // within-cluster recall: every exact pair whose endpoints share a
    // bucket must register as a kill of the larger id
    val bucketOf = sem.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dropped = sem.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    for ((a, b) <- exact if bucketOf(a) == bucketOf(b))
      assert(dropped.contains(b), s"co-bucketed near-dup ($a,$b) kept $b")
  }

  test("PQ ADC recall against the cosine brute force") {
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding",
        k = 5, dim = 64, m = 8, ksub = 16, rerank = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & bf).size.toDouble / bf.size
    assert(recall >= 0.6, s"PQ recall@5 $recall vs cosine brute force")
  }

  test("IVF-PQ recall against the cosine brute force") {
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
        k = 5, dim = 64, nlist = 16, nprobe = 4, m = 8, ksub = 16,
        rerank = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivfpq & bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF-PQ recall@5 $recall vs cosine brute force")
  }

  test("feature extraction emits fixed-dim float vectors, deterministically") {
    val wb = Multimodal.withBinary(docs, "text", "doc_id")
    val f1 = Multimodal.featureExtract(wb, "doc_id")
    assert(f1.schema("feature").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val rows = f1.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    val f2 = Multimodal.featureExtract(wb, "doc_id")
    assert(f1.exceptAll(f2).isEmpty)
  }

  test("resize clamps pseudo-dimensions and keeps payloads non-empty") {
    val wb = Multimodal.withBinary(docs, "text", "doc_id")
    val rs = Multimodal.resize(wb, "doc_id", maxW = 256, maxH = 256).collect()
    assert(rs.length == docs.count())
    assert(rs.forall(r => r.getInt(2) <= 256 && r.getInt(3) <= 256))
    assert(rs.forall(r => r.getAs[Array[Byte]](1).nonEmpty))
  }

  test("frame sampling explodes to ceil(n_frames/stride) rows per doc") {
    val wb = Multimodal.withBinary(docs, "text", "doc_id")
    val meta = Multimodal.decode(wb, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    val frames = Multimodal.frameSample(wb, "doc_id", stride = 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(frames.keySet == meta.keySet)
    meta.foreach { case (id, n) =>
      assert(frames(id) == (n + 3) / 4, s"doc $id: $n frames -> ${frames(id)} sampled")
    }
  }

  test("stratified sampling: deterministic under a seed, fractions in bounds") {
    val d = docs.withColumn("lang_pred", Text.langId(col("text")))
    val fracs = Map("en" -> 0.2, "de" -> 0.8, "fr" -> 0.8, "es" -> 0.8, "zh" -> 1.0)
    val s1 = d.stat.sampleBy("lang_pred", fracs, 42L).collect().map(_.getLong(0)).toSet
    val s2 = d.stat.sampleBy("lang_pred", fracs, 42L).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must select the same rows")
    val perLang = d.stat.sampleBy("lang_pred", fracs, 42L)
      .groupBy("lang_pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = d.groupBy("lang_pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- perLang) {
      val frac = n.toDouble / totals(lang)
      assert(frac <= math.min(1.0, fracs(lang) * 2) + 0.2 &&
        (totals(lang) < 10 || frac >= fracs(lang) / 3),
        s"$lang sampled fraction $frac far from ${fracs(lang)}")
    }
  }

  test("langId returns only known codes") {
    val langs = docs.select(Text.langId(col("text"))).distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
  }

  test("diversitySample: sqrt quotas, central-first picks, partition-proof") {
    import spark.implicits._
    // nlist=2 -> centroids are vectors 0 ([1,0]) and 1 ([0,1]); ids
    // 2..6 cluster on the x-axis (bucket 0, size 6 with its centroid),
    // ids 7..8 on the y-axis (bucket 1, size 3). total=4:
    // w0=sqrt(6)=2.449.., w1=sqrt(3)=1.732.., sum=4.181..;
    // quota0=floor(4*2.449/4.181)=2, quota1=floor(4*1.732/4.181)=1
    val vecs = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      2L -> Seq(1.0f, 0.05f), 3L -> Seq(1.0f, 0.1f),
      4L -> Seq(1.0f, 0.2f), 5L -> Seq(1.0f, 0.3f),
      6L -> Seq(1.0f, 0.4f),
      7L -> Seq(0.05f, 1.0f), 8L -> Seq(0.3f, 1.0f))
      .toDF("vec_id", "embedding")
    val r = Sampling.diversitySample(vecs, "vec_id", "embedding",
      total = 4L, nlist = 2).collect()
    assert(r.length == 9)
    val kept = r.filter(_.getAs[Boolean]("kept"))
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("vec_id")).toSeq
    // bucket 0 keeps its centroid (csim 1.0) + the closest member (id
    // 2, 0.05 tilt); bucket 1 keeps only its centroid
    assert(kept.sorted == Seq(0L -> 0L, 0L -> 2L, 1L -> 1L), s"got $kept")
    val q = r.map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("quota"))
      .distinct.toMap
    assert(q == Map(0L -> 2L, 1L -> 1L), s"got $q")
    // same result under any input partitioning
    val r8 = Sampling.diversitySample(vecs.repartition(8), "vec_id",
      "embedding", total = 4L, nlist = 2)
      .orderBy(col("vec_id")).collect().toSeq
    val r1 = Sampling.diversitySample(vecs.repartition(1), "vec_id",
      "embedding", total = 4L, nlist = 2)
      .orderBy(col("vec_id")).collect().toSeq
    assert(r8 == r1)
  }

  test("neymanSample gives variable strata more budget, capped and invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // stratum "wide": values 0..100; "narrow": ~50±1; same sizes
    val rows = (1L to 300L).map(i => ("wide", i, rnd.nextInt(10000) / 100.0)) ++
      (301L to 600L).map(i => ("narrow", i, 50.0 + rnd.nextInt(200) / 100.0)) ++
      (601L to 605L).map(i => ("tiny", i, rnd.nextInt(10000) / 100.0))
    val df = rows.toDF("h", "id", "v")
    val r = Sampling.neymanSample(df, col("h"), col("id"), col("v"), 100L)
      .select("h", "quota", "kept", "n_h")
      .collect()
    val quota = r.map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(quota("wide") > quota("narrow"),
      s"variance-aware allocation inverted: $quota")
    assert(quota.values.sum <= 100L + quota.size, "budget blown past floor slack")
    assert(quota("tiny") <= 5L, "quota exceeded stratum size")
    // per stratum, exactly `quota` rows carry kept = true
    val keptBy = r.filter(_.getBoolean(2)).groupBy(_.getString(0))
      .view.mapValues(_.length.toLong).toMap
    quota.foreach { case (h, q) =>
      assert(keptBy.getOrElse(h, 0L) === q, s"stratum $h kept != quota") }
    // partition invariance
    val a = Sampling.neymanSample(df.repartition(7), col("h"), col("id"),
      col("v"), 100L).orderBy("h", "id").collect().toSeq
    val b = Sampling.neymanSample(df.repartition(1), col("h"), col("id"),
      col("v"), 100L).orderBy("h", "id").collect().toSeq
    assert(a === b)
  }

  test("farthestPointSample matches the naive greedy k-center reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0L until 60L).map(i =>
      (i, Array.fill(6)(rnd.nextFloat() * 2f - 1f)))
    val df = rows.toDF("vec_id", "embedding")
    val k = 5
    val got = Sampling.farthestPointSample(df, "vec_id", "embedding", k)
      .orderBy(col("pick_rank"))
      .select("pick_rank", "id").as[(Int, Long)].collect()
      .map(_._2).toSeq

    def cosd(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.indices.map(j => x(j).toDouble * y(j).toDouble).sum
      1.0 - d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val byId = rows.toMap
    var sel = Seq(0L) // seed = min id
    while (sel.size < k) {
      val pick = rows.map(_._1).filterNot(sel.contains)
        .map(i => (i, sel.map(s => cosd(byId(i), byId(s))).min))
        .minBy { case (i, d) => (-d, i) }._1
      sel = sel :+ pick
    }
    assert(got === sel)
  }

  test("farthestPointSample spreads picks: every later pick is farther than its coverage radius") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (0L until 80L).map(i =>
      (i, Array.fill(5)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val r = Sampling.farthestPointSample(df, "vec_id", "embedding", 6)
      .orderBy(col("pick_rank"))
      .select("pick_rank", "sel_dist").as[(Int, Option[Double])].collect()
    assert(r.head._2.isEmpty) // seed has no distance
    val dists = r.tail.map(_._2.get)
    // greedy max-min distances are non-increasing
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b })
  }
}
