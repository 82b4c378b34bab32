package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY.md
  * §2.8): exact, n-gram Jaccard (inverted-index), MinHash+LSH banding,
  * SimHash with pigeonhole banding, embedding-cosine near-dup.
  *
  * Scale design notes (100 TB):
  *  - Nothing here is O(n²) over documents: candidate generation always
  *    goes through an equi-join key (shingle, band hash, simhash chunk,
  *    or bucket id), so Spark shuffles on that key and only co-bucketed
  *    docs ever meet.
  *  - Ultra-frequent shingles create join skew; production would drop
  *    shingles with document-frequency above a cutoff (they carry no
  *    discriminative signal). Kept explicit in [[shingleIndex]].
  */
object Dedup {

  /** Exact dedup: canonical survivor per text (deterministic min-id —
    * dropDuplicates picks an arbitrary row, so we don't use it here).
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Distinct word k-shingles of a text column. */
  def shingles(text: Column, k: Int): Column = {
    val t = split(text, " ")
    when(size(t) >= k,
      array_distinct(transform(sequence(lit(0), size(t) - k), i =>
        concat_ws(" ", (0 until k).map(j => element_at(t, i + j + 1)): _*))))
      .otherwise(array(text))
  }

  /** Exploded (id, shingle) inverted index; optional df-cutoff drops
    * shingles appearing in more than maxDocFreq docs (skew guard).
    *
    * Built with a typed flatMap rather than Catalyst array HOFs:
    * transform()/aggregate() lambdas are INTERPRETED per element (no
    * codegen), which profiling showed dominating the whole dedup
    * pipeline; the compiled closure is ~5× faster and this op sits on
    * the hot path of every near-dup operator.
    */
  def shingleIndex(docs: DataFrame, textCol: String, idCol: String, k: Int,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idx = docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val w = text.split(' ')
        if (w.length < k) Iterator.single((id, text))
        else {
          val seen = scala.collection.mutable.LinkedHashSet.empty[String]
          var i = 0
          while (i + k <= w.length) {
            seen.add(w.slice(i, i + k).mkString(" ")); i += 1
          }
          seen.iterator.map(s => (id, s))
        }
      }.toDF("id", "s")
    maxDocFreq match {
      case Some(cut) =>
        val hot = idx.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") > cut)
        idx.join(hot, Seq("s"), "left_anti")
      case None => idx
    }
  }

  /** Exact-Jaccard verification of candidate pairs: intersection
    * counts from an inverted-index join RESTRICTED to candidate docs
    * (shipping whole shingle-set arrays to each pair profiled 2.4×
    * slower), then the Jaccard filter; per-doc counts join back as a
    * broadcast. Cost scales with candidates, not with the corpus.
    */
  private def verifyJaccard(idx: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame = {
    val candIds = candidates.select(col("doc_a").as("id"))
      .union(candidates.select(col("doc_b").as("id"))).distinct()
    val idxC = idx.join(candIds, Seq("id"), "left_semi")
    val inter = idxC.as("a")
      .join(idxC.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("ix"))
      .join(candidates, Seq("doc_a", "doc_b"), "left_semi")
    val counts = idx.groupBy("id").agg(count(lit(1)).as("n"))
    inter
      .join(broadcast(counts.select(col("id").as("doc_a"), col("n").as("na"))), "doc_a")
      .join(broadcast(counts.select(col("id").as("doc_b"), col("n").as("nb"))), "doc_b")
      .withColumn("jaccard",
        col("ix").cast("double") / (col("na") + col("nb") - col("ix")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard pairs with AllPairs-style prefix filtering
    * (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07
    * — public literature): shingles are globally ordered rarest-first;
    * Jaccard ≥ t plus the size filter |B| ≥ t·|A| implies an overlap of
    * ≥ ⌈t·n⌉, so two qualifying docs MUST share a token within their
    * (n − ⌈t·n⌉ + 1)-prefixes. Candidates therefore come from a
    * prefix×prefix equi-join (common shingles sit at the END of the
    * order and never generate pairs — this is what kills the
    * common-vocabulary pair explosion), then exact verification against
    * full shingle sets. Output is IDENTICAL to the exhaustive join.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached: consumed by the df-rank aggregate, the positioned join,
    // and the verification sets — without it the shingle explode (string
    // building over every k-gram) runs three times
    val idx = shingleIndex(docs, textCol, idCol, k).cache()

    // global rarity order: (document frequency, shingle) ascending
    val dfRank = idx.groupBy("s").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("df"), col("s"))
    val positioned = idx.join(dfRank, "s")
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))

    val prefix = positioned
      .filter(col("pos") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("id"), col("s"), col("n"))

    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("b.n") >= lit(threshold) * col("a.n") &&
          col("a.n") >= lit(threshold) * col("b.n"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()

    verifyJaccard(idx, candidates, threshold)
  }

  /** MinHash+LSH near-dup pairs: per-doc signature of `numHashes`
    * universal-hash minima over shingle hashes; signatures split into
    * `bands`; docs sharing any band bucket become candidates; candidates
    * are verified with exact Jaccard ≥ threshold (no false positives;
    * false-negative probability at j=0.8 with 128/32 is ~5e-8).
    *
    * Universal hashes: h_i(x) = (a_i·x + b_i) mod p over p = 2^31−1 with
    * x = xxhash64(shingle) folded into [0,p); constants from a fixed
    * seed so results are deterministic.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int, threshold: Double,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val p = 2147483647L
    val rnd = new scala.util.Random(42)
    val ab = Array.fill(numHashes)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong -> rnd.nextInt(Int.MaxValue).toLong)

    // cached: consumed by the signature pass, the verification
    // intersection join, and the per-doc counts
    val idx = shingleIndex(docs, textCol, idCol, k).cache()
    val hashed = idx.withColumn("x", pmod(xxhash64(col("s")), lit(p)))

    // Signatures + band buckets in ONE compiled flatMapGroups: a
    // 128-expression Catalyst aggregate blows past codegen method
    // limits and falls back to per-row interpretation (measured: wildly
    // variable 5–20s); the tight closure loop is deterministic and
    // fast. Shuffle shape is identical (one exchange on doc id).
    val spark2 = docs.sparkSession
    import spark2.implicits._
    val aArr = ab.map(_._1)
    val bArr = ab.map(_._2)
    val nh = numHashes
    val rpb = rowsPerBand
    val bandEntries = hashed.select(col("id"), col("x")).as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (id: Long, it: Iterator[(Long, Long)]) =>
        val sig = Array.fill(nh)(Long.MaxValue)
        it.foreach { case (_, x) =>
          var i = 0
          while (i < nh) {
            val v = (x * aArr(i) + bArr(i)) % p // x < p, a < 2^31 ⇒ no overflow
            if (v < sig(i)) sig(i) = v
            i += 1
          }
        }
        (0 until bands).iterator.map { b =>
          var h = 1125899906842597L
          var r = 0
          while (r < rpb) { h = h * 31 + sig(b * rpb + r); r += 1 }
          (id, b, h)
        }
      }.toDF("id", "band", "bucket")

    val candidates = bandEntries.as("a")
      .join(bandEntries.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()

    // exact Jaccard on CANDIDATES ONLY (the whole point of LSH)
    verifyJaccard(idx, candidates, threshold)
  }

  /** SimHash near-dup pairs: 64-bit signature from token-hash bit votes;
    * pairs within `hammingMax` found exactly via the pigeonhole split
    * into hammingMax+1 chunks (a pair within distance d must agree on at
    * least one of d+1 chunks) — candidate join on (chunkIdx, chunkValue).
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      hammingMax: Int = 3): DataFrame = {
    val nChunks = hammingMax + 1
    require(64 % nChunks == 0, "chunk count must divide 64")
    val chunkBits = 64 / nChunks

    val tok = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("t"))
      .withColumn("h", xxhash64(col("t")))

    val voteCols = (0 until 64).map(k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$k"))
    val votes = tok.groupBy(col("id")).agg(voteCols.head, voteCols.tail: _*)

    val sim = (0 until 64).map(k =>
      shiftleft(when(col(s"v$k") > 0, 1L).otherwise(0L), k))
      .reduce(_.bitwiseOR(_))
    val sigs = votes.select(col("id"), sim.as("sim"))

    val chunks = (0 until nChunks).map(j =>
      sigs.select(col("id"), col("sim"), lit(j).as("chunk"),
        shiftright(col("sim"), j * chunkBits).bitwiseAND((1L << chunkBits) - 1).as("cv")))
      .reduce(_ unionByName _)

    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingMax)
  }

  /** Embedding-cosine near-dup pairs (exact all-pairs — the baseline;
    * [[Similarity.ivfTopK]] is the bucketed scale path). Floats are
    * promoted to double BEFORE multiplication so both engines compute
    * identical products; only summation order can differ (1 ulp).
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.norm(col(vecCol)).as("nrm"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }
}
