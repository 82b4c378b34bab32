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

  /** Incremental-state read where ONLY "state doesn't exist yet" means
    * empty history. Any other read failure — corruption, permissions, a
    * transient FS error — MUST propagate: swallowing it (the old
    * `Try(...).toOption`) would silently skip history excision and
    * under-deduplicate the batch, which is data corruption, not a
    * recoverable default.
    */
  private[ext] def readStateOrEmpty(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => None
    }

  /** Exact dedup: canonical survivor per text (deterministic min-id —
    * dropDuplicates picks an arbitrary row, so we don't use it here).
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup keyed on the content digest instead of the content:
    * at corpus scale, grouping by the raw text ships every document's
    * full body through the exchange AS THE KEY; grouping by sha256
    * ships 64 hex chars per row regardless of document size — the
    * standard production shape (collision probability over any real
    * corpus is cryptographically negligible, and unlike a 64-bit
    * fingerprint there is no birthday-bound caveat at 10^12 docs).
    * Same survivor semantics as [[exact]]; the digest doubles as the
    * stable content key downstream stages join on.
    */
  def exactByDigest(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol).cast("binary"), 256).as("content_sha256"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Incremental exact dedup: admit only the new batch's documents
    * whose content digest is (a) unseen in the historical corpus and
    * (b) first within the batch — the daily-crawl-append counterpart
    * of [[exactByDigest]] (the near-dup counterpart with persistent
    * state is [[minhashDedupIncremental]]).
    *
    * Scale shape: in-batch dedup is the usual min-aggregate groupBy;
    * the history check is a left-anti equi-join on the 64-hex-char
    * digest — the history side needs only its digest column (at
    * production scale that index is stored as its own compact table,
    * bucketed on digest so successive batches probe without
    * reshuffling it; here it is derived from the history rows
    * directly, which Catalyst prunes to the one column).
    */
  def exactIncremental(newDocs: DataFrame, history: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val dig = sha2(col(textCol).cast("binary"), 256)
    val batch = newDocs.groupBy(dig.as("content_sha256"))
      .agg(min(col(idCol)).as("survivor_id"),
        count(lit(1)).as("n_batch_copies"))
    val hist = history.select(dig.as("content_sha256")).distinct()
    batch.join(hist, Seq("content_sha256"), "left_anti")
  }

  /** Chunk-level exact-duplicate removal — the practical form of
    * exact-substring dedup (Lee et al., ACL 2022: duplicated training
    * spans hurt LMs; production pipelines approximate the suffix-array
    * formulation by deduping fixed-size token segments). Documents are
    * cut into non-overlapping `chunkTokens`-token segments
    * ([[Text.chunk]] with overlap 0); each distinct segment text keeps
    * only its FIRST occurrence corpus-wide (min (doc_id, chunk_idx) —
    * deterministic under any partitioning); every later occurrence is
    * cut from its document. Per doc: segment counts, duplicated
    * fraction, and the re-assembled deduped text.
    *
    * Scale shape: two key shuffles, nothing quadratic —
    *  - first-occurrence is a groupBy on the segment text whose only
    *    aggregate is a min, so map-side partial aggregation absorbs
    *    even a boilerplate segment repeated across millions of docs
    *    (no skew guard needed: the hot key reduces to one row per map
    *    task before the exchange);
    *  - at 100 TB the group key would be the segment's 64-bit
    *    fingerprint rather than its text (same hashed-key move as
    *    [[Text.contamination]]'s `hashedGrams`), shrinking the shuffle
    *    by the mean segment length; kept as the text itself here so the
    *    oracle adjudicates the exact semantics;
    *  - re-assembly is a per-doc groupBy: collect surviving (idx, text)
    *    pairs, array_sort (order-stable regardless of arrival order),
    *    concat — state is O(one document), the same bound every other
    *    per-doc operator here lives with.
    */
  def chunkDedup(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int): DataFrame = {
    val ch = Text.chunk(docs, textCol, idCol, chunkTokens, overlap = 0)
    val first = ch.groupBy(col("chunk_text"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("first"))
    ch.join(first, "chunk_text")
      .withColumn("is_first",
        col("doc_id") === col("first.doc_id") &&
          col("chunk_idx") === col("first.chunk_idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_chunks"),
        sum(when(col("is_first"), 1).otherwise(0)).cast("bigint").as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("is_first"), struct(col("chunk_idx"), col("chunk_text"))))),
          x => x.getField("chunk_text"))).as("deduped_text"))
      .withColumn("dup_frac",
        lit(1.0) - col("n_kept").cast("double") / col("n_chunks").cast("double"))
  }

  /** Dolma-style paragraph-level NEAR-dup dedup (Soldaini et al. 2024;
    * RefinedWeb — public literature): the sub-document pass between
    * [[intraDocDedup]] (within one doc) and [[minhashLshPairs]] (whole
    * docs). Composition of audited pieces:
    *
    *  1. fixed segmentation — [[Text.chunk]]'s `paraTokens`-token
    *     non-overlapping windows stand in for paragraphs (the corpus
    *     carries no newlines; with newline-delimited text the same
    *     pipeline runs off `split(text, "\n")`);
    *  2. paragraph-keyed MinHash+LSH — each segment ≥ `minTokens`
    *     tokens becomes its own LSH document under the ordered key
    *     `pid = doc_id·1e6 + chunk_idx` (order-preserving: pid order =
    *     (doc_id, chunk_idx) lexicographic, which is what makes
    *     "earlier" well-defined; 1e6 bounds docs at 20M tokens here —
    *     at corpus scale the pid would be a struct key instead);
    *     band join + exact-Jaccard verify at `threshold`, identical
    *     machinery (and scale shape: bucketed equi-join, never
    *     all-pairs) to the document face;
    *  3. damage: a paragraph is REMOVED iff it near-dups an EARLIER
    *     paragraph (any verified pair names it on the larger-pid side
    *     — first occurrence wins, exactly the chunkDedup convention
    *     lifted from exact to near-dup). Short segments (< `minTokens`)
    *     are exempt — too few shingles for Jaccard to mean anything —
    *     and always kept.
    *
    * Emits the per-doc damage report: paragraph counts, removed count,
    * dup_frac, and the document re-assembled from surviving paragraphs
    * in order — byte-for-byte adjudicable.
    *
    * Correctness contract (same argument as [[minhashLshPairs]] vs the
    * exhaustive oracle): every true pair at j ≥ 0.8 is a band candidate
    * with P ≥ 1 − (1 − 0.8⁴)³² = 1 − 4.7e-8; the arr_jaccard verify is
    * exact, so the oracle can replay the semantics with the exhaustive
    * quadratic pair set.
    *
    * Cache lifecycle: with the default `eager = true` the per-doc
    * report is pinned (localCheckpoint) and the internal segmentation
    * cache is released before returning — no caller bookkeeping. With
    * `eager = false` the LAZY plan is returned for inspection and the
    * segmentation cache entry stays registered until the CALLER clears
    * it (`spark.catalog.clearCache()`, which the Verify/Bench harnesses
    * do per query) — a library caller passing `eager = false` owns that
    * cleanup or leaks one text-sized CacheManager entry per call.
    */
  def paragraphDedup(docs: DataFrame, textCol: String, idCol: String,
      paraTokens: Int = 20, minTokens: Int = 5, threshold: Double = 0.8,
      numHashes: Int = 128, bands: Int = 32,
      eager: Boolean = true): DataFrame = {
    require(minTokens >= 3, "paragraphs need >= 3 tokens for 3-gram shingles")
    // pid key-space guard (the r11 audit discipline: a silent cliff
    // must fail LOUDLY, never corrupt): chunk_idx >= 1e6 (a 20M-token
    // doc at the default paraTokens) would collide into doc_id+1's key
    // range, and doc_id beyond Long.MaxValue/1e6 would overflow the
    // multiply — both mark the WRONG paragraphs as removed with no
    // error. raise_error stays inside codegen and costs one branch.
    // cached: the segmentation feeds FOUR plan branches (reps groupBy,
    // verdicts member side, the LSH profiles via paras, and the final
    // damage join) — without the cache each branch re-runs the corpus
    // scan + split + posexplode (same pattern as minhashLshPairs's
    // profiles cache; Verify clears caches per query)
    val ch = paragraphChunks(docs, textCol, idCol, paraTokens).cache()
    paragraphDedupFromChunks(ch, minTokens, threshold, numHashes, bands,
      sep = " ", eager)
  }

  /** [[paragraphDedup]] on REAL newline paragraphs: the segmentation is
    * `split(text, "\n")` (one paragraph per line, positions preserved —
    * the shape the fixed-window face's scaladoc promised for
    * newline-delimited text), everything downstream — exact-first
    * representative collapse, MinHash+LSH at `threshold`,
    * earlier-occurrence-wins removal, per-doc damage report — is the
    * SAME kernel chain, and the document re-assembles with "\n" so the
    * surviving text round-trips byte-for-byte. Cache lifecycle of
    * `eager` as documented on [[paragraphDedup]]: `eager = false`
    * callers own the segmentation-cache cleanup
    * (`spark.catalog.clearCache()`).
    */
  def paragraphDedupLines(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 5, threshold: Double = 0.8,
      numHashes: Int = 128, bands: Int = 32,
      eager: Boolean = true): DataFrame = {
    require(minTokens >= 3, "paragraphs need >= 3 tokens for 3-gram shingles")
    val ch = paragraphChunksLines(docs, textCol, idCol).cache()
    paragraphDedupFromChunks(ch, minTokens, threshold, numHashes, bands,
      sep = "\n", eager)
  }

  /** Shared batch-face tail: exact-first representative collapse →
    * rep-level LSH → verdicts → eager report → cache release.
    *
    * EXACT-FIRST composition (the production ordering — Dolma/
    * RefinedWeb run the hash pass before MinHash): collapse identical
    * paragraph texts to their first-occurrence representative and run
    * LSH on REPRESENTATIVES only. Provably verdict-equivalent to the
    * pairwise rule on all paragraphs: (i) a non-min member always has
    * its group min as an earlier j=1 partner → removed either way;
    * (ii) a representative is removed iff some earlier paragraph
    * near-dups it, and since jaccard depends only on TEXT, that
    * earlier paragraph's own representative (pid ≤ it < rep) carries
    * the identical pair — so rep-level pairs decide exactly. The
    * scale payoff: the LSH stage is CLONE-INVARIANT — an adversarial
    * k×-duplicated corpus costs the same near-dup work as its
    * distinct content (measured in ScaleBench `paradedup`: the
    * member-level formulation OOM'd a 48 GB JVM at 40× clones on the
    * 32·Σk² band-candidate blowup; this one is flat).
    */
  private def paragraphDedupFromChunks(ch: DataFrame, minTokens: Int,
      threshold: Double, numHashes: Int, bands: Int,
      sep: String, eager: Boolean): DataFrame = {
    val paras = ch.filter(col("n_chunk_tokens") >= minTokens)
    val reps = paras.groupBy(col("chunk_text"))
      .agg(min(col("pid")).as("pid"))
    val removedReps = minhashLshPairs(reps, "chunk_text", "pid",
        k = 3, threshold, numHashes, bands)
      .select(col("doc_b").as("rpid")).distinct()
    val report = paragraphReport(ch,
      paragraphVerdicts(paras, reps, removedReps), sep)
    // TWO cache-lifecycle faces (r13 verdict: one face can't serve
    // both masters). eager=true (library default): the report is one
    // row per doc — pin it and release the segmentation cache HERE,
    // so library callers don't leak one text-sized CacheManager entry
    // per call. eager=false (registered queries / plan inspection):
    // return the LAZY plan — the harnesses clearCache per query, and
    // an eager pin would both hide the plan shape behind a
    // Scan ExistingRDD and execute the dedup at registration time.
    if (eager) {
      val pinned = report.localCheckpoint(true)
      ch.unpersist()
      pinned
    } else report
  }

  /** Member verdicts shared by the batch and streaming paragraph faces
    * (ONE polarity, one place): a paragraph is removed iff it is not
    * its text group's first occurrence, or its representative fell at
    * the near-dup stage (`removedReps(rpid)`).
    */
  private def paragraphVerdicts(paras: DataFrame, reps: DataFrame,
      removedReps: DataFrame): DataFrame =
    paras.select(col("pid"), col("chunk_text"))
      .join(reps.select(col("chunk_text"), col("pid").as("rep_pid")),
        "chunk_text")
      .join(removedReps.withColumn("rep_removed", lit(true)),
        col("rep_pid") === col("rpid"), "left")
      .select(col("pid"),
        (col("pid") =!= col("rep_pid") ||
          coalesce(col("rep_removed"), lit(false))).as("removed"))

  /** Guarded fixed-window segmentation shared by the batch and
    * streaming paragraph faces: [[Text.chunk]] plus the order-preserving
    * pid key with the loud key-space guard.
    */
  private[graft] def paragraphChunks(docs: DataFrame, textCol: String,
      idCol: String, paraTokens: Int): DataFrame =
    Text.chunk(docs, textCol, idCol, paraTokens, overlap = 0)
      .withColumn("pid", paragraphPid)

  /** Newline segmentation twin of [[paragraphChunks]]: one chunk per
    * line of `split(text, "\n")`, positions preserved (empty lines
    * included — they are part of the document and must survive
    * re-assembly), token counts off the same whitespace tokenizer.
    */
  private[graft] def paragraphChunksLines(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_chunk_tokens", size(split(col("chunk_text"), " ")))
      .withColumn("pid", paragraphPid)

  /** The order-preserving pid key with the loud key-space guard, off
    * columns (doc_id, chunk_idx).
    */
  private def paragraphPid: Column = {
    val maxDocId = Long.MaxValue / 1000000L - 1L
    when(col("chunk_idx") >= 1000000 || col("doc_id") < 0 ||
        col("doc_id") > maxDocId,
      raise_error(concat(
        lit("paragraphDedup: pid key space exceeded (doc_id="),
        col("doc_id").cast("string"),
        lit(", chunk_idx="), col("chunk_idx").cast("string"),
        lit(") — ids must be in [0, 9.2e12] with <1e6 paragraphs/doc; " +
          "re-key the corpus or use a struct paragraph key"))))
      .otherwise(col("doc_id").cast("long") * 1000000L + col("chunk_idx"))
  }

  /** Per-doc damage report shared by the batch and streaming paragraph
    * faces: all chunks LEFT-joined with (pid, removed) verdicts (absent
    * pid — a short exempt segment — means kept), re-assembled in chunk
    * order.
    */
  private[graft] def paragraphReport(ch: DataFrame,
      verdicts: DataFrame, sep: String = " "): DataFrame =
    ch.join(verdicts, Seq("pid"), "left")
      .withColumn("keep", coalesce(!col("removed"), lit(true)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_paragraphs"),
        sum(when(col("keep"), 0).otherwise(1)).cast("bigint").as("n_removed"),
        concat_ws(sep, transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("chunk_idx"), col("chunk_text"))))),
          x => x.getField("chunk_text"))).as("deduped_text"))
      .withColumn("dup_frac",
        col("n_removed").cast("double") / col("n_paragraphs").cast("double"))

  /** Streaming/incremental face of [[paragraphDedup]] — paragraph-level
    * near-dup dedup of a batch AGAINST THE ACCUMULATED CORPUS: the same
    * exact-first composition (in-batch exact clones collapse to their
    * min-pid representative), then the representatives ride
    * [[minhashDedupIncremental]] — in-batch min-pid survivor over the
    * verified pair set, cross-batch check against the signature state
    * at `statePath`, survivors' signatures appended. Emits the per-doc
    * damage report for THIS batch's documents.
    *
    * Semantics note (the doc-level incremental convention): state holds
    * SURVIVOR signatures only, so a paragraph near-dupping ONLY a
    * removed historical paragraph survives — the batch face, which sees
    * all of history pairwise, would remove it. Exact duplicates are
    * unaffected (their survivor is in state by construction). Replay
    * idempotence via `batchTag` is inherited from
    * [[minhashDedupIncremental]]: a redelivered micro-batch recomputes
    * the identical report.
    */
  def paragraphDedupIncremental(newDocs: DataFrame, textCol: String,
      idCol: String, statePath: String, paraTokens: Int = 20,
      minTokens: Int = 5, threshold: Double = 0.8,
      numHashes: Int = 128, bands: Int = 32,
      batchTag: Option[Long] = None): DataFrame = {
    require(minTokens >= 3, "paragraphs need >= 3 tokens for 3-gram shingles")
    val ch = paragraphChunks(newDocs, textCol, idCol, paraTokens).cache()
    val paras = ch.filter(col("n_chunk_tokens") >= minTokens)
    val reps = paras.groupBy(col("chunk_text"))
      .agg(min(col("pid")).as("pid"))
    val survReps = minhashDedupIncremental(
      reps.select(col("pid"), col("chunk_text")), "chunk_text", "pid",
      statePath, k = 3, threshold, numHashes, bands, batchTag,
      collapseExact = false) // reps are already distinct-by-text
      .select(col("pid").as("srpid"))
    // removed reps = reps that did NOT survive — same shape (rpid) and
    // polarity as the batch face, so both ride ONE verdict kernel
    val removedReps = reps
      .join(survReps, col("pid") === col("srpid"), "left_anti")
      .select(col("pid").as("rpid"))
    // the report is one row per batch doc — pin it EAGERLY so the
    // per-batch segmentation cache can be released here instead of
    // leaking one text-sized CacheManager entry per micro-batch (the
    // minhashDedupIncremental idiom; the lazy report would otherwise
    // hold the cache reference forever)
    val report = paragraphReport(ch,
      paragraphVerdicts(paras, reps, removedReps)).localCheckpoint(true)
    ch.unpersist()
    report
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

  /** UTF-8 byte order — the order UTF8String.compareTo (and therefore
    * the native arr_jaccard merge walk) uses. Differs from Java's
    * UTF-16 String order for supplementary-plane characters, so arrays
    * destined for arr_jaccard MUST be sorted with THIS ordering.
    */
  val utf8Order: Ordering[String] = (a: String, b: String) =>
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Sorted-array intersection count (merge walk — both arrays are
    * lexicographically sorted by construction).
    */
  private def intersectSorted(a: Array[String], b: Array[String]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
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
    val spark = docs.sparkSession
    import spark.implicits._
    // NOT cached although consumed twice (df aggregate + join back):
    // measured 4.2s uncached vs 5.0s cached at sf0.1 — serializing the
    // exploded index into the block store costs more than re-running
    // the cheap shingling flatMap
    val idx = shingleIndex(docs, textCol, idCol, k)

    // Per-doc profile in ONE compiled pass over the exchange on doc id:
    // shingles sorted rarest-first (document frequency, then shingle) to
    // cut the AllPairs prefix, plus the full set re-sorted
    // lexicographically for merge-intersection. A doc's shingle set is
    // O(doc length) — in-memory per group at any corpus size. (The
    // earlier shape — two Window ops + a prefix×prefix join + an
    // inverted-index verify — was 10+ shuffle stages; per-stage overhead
    // dominated the whole pipeline at bench scale.)
    // df aggregate + join back (NOT collect_list postings in one pass:
    // that builds an O(document-frequency) row per shingle — a skew
    // hazard on hot shingles at corpus scale, and measured no faster)
    val dfRank = idx.groupBy("s").agg(count(lit(1)).as("df"))
    val profiles = idx.join(dfRank, "s")
      .select(col("id").cast("long"), col("s"), col("df").cast("long"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (id: Long, it: Iterator[(Long, String, Long)]) =>
        val arr = it.toArray.sortBy(x => (x._3, x._2))
        val n = arr.length
        val keep = n - math.ceil(threshold * n).toInt + 1
        val prefix = arr.iterator.take(keep).map(_._2).toArray
        val full = arr.map(_._2)
        java.util.Arrays.sort(full, Ordering.String)
        (id, n, full, prefix)
      }

    // Candidate generation AND exact verification in one grouped pass:
    // docs sharing a prefix token meet in that token's group (Jaccard ≥ t
    // plus the size filter forces a shared prefix token — Bayardo et al.
    // WWW'07); each qualifying pair is verified inline by merge-
    // intersection. Group width is bounded: prefix tokens are globally
    // the RAREST tokens of each doc, so hot shingles never form groups.
    profiles
      .flatMap { case (id, n, full, prefix) =>
        prefix.iterator.map(s => (s, id, n, full))
      }
      .groupByKey(_._1)
      .flatMapGroups { (_, it: Iterator[(String, Long, Int, Array[String])]) =>
        val ds = it.toArray.sortBy(_._2)
        val out = Seq.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < ds.length) {
          var j = i + 1
          while (j < ds.length) {
            val na = ds(i)._3; val nb = ds(j)._3
            if (nb >= threshold * na && na >= threshold * nb) {
              val ix = intersectSorted(ds(i)._4, ds(j)._4)
              val jac = ix.toDouble / (na + nb - ix)
              if (jac >= threshold) out += ((ds(i)._2, ds(j)._2, jac))
            }
            j += 1
          }
          i += 1
        }
        out.result().iterator
      }
      .toDF("doc_a", "doc_b", "jaccard")
      .distinct() // a pair may share several prefix tokens
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
  /** Per-doc MinHash profile: signature minima, LSH band buckets, and
    * the UTF-8-sorted shingle array — computed in ONE compiled
    * flatMapGroups over the exchange on doc id. (A 128-expression
    * Catalyst aggregate blows past codegen method limits and falls back
    * to per-row interpretation — measured wildly variable 5–20s; and
    * keeping the arrays here lets verification be candidate-sized
    * joins instead of an inverted-index pipeline.)
    * Shingle → [0,p) via the same xxhash64(seed 42) Catalyst uses.
    */
  private[ext] def minhashProfiles(docs: DataFrame, textCol: String,
      idCol: String, k: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val p = 2147483647L
    val rnd = new scala.util.Random(42)
    val ab = Array.fill(numHashes)(
      (1 + rnd.nextInt(Int.MaxValue - 1)).toLong -> rnd.nextInt(Int.MaxValue).toLong)
    val idx = shingleIndex(docs, textCol, idCol, k)
    val spark2 = docs.sparkSession
    import spark2.implicits._
    val aArr = ab.map(_._1)
    val bArr = ab.map(_._2)
    val nh = numHashes
    val rpb = rowsPerBand
    val nBands = bands
    idx.select(col("id").cast("long"), col("s"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroups { (id: Long, it: Iterator[(Long, String)]) =>
        val ss = it.map(_._2).toArray
        val sig = Array.fill(nh)(Long.MaxValue)
        ss.foreach { s =>
          val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          val h64 = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
          val x = java.lang.Math.floorMod(h64, p) // = pmod(xxhash64(s), p)
          var i = 0
          while (i < nh) {
            val v = (x * aArr(i) + bArr(i)) % p // x < p, a < 2^31 ⇒ no overflow
            if (v < sig(i)) sig(i) = v
            i += 1
          }
        }
        val buckets = Array.tabulate(nBands) { b =>
          var h = 1125899906842597L
          var r = 0
          while (r < rpb) { h = h * 31 + sig(b * rpb + r); r += 1 }
          h
        }
        // MUST match arr_jaccard's UTF-8 byte order (not Ordering.String
        // — Java UTF-16 order diverges on supplementary-plane chars)
        java.util.Arrays.sort(ss, utf8Order)
        (id, ss.length, ss, buckets, sig.toSeq)
      }
      .toDF("id", "n", "ss", "buckets", "sig")
  }

  /** Band-join + exact-Jaccard verify over PRECOMPUTED minhash
    * profiles — shared by [[minhashLshPairs]] (which builds the
    * profiles itself) and [[minhashDedupIncremental]] (which reuses
    * one profile pass for the in-batch pairs AND the cross-batch
    * probe, halving its dominant per-batch cost).
    */
  private def minhashPairsFromProfiles(profiles: DataFrame,
      threshold: Double): DataFrame = {
    val bandEntries = profiles
      .select(col("id"), posexplode(col("buckets")).as(Seq("band", "bucket")))

    val candidates = bandEntries.as("a")
      .join(bandEntries.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()

    // exact Jaccard on CANDIDATES ONLY (the whole point of LSH): two
    // joins ship each candidate doc's array once; arr_jaccard is the
    // native codegen'd merge-walk (graft.plans.ArrJaccard) — beats a
    // Scala UDF (boxed Seqs, opaque to codegen) per the custom-operator
    // preference order
    candidates
      .join(profiles.select(col("id").as("doc_a"), col("ss").as("sa")), "doc_a")
      .join(profiles.select(col("id").as("doc_b"), col("ss").as("sb")), "doc_b")
      .withColumn("jaccard", call_function("arr_jaccard", col("sa"), col("sb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int, threshold: Double,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    // self-contained: the verification step resolves arr_jaccard even
    // when the caller's session was built without spark.sql.extensions
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    val profiles = minhashProfiles(docs, textCol, idCol, k, numHashes, bands)
      .drop("sig")
      .cache() // consumed by both band-join sides + both verify joins
    minhashPairsFromProfiles(profiles, threshold)
  }

  /** Digest-keyed exact collapse to one min-id representative per
    * distinct text: (text_digest, idCol, textCol), one row per
    * distinct text. Keyed on sha2-256 — the collapse exchange and any
    * member re-join hash/compare 64 hex chars per row regardless of
    * document size (the [[exactByDigest]] doctrine); digest equality
    * stands in for text equality under the standard 2⁻¹²⁸ collision
    * assumption every content-addressed dedup here already makes.
    */
  def wholeDocReps(docs: DataFrame, textCol: String, idCol: String)
      : DataFrame =
    docs.select(col(idCol), col(textCol),
        sha2(col(textCol).cast("binary"), 256).as("text_digest"))
      .groupBy(col("text_digest"))
      .agg(min(col(idCol)).as(idCol), first(col(textCol)).as(textCol))

  /** Whole-document near-dup REMOVAL verdict with exact-first collapse
    * — the clone-invariant face callers should run on document-level
    * text (lifted from the master chain's stage 7, where ScaleBench
    * caught the raw pair faces' output-quadratic clone behavior:
    * c identical copies are c(c−1)/2 pairs under
    * [[ngramJaccardPairs]]/[[minhashLshPairs]] but ONE representative
    * here). Identical texts collapse to their min-id representative
    * (digest-keyed, [[wholeDocReps]]); the chosen pair face runs on
    * representatives only; the verdict expands back to members through
    * a digest equi-join. Returns the ids REMOVED under the
    * earlier-occurrence-wins rule (j ≥ threshold ⇒ the larger id of
    * the pair drops), one column named `idCol`.
    *
    * Equivalence to the pairwise rule on the full input: a non-min
    * member always has its group min as an earlier j=1 partner
    * (identical — for sub-k-token docs via [[shingleIndex]]'s
    * whole-text fallback shingle) → removed either way; a
    * representative is removed iff some earlier doc near-dups it, and
    * Jaccard depends only on TEXT, so that doc's own representative
    * (≤ it, < rep) carries the identical pair.
    *
    * `lsh = false` runs the exact AllPairs face (the oracle anchor);
    * `lsh = true` the MinHash+LSH band join — the 100 TB production
    * face (recall odds quantified at
    * [[graft.queries.ExtK.masterStages]], which consumes THIS face for
    * the registered capstones).
    */
  def nearDupDropExactFirst(docs: DataFrame, textCol: String,
      idCol: String, k: Int, threshold: Double,
      lsh: Boolean = false): DataFrame = {
    val reps = wholeDocReps(docs, textCol, idCol)
    val pairs =
      if (lsh) minhashLshPairs(reps, textCol, idCol, k, threshold)
      else ngramJaccardPairs(reps, textCol, idCol, k, threshold)
    val removedReps = pairs.select(col("doc_b").as("rep_id")).distinct()
    val members = docs
      .select(col(idCol), sha2(col(textCol).cast("binary"), 256)
        .as("text_digest"))
      .join(reps.select(col("text_digest"), col(idCol).as("rep_id")),
        "text_digest")
    members.filter(col(idCol) =!= col("rep_id")).select(col(idCol))
      .unionByName(removedReps.select(col("rep_id").as(idCol)))
      .distinct()
  }

  /** Incremental near-dup dedup for continuous ingestion — the batch
    * face of "dedup the firehose": each incoming batch is (0) collapsed
    * exact-first to digest-keyed min-id representatives
    * ([[wholeDocReps]] — r16; skip via `collapseExact = false` when the
    * input is already distinct-by-text), (1) deduped
    * in-batch exactly (band join + arr_jaccard verify, min-id
    * survivor), (2) checked against the ACCUMULATED signature state at
    * `statePath` via band-bucket candidates and the unbiased MinHash
    * estimate (matching-component fraction; σ ≈ √(t(1−t)/numHashes) ≈
    * 0.044 at t=0.5, 128 hashes), then (3) survivors' signatures are
    * appended to the state.
    *
    * The state stores O(numHashes) longs per surviving doc — never
    * shingle sets — so at fleet scale it stays signature-sized and the
    * cross-batch check is a bucketed equi-join against it. At cluster
    * scale the state directory would additionally be written bucketed
    * on the band-bucket key (Spark bucketBy over an exploded
    * (band, bucket, id, sig) layout) so each batch's candidate join
    * co-locates without reshuffling the whole state; the flat layout
    * here keeps the operator metastore-free.
    *
    * Redelivery semantics, chosen via `batchTag`:
    *  - None (ad-hoc use): replaying the SAME batch yields zero
    *    survivors — its signatures are already in state, so re-runs
    *    can't re-admit documents.
    *  - Some(id) (streaming foreachBatch): state rows are stamped with
    *    the batch id and SAME-tag rows are ignored during the
    *    cross-batch check, so a replayed micro-batch recomputes the
    *    IDENTICAL survivor set — paired with an overwrite-per-batch
    *    sink this gives exactly-once output even when the failure
    *    lands between the state append and the sink write (the
    *    replayed append costs duplicate signature rows, which only
    *    waste space — they can never change a dedup verdict).
    *
    * Returns the surviving rows of `newDocs` (original columns).
    */
  def minhashDedupIncremental(newDocs: DataFrame, textCol: String,
      idCol: String, statePath: String, k: Int, threshold: Double,
      numHashes: Int = 128, bands: Int = 32,
      batchTag: Option[Long] = None,
      collapseExact: Boolean = true): DataFrame = {
    require(threshold <= 1.0,
      "threshold must be <= 1.0 (exact duplicates are j = 1 pairs — " +
        "the exact-first collapse assumes they qualify)")
    graft.plans.GraftExtensions.ensure(newDocs.sparkSession)
    val spark = newDocs.sparkSession

    // r16: exact-first collapse BEFORE profiling (the paragraph-face
    // move, doc-level — [[wholeDocReps]], digest-keyed): a clone burst
    // inside one micro-batch costs ONE profile per distinct text and
    // zero extra band candidates instead of quadratic j=1 pairs.
    // Verdict-equivalent to profiling every row: a non-min member
    // always has its group min as an earlier identical partner
    // (identical shingle sets ⇒ identical signatures ⇒ a verified
    // j = 1 pair), so it drops in-batch under the pairwise rule either
    // way; its cross-batch verdict equals its representative's (same
    // signature); and members never survive, so the state append set
    // is unchanged.
    val reps =
      if (collapseExact) wholeDocReps(newDocs, textCol, idCol)
      else newDocs

    // ONE profile pass (shingling + 128 universal hashes — the
    // dominant per-batch cost) serves BOTH the in-batch pair set and
    // the cross-batch probe; previously minhashLshPairs recomputed it
    // internally, doubling the heaviest stage every micro-batch
    val profAll = minhashProfiles(reps, textCol, idCol, k, numHashes,
      bands).cache()

    // (1) in-batch exact dedup: greedy min-id survivor over the verified
    // pair set (any doc that is the GREATER side of a pair is dropped)
    val inBatchDrops = minhashPairsFromProfiles(profAll, threshold)
      .select(col("doc_b").as("id")).distinct()

    val prof = profAll
      .select(col("id"), col("buckets"), col("sig"))
      .join(inBatchDrops, Seq("id"), "left_anti")
      .cache()

    // (2) cross-batch: band candidates against state, similarity via
    // the matching-signature fraction (integer count / numHashes — a
    // deterministic rational, identical on any partitioning)
    val state = readStateOrEmpty(spark, statePath)
      .map(st => batchTag.fold(st)(t => st.filter(col("batch") =!= t)))
    val crossDups = state match {
      case Some(st) =>
        val newBands = prof.select(col("id"),
          posexplode(col("buckets")).as(Seq("band", "bucket")))
        val stBands = st.select(col("id").as("sid"),
          posexplode(col("buckets")).as(Seq("band", "bucket")))
        val cands = newBands.join(stBands, Seq("band", "bucket"))
          .select(col("id"), col("sid")).distinct()
        val matchFrac = aggregate(
          zip_with(col("sig"), col("ssig"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes
        cands
          .join(prof.select(col("id"), col("sig")), "id")
          .join(st.select(col("id").as("sid"), col("sig").as("ssig")), "sid")
          .filter(matchFrac >= threshold)
          .select(col("id")).distinct()
      case None => spark.emptyDataFrame.withColumn("id", lit(0L)).limit(0)
    }

    // survivors are pinned EAGERLY (localCheckpoint severs lineage)
    // before the state append below — a lazy plan re-evaluated by the
    // caller after the append would read this batch's own signatures
    // back out of the state and declare every row its own duplicate
    val survivors = prof.select(col("id"))
      .join(crossDups, Seq("id"), "left_anti")
      .localCheckpoint(true)

    // (3) persist survivors' signatures (append — state only grows by
    // accepted docs)
    prof.join(survivors, Seq("id"))
      .select(col("id"), col("buckets"), col("sig"),
        lit(batchTag.getOrElse(-1L)).as("batch"))
      .write.mode("append").parquet(statePath)

    // survivors are pinned and the state append is done — release the
    // per-batch caches (a foreachBatch caller would otherwise leak two
    // CacheManager entries per micro-batch until eviction thrash)
    prof.unpersist()
    profAll.unpersist()

    newDocs.join(survivors.withColumnRenamed("id", "__sid"),
        col(idCol).cast("long") === col("__sid"), "left_semi")
  }

  /** SimHash near-dup pairs: 60-bit signature from token-hash bit
    * votes; pairs within `hammingMax` found exactly via the pigeonhole
    * split into hammingMax+1 chunks (a pair within distance d must
    * agree on at least one of d+1 chunks) — candidate join on
    * (chunkIdx, chunkValue).
    *
    * Every arithmetic step is replayable by a plain-SQL oracle (the
    * x_ann_ivf_kmeans / LSH-hyperplane determinism move applied to the
    * signature itself), so the pair output adjudicates pair-for-pair
    * against an independent engine:
    *  - token hash = polynomial over the token's code points,
    *    h ← (31·h + cp) mod 1000003 — full-content, one value per
    *    distinct token;
    *  - bit j's coin flip = low bit of a xorshift-multiply mix of
    *    h·64 + j (see [[simhashCore]] for why the non-affine xor steps
    *    are load-bearing — affine/parity mixings bias signature
    *    positions and inflate the Hamming-3 ball by orders of
    *    magnitude);
    *  - 60 signature bits (not 64) so the signature, every per-bit
    *    1<<j, and every chunk shift stay inside a NON-NEGATIVE BIGINT
    *    on the SQL side — 60 also divides evenly into the pigeonhole
    *    chunk counts for hammingMax 1–5. The 4-bit narrowing is
    *    immaterial to selectivity (random-pair Hamming mean moves from
    *    32 to 30).
    * [[simhashPairsXxh64]] keeps the engine-native 64-bit xxhash64
    * variant for environments that prefer the engine's own codegen'd
    * hash over cross-system reproducibility.
    *
    * `maxBucketFreq` is the skew guard (mirror of [[shingleIndex]]'s
    * maxDocFreq): a degenerate corpus — many near-identical or
    * near-zero-signature docs — can pile thousands of docs into one
    * (chunk, value) bucket, turning the candidate self-join quadratic
    * on that bucket. Buckets wider than the cutoff are dropped from
    * candidate generation; pairs found through surviving buckets are
    * still exact (verified on the full signature). None keeps the
    * exhaustive pigeonhole guarantee.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      hammingMax: Int = 3, maxBucketFreq: Option[Int] = None): DataFrame =
    simhashCore(docs, textCol, idCol, bits = 60, hammingMax, maxBucketFreq) {
      t =>
        var h = 7L
        val it = t.codePoints().iterator()
        while (it.hasNext) h = (h * 31L + it.next()) % 1000003L
        h
    }

  /** SimHash over Spark's engine-native xxhash64 token hash — identical
    * operator shape to [[simhashPairs]] (bit votes → pigeonhole chunk
    * banding → exact Hamming verify) with the full 64-bit signature.
    * Not SQL-replayable (no external engine recomputes xxhash64), so
    * pair output can only be adjudicated structurally; kept for callers
    * that want the engine's own hash spread and have no cross-system
    * reproducibility requirement.
    */
  def simhashPairsXxh64(docs: DataFrame, textCol: String, idCol: String,
      hammingMax: Int = 3, maxBucketFreq: Option[Int] = None): DataFrame =
    // 64 bit-votes per doc in ONE compiled mapGroups (a 64-expression
    // Catalyst aggregate falls out of codegen and runs interpreted —
    // profiled 5.7s vs ~2s at sf0.1); token hash = the same
    // xxhash64(seed 42) the Catalyst expression computes
    simhashCore(docs, textCol, idCol, bits = 64, hammingMax, maxBucketFreq) {
      t =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    }

  /** Shared SimHash kernel: per-doc bit votes from `tokHash` in one
    * compiled mapGroups, then pigeonhole banding + exact Hamming verify
    * (see [[simhashPairs]] for the candidate-join and skew-guard
    * semantics). For `bits < 64`, bit j's vote is the low bit of a
    * xorshift-multiply mix of (h·64 + j): multiply, xor-shift, multiply,
    * xor-shift, all operands kept under 2^31 so every product stays in
    * a BIGINT on BOTH engines. The xor-shift steps are what make this
    * sound: LCG-style rounds alone COMPOSE TO ONE AFFINE MAP mod 2^31,
    * whose output bits over the structured (h, j) seed lattice carry
    * per-position biases — and simhash's majority vote AMPLIFIES any
    * per-position bias into signature bits that agree across all docs
    * (measured: an affine two-round mid-bit variant put 307/44 850
    * RANDOM doc pairs inside Hamming 3, where unbiased bits predict
    * ~0). The xor makes the map non-affine; measured per-position bias
    * 0.003, zero random-pair collisions. For 64 the raw hash bits are
    * used directly.
    */
  private def simhashCore(docs: DataFrame, textCol: String, idCol: String,
      bits: Int, hammingMax: Int, maxBucketFreq: Option[Int])
      (tokHash: String => Long): DataFrame = {
    val nChunks = hammingMax + 1
    require(bits % nChunks == 0, s"chunk count must divide $bits")
    val chunkBits = bits / nChunks
    val useRawBits = bits == 64

    val spark = docs.sparkSession
    import spark.implicits._
    val nb = bits
    val sigs = docs
      .select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), " ")).as("t"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroups { (id: Long, it: Iterator[(Long, String)]) =>
        val votes = new Array[Int](nb)
        it.foreach { case (_, t) =>
          val h = tokHash(t)
          var k = 0
          while (k < nb) {
            val bit =
              if (useRawBits) ((h >>> k) & 1L) == 1L
              else {
                val v1 = ((h * 64L + k) * 2654435761L) % 2147483648L
                val v2 = v1 ^ (v1 >> 13)
                val v3 = (v2 * 1103515245L) % 2147483648L
                val v4 = v3 ^ (v3 >> 17)
                (v4 & 1L) == 1L
              }
            if (bit) votes(k) += 1 else votes(k) -= 1
            k += 1
          }
        }
        var sim = 0L
        var k = 0
        while (k < nb) { if (votes(k) > 0) sim |= 1L << k; k += 1 }
        (id, sim)
      }
      .toDF("id", "sim")

    // chunkBits == 64 (hammingMax = 0, "exact signature" banding):
    // (1L << 64) wraps to 1 under JVM shift-mod-64, making the mask 0
    // and collapsing EVERY doc into one bucket — a silent O(n²)
    // self-join; the full-width mask is -1L
    val chunkMask = if (chunkBits >= 64) -1L else (1L << chunkBits) - 1
    val chunkVals = array((0 until nChunks).map(j =>
      shiftright(col("sim"), j * chunkBits).bitwiseAND(chunkMask)): _*)
    val allChunks = sigs.select(col("id"), col("sim"),
      posexplode(chunkVals).as(Seq("chunk", "cv")))
    val chunks = maxBucketFreq match {
      case Some(cut) =>
        val hot = allChunks.groupBy(col("chunk"), col("cv"))
          .agg(count(lit(1)).as("n_bucket"))
          .filter(col("n_bucket") > cut)
          .select(col("chunk"), col("cv"))
        allChunks.join(hot, Seq("chunk", "cv"), "left_anti")
      case None => allChunks
    }

    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingMax)
  }

  /** Duplicate CLUSTERS from a near-dup pair set: connected components
    * of the pair graph via iterative min-label propagation (the same
    * shape as [[graft.grid.TableDetect]]'s distributed CC tier), then
    * one row per cluster with the min-id member as the canonical
    * survivor. This is the production step AFTER pair generation —
    * greedy pair-wise dropping under-deletes when dups chain
    * (a~b, b~c, but a!~c must still collapse to one survivor).
    *
    * Rounds are bounded by cluster diameter (near-dup clusters are
    * shallow); each round is one equi-join + one aggregate, and labels
    * are eagerly localCheckpoint'ed so lineage doesn't snowball.
    */
  /** Per-member cluster labels from a near-dup pair set (iterative
    * min-label propagation; see [[nearDupClusters]] for the scale
    * notes). Returns (id, lbl) for every id appearing in a pair.
    */
  def nearDupLabels(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col("doc_a").cast("long").as("a"),
        col("doc_b").cast("long").as("b"))
      .union(pairs.select(col("doc_b").cast("long"), col("doc_a").cast("long")))
      .distinct().cache()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .transform(Iter.pin)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val neigh = edges.join(labels.withColumnRenamed("id", "nid"),
          col("b") === col("nid"))
        .select(col("a").as("id"), col("lbl"))
      // pointer jumping (the large-star move): besides the one-hop
      // neighbor labels, each node also adopts its LABEL's label —
      // effective diameter halves per round, so convergence is
      // O(log diameter) instead of O(diameter) and a 30-link chain no
      // longer exhausts the round budget (every lbl value is a node id
      // present in `labels`, so the self-join is total). Engaged only
      // from round 3 onward: near-dup clusters are overwhelmingly
      // shallow (diameter ≤ ~3), where plain propagation already
      // converges and the labels⋈labels self-join would double every
      // round's join work for nothing — jumping pays exactly when two
      // plain rounds were NOT enough (adjudicated r11: the always-on
      // jump cost curate_v2/train_prep ~20% at sf0.1).
      val next0 = labels.union(neigh)
      val next1 =
        if (iter < 2) next0
        else {
          val jump = labels.as("l1")
            .join(labels.select(col("id").as("jid"), col("lbl").as("jlbl")),
              col("l1.lbl") === col("jid"))
            .select(col("l1.id").as("id"), col("jlbl").as("lbl"))
          next0.union(jump)
        }
      val next = next1
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .transform(Iter.pin)
      changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") =!= col("old")).count()
      labels = next
      iter += 1
    }
    edges.unpersist()
    // a silent early exit would split one true cluster into several
    // labels — leakageSafeSplit would then put near-duplicates on both
    // sides of a train/test boundary (the exact leak it exists to
    // prevent) and qualitySurvivors would keep several "survivors" per
    // cluster. With pointer jumping from round 3, maxIters = 25 covers
    // diameters up to ~2^23, so this fires only on genuinely
    // pathological inputs — loudly, never wrongly.
    require(changed == 0,
      s"nearDupLabels did not converge within $maxIters rounds " +
        s"($changed labels still moving) — raise maxIters")
    labels
  }

  def nearDupClusters(pairs: DataFrame): DataFrame =
    nearDupLabels(pairs)
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("lbl").as("cluster_id"), col("n_members"))

  /** Textual-overlap candidate pairs: documents sharing at least
    * `minShared` distinct k-token shingles — the conservative
    * span-overlap graph (a pair here need not be a near-duplicate;
    * it shares verbatim phrases). Used where overlap itself is the
    * signal, e.g. contamination spread.
    *
    * Scale shape: one shingle equi-join; at web scale add the same
    * document-frequency cutoff on hot shingles as
    * [[ngramJaccardPairs]] (boilerplate shingles otherwise dominate
    * the join).
    */
  def sharedShinglePairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int, minShared: Long): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
        explode(Text.ngramArray(Text.tokens(col(textCol)), k)).as("s"))
      .distinct()
    sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).cast("bigint").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Quality-aware survivor selection: one document kept per near-dup
    * cluster — the HIGHEST-scoring member (ties broken by min id), not
    * the arbitrary min-id member. This is the curation-correct dedup:
    * when a document exists in five scraped variants, keep the cleanest
    * one, not the one with the smallest crawl id. Singletons (documents
    * in no pair) survive as their own cluster.
    *
    * The argmax is a single `max(struct(score, -id))` aggregate —
    * map-side combinable and order-independent, so survivors are
    * deterministic under any partitioning.
    */
  def qualitySurvivors(docs: DataFrame, idCol: String, pairs: DataFrame,
      score: Column): DataFrame = {
    val labels = nearDupLabels(pairs).select(col("id").as("_lid"), col("lbl"))
    // nanvl: Spark's struct max orders NaN above every double, so a
    // corrupt NaN score would be crowned "highest quality" — treat NaN
    // as -Inf (never wins; reported as -Inf only if EVERY member is NaN)
    docs
      .select(col(idCol).cast("long").as("doc"),
        nanvl(score.cast("double"), lit(Double.NegativeInfinity)).as("q"))
      .join(labels, col("doc") === col("_lid"), "left")
      .withColumn("cluster_id", coalesce(col("lbl"), col("doc")))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).cast("bigint").as("n_members"),
        max(struct(col("q"), (-col("doc")).as("nid"))).as("best"))
      .select(col("cluster_id"), col("n_members"),
        (-col("best").getField("nid")).as("survivor_id"),
        col("best").getField("q").as("survivor_score"))
  }

  /** Leakage-safe train/val/test assignment: split membership is a
    * deterministic function of the near-dup CLUSTER id, never the
    * document, so two near-duplicate documents can never straddle a
    * split boundary (the classic eval-leakage failure of per-document
    * random splits). Singleton documents are their own cluster. The
    * spreading key multiplies the cluster id by a large odd constant
    * before the mod so dense id ranges still distribute ~uniformly —
    * plain `id mod 1000` would put every cluster of a small corpus in
    * one split.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainPerMille: Int = 800, valPerMille: Int = 100): DataFrame = {
    val labels = nearDupLabels(pairs)
      .select(col("id").as("_lid"), col("lbl"))
    // reduce into 31 bits BEFORE the multiply (the weightedSample
    // discipline): cluster_id beyond ~3.47e9 would otherwise wrap the
    // Long product — silent split drift vs a checked-arithmetic
    // engine, ArithmeticException under ANSI. Identical keys for ids
    // < 2^31.
    val key = pmod(pmod(col("cluster_id"), lit(2147483648L)) *
      lit(2654435761L), lit(1000))
    docs.join(labels, col(idCol).cast("long") === col("_lid"), "left")
      .withColumn("cluster_id", coalesce(col("lbl"), col(idCol).cast("long")))
      .drop("_lid", "lbl")
      .withColumn("split",
        when(key < trainPerMille, "train")
          .when(key < trainPerMille + valPerMille, "val")
          .otherwise("test"))
  }

  /** Embedding-cosine near-dup pairs (exact all-pairs — the BASELINE,
    * never the production path; [[Similarity.cosineLshPairs]] and
    * [[semanticDedup]] are the bucketed scale paths with identical
    * output shape). Floats are promoted to double BEFORE multiplication
    * so both engines compute identical products; only summation order
    * can differ (1 ulp).
    *
    * The theta join is O(n²) with NO guard the optimizer can apply, so
    * the quadratic cost is opt-in: callers must pass
    * `acceptQuadraticBaseline = true`, acknowledging this is an
    * oracle-anchor / recall-measurement run on a bounded corpus. The
    * default throws with a pointer to the scale paths — an "embedding
    * near-dup" call that compiles without the flag cannot silently
    * become the 10⁸-row cross join.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, acceptQuadraticBaseline: Boolean = false): DataFrame = {
    require(acceptQuadraticBaseline,
      "embeddingCosinePairs is the exact O(n²) all-pairs BASELINE (it " +
        "cross-joins the corpus with itself). For production embedding " +
        "near-dup use Similarity.cosineLshPairs (hyperplane LSH) or " +
        "Dedup.semanticDedup (cluster-scoped pairs); pass " +
        "acceptQuadraticBaseline = true only for oracle-anchor or " +
        "recall-measurement runs on a corpus you know is small.")
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    // zero-norm vectors (padding/failure artifacts) make the cosine
    // 0/0 = NaN, and Spark orders NaN ABOVE every number — NaN >=
    // threshold passes, pairing the zero vector with everything. A
    // zero vector has no direction: excluded from cosine dedup.
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0)
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  /** Asymmetric shingle-containment pairs: containment(A→B) =
    * |sh(A)∩sh(B)| / |sh(A)| — unlike Jaccard this is direction-aware,
    * so it catches quotation/superset relationships (a doc that embeds
    * another verbatim has containment ≈ 1 from the smaller side even
    * when Jaccard is low). Emits (sub_id, sup_id, containment) for
    * every ordered pair at or above `threshold`.
    *
    * Scale shape: one shingle equi-join computes BOTH directions (the
    * unordered intersection count is joined to each side's shingle
    * count); `maxDocFreq` is the standard hot-shingle cutoff for web
    * corpora (makes the result approximate — leave None for exact).
    */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 3, threshold: Double = 0.6,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val sh = shingleIndex(docs, textCol, idCol, k, maxDocFreq)
    val cnt = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("id").as("da"), col("s"))
      .join(sh.select(col("id").as("db"), col("s")), "s")
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ix"))
    val j = inter
      .join(cnt.select(col("id").as("da"), col("n").as("na")), "da")
      .join(cnt.select(col("id").as("db"), col("n").as("nb")), "db")
    j.select(col("da").as("sub_id"), col("db").as("sup_id"),
        (col("ix").cast("double") / col("na")).as("containment"))
      .union(j.select(col("db"), col("da"),
        (col("ix").cast("double") / col("nb")).as("containment")))
      .filter(col("containment") >= threshold)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540
    * — public literature): cluster the embedding space, then compute
    * exact pairwise cosine ONLY within clusters and drop every vector
    * that has a lower-id neighbor at cosine >= `threshold` (so each
    * near-dup chain keeps its minimal id — deterministic under any
    * partitioning). Returns one row per vector:
    * (vec_id, bucket, dropped, killer_id) where killer_id is the
    * smallest such neighbor (null for survivors).
    *
    * Scale shape: the all-pairs cosine never materializes — candidates
    * are a bucket equi-join, O(sum of cluster sizes squared), and nlist
    * grows with n (SemDeDup uses ~100k clusters at web scale) to keep
    * clusters bounded. Centroids default to first-n-by-id (SQL-
    * replayable); pass [[Similarity.kmeansCentroids]] for production
    * (identical machinery). A runaway cluster (skew) is capped by the
    * same remedy as IVF: raise nlist or re-cluster the big bucket.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16,
      centroids: Option[DataFrame] = None): DataFrame = {
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    // zero-norm guard: same NaN-passes-threshold hazard as
    // [[embeddingCosinePairs]] — a zero vector would kill every
    // higher-id member of its bucket
    val base = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nn", Similarity.norm(col("nv")))
      .filter(col("nn") > 0)
    val centroidDf = centroids.getOrElse(
      base.orderBy(col("nid")).limit(nlist)
        .select(col("nid").as("cid"), col("nv").as("cv")))
      .select(col("cid"), col("cv"), Similarity.norm(col("cv")).as("cn"))
    val assigned = Similarity.assignToCentroids(base, centroidDf).cache()
    val a = assigned.select(col("bucket").as("bk_a"), col("nid").as("ka"),
      col("nv").as("va"), col("nn").as("na"))
    val b = assigned.select(col("bucket").as("bk_b"), col("nid").as("vb"),
      col("nv").as("vband"), col("nn").as("nb"))
    val kills = a.join(b, col("bk_a") === col("bk_b") && col("ka") < col("vb"))
      .filter(Similarity.dot(col("va"), col("vband")) /
        (col("na") * col("nb")) >= threshold)
      .groupBy(col("vb")).agg(min(col("ka")).as("killer_id"))
    assigned.select(col("nid").as("vec_id"), col("bucket"))
      .join(kills, col("vec_id") === col("vb"), "left")
      .select(col("vec_id"), col("bucket"),
        col("killer_id").isNotNull.as("dropped"), col("killer_id"))
  }

  /** Overlapping-span exact-substring dedup — the C4 move (Raffel et
    * al., JMLR 2020: drop every repeat of any three-sentence span) and
    * the practical sliding-window approximation of Lee et al.'s (ACL
    * 2022) suffix-array formulation. Every `span`-token window at
    * every position (stride 1, unlike [[chunkDedup]]'s disjoint
    * segments) is ranked corpus-wide; each window occurrence that is
    * not the first (min (doc, start) — deterministic under any
    * partitioning) marks ALL `span` token positions it covers for
    * removal, so a duplicated passage is excised wherever it reappears
    * even when it straddles chunk boundaries. Documents shorter than
    * `span` tokens contribute no windows and pass through unchanged.
    *
    * Output per doc: token counts before/after and the re-assembled
    * deduped text (byte-adjudicable).
    *
    * Scale shape — three key shuffles, nothing quadratic:
    *  - window index is len−span+1 rows per doc (amplification ≈ len,
    *    vs len/chunk for [[chunkDedup]]); this text-keyed variant ships
    *    window TEXT through the corpus-wide shuffle so the oracle
    *    adjudicates exact semantics — [[spanDedupHashed]] is the 100 TB
    *    variant, grouping on the window's 64-bit fingerprint (8-byte
    *    shuffle keys) and adjudicated by parity against this one;
    *  - first-occurrence is a groupBy whose only aggregate is a min →
    *    map-side partial aggregation absorbs boilerplate spans repeated
    *    across millions of docs (no skew guard needed);
    *  - removal ranges are interval-merged per doc BEFORE positions
    *    explode ([[coveredPositions]], since round 8): the explosion is
    *    one row per damaged position, bounded by output damage even
    *    when dozens of sliding windows overlap the same passage;
    *  - re-assembly is the per-doc collect/array_sort/concat every
    *    other per-doc operator here lives with — state O(one doc).
    */
  def spanDedup(docs: DataFrame, textCol: String, idCol: String,
      span: Int): DataFrame =
    spanDedupCore(docs, textCol, idCol, span, perDoc = false)

  /** Intra-document repetition removal — the within-page half of the
    * RefinedWeb/CCNet recipe (Penedo et al. 2023 §4.2: pages repeat
    * their own boilerplate; repeated spans inside one document are
    * removed independently of corpus-wide dedup). Identical windowing
    * to [[spanDedup]], but first-occurrence ranking is scoped PER
    * DOCUMENT: later repeats of a span within the same doc are cut,
    * while cross-document sharing is untouched. Composes with (and is
    * cheaper than) the global pass — no corpus-wide shuffle on window
    * text is needed beyond the per-doc group.
    */
  def intraDocDedup(docs: DataFrame, textCol: String, idCol: String,
      span: Int): DataFrame =
    spanDedupCore(docs, textCol, idCol, span, perDoc = true)

  /** [[intraDocDedup]] on 64-bit fingerprint window keys — the per-doc
    * group never ships window text (the key is (doc_id, 8-byte
    * fingerprint)); same collision caveat and parity adjudication
    * story as [[spanDedupHashed]] (`x_dedup_intra_doc_hashed`).
    */
  def intraDocDedupHashed(docs: DataFrame, textCol: String, idCol: String,
      span: Int): DataFrame =
    spanDedupCore(docs, textCol, idCol, span, perDoc = true,
      hashedKeys = true)

  /** [[spanDedup]] with 64-bit fingerprint window keys — the 100 TB
    * variant the text-keyed scaladoc promises: the corpus-wide
    * first-occurrence shuffle ships an 8-byte rolling-fold key instead
    * of the window's text (cutting shuffle bytes by the mean window
    * length — measured ~27× on the ScaleBench corpus at span 10), and
    * removal ranges are interval-merged per doc before positions
    * explode ([[coveredPositions]] — which since round 8 also serves
    * the text-keyed path). Semantics are identical to [[spanDedup]]
    * up to 64-bit key collisions (birthday-bound ~n²/2^64 over
    * distinct windows; a collision over-deletes one span) —
    * x_dedup_span_hashed adjudicates exact parity against the
    * text-keyed SQL oracle at test scale.
    */
  def spanDedupHashed(docs: DataFrame, textCol: String, idCol: String,
      span: Int): DataFrame =
    spanDedupCore(docs, textCol, idCol, span, perDoc = false,
      hashedKeys = true)

  /** Incremental overlapping-span dedup for continuous ingestion — the
    * streaming face of [[spanDedup]], same conventions as
    * [[minhashDedupIncremental]]: each batch is (1) span-deduped
    * in-batch (corpus-wide first-occurrence semantics within the
    * batch), (2) checked against the ACCUMULATED window state at
    * `statePath` — EVERY batch occurrence of a historical window is
    * excised, including the batch's own first — and (3) the batch's
    * genuinely-new first-occurrence windows are appended to state.
    *
    * Equivalence: processing a corpus as doc-id-ordered batches yields
    * exactly [[spanDedup]]'s one-shot output (spec-gated) — batch-2
    * occurrences of a batch-1 window are non-first globally, and the
    * state filter removes precisely those.
    *
    * Redelivery via `batchTag` (the minhash protocol): state rows are
    * stamped, same-tag rows are ignored during the history check, so a
    * replayed micro-batch recomputes the IDENTICAL output; the
    * replayed append costs duplicate window rows, which can never
    * change a verdict (the history probe is a semi-join).
    *
    * State is O(distinct windows). `hashedState = false` keys it on the
    * window TEXT (exact, SQL-adjudicable); `hashedState = true` stores
    * the 64-bit fingerprint instead ([[spanWindows]] — the
    * [[spanDedupHashed]] key), shrinking every state row to 8 bytes +
    * tag and making the history probe an 8-byte equi-join — at 100 TB
    * additionally bucket the state layout on the fingerprint so
    * successive batch probes co-locate without reshuffling history.
    * The two modes' states are not interchangeable (different key
    * domains); pick one per state directory.
    */
  def spanDedupIncremental(newDocs: DataFrame, textCol: String,
      idCol: String, span: Int, statePath: String,
      batchTag: Option[Long] = None,
      hashedState: Boolean = false): DataFrame = {
    val spark = newDocs.sparkSession
    val expected = if (hashedState) "fp64" else "text"
    val state0 = readStateOrEmpty(spark, statePath)
    val legacy = spanStateModeGuard(state0, statePath, expected)
    val state = state0
      .map(st => batchTag.fold(st)(t => st.filter(col("batch") =!= t)))
    val histKeys = state.map(_.select(col("wkey")).distinct())
    val (out0, newWindows) =
      spanDedupBatchCore(newDocs, textCol, idCol, span, histKeys,
        hashedKeys = hashedState)
    // pinned EAGERLY before the state append — a lazy plan evaluated by
    // the caller afterwards would read this batch's own windows back
    // out of state and excise every document (the minhash lesson)
    val out = out0.localCheckpoint(true)
    val rows = newWindows
      .select(col("wkey"), lit(batchTag.getOrElse(-1L)).as("batch"))
    (if (legacy) rows else rows.withColumn("kmode", lit(expected)))
      .write.mode("append").parquet(statePath)
    out
  }

  /** The key mode of an EXISTING span-dedup state directory — the
    * resume-side dual of [[spanStateModeGuard]]: None when no state
    * has been written yet (a fresh stream), otherwise the stamped
    * `kmode` of the first row; for legacy (pre-stamp) or zero-row
    * dirs, the inferred mode — long keys are fp64, string keys go
    * through the 64-lowercase-hex sample heuristic (the guard's), and
    * a zero-row string dir reads as sha256 (with no history rows any
    * string mode is semantically safe — nothing can match — and the
    * schemas are identical, so the content-addressed default is the
    * right forward choice). Drivers use this to auto-select the span
    * face: fresh dir → the exact sha-256 face, existing dir → whatever
    * it was written with ([[graft.streaming.CurateStream]] r19); the
    * write-side guard still fails loudly if a caller forces a
    * mismatched mode.
    */
  def spanStateKeyMode(spark: org.apache.spark.sql.SparkSession,
      statePath: String): Option[String] =
    readStateOrEmpty(spark, statePath).map { st =>
      val stamped = if (st.columns.contains("kmode"))
        st.select(col("kmode")).head(1).headOption.map(_.getString(0))
      else None
      stamped.getOrElse {
        if (st.schema("wkey").dataType ==
            org.apache.spark.sql.types.LongType) "fp64"
        // a zero-row string dir reads as sha256: with no history rows
        // any string mode is semantically safe (nothing can match) and
        // the schemas are identical, so the content-addressed default
        // is the right forward choice
        else sampledStringKeyMode(st).getOrElse("sha256")
      }
    }

  /** THE 64-lowercase-hex value heuristic over a legacy string-keyed
    * state — ONE implementation shared by the write-side guard
    * ([[spanStateModeGuard]]) and the resume-side probe
    * ([[spanStateKeyMode]]) so the two can never disagree about a
    * directory (r19 review fix). Samples a bounded O(100) slice of
    * non-null keys; None when the sample is empty (the callers pick
    * their own empty-dir policy — the guard has nothing to protect,
    * the probe defaults forward to sha256).
    */
  private def sampledStringKeyMode(st: DataFrame): Option[String] = {
    val sample = st.select(col("wkey"))
      .filter(col("wkey").isNotNull).head(100)
    if (sample.isEmpty) None
    else if (sample.forall(_.getString(0).matches("[0-9a-f]{64}")))
      Some("sha256")
    else Some("text")
  }

  /** Key-mode guard for the span-dedup state directories: the three
    * key domains (text / fp64 / sha256) are NOT interchangeable — a
    * probe against the wrong domain matches nothing and silently
    * skips every historical excision (under-deduplication, i.e. data
    * corruption), and a mixed append corrupts the state schema. New
    * states stamp a `kmode` column; resuming with a different mode
    * fails loudly. Pre-guard (legacy) states lack the stamp — there a
    * TYPE flip (fp64's long keys vs the string modes) still fails
    * loudly; text-vs-sha256 (both strings) is adjudicated by a VALUE
    * heuristic (r19, closing the r18 residual): a sample of stored
    * keys that is uniformly 64 lowercase-hex chars reads as sha256,
    * anything else as text — a sha256 state can never hold a
    * non-hex row, and a span window (space-joined tokens) collides
    * with the 64-hex shape only for pathological single-token
    * corpora, where the guard fails LOUDLY (the safe direction: a
    * false reject names itself; a silent wrong-domain probe
    * under-dedups). Returns whether the directory is legacy (appends
    * then stay stampless, keeping the dir schema homogeneous).
    */
  private def spanStateModeGuard(state: Option[DataFrame],
      statePath: String, expected: String): Boolean =
    state match {
      case None => false
      case Some(st) if st.columns.contains("kmode") =>
        st.select(col("kmode")).head(1).headOption.foreach { r =>
          require(r.getString(0) == expected,
            s"span state at $statePath was written with key mode " +
              s"'${r.getString(0)}' but this run uses '$expected' — " +
              "key domains are not interchangeable (a mismatched " +
              "probe silently skips history excision); pick one mode " +
              "per state directory")
        }
        false
      case Some(st) =>
        val dt = st.schema("wkey").dataType
        val ok = if (expected == "fp64")
          dt == org.apache.spark.sql.types.LongType
        else dt.isInstanceOf[org.apache.spark.sql.types.StringType]
        require(ok, s"span state at $statePath holds " +
          s"${dt.simpleString} keys — incompatible with key mode " +
          s"'$expected'; key domains are not interchangeable per " +
          "state directory")
        if (expected != "fp64") {
          // string-vs-string: the shared bounded-sample hex heuristic
          // (same implementation the resume-side probe uses, so the
          // two verdicts cannot diverge); an empty sample has nothing
          // to protect — the appends proceed
          sampledStringKeyMode(st).foreach { inferred =>
            require(inferred == expected,
              s"span state at $statePath is legacy (no kmode stamp) " +
                s"and its stored keys read as '$inferred' by the " +
                s"64-lowercase-hex heuristic, but this run uses " +
                s"'$expected' — key domains are not interchangeable " +
                "(a mismatched probe silently skips history " +
                "excision); pick one mode per state directory")
          }
        }
        true
    }

  /** [[spanDedupIncremental]] behind the exact-first collapse — the
    * incremental counterpart of
    * [[graft.ext.Suffix.exciseDupSpansExactFirst]] (the clone-robust
    * doctrine applied to the STREAMING excision): each batch's
    * identical texts collapse to their min-id representative
    * (digest-keyed; NULL text rides its own sentinel key so it is
    * never conflated with ''), the in-batch dedup + history probe +
    * state append run on REPRESENTATIVES only, and members are
    * reconstructed CLOSED-FORM. Output is provably byte-equal to
    * running the raw incremental face on the full batch:
    *
    *  - a non-rep member M clones its rep R (R's id is the group min,
    *    so min-struct(doc, start) can never elect (M, s) while (R, s)
    *    exists) — every window of M is a non-first duplicate, M's
    *    positions are fully covered, and M emits ('', 0 kept) when it
    *    has ≥ `span` tokens and its intact text when shorter (no
    *    windows exist to mark, and history probes windows only);
    *  - a rep's verdict is unchanged by dropping members: member
    *    windows duplicate the rep's at identical starts, so no wkey's
    *    first occurrence moves and no history verdict changes;
    *  - the state evolves IDENTICALLY: members contribute no new
    *    distinct window keys, so the appended first-occurrence set is
    *    the same — the face inherits [[spanDedupIncremental]]'s
    *    id-ordered batch-composition equivalence to the one-shot
    *    [[spanDedup]] (CurateStreamSpec proves the composed chain).
    *
    * `stateKeys` picks the state/exchange key representation:
    * "sha256" (default) content-addresses the window text — EXACT
    * under the [[exactByDigest]] assumption, fixed 64-hex rows at any
    * span length, no 64-bit birthday bound — the 100 TB production
    * shape; "fp64" is [[spanDedupHashed]]'s 8-byte rolling fingerprint
    * (collision-admitting — the registered twin audits it); "text"
    * stores the literal window (the SQL-adjudicable anchor). The
    * three key domains are not interchangeable — ENFORCED: state rows
    * are `kmode`-stamped and a resume under a different mode (or
    * against a type-incompatible legacy state) fails loudly instead
    * of silently matching zero history keys. Redelivery rides the
    * same `batchTag` protocol as the raw face.
    */
  def spanDedupIncrementalExactFirst(newDocs: DataFrame, textCol: String,
      idCol: String, span: Int, statePath: String,
      batchTag: Option[Long] = None,
      stateKeys: String = "sha256"): DataFrame = {
    require(span >= 1, s"span must be >= 1, got $span")
    val (fp64, sha) = stateKeys match {
      case "text" => (false, false)
      case "fp64" => (true, false)
      case "sha256" => (false, true)
      case other => throw new IllegalArgumentException(
        s"stateKeys must be text|fp64|sha256, got '$other'")
    }
    val spark = newDocs.sparkSession
    // space-prefixed NULL sentinel (the Suffix sentinel convention):
    // sha2 output is hex, so ' NULL' cannot collide with any digest —
    // NULL-text docs group together and NEVER with ''-text docs (the
    // two differ through split/size, so conflating them would break
    // raw-face byte parity)
    val keyed = newDocs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .withColumn("_tdig", when(col("text").isNull, lit(" NULL"))
        .otherwise(sha2(col("text").cast("binary"), 256)))
    val reps = keyed.groupBy(col("_tdig"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
      .localCheckpoint(true) // consumed by the core AND the member map
    val state0 = readStateOrEmpty(spark, statePath)
    val legacy = spanStateModeGuard(state0, statePath, stateKeys)
    val state = state0
      .map(st => batchTag.fold(st)(t => st.filter(col("batch") =!= t)))
    val histKeys = state.map(_.select(col("wkey")).distinct())
    val (repOut0, newWindows) = spanDedupBatchCore(
      reps.select(col("doc_id"), col("text")), "text", "doc_id", span,
      histKeys, hashedKeys = fp64, sha256Keys = sha)
    // pinned EAGERLY before the state append (the raw face's rule)
    val repOut = repOut0.localCheckpoint(true)
    val stRows = newWindows
      .select(col("wkey"), lit(batchTag.getOrElse(-1L)).as("batch"))
    (if (legacy) stRows else stRows.withColumn("kmode", lit(stateKeys)))
      .write.mode("append").parquet(statePath)
    // closed-form member reconstruction: every expression mirrors the
    // raw core's (size(split(...)), the split-join identity), so NULL
    // and empty texts propagate bit-identically
    val repIds = reps.select(col("_tdig"), col("doc_id").as("_rep_id"))
    val repRows = repOut.select(col("doc_id").as("_rep_id"),
      col("n_kept_tokens").as("_r_nk"), col("deduped_text").as("_r_dt"))
    val nTok = size(split(col("text"), " ")).cast("bigint")
    val isRep = col("doc_id") === col("_rep_id")
    val kept = when(isRep, col("_r_nk"))
      .when(nTok >= span, lit(0L))
      .otherwise(when(col("text").isNull, lit(0L)).otherwise(nTok))
    keyed.join(repIds, "_tdig").join(repRows, "_rep_id")
      .select(col("doc_id"), nTok.as("n_tokens"),
        kept.as("n_kept_tokens"),
        (nTok - kept).cast("bigint").as("n_removed"),
        when(isRep, col("_r_dt"))
          .when(nTok >= span, lit(""))
          .otherwise(coalesce(col("text"), lit(""))).as("deduped_text"))
  }

  /** History-relative span dedup without mutable state: `history` is a
    * document corpus whose windows are authoritative; the batch is
    * span-deduped in-batch AND every batch occurrence of a historical
    * window is excised. Pure function of its two inputs (the
    * SQL-adjudicable face of [[spanDedupIncremental]], which is this
    * plus the accumulated-state bookkeeping).
    */
  def spanDedupAgainstHistory(newDocs: DataFrame, history: DataFrame,
      textCol: String, idCol: String, span: Int): DataFrame = {
    val histKeys = spanWindows(
      history.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("tk")), span, hashedKeys = false)
      .select(col("wkey")).distinct()
    spanDedupBatchCore(newDocs, textCol, idCol, span, Some(histKeys),
      hashedKeys = false)._1
  }

  /** Shared batch kernel: in-batch first-occurrence dedup plus optional
    * history excision. Returns (per-doc output, genuinely-new
    * first-occurrence windows keyed as `wkey`). `hashedKeys` selects
    * the window-key representation ([[spanWindows]]); `histKeys` must
    * use the same representation.
    */
  private def spanDedupBatchCore(newDocs: DataFrame, textCol: String,
      idCol: String, span: Int, histKeys: Option[DataFrame],
      hashedKeys: Boolean, sha256Keys: Boolean = false): (DataFrame, DataFrame) = {
    require(span >= 1, s"span must be >= 1, got $span")
    require(!(hashedKeys && sha256Keys),
      "sha256Keys digests the TEXT key — exclusive with hashedKeys")
    val toks = newDocs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("tk"))
    // sha256Keys: content-address the window text (the exactByDigest
    // doctrine) — grouping/probing on the digest is injective under
    // the standard 2⁻¹²⁸ assumption, every state row and exchange key
    // is a fixed 64 hex chars at ANY span length, and unlike the
    // 64-bit fingerprint there is no birthday bound at 10^12 windows
    val windows0 = spanWindows(toks, span, hashedKeys)
    val windows = if (sha256Keys)
      windows0.withColumn("wkey", sha2(col("wkey").cast("binary"), 256))
    else windows0
    val histDup = histKeys match {
      case Some(h) => windows.join(h, Seq("wkey"), "left_semi")
      case None => windows.limit(0)
    }
    val first = windows.groupBy(col("wkey"))
      .agg(min(struct(col("doc_id").as("fd"), col("start").as("fs")))
        .as("first"))
    val batchDup = windows.join(first, Seq("wkey"))
      .filter(!(col("doc_id") === col("first.fd") &&
        col("start") === col("first.fs")))
    val removed = coveredPositions(
      histDup.select(col("doc_id"), col("start"))
        .union(batchDup.select(col("doc_id"), col("start"))), span)
    val tok = toks
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
    val rebuilt = tok.join(removed, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_kept_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("deduped_text"))
    val out = toks
      .select(col("doc_id"), size(col("tk")).cast("bigint").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept_tokens"), lit(0L)).as("n_kept_tokens"),
        (col("n_tokens") - coalesce(col("n_kept_tokens"), lit(0L)))
          .cast("bigint").as("n_removed"),
        coalesce(col("deduped_text"), lit("")).as("deduped_text"))
    val newWindows = histKeys match {
      case Some(h) => first.select(col("wkey"))
        .join(h, Seq("wkey"), "left_anti")
      case None => first.select(col("wkey"))
    }
    (out, newWindows)
  }

  /** Covered-position set from duplicate-window occurrences: each
    * (doc_id, start) marks [start, start+span) for removal. Overlapping
    * and adjacent ranges are INTERVAL-MERGED per doc (gaps-and-islands:
    * running max of interval end, new island when a start clears it)
    * BEFORE positions explode, so the explosion is one row per damaged
    * position — never span rows per overlapping occurrence. A heavily
    * duplicated passage hit by dozens of sliding windows previously
    * exploded span×occurrences rows and leaned on a distinct() to
    * collapse them; the merged form never materializes the redundancy.
    * Duplicate (doc, start) inputs are harmless (they land in the same
    * island), so callers need no pre-distinct either.
    */
  private def coveredPositions(occ: DataFrame, span: Int): DataFrame = {
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("start"))
    occ.select(col("doc_id"), col("start"),
        (col("start") + span).as("end"))
      .withColumn("prev_max_end",
        max(col("end")).over(wOrd.rowsBetween(Long.MinValue, -1)))
      .withColumn("new_isl",
        when(col("prev_max_end").isNull ||
          col("start") > col("prev_max_end"), 1).otherwise(0))
      .withColumn("isl", sum(col("new_isl")).over(wOrd))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("start")).as("s"), max(col("end")).as("e"))
      .select(col("doc_id"),
        explode(sequence(col("s"), col("e") - 1)).as("pos"))
  }

  /** Per-(doc, start) window keys for the span-dedup family. Text keys
    * (`hashedKeys = false`) group on the window's literal token string
    * — exact semantics, SQL-adjudicable, but the corpus-wide shuffle
    * carries every window's full text. Fingerprint keys group on a
    * 64-bit ROLLING polynomial hash of the window's xxhash64 token
    * hashes (wrapping two's-complement arithmetic — deterministic
    * under any partitioning): the shuffle key drops to 8 bytes
    * regardless of window byte-length — the 100 TB shape — at the cost
    * of a birthday-bound collision risk (~n²/2^64; negligible below
    * ~10^8 distinct windows, and a collision can only over-delete one
    * span). The fingerprints come from ONE compiled mapPartitions pass,
    * O(len) per doc via the rolling update fp' = (fp − h_out·B^{s−1})·B
    * + h_in — a per-window aggregate(slice(...)) higher-order fold was
    * O(len·span) interpreted work and ate the shuffle savings at bench
    * scale (the simhash/LSH compiled-kernel lesson again). No window
    * string is ever materialized.
    */
  private def spanWindows(toks: DataFrame, span: Int,
      hashedKeys: Boolean): DataFrame =
    if (!hashedKeys)
      toks.select(col("doc_id"),
          posexplode(when(size(col("tk")) >= span,
            transform(sequence(lit(0), size(col("tk")) - span),
              i => concat_ws(" ", slice(col("tk"), i + 1, lit(span)))))
            .otherwise(array().cast("array<string>"))))
        .select(col("doc_id"), col("pos").as("start"),
          col("col").as("wkey"))
    else {
      val spark = toks.sparkSession
      import spark.implicits._
      val sp = span
      // explicit cast: the family contract is long-castable ids (every
      // sibling — shingleIndex, simhashCore, qualitySurvivors — casts
      // idCol to long); without it the typed encoder REJECTS e.g. an
      // int doc_id column the text-keyed variant above accepts,
      // breaking the documented parity between the two variants
      toks.select(col("doc_id").cast("long").as("doc_id"), col("tk"))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          var bpow = 1L // 31^(span-1), wrapping
          var j = 1
          while (j < sp) { bpow *= 31L; j += 1 }
          val bp = bpow
          it.flatMap { case (id, tk) =>
            // NULL text (split(NULL) = NULL array) emits no windows —
            // mirroring the text-keyed branch's when(size(tk) >= span)
            // guard, which nulls out on NULL and falls to empty (r18:
            // the kernel NPE'd here, crashing every fp64 face on a
            // corpus with a single NULL document)
            val n = if (tk == null) 0 else tk.length
            if (n < sp) Iterator.empty
            else {
              val hs = new Array[Long](n)
              var i = 0
              while (i < n) {
                val u = org.apache.spark.unsafe.types.UTF8String
                  .fromString(tk(i))
                hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
                  .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
                    u.numBytes, 42L)
                i += 1
              }
              var fp = 0L
              i = 0
              while (i < sp) { fp = fp * 31L + hs(i); i += 1 }
              val first = (id, 0, fp)
              Iterator.single(first) ++ (1 to n - sp).iterator.map { s =>
                fp = (fp - hs(s - 1) * bp) * 31L + hs(s + sp - 1)
                (id, s, fp)
              }
            }
          }
        }.toDF("doc_id", "start", "wkey")
    }

  /** Shared kernel for [[spanDedup]]/[[intraDocDedup]]/
    * [[spanDedupHashed]]: `perDoc` scopes the first-occurrence group to
    * (doc, window) instead of (window); `hashedKeys` selects the window
    * key representation ([[spanWindows]]).
    */
  private def spanDedupCore(docs: DataFrame, textCol: String, idCol: String,
      span: Int, perDoc: Boolean, hashedKeys: Boolean = false): DataFrame = {
    require(span >= 1, s"span must be >= 1, got $span")
    // doc-id clustering up front (r19 optimization, the
    // bigramLogProbUnder move): every downstream step of this kernel —
    // the per-doc first-occurrence group (perDoc face), the
    // interval-merge window, the position anti-join, the rebuild
    // group, and the final doc join — clusters on doc_id, so one
    // raw-docs exchange here lets EnsureRequirements elide all of
    // their exchanges (the corpus-wide face keeps its one wkey
    // identity exchange, which no clustering can remove). The hashed
    // kernel is an opaque mapPartitions (partitioning metadata does
    // not survive it), so that face re-clusters its compact
    // (long, int, long) window rows instead. Exact aggregates
    // throughout make regrouping value-neutral.
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("tk"))
      .repartition(col("doc_id"))
    val windowsRaw = spanWindows(toks, span, hashedKeys)
    // only the perDoc face profits from re-clustering the hashed
    // kernel's output (its first-occurrence group is doc-scoped); the
    // corpus-wide face groups on wkey and would pay the exchange for
    // nothing
    val windows =
      if (hashedKeys && perDoc) windowsRaw.repartition(col("doc_id"))
      else windowsRaw
    val firstKey = if (perDoc) Seq(col("doc_id"), col("wkey"))
      else Seq(col("wkey"))
    val first = windows.groupBy(firstKey: _*)
      .agg(min(struct(col("doc_id").as("fd"), col("start").as("fs")))
        .as("first"))
    val joined =
      if (perDoc) windows.join(first, Seq("doc_id", "wkey"))
      else windows.join(first, Seq("wkey"))
    val removed = coveredPositions(joined
      .filter(!(col("doc_id") === col("first.fd") &&
        col("start") === col("first.fs")))
      .select(col("doc_id"), col("start")), span)
    val tok = toks
      .select(col("doc_id"), size(col("tk")).as("n_tok"), posexplode(col("tk")))
      .select(col("doc_id"), col("n_tok"), col("pos"), col("col").as("tok"))
    val rebuilt = tok.join(removed, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_kept_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("deduped_text"))
    toks.select(col("doc_id"), size(col("tk")).cast("bigint").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept_tokens"), lit(0L)).as("n_kept_tokens"),
        (col("n_tokens") - coalesce(col("n_kept_tokens"), lit(0L)))
          .cast("bigint").as("n_removed"),
        coalesce(col("deduped_text"), lit("")).as("deduped_text"))
  }
}
