package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so
  * file-level min/max statistics prune scans on EITHER predicate
  * dimension — the Delta/Iceberg `ZORDER BY` idea as an explicit
  * operator. A linear sort makes one dimension's ranges tight and
  * leaves the other spanning the whole table; interleaving the
  * quantized bits gives every written bucket a small bounding box in
  * both dimensions, so a 100 TB table answers `WHERE price BETWEEN`
  * AND `WHERE date BETWEEN` queries from a fraction of its files.
  *
  * All narrow bit arithmetic (shift/and/or — codegen'd); the only wide
  * operation is whatever the caller does with the bucket id
  * (repartitionByRange(bucket) before the write, a groupBy here for
  * the stats report).
  */
object Layout {

  /** Quantize v over [lo, hi) to 0 .. 2^bits−1 (clamped). */
  def quantize(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits > 0 && bits <= 30 && hi > lo, "need 0 < bits <= 30, hi > lo")
    least(greatest(
      floor((v.cast("double") - lit(lo)) / lit(hi - lo) * lit(1L << bits)),
      lit(0L)), lit((1L << bits) - 1L)).cast("long")
  }

  /** Morton interleave of two `bits`-bit values: x on even bit
    * positions, y on odd.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Assign each row a z-order bucket (top `bucketBits` bits of the
    * interleaved value = 2^bucketBits buckets) and report each
    * bucket's row count and per-dimension bounding box — the min/max
    * stats a writer would persist per file.
    */
  def zorderStats(df: DataFrame, x: Column, y: Column,
      xLo: Double, xHi: Double, yLo: Double, yHi: Double,
      bits: Int, bucketBits: Int): DataFrame = {
    require(bucketBits > 0 && bucketBits <= 2 * bits, "bad bucketBits")
    val z = zValue(quantize(x, xLo, xHi, bits), quantize(y, yLo, yHi, bits), bits)
    df.withColumn("bucket", shiftright(z, 2 * bits - bucketBits))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(x.cast("double")).as("x_min"), max(x.cast("double")).as("x_max"),
        min(y.cast("double")).as("y_min"), max(y.cast("double")).as("y_max"))
  }

  /** The DuckDB-replayable SQL text of [[zValue]] over `x`/`y`
    * expression strings — oracle construction shares the exact formula.
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** SQL text of [[quantize]]. */
  def quantizeSql(v: String, lo: Double, hi: Double, bits: Int): String =
    s"least(greatest(CAST(floor((CAST($v AS DOUBLE) - $lo) / ${hi - lo} " +
      s"* ${1L << bits}) AS BIGINT), 0), ${(1L << bits) - 1})"

  /** Deterministic EPOCH-ORDER shuffle over packed training sequences
    * — the reproducible global permutation every data-parallel
    * training run needs between packing and consumption (sequences
    * are written in packer order, which is length-sorted and
    * group-clustered — consuming them in that order would feed each
    * epoch long-docs-first, one source at a time):
    *
    *  - each sequence (one per (group, bin)) gets a SEEDED HASH
    *    permutation key, pure arithmetic over (group index, bin,
    *    seed) — the [[Sampling.weightedSample]] 31-bit LCG discipline,
    *    so the order is a function of content + seed alone:
    *    reproducible across runs, partitionings, cluster sizes, and
    *    engines (SQL-replayable, unlike a hashed-string or RNG key).
    *    The seed enters MULTIPLICATIVELY and the key passes a
    *    NONLINEAR finalizer (r19): key = `fin((mult(seed) · lcg(sid)
    *    + off(seed)) mod 2^31)` with `mult` an odd seed-derived
    *    multiplier and `fin` two seed-independent xorshift+LCG
    *    rounds. An additive seed (`lcg(sid + seed)`) makes any two
    *    seeds' keys differ by a CONSTANT, so "epoch 2" was exactly
    *    "epoch 1 rotated" and adjacent pairs survived across epochs
    *    598/599 on the 600-sequence probe (caught by the
    *    [[epochOrderAudit]] family's preserved-adjacency statistic);
    *    the multiplier alone still leaves same-mult seed pairs
    *    rotated (pigeonhole over 2^30 multipliers — e.g. any seeds
    *    differing by 2^30), which the finalizer closes: every probed
    *    pair lands at the random-permutation preserved-adjacency
    *    level (≤4/599), with displacement at the uniform N²/3;
    *  - the epoch position is [[Rank.globalRowNumber]] over
    *    (key, group, bin) — ONE range exchange on the permuted key +
    *    the two narrow numbering jobs, never a driver sort and never
    *    a single-partition window (the 100 TB shape: consumers then
    *    read position ranges, i.e. the range partitioning IS the
    *    epoch sharding); LCG collisions are broken by (group, bin),
    *    so the order is total and the permutation exact;
    *  - the group index itself rides a [[Rank.globalRowNumber]] over
    *    the DISTINCT groups (O(groups) rows) and joins back broadcast
    *    — group names never hash engine-specifically.
    *
    * Returns the input columns + `shuffle_key` + `epoch_pos`
    * (1-based). A new epoch = a new seed; nothing is re-packed.
    *
    * NULL group names are kept (null-safe group join) and sort NULLS
    * FIRST — Spark's ascending default. A SQL replay must spell
    * `ORDER BY grp NULLS FIRST` explicitly (DuckDB defaults ascending
    * NULLs LAST, which would silently re-index every group and
    * diverge the whole permutation); the registered oracles do.
    */
  def epochOrder(seqs: DataFrame, groupCol: String, binCol: String,
      seed: Long): DataFrame =
    epochOrderWithTotal(seqs, groupCol, binCol, seed)._1

  /** [[epochOrder]] plus the TOTAL sequence count, which the rank
    * pass's per-partition counts already computed — callers that need
    * N for a cut ([[epochShards]]' consumer division, a budget
    * boundary) get it for free instead of paying a second pass over
    * the (possibly expensive) packed-sequence plan (the
    * [[Rank.globalRowNumberWithTotal]] doctrine).
    */
  def epochOrderWithTotal(seqs: DataFrame, groupCol: String,
      binCol: String, seed: Long): (DataFrame, Long) = {
    require(seed >= 0, "seed must be non-negative (the LCG domain)")
    val groups = Rank.globalRowNumber(
      seqs.select(col(groupCol).cast("string").as("_g")).distinct(),
      Seq(col("_g")), out = "_gi")
    val M = 2147483648L // 2^31
    val m = lit(M)
    // sid packs (group index, bin) into one integer; collisions past
    // 2^20 bins per group only merge LCG keys, never break the total
    // order (the (group, bin) tiebreak below)
    val sid = col("_gi") * lit(1048576L) + col(binCol).cast("long")
    // seed-derived constants, computed ONCE on the driver: s1/s2 are
    // two LCG advances of the seed, mult = 2·(s1 mod 2^30)+1 is an ODD
    // multiplier < 2^31 (odd ⇒ invertible mod 2^31, so distinct seeds
    // give genuinely different lattices — the r19 rotation fix; an
    // additive-only seed shifted every key by the same constant and
    // epoch orders were rotations of each other)
    val s1 = ((seed % M) * 1103515245L + 12345L) % M
    val s2 = (s1 * 1103515245L + 12345L) % M
    val mult = 2L * (s1 % 1073741824L) + 1L
    // reduce mod 2^31 BEFORE each multiply: every product tops out at
    // 2^31·1103515245 < Long.MaxValue (the weightedSample bound)
    val inner = pmod(pmod(sid, m) * lit(1103515245L) + lit(12345L), m)
    val y0 = pmod(lit(mult) * inner + lit(s2), m)
    // seed-independent NONLINEAR finalizer (two xorshift+LCG rounds):
    // the affine stage alone cannot decorrelate every seed pair —
    // mult has only 2^30 values over 2^31 seeds, so same-mult pairs
    // exist by pigeonhole (concretely: seeds differing by 2^30 shift
    // s1 by exactly 2^30, share mult, and their keys differ by one
    // constant — a rotation again, caught in review). The xorshift
    // breaks the affine structure, so equal-mult seed pairs are no
    // longer order-related: measured preserved adjacency for the
    // Δ=2^30 pairs drops from 598/599 (no finalizer would help the
    // additive key) through 196/599 (one round) to ≤4/599 (two
    // rounds, the random-pair level); it also dissolves the LCG
    // lattice WITHIN an epoch (adjacent same-group pairs land at the
    // uniform expectation instead of the super-uniform 0)
    val y1 = pmod((y0.bitwiseXOR(shiftright(y0, 15)))
      * lit(1103515245L) + lit(12345L), m)
    val pk = pmod((y1.bitwiseXOR(shiftright(y1, 13)))
      * lit(1103515245L) + lit(12345L), m)
    // null-safe equality: a NULL group name must keep its sequences
    // (an equi-join would silently DROP them — the stage-0 NULL-url
    // lesson); the distinct table carries the NULL row and the order
    // columns sort it NULLS FIRST deterministically
    val keyed = seqs
      .join(broadcast(groups), col(groupCol).cast("string") <=> col("_g"))
      .withColumn("shuffle_key", pk.cast("long"))
      .drop("_g", "_gi")
    Rank.globalRowNumberWithTotal(keyed,
      Seq(col("shuffle_key"), col(groupCol), col(binCol)),
      out = "epoch_pos")
  }

  /** The balanced consumer assignment shared by EVERY epoch face —
    * consumer = ((epoch_pos − 1) · nConsumers) div total — factored
    * once so the manifest ([[epochShards]]), the physical layout
    * ([[writeEpochLayout]]), the resume cursor ([[epochResumeCursor]])
    * and the block digests ([[epochBlockDigests]]) can never drift
    * apart: they all describe the SAME blocks, and a rounding change
    * applied to one copy but not another would make digests verify
    * ranges a rank does not actually read (r19 review fix — this was
    * previously four inline copies). [[consumerFirstPos]] is the
    * closed-form inverse: consumer c's first (epoch_pos − 1) is
    * ⌈c·total/nConsumers⌉.
    */
  private[ext] def consumerOfPos(total: Long, nConsumers: Int): Column =
    expr(s"((epoch_pos - 1) * $nConsumers) div $total").cast("long")

  private[ext] def consumerFirstPos(total: Long, nConsumers: Int): Column =
    expr(s"(consumer * $total + ${nConsumers - 1}) div $nConsumers")

  /** The shared empty-consumer terminal-row fill: every face that
    * reports per-consumer rows (the manifest, the digests) answers
    * consumers 0..nConsumers−1 even when N < nConsumers — zeroCols
    * coalesce to 0, everything else stays NULL (the r18
    * empty-consumer discipline, factored once in review so the faces
    * cannot disagree about what an empty consumer looks like). The
    * broadcast side is the per-consumer aggregate, which every caller
    * guarantees is O(nConsumers) rows at the call site.
    */
  private def fillConsumers(agg: DataFrame, nConsumers: Int,
      zeroCols: Set[String]): DataFrame = {
    val others = agg.columns.filter(_ != "consumer").toSeq
    agg.sparkSession.range(nConsumers).select(col("id").as("consumer"))
      .join(broadcast(agg), Seq("consumer"), "left")
      .select(col("consumer") +: others.map(c =>
        if (zeroCols(c)) coalesce(col(c), lit(0L)).as(c) else col(c)): _*)
  }

  /** Consumer assignment over an [[epochOrder]] result — the epoch
    * SHARDING claim made executable: data-parallel consumer `c` of
    * `nConsumers` reads the contiguous position range it is assigned
    * by the balanced closed form
    * `consumer = ((epoch_pos − 1) · nConsumers) div N` (block sizes
    * differ by at most one sequence; pure integer arithmetic, so the
    * assignment is a function of (position, N, nConsumers) alone —
    * reproducible and SQL-replayable). Emits one row per consumer
    * 0..nConsumers−1 — INCLUDING consumers left empty when N <
    * nConsumers (n_seqs 0, NULL first/last positions, zero sums): a
    * launcher iterating ranks must find every rank's manifest row
    * (r18 review fix — empty consumers previously emitted nothing).
    * Columns: (consumer, n_seqs, first_pos, last_pos, n_docs,
    * n_toks).
    *
    * `total` is the N the division uses — pass the count
    * [[epochOrderWithTotal]] already computed; deriving it here would
    * re-execute the whole ordered plan for one long.
    *
    * Scale: one map-side-combinable aggregate over the ordered
    * sequences + a broadcast O(nConsumers) dimension join; no new
    * shuffle class — and because [[epochOrder]] range-partitioned BY
    * the permuted key, each consumer's block is physically contiguous
    * in the written layout (the "range partitioning IS the epoch
    * sharding" property).
    */
  def epochShards(ordered: DataFrame, total: Long, nConsumers: Int,
      nDocsCol: String = "n_docs", nToksCol: String = "n_toks")
      : DataFrame = {
    require(nConsumers > 0, "nConsumers must be positive")
    require(total > 0, "total must be positive (an empty epoch has no shards)")
    val spark = ordered.sparkSession
    val filled = ordered
      .withColumn("consumer", consumerOfPos(total, nConsumers))
      .groupBy(col("consumer"))
      .agg(count(lit(1)).cast("bigint").as("n_seqs"),
        min(col("epoch_pos")).cast("bigint").as("first_pos"),
        max(col("epoch_pos")).cast("bigint").as("last_pos"),
        sum(col(nDocsCol)).cast("bigint").as("n_docs"),
        sum(col(nToksCol)).cast("bigint").as("n_toks"))
    fillConsumers(filled, nConsumers, Set("n_seqs", "n_docs", "n_toks"))
  }

  /** Materialize an [[epochOrder]] result as the loader-facing
    * PHYSICAL layout (r19 — the "range partitioning IS the epoch
    * sharding" claim written to disk, not just held as a DataFrame
    * property): one parquet directory per consumer
    * (`consumer=c/`), each holding exactly that consumer's contiguous
    * [[epochShards]] position block, rows in epoch order within each
    * file.
    *
    * Scale shape — deliberately NO new exchange: `consumer` is a
    * MONOTONE function of `epoch_pos` (the balanced integer division),
    * and [[epochOrder]]'s output is already range-partitioned and
    * sorted by the permutation key (= epoch order), so every task's
    * rows land in at most TWO consumer directories and arrive
    * pre-sorted; the dynamic-partition write needs no shuffle and no
    * per-task sort of substance. A repartition-by-consumer here would
    * add a full exchange of the corpus for nothing.
    *
    * The written artifact is gated (LayoutEpochSpec): per consumer
    * directory the read-back positions must be exactly the gap-free
    * range [first_pos, last_pos] of the consumer's manifest row, and
    * the union over directories must be every sequence exactly once.
    *
    * Returns the [[epochShards]] manifest the layout was written
    * against (the launcher reads it to find each rank's directory and
    * expected range).
    */
  def writeEpochLayout(ordered: DataFrame, total: Long, nConsumers: Int,
      path: String, nDocsCol: String = "n_docs",
      nToksCol: String = "n_toks"): DataFrame = {
    require(nConsumers > 0, "nConsumers must be positive")
    require(total > 0, "total must be positive")
    ordered
      .withColumn("consumer", consumerOfPos(total, nConsumers))
      .write.mode("overwrite").partitionBy("consumer").parquet(path)
    // the manifest aggregates the JUST-WRITTEN parquet, not `ordered` —
    // running epochShards over the input would re-execute the entire
    // upstream plan (packer + range exchange + numbering jobs) a
    // second time for a nConsumers-row summary (the no-second-pass
    // doctrine epochOrderWithTotal exists for); the written layout is
    // a cheap columnar scan and is BY DEFINITION what the manifest
    // must describe
    epochShards(ordered.sparkSession.read.parquet(path), total,
      nConsumers, nDocsCol, nToksCol)
  }

  /** Mid-epoch RESUME cursor (r19) — the deterministic restart
    * contract a crashed data-parallel training job needs: for each
    * requested (consumer c, K), "skip the first K sequences of
    * consumer c's epoch block and resume at the next one", with the
    * per-consumer cumulative token positions that make a token-budget
    * resume ("skip the first B tokens") the same lookup.
    *
    * Everything composes from machinery this family already pays for:
    *  - the global inclusive prefix sum over the epoch order
    *    ([[Rank.globalRunningSum]] — one range exchange, never a
    *    single-partition window);
    *  - the per-consumer manifest (one map-side-combinable aggregate,
    *    O(nConsumers) rows) plus an O(nConsumers) window for each
    *    consumer's token OFFSET (tokens of all earlier consumers), so
    *    consumer-local cumulative tokens = global cum − offset;
    *  - the resume row itself: consumer c's block is the contiguous
    *    position range starting at its manifest `first_pos`, so the
    *    (K+1)-th sequence is simply position `first_pos + K` — an
    *    equi-join of the O(#skips) request table against the summed
    *    order (broadcast, no new shuffle class).
    *
    * `ordered` must be an [[epochOrder]]-shaped frame (carries
    * `epoch_pos`, `groupCol`, `binCol`, `nToksCol`); `total` is the N
    * the division used (from [[epochOrderWithTotal]]). A skip past
    * the consumer's block (K ≥ its n_seqs) is EXHAUSTED: the resume
    * columns come back NULL, skipped_toks = the consumer's whole
    * token load, remaining 0 — adjudicated, not an error (a launcher
    * replaying "skip everything consumed" on a finished shard must
    * get a clean terminal answer).
    *
    * Returns one row per requested (consumer, skip_k):
    * (consumer, skip_k, n_seqs, resume_pos, resume_grp, resume_bin,
    * resume_toks, skipped_toks, remaining_seqs, remaining_toks).
    */
  /** Shuffle-QUALITY audit over an [[epochOrder]] result (r19) — the
    * measured answer to "did the seeded LCG permutation actually mix
    * the sources?", which a training run needs certified before it
    * trusts the epoch order (a clustered order feeds each step a
    * correlated batch and quietly biases gradients):
    *
    *  - `observed_same` counts adjacent position pairs (p, p+1) whose
    *    sequences share a group — via an equi-join on the successor
    *    position (a hash shuffle on a long key), never a corpus-wide
    *    window;
    *  - `expected_num` = Σ_g n_g·(n_g−1) is the EXACT numerator of the
    *    uniform-permutation expectation: under a uniform random order
    *    E[observed_same] = Σ n_g(n_g−1)/N (each of the N−1 adjacent
    *    slots is a uniform ordered pair), so `expected_floor` =
    *    expected_num div N is the integer baseline to read
    *    `observed_same` against, exactly — no floating point anywhere;
    *  - run structure: `n_runs` / `max_run` over maximal same-group
    *    intervals — boundary flags from the predecessor join, segment
    *    ids via [[Rank.globalRunningSum]] (the distributed inclusive
    *    prefix sum — one range exchange, never a single-partition
    *    window), run lengths by a map-side-combinable count per
    *    segment;
    *  - `mixed_ok` is the 2× verdict `observed_same · N ≤
    *    2 · expected_num`, compared in DECIMAL(38,0) so the products
    *    stay exact at any corpus size (at 10^9 sequences the bigint
    *    product would overflow).
    *
    * NULL group names participate as their own group (null-safe
    * comparisons throughout — the epoch family's standing NULL-group
    * discipline). Returns ONE row:
    * (n_seqs, n_groups, n_adjacent, observed_same, expected_num,
    * expected_floor, n_runs, max_run, mixed_ok).
    */
  def epochOrderAudit(ordered: DataFrame, total: Long,
      groupCol: String = "grp"): DataFrame = {
    require(total > 0, "total must be positive")
    val g = col(groupCol)
    // Σ n_g(n_g−1): one map-side-combinable aggregate over O(groups)
    val exp = ordered.groupBy(g.as("_ag"))
      .agg(count(lit(1)).as("_n"))
      .agg(count(lit(1)).cast("bigint").as("n_groups"),
        coalesce(sum(col("_n") * (col("_n") - 1)), lit(0L))
          .cast("bigint").as("expected_num"))
    val a = ordered.select(col("epoch_pos").as("_p"), g.as("_ga"))
    // successor pairs: row at position p+1 re-keyed to p
    val succ = ordered.select((col("epoch_pos") - 1).as("_p"), g.as("_gs"))
    val obs = a.join(succ, Seq("_p"))
      .agg(count(lit(1)).cast("bigint").as("n_adjacent"),
        coalesce(sum(when(col("_ga") <=> col("_gs"), 1L).otherwise(0L)),
          lit(0L)).cast("bigint").as("observed_same"))
    // predecessor pairs → boundary flags → prefix-sum segment ids
    val prev = ordered.select((col("epoch_pos") + 1).as("_p"), g.as("_gp"))
    val flags = a.join(prev, Seq("_p"), "left")
      .withColumn("_flag",
        when(col("_p") === 1L, 1L)
          .otherwise(when(col("_ga") <=> col("_gp"), 0L).otherwise(1L)))
    val runs = Rank.globalRunningSum(flags, Seq(col("_p")), col("_flag"),
        out = "_seg")
      .groupBy(col("_seg")).agg(count(lit(1)).as("_len"))
      .agg(count(lit(1)).cast("bigint").as("n_runs"),
        max(col("_len")).cast("bigint").as("max_run"))
    exp.crossJoin(obs).crossJoin(runs)
      .select(lit(total).cast("bigint").as("n_seqs"), col("n_groups"),
        col("n_adjacent"), col("observed_same"), col("expected_num"),
        expr(s"expected_num div $total").cast("bigint")
          .as("expected_floor"),
        col("n_runs"), col("max_run"),
        (col("observed_same").cast("decimal(38,0)") * lit(total) <=
          col("expected_num").cast("decimal(38,0)") * lit(2L))
          .as("mixed_ok"))
  }

  /** Per-consumer BLOCK digests over an [[epochOrder]] result (r19) —
    * the order-integrity checksum that completes the
    * [[epochResumeCursor]] restart contract: the cursor tells a
    * resumed rank WHERE to continue; the digest lets it VERIFY it is
    * reading the same bytes in the same order as the run that crashed
    * (a re-shuffled corpus, a drifted seed, or a misrouted consumer
    * directory all change some block's digest).
    *
    * Consumer and block are CLOSED FORM in the position — consumer
    * `c` starts at position ⌈c·N/nConsumers⌉+1 (the inverse of the
    * balanced division), so the block id needs no manifest join and
    * no window: one projection + one map-side-combinable aggregate
    * per (consumer, block). The digest term MULTIPLIES the position
    * into the content — `(pos mod 2^31) · ((key·97 + toks·31 + 1)
    * mod 2^31), mod 2^31` — because an additive mix
    * (`pos·A + key·B + …`) is order-INVARIANT under content swaps:
    * position and content contributions separate additively mod 2^31,
    * so swapping two sequences' content across positions leaves the
    * block sum unchanged (caught by the order-sensitivity spec). With
    * the product term a swap changes `p₁c₁ + p₂c₂` to `p₁c₂ + p₂c₁`,
    * which differ unless the contents collide. Pure 64-bit-safe
    * integer arithmetic throughout — engine-reproducible and
    * SQL-replayable; sums stay exact: each term < 2^31 and
    * `blockLen` ≤ 2^20 keeps a block's sum < 2^51.
    *
    * Returns one row per (consumer, block), RANGE-FILLED over
    * consumers 0..nConsumers−1 — a consumer left empty when N <
    * nConsumers gets a terminal row (n_seqs 0, NULL
    * block/range/digest, zero tokens), matching the [[epochShards]] /
    * [[epochResumeCursor]] discipline:
    * (consumer, block, n_seqs, first_pos, last_pos, n_toks, digest).
    */
  def epochBlockDigests(ordered: DataFrame, total: Long, nConsumers: Int,
      blockLen: Long, nToksCol: String = "n_toks"): DataFrame = {
    require(nConsumers > 0, "nConsumers must be positive")
    require(total > 0, "total must be positive")
    require(blockLen > 0 && blockLen <= (1L << 20),
      "need 0 < blockLen <= 2^20 (the exact-sum bound)")
    val m = lit(2147483648L) // 2^31
    val agg = ordered
      .withColumn("consumer", consumerOfPos(total, nConsumers))
      .withColumn("_local", col("epoch_pos") - lit(1L) -
        consumerFirstPos(total, nConsumers))
      .withColumn("block", expr(s"_local div $blockLen").cast("long"))
      .withColumn("_term",
        pmod(pmod(col("epoch_pos"), m) *
          pmod(col("shuffle_key") * lit(97L)
            + col(nToksCol).cast("long") * lit(31L) + lit(1L), m), m))
      .groupBy(col("consumer"), col("block"))
      .agg(count(lit(1)).cast("bigint").as("n_seqs"),
        min(col("epoch_pos")).cast("bigint").as("first_pos"),
        max(col("epoch_pos")).cast("bigint").as("last_pos"),
        sum(col(nToksCol)).cast("bigint").as("n_toks"),
        pmod(sum(col("_term")), m).cast("bigint").as("digest"))
    // RANGE-FILLED like every other face (the r18 empty-consumer
    // lesson, applied to the digests in review): when N < nConsumers a
    // rank assigned an empty block must find its terminal row (n_seqs
    // 0, NULL block/range/digest, zero tokens) — with no row it cannot
    // distinguish "legitimately empty shard" from "my digests were
    // lost". The fill ONLY runs on that cold path: when N >=
    // nConsumers the balanced division makes every consumer non-empty
    // (the fill is provably a no-op), and forcing a broadcast of the
    // O(N/blockLen) digest aggregate there would ship the whole
    // digest table to every executor for nothing (second review pass —
    // at 10^9 sequences that broadcast kills the driver; on the cold
    // path agg has < nConsumers rows and the broadcast is O(1))
    if (total >= nConsumers.toLong) agg
    else fillConsumers(agg, nConsumers, Set("n_seqs", "n_toks"))
  }

  def epochResumeCursor(ordered: DataFrame, total: Long, nConsumers: Int,
      skips: Seq[(Long, Long)], groupCol: String = "grp",
      binCol: String = "bin", nToksCol: String = "n_toks"): DataFrame = {
    require(nConsumers > 0, "nConsumers must be positive")
    require(total > 0, "total must be positive")
    require(skips.nonEmpty, "need at least one (consumer, skip) request")
    require(skips.forall { case (c, k) => c >= 0 && c < nConsumers && k >= 0 },
      s"every request needs 0 <= consumer < $nConsumers and skip_k >= 0")
    val spark = ordered.sparkSession
    import spark.implicits._
    val cum = Rank.globalRunningSum(ordered, Seq(col("epoch_pos")),
        col(nToksCol), out = "_gcum")
      .withColumn("consumer", consumerOfPos(total, nConsumers))
    // O(nConsumers) manifest + exclusive token offsets; the window is
    // over the BOUNDED consumer dimension, not the corpus (the
    // single-partition exchange it implies moves nConsumers rows).
    // RANGE-FILLED like epochShards: when N < nConsumers some
    // consumers own no sequences, and a request against one must
    // still answer with the documented exhausted terminal (n_seqs 0,
    // NULL resume, zero tokens) — an aggregate-only manifest would
    // silently DROP the request at the join (the r18 empty-consumer
    // lesson, applied to the cursor)
    val man = spark.range(nConsumers).select(col("id").as("consumer"))
      .join(broadcast(cum.groupBy(col("consumer"))
        .agg(count(lit(1)).cast("bigint").as("n_seqs"),
          min(col("epoch_pos")).cast("bigint").as("_first"),
          sum(col(nToksCol)).cast("bigint").as("_ctoks"))),
        Seq("consumer"), "left")
      .select(col("consumer"),
        coalesce(col("n_seqs"), lit(0L)).as("n_seqs"),
        col("_first"),
        coalesce(col("_ctoks"), lit(0L)).as("_ctoks"))
    val wc = org.apache.spark.sql.expressions.Window
      .orderBy(col("consumer"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val manOff = man
      .withColumn("_off", coalesce(sum(col("_ctoks")).over(wc), lit(0L)))
    val req = skips.toDF("consumer", "skip_k")
      .join(broadcast(manOff), Seq("consumer"))
    // probe shape: the corpus-sized summed order is scanned ONCE with
    // the O(#skips) request table BROADCAST against it (an inner join
    // can build the tiny side; a left-outer here would force the
    // corpus through a join exchange just to carry the exhausted
    // requests) — exhausted requests are re-attached by a second,
    // O(#skips)-vs-O(#skips) left join
    val hits = cum.join(broadcast(req),
        cum("consumer") === req("consumer") &&
          col("epoch_pos") === col("_first") + col("skip_k"))
      .select(req("consumer"), col("skip_k"),
        col("epoch_pos").as("resume_pos"),
        col(groupCol).as("resume_grp"), col(binCol).as("resume_bin"),
        col(nToksCol).cast("long").as("resume_toks"), col("_gcum"))
    req.join(hits, Seq("consumer", "skip_k"), "left")
      .select(col("consumer"), col("skip_k"), col("n_seqs"),
        col("resume_pos"),
        col("resume_grp"), col("resume_bin"), col("resume_toks"),
        coalesce(col("_gcum") - col("resume_toks") - col("_off"),
          col("_ctoks")).as("skipped_toks"),
        greatest(lit(0L), col("n_seqs") - col("skip_k"))
          .as("remaining_seqs"),
        (col("_ctoks") - coalesce(
          col("_gcum") - col("resume_toks") - col("_off"),
          col("_ctoks"))).as("remaining_toks"))
  }
}
