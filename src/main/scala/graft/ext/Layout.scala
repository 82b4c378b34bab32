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
    *    engines (SQL-replayable, unlike a hashed-string or RNG key);
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
    val m = lit(2147483648L) // 2^31
    // sid packs (group index, bin) into one integer; collisions past
    // 2^20 bins per group only merge LCG keys, never break the total
    // order (the (group, bin) tiebreak below)
    val sid = col("_gi") * lit(1048576L) + col(binCol).cast("long")
    // reduce mod 2^31 BEFORE the multiply: the product then tops out
    // at 2^31·1103515245 < Long.MaxValue (the weightedSample bound)
    val pk = pmod(pmod(sid + lit(seed), m) * lit(1103515245L)
      + lit(12345L), m)
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
      .withColumn("consumer",
        expr(s"((epoch_pos - 1) * $nConsumers) div $total").cast("long"))
      .groupBy(col("consumer"))
      .agg(count(lit(1)).cast("bigint").as("n_seqs"),
        min(col("epoch_pos")).cast("bigint").as("first_pos"),
        max(col("epoch_pos")).cast("bigint").as("last_pos"),
        sum(col(nDocsCol)).cast("bigint").as("n_docs"),
        sum(col(nToksCol)).cast("bigint").as("n_toks"))
    spark.range(nConsumers).select(col("id").as("consumer"))
      .join(broadcast(filled), Seq("consumer"), "left")
      .select(col("consumer"),
        coalesce(col("n_seqs"), lit(0L)).as("n_seqs"),
        col("first_pos"), col("last_pos"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"))
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
      .withColumn("consumer",
        expr(s"((epoch_pos - 1) * $nConsumers) div $total").cast("long"))
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
      .withColumn("consumer",
        expr(s"((epoch_pos - 1) * $nConsumers) div $total").cast("long"))
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
