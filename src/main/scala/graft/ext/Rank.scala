package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe global order statistics.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY is the
  * canonical 100 TB trap: Spark (and every MPP engine) must funnel the
  * entire input through ONE partition to number it — WindowExec even
  * logs a warning when it sees an empty partition spec. But a global
  * rank doesn't need a global funnel: after a RANGE partitioning on the
  * order key, every row's global rank = (rows in earlier partitions) +
  * (its rank within its own partition). Both terms are cheap: the
  * per-partition counts are P numbers collected to the driver, and the
  * within-partition rank is a narrow per-partition scan of data that
  * the range exchange already sorted.
  *
  * This is the distributed zipWithIndex pattern (Spark's own
  * `RDD.zipWithIndex` works exactly this way): one range shuffle + one
  * tiny count job + one narrow map job. The count and numbering jobs
  * run over the SAME shuffled RDD, so the exchange is executed once and
  * its map output reused — confirmed by the two jobs sharing a shuffle
  * id in the Spark UI/event log.
  *
  * The RDD hop is deliberate: per-partition sequential numbering is
  * genuine imperative per-partition logic (SURVEY.md §7.3's narrow
  * exception). A pure-DataFrame alternative — window over
  * `spark_partition_id()` — adds a second full shuffle (hash on pid)
  * for nothing.
  *
  * Output rank is deterministic iff `order` is a total order (callers
  * must include a tiebreaker, same as any rank-stability contract);
  * range-boundary sampling randomness only moves partition BOUNDARIES,
  * never the global order, so the assigned numbers are identical for
  * any boundary outcome.
  */
object Rank {

  /** Append a 1-based global row number `out` ordered by `order`
    * (which must be a total order for deterministic output).
    *
    * `numParts` defaults to the session's shuffle parallelism; at
    * cluster scale set it so each range partition fits in executor
    * memory (the per-partition state here is O(1) — only the running
    * counter — so the real bound is the sort's spill behavior).
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      out: String = "rn", numParts: Int = 0): DataFrame =
    globalRowNumberWithTotal(df, order, out, numParts)._1

  /** [[globalRowNumber]] plus the TOTAL row count, which job 1's
    * per-partition counts already computed — callers that need N for
    * a cut (e.g. quantile/bucket boundaries) get it for free instead
    * of paying a separate pass over the (possibly expensive) input
    * plan.
    */
  def globalRowNumberWithTotal(df: DataFrame, order: Seq[Column],
      out: String = "rn", numParts: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)

    // one RDD instance for both jobs → the range exchange's map output
    // is computed once and reused by the second job
    val rows = parted.rdd

    // job 1: per-partition counts — P longs to the driver, nothing else
    val counts = rows.mapPartitionsWithIndex { (i, it) =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator((i, n))
    }.collect().sortBy(_._1)

    // exclusive prefix sum: offset(i) = rows in partitions < i
    val offsets = new Array[Long](counts.length + 1)
    counts.foreach { case (i, n) => offsets(i + 1) = n }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    val bc = spark.sparkContext.broadcast(offsets)

    // job 2: narrow numbering pass (shuffle output reused)
    val schema = df.schema.add(out, LongType, nullable = false)
    val numbered = rows.mapPartitionsWithIndex { (pi, it) =>
      var rn = bc.value(pi)
      it.map { r => rn += 1; Row.fromSeq(r.toSeq :+ rn) }
    }
    (spark.createDataFrame(numbered, schema), offsets.last)
  }

  /** Global INCLUSIVE running sum of a long column in `order` — the
    * distributed prefix sum: `SUM(v) OVER (ORDER BY …)` with no
    * PARTITION BY is the same 100 TB trap as the global row_number
    * (one partition swallows the corpus), and the same range-partition
    * fix applies — after a range exchange on the order key, a row's
    * prefix sum = (sum of earlier partitions) + (its running sum
    * within its own partition). Job 1 collects P partial sums to the
    * driver; job 2 is a narrow accumulation pass over the SAME
    * shuffled RDD (exchange executed once, the [[globalRowNumber]]
    * machinery with SUM offsets instead of COUNT offsets).
    *
    * `order` must be a total order for deterministic output; `value`
    * must be a non-null long (nulls would make "inclusive prefix"
    * engine-convention-dependent) — a NULL value FAILS LOUDLY instead
    * of silently folding as 0 (JVM unboxing of a null Long is 0L, so
    * without the guard a null would corrupt every later prefix).
    */
  def globalRunningSum(df: DataFrame, order: Seq[Column],
      value: Column, out: String = "cum", numParts: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val withV = df.withColumn("_grs_v",
      when(value.isNull, raise_error(lit(
        "globalRunningSum: NULL value column — coalesce upstream")))
        .otherwise(value.cast("long")))
    val parted = withV.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
    val rows = parted.rdd
    val vIdx = parted.schema.fieldIndex("_grs_v")
    // job 1: per-partition sums — P longs to the driver
    val sums = rows.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      while (it.hasNext) s += it.next().getLong(vIdx)
      Iterator((i, s))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](sums.length + 1)
    sums.foreach { case (i, s) => offsets(i + 1) = s }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    val bc = spark.sparkContext.broadcast(offsets)
    // job 2: narrow accumulation (shuffle output reused)
    val schema = withV.schema.add(out, LongType, nullable = false)
    val summed = rows.mapPartitionsWithIndex { (pi, it) =>
      var acc = bc.value(pi)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(summed, schema).drop(col("_grs_v"))
  }

  /** Typed bounded top-k Aggregator: per group, keep only the k
    * largest (value, id) pairs in the aggregation buffer. The scale
    * point vs `row_number() OVER (PARTITION BY g ORDER BY v)`: the
    * window shuffles EVERY row of every group and sorts them; this is
    * a real Aggregator, so Spark runs it partial/final — each map task
    * reduces its slice of a group to ≤ k pairs and the exchange ships
    * only those. For a 10^6-row group and k=3, the shuffle carries 3
    * pairs per map task instead of 10^6 rows. Determinism: ordering is
    * (value, then id descending-value/ascending-id), so ties cannot
    * reorder under partitioning.
    */
  class TopKAgg(k: Int) extends org.apache.spark.sql.expressions.Aggregator[
      (Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }
    private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.sorted(ord).take(k)
    def zero: Seq[(Double, Long)] = Seq.empty
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ a)
    def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(b1 ++ b2)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Grouped top-k via [[TopKAgg]]: returns (group, rank, id, value)
    * rows, rank 1-based in (value desc, id asc) order.
    */
  def groupedTopK(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    df.select(col(groupCol).cast("long"), col(valCol).cast("double"),
        col(idCol).cast("long"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, v, id) => (v, id) }
      .agg(agg.name("top"))
      .toDF("grp", "top")
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).cast("int").as("rank"),
        col("col._2").as("id"), col("col._1").as("value"))
  }

  /** Reciprocal rank fusion (Cormack, Clarke & Buettcher SIGIR'09):
    * combine several (id, rank) result lists into one ranking by
    * `RRF(id) = Σ_lists 1/(k + rank)` — the standard hybrid-retrieval
    * merge (BM25 ⊕ dense-vector lists) that needs no score
    * calibration between the systems. Each term is a division of
    * exact integers (bit-identical everywhere); terms are
    * decimal-rounded and summed exactly, so fused scores — and
    * therefore the fused ORDER — adjudicate exactly.
    *
    * Scale shape: a union of the (tiny) top-k lists and one groupBy
    * on the id — nothing touches the corpora themselves.
    */
  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98): from each anchor's candidate pool, greedily pick k
    * items maximizing `λ·rel − (1−λ)·max_{s∈S} sim(c, s)` — the
    * standard diversity-aware re-rank that keeps a RAG context window
    * (or a training batch) from filling with near-duplicates of the
    * top hit. Relevance and similarity are both exact-replay cosines;
    * the greedy recurrence is unrolled as k plan rounds (the
    * Lloyd-rounds/water-fill move), each an equi-join on the anchor id
    * + a groupBy max + an argmax window tie-broken by item id — so the
    * whole selection is SQL-replayable CTE by CTE. Round 1 scores
    * λ·rel (max-sim over the empty set is 0); `(1 − λ)` is computed,
    * not precomputed, so both engines derive the identical double.
    *
    * Scale shape: pools are top-`pool` shortlists (from ANN/BM25 —
    * here brute-force cosine for the exactness anchor), so every round
    * joins O(#anchors · pool) rows against O(#anchors · round)
    * selections — the corpus itself is touched once, to build pools.
    * k and pool are small constants; nothing grows with corpus size.
    */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
      nAnchors: Int, pool: Int, k: Int, lambda: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.ext.Similarity.dot
    graft.plans.GraftExtensions.ensure(emb.sparkSession)
    val e = emb.select(col(idCol).cast("bigint").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val anchors = e.filter(col("id") < nAnchors)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wPool = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("id"))
    val cands = e.join(broadcast(anchors), col("id") =!= col("qid"))
      .withColumn("rel", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rk", row_number().over(wPool))
      .filter(col("rk") <= pool)
      .select(col("qid"), col("id"), col("v"), col("nrm"), col("rel"))
    val lam = lit(lambda)
    val wPick = Window.partitionBy(col("qid"))
      .orderBy(col("mmr").desc, col("id"))
    var selected = cands
      .withColumn("mmr", lam * col("rel") - (lit(1.0) - lam) * lit(0.0))
      .withColumn("pk", row_number().over(wPick))
      .filter(col("pk") === 1)
      .select(col("qid"), col("id"), col("v"), col("nrm"), col("rel"),
        col("mmr"), lit(1).as("pick_rank"))
    for (round <- 2 to k) {
      val sel = selected.select(col("qid"), col("id").as("sid"),
        col("v").as("sv"), col("nrm").as("sn"))
      val scored = cands
        .join(sel, Seq("qid"))
        .filter(col("id") =!= col("sid"))
        .groupBy(col("qid"), col("id"))
        .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"),
          first(col("rel")).as("rel"),
          max(dot(col("v"), col("sv")) / (col("nrm") * col("sn")))
            .as("maxsim"),
          count(lit(1)).as("nsel"))
        .filter(col("nsel") === round - 1) // drop already-picked items
        .withColumn("mmr", lam * col("rel") - (lit(1.0) - lam) * col("maxsim"))
      val pick = scored
        .withColumn("pk", row_number().over(wPick))
        .filter(col("pk") === 1)
        .select(col("qid"), col("id"), col("v"), col("nrm"), col("rel"),
          col("mmr"), lit(round).as("pick_rank"))
      selected = selected.unionByName(pick)
    }
    selected.select(col("qid"), col("pick_rank"), col("id"), col("rel"),
      col("mmr").as("mmr_score"))
  }

  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int = 60): DataFrame = {
    import org.apache.spark.sql.functions._
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings.map(df =>
      df.select(col(idCol).as("id"), col(rankCol).cast("long").as("r")))
    val term = (lit(1.0) / (lit(k.toDouble) + col("r").cast("double")))
      .cast("decimal(30,14)")
    tagged.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("bigint").as("n_lists"),
        sum(term).as("s"))
      .select(col("id"), col("n_lists"),
        col("s").cast("double").as("rrf_score"))
  }
}
