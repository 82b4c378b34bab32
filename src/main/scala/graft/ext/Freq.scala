package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-items (heavy-hitters) sketching: Misra–Gries counters as a
  * typed, MERGEABLE Aggregator (Agarwal et al., "Mergeable Summaries",
  * PODS'12 — combine then subtract the (k+1)-th largest count). Spark
  * runs it partial/final, so each map task ships ≤ k counters per
  * group regardless of input size — the vocabulary-scale alternative
  * to an exact token groupBy when only the head of the distribution
  * matters.
  *
  * Guarantee (what the driver query adjudicates): any term with true
  * frequency > n/(k+1) is IN the sketch, and its sketched count
  * under-estimates the true count by at most n/(k+1). The sketch
  * CONTENT beyond that is merge-order-dependent (like every MG
  * implementation), which is why the oracle checks the guarantee
  * against exact counts, not the raw counter map.
  */
object Freq {

  class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)

    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
        m.collect { case (t, c) if c - cut > 0 => t -> (c - cut) }
      }

    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      shrink(b + (a -> (b.getOrElse(a, 0L) + 1L)))
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
      shrink(b2.foldLeft(b1) { case (m, (t, c)) =>
        m + (t -> (m.getOrElse(t, 0L) + c))
      })
    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) as plain
    * dataframe aggregation: d hash rows × w buckets of integer sums.
    * Counter sums commute, so unlike MG the sketch CONTENT is
    * order-independent too; the cells live as (depth, bucket, cnt)
    * rows — O(d·w), mergeable across shards/batches by adding cells.
    *
    * Guarantee: est(t) = min over depths of t's cell ≥ true(t), and
    * ≤ true(t) + (e/w)·N with probability 1−e^−d per query — the
    * driver query adjudicates the deterministic two-sided bound for
    * every probed term.
    */
  def countMin(df: DataFrame, termCol: String, width: Int,
      depth: Int): DataFrame = {
    require(width > 0 && depth > 0)
    val cells = (0 until depth).map { d =>
      df.select(lit(d).as("depth"),
        pmod(xxhash64(col(termCol), lit(d)), lit(width.toLong)).as("bucket"))
    }.reduce(_ union _)
    cells.groupBy(col("depth"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate terms against a [[countMin]] sketch: min over
    * depths of the term's cell. Probe terms are broadcast-sized.
    */
  def cmEstimate(sketch: DataFrame, terms: DataFrame, termCol: String,
      width: Int, depth: Int): DataFrame = {
    val depths = terms.sparkSession.range(depth)
      .select(col("id").cast("int").as("depth"))
    val probes = terms.select(col(termCol).as("term"))
      .crossJoin(depths)
      .withColumn("bucket",
        pmod(xxhash64(col("term"), col("depth")), lit(width.toLong)))
    probes.join(sketch, Seq("depth", "bucket"))
      .groupBy(col("term"))
      .agg(min(col("cnt")).cast("bigint").as("cm_est"))
  }

  /** Sketch the heavy hitters of a string column: (term, mg_count). */
  def heavyHitters(df: DataFrame, termCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(termCol).cast("string")).as[String]
      .groupByKey(_ => 0)
      .agg(new MisraGriesAgg(k).toColumn.name("mg"))
      .flatMap { case (_, m) => m.toSeq }
      .toDF("term", "mg_count")
  }
}
