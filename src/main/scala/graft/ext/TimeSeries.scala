package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over event streams: calendar densification
  * (gap-fill/resample), autocorrelation, and CUSUM changepoint scores.
  *
  * These are the batch faces of the monitoring stack a training-data
  * pipeline runs over its ingest volumes (did a source's daily token
  * mass shift? is the dup rate autocorrelated with the crawl schedule?
  * when exactly did quality drift start?). The reference has no
  * time-series surface at all (it forwards raw rows to BigQuery);
  * these operators are part of the extension surface BASELINE.json's
  * north star requires.
  *
  * Determinism rules (driver hash is bit-sensitive):
  *   - daily measures are EXACT decimal sums ([[graft.queries.H]]
  *     conventions), so grouping/partitioning cannot reorder anything
  *     observable;
  *   - all recurrences are re-expressed as closed forms over prefix
  *     sums of decimals (exact, association-independent — safe even
  *     under DuckDB's segment-tree window aggregation, which adds in
  *     a different order than Spark's running accumulator);
  *   - final doubles are produced by the same expression tree on both
  *     engines from bit-identical decimal inputs.
  */
object TimeSeries {

  private def dec0(n: Column): Column = n.cast("decimal(10,0)")

  /** Exact per-group daily decimal sums, day as a yyyy-MM-dd string
    * (lexicographic == chronological, and the cross-engine-stable form
    * the rest of the query surface uses).
    */
  private def dailySum(df: DataFrame, groups: Seq[(String, Column)],
      ts: Column, value: Column): DataFrame =
    df.groupBy(groups.map { case (n, c) => c.as(n) } :+
        date_format(ts, "yyyy-MM-dd").as("day"): _*)
      .agg(sum(value.cast("decimal(10,2)")).cast("decimal(12,2)").as("x"))

  /** Calendar gap-fill (resample-to-daily + forward fill): densify each
    * group's series to every day in its observed [min, max] span, carry
    * the last observed value forward across gaps, and flag filled rows.
    * The first day of every span is observed by construction, so
    * `value_filled` is never null.
    *
    * Scale shape: one exact-decimal daily aggregate (map-side combine),
    * a per-group O(span-days) calendar explode — rows proportional to
    * the OUTPUT, nothing quadratic — and one running `last(ignoreNulls)`
    * window per group ordered by day. Group count × span bounds
    * everything; at 100 TB the windows range-partition by group exactly
    * like any per-key sort.
    */
  def gapFill(df: DataFrame, groups: Seq[(String, Column)], ts: Column,
      value: Column): DataFrame = {
    val gnames = groups.map(_._1)
    val daily = dailySum(df, groups, ts, value)
    val span = daily.groupBy(gnames.map(col): _*)
      .agg(min(to_date(col("day"))).as("d0"), max(to_date(col("day"))).as("d1"))
    val cal = span
      .select(gnames.map(col) :+
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("d"): _*)
      .select(gnames.map(col) :+ date_format(col("d"), "yyyy-MM-dd").as("day"): _*)
    val w = Window.partitionBy(gnames.map(col): _*).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, gnames :+ "day", "left")
      .select(gnames.map(col) :+ col("day") :+
        last(col("x"), ignoreNulls = true).over(w).cast("double")
          .as("value_filled") :+
        col("x").isNull.as("is_gap"): _*)
  }

  /** Sample autocorrelation function of per-group daily sums at lags
    * 1..maxLag, over the zero-filled calendar span (a missing day IS a
    * zero-volume day for an ingest series — densification is part of
    * the defined computation, not a convenience):
    *
    *   r_l = Σ_{t=l..n-1} (x_t − x̄)(x_{t−l} − x̄) / Σ_t (x_t − x̄)²
    *
    * with x̄ the full-series mean — the standard biased estimator
    * (Box & Jenkins; what statsmodels' `acf` computes). Expanded into
    * raw exact-decimal power sums (Σx_t·x_{t−l}, the two one-sided
    * partial sums, Σx, Σx²) so no float ever enters an aggregation;
    * the final assembly runs the same double expression tree on both
    * engines. Groups with zero variance have no defined ACF and are
    * excluded (den > 0).
    *
    * Scale shape: the lag join is an equi-join of the dense series
    * against itself shifted by an exploded 1..maxLag dimension —
    * O(n·maxLag) candidate rows, partitioned by group; never a window
    * holding the whole series, never quadratic in days.
    */
  def acf(df: DataFrame, group: Column, ts: Column, value: Column,
      maxLag: Int = 7): DataFrame = {
    val daily = dailySum(df, Seq("grp" -> group), ts, value)
    val span = daily.groupBy(col("grp"))
      .agg(min(to_date(col("day"))).as("d0"), max(to_date(col("day"))).as("d1"))
    val dense = span
      .select(col("grp"), col("d0"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
      .join(daily.withColumn("d", to_date(col("day"))).drop("day"),
        Seq("grp", "d"), "left")
      .select(col("grp"), datediff(col("d"), col("d0")).as("idx"),
        coalesce(col("x"), lit(0).cast("decimal(12,2)")).as("x"))
    val tot = dense.groupBy(col("grp")).agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(col("x")).cast("decimal(38,2)").as("s"),
      sum((col("x") * col("x")).cast("decimal(38,4)")).cast("decimal(38,4)")
        .as("ss"))
    val lags = df.sparkSession.range(1, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val shifted = dense.crossJoin(broadcast(lags))
      .select(col("grp"), (col("idx") + col("lag")).as("idx"), col("lag"),
        col("x").as("xb"))
    val pairs = dense.join(shifted, Seq("grp", "idx"))
      .groupBy(col("grp"), col("lag"))
      .agg(
        sum((col("x") * col("xb")).cast("decimal(38,4)"))
          .cast("decimal(38,4)").as("sxy"),
        sum(col("x")).cast("decimal(38,2)").as("sa"),
        sum(col("xb")).cast("decimal(38,2)").as("sb"),
        count(lit(1)).cast("bigint").as("m"))
    val xbar = col("s").cast("double") / col("n").cast("double")
    val num = col("sxy").cast("double") -
      xbar * col("sa").cast("double") - xbar * col("sb").cast("double") +
      col("m").cast("double") * xbar * xbar
    val den = col("ss").cast("double") -
      col("n").cast("double") * xbar * xbar
    pairs.join(tot, "grp")
      .filter(den > 0)
      .select(col("grp"), col("lag"), col("n"), (num / den).as("acf"))
  }

  /** Two-sided CUSUM changepoint scores (Page 1954) of per-group daily
    * sums against the group's own full-series mean, with slack `k` and
    * alarm threshold `h` in measure units:
    *
    *   S⁺_t = max(0, S⁺_{t−1} + x_t − μ − k)
    *   S⁻_t = max(0, S⁻_{t−1} − x_t + μ − k)      alarm ⇔ S⁺ or S⁻ > h
    *
    * The recurrence is NOT evaluated sequentially: one-sided CUSUM has
    * the exact closed form S⁺_t = P_t − min(0, min_{j≤t} P_j) over
    * prefix sums P of (x − μ − k), so both engines compute it with two
    * stacked windows (running sum, then running min/max) — order-safe
    * because μ is cleared of division by scaling everything by n
    * (Y_t = n·x_t − Σx − n·k stays an EXACT decimal; the /n happens
    * once, on the final already-exact statistic).
    *
    * Scale shape: per-group windows over O(days) rows; prefix sums
    * parallelize as range-partitioned sorts. Nothing holds more than a
    * group's own series.
    */
  def cusum(df: DataFrame, group: Column, ts: Column, value: Column,
      slack: BigDecimal, threshold: BigDecimal): DataFrame =
    cusumFromDaily(dailySum(df, Seq("grp" -> group), ts, value),
      slack, threshold)

  /** [[cusum]] over an already-aggregated exact-decimal daily series
    * (columns `grp`, `day`, `x: decimal(12,2)`) — the face
    * [[graft.streaming.CusumStream]] runs per micro-batch against
    * accumulated state.
    */
  def cusumFromDaily(daily: DataFrame, slack: BigDecimal,
      threshold: BigDecimal): DataFrame = {
    val tot = daily.groupBy(col("grp")).agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(col("x")).cast("decimal(20,2)").as("s"))
    val k = lit(slack.bigDecimal).cast("decimal(10,2)")
    val h = lit(threshold.bigDecimal).cast("decimal(10,2)")
    val xn = (col("x") * dec0(col("n"))).cast("decimal(20,2)")
    val nk = (dec0(col("n")) * k).cast("decimal(20,2)")
    val base = daily.join(tot, "grp").select(
      col("grp"), col("day"), col("n"),
      (xn - col("s") - nk).cast("decimal(30,2)").as("yv"),
      (xn - col("s") + nk).cast("decimal(30,2)").as("zv"),
      (dec0(col("n")) * h).cast("decimal(30,2)").as("nh"))
    val w = Window.partitionBy(col("grp")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zero = lit(BigDecimal(0).bigDecimal).cast("decimal(30,2)")
    val pq = base.select(col("grp"), col("day"), col("n"), col("nh"),
      sum(col("yv")).over(w).cast("decimal(30,2)").as("p"),
      sum(col("zv")).over(w).cast("decimal(30,2)").as("q"))
    val m = pq.select(col("grp"), col("day"), col("n"), col("nh"),
      col("p"), col("q"),
      least(zero, min(col("p")).over(w)).as("minp"),
      greatest(zero, max(col("q")).over(w)).as("maxq"))
    m.select(col("grp"), col("day"),
      ((col("p") - col("minp")).cast("double") / col("n").cast("double"))
        .as("cusum_pos"),
      ((col("maxq") - col("q")).cast("double") / col("n").cast("double"))
        .as("cusum_neg"),
      (col("p") - col("minp") > col("nh") ||
        col("maxq") - col("q") > col("nh")).as("alarm"))
  }
}
