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

  /** Seasonal-naive forecast backtest with MASE (Hyndman & Koehler
    * 2006): per group, the season-m naive forecast `x̂_t = x_{t−m}` is
    * scored against the one-step naive baseline —
    *
    *   MASE = mean|x_t − x_{t−m}| / mean|x_t − x_{t−1}|
    *
    * over the zero-filled calendar ([[acf]]'s densification). MASE < 1
    * means the weekly pattern genuinely predicts the series (worth a
    * seasonal model); ≈ 1 means it adds nothing over persistence —
    * the cheap "is this ingest volume seasonal?" gate run before any
    * forecasting investment. Absolute errors stay EXACT decimals
    * (|x_t − x_{t−k}| of exact operands); only the two final mean
    * divisions and their ratio are doubles — identical expressions
    * both engines.
    *
    * Scale shape: two lag equi-joins on the dense per-group index and
    * one aggregate — O(days) per group.
    */
  def seasonalNaiveBacktest(df: DataFrame, group: Column, ts: Column,
      value: Column, season: Int = 7): DataFrame = {
    val daily = dailySum(df, Seq("grp" -> group), ts, value)
    val span = daily.groupBy(col("grp"))
      .agg(min(to_date(col("day"))).as("d0"), max(to_date(col("day"))).as("d1"))
    val dense = span
      .select(col("grp"), col("d0"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
      .join(daily.withColumn("d", to_date(col("day"))).drop("day"),
        Seq("grp", "d"), "left")
      .select(col("grp"), datediff(col("d"), col("d0")).as("i"),
        coalesce(col("x"), lit(0).cast("decimal(12,2)")).as("x"))
    def lagged(k: Int, out: String): DataFrame = dense
      .select(col("grp"), (col("i") + k).as("i"), col("x").as(out))
    dense
      .join(lagged(season, "xs"), Seq("grp", "i"), "left")
      .join(lagged(1, "x1"), Seq("grp", "i"), "left")
      .groupBy(col("grp"))
      .agg(
        count(col("xs")).cast("bigint").as("n_eval"),
        sum(abs(col("x") - col("xs"))).cast("decimal(38,2)").as("se"),
        count(col("x1")).cast("bigint").as("n1"),
        sum(abs(col("x") - col("x1"))).cast("decimal(38,2)").as("s1"))
      .filter(col("n_eval") > 0 && col("s1") > 0)
      .select(col("grp"), col("n_eval"),
        (col("se").cast("double") / col("n_eval").cast("double"))
          .as("mae_seasonal"),
        (col("s1").cast("double") / col("n1").cast("double"))
          .as("mae_naive"),
        ((col("se").cast("double") / col("n_eval").cast("double")) /
          (col("s1").cast("double") / col("n1").cast("double")))
          .as("mase"))
  }

  /** Mann–Kendall trend test + Theil–Sen slope of per-group daily
    * sums — the robust monotone-trend detector (is this source's
    * volume/quality drifting?) that complements [[cusum]]'s abrupt-
    * shift detection. Over the time-ordered series x_0..x_{n−1}:
    *
    *   S   = Σ_{i<j} sign(x_j − x_i)                (exact integer)
    *   Var = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18   (tie-corrected)
    *   z   = (S ∓ 1) / √Var  (continuity-corrected, 0 when S = 0)
    *   Theil–Sen = median over all pairwise slopes (x_j−x_i)/(j−i)
    *
    * Everything before the final doubles is integer/decimal-exact:
    * signs and tie counts are integers, each slope is one double
    * division of exact operands, and the median picks (or averages)
    * order statistics — so the whole test adjudicates bit-for-bit.
    *
    * Scale shape: the pair join is per-group O(days²) — bounded by
    * SERIES LENGTH, never corpus size (30 days → 435 pairs; cap the
    * monitored window at cluster scale). One join, two aggregates,
    * one slope-rank window. The pair fan-out (Σ n_g(n_g−1)/2 rows) is
    * measured up front from the tiny per-group day counts, and the
    * pair stages are repartitioned to `≈ pairs / maxPairsPerTask`
    * tasks — the ScaleBench sizing rule (≈2–3M pair rows per task)
    * moved INTO the operator, so a 10k-group × 365-day panel sorts
    * 664M slope rows across ~221 tasks instead of OOMing the default
    * partition count.
    */
  def trendTest(df: DataFrame, group: Column, ts: Column,
      value: Column, maxPairsPerTask: Long = 3000000L): DataFrame = {
    require(maxPairsPerTask > 0, "maxPairsPerTask must be positive")
    val daily = dailySum(df, Seq("grp" -> group), ts, value)
    // O(groups) aggregate, ONE scalar to the driver — the same bounded
    // collect class as the range-partition counts in Rank.globalRank
    val totalPairs = daily.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2"))).head().get(0) match {
        case null => 0L
        case v: Long => v
      }
    val spark = df.sparkSession
    val parts = math.max(
      spark.sessionState.conf.numShufflePartitions,
      (totalPairs / maxPairsPerTask).toInt + 1)
    val idx = Window.partitionBy(col("grp")).orderBy(col("day"))
    val series = daily.select(col("grp"),
      (row_number().over(idx) - 1).cast("bigint").as("i"), col("x"))
    val pairs = series.as("a")
      .join(series.as("b"),
        col("a.grp") === col("b.grp") && col("a.i") < col("b.i"))
      .select(col("a.grp").as("grp"),
        signum((col("b.x") - col("a.x")).cast("double")).cast("bigint")
          .as("sgn"),
        ((col("b.x") - col("a.x")).cast("double") /
          (col("b.i") - col("a.i")).cast("double")).as("slope"))
      // hash-partition the exploded pairs by grp at the pair-sized
      // task count: the slope-rank window requires exactly this
      // distribution, so it reuses the exchange instead of re-sorting
      // an under-partitioned one
      .repartition(parts, col("grp"))
    val sAgg = pairs.groupBy(col("grp")).agg(
      sum(col("sgn")).cast("bigint").as("s_stat"),
      count(lit(1)).cast("bigint").as("npairs"))
    val n = daily.groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n"))
    val ties = daily.groupBy(col("grp"), col("x"))
      .agg(count(lit(1)).cast("bigint").as("t"))
      .filter(col("t") > 1)
      .groupBy(col("grp"))
      // r10 decimal-width audit: t ≤ days-per-group (calendar-bounded
      // ~10⁵ even for 300-year series), so 2t³ ≤ 2·10¹⁵ « 2⁶³ — the
      // BIGINT ride is safe by the same bound that keeps varS's
      // n(n−1)(2n+5) ≤ ~10¹⁶ exact in the double below
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
        .cast("bigint").as("tie_term"))
    val wSlope = Window.partitionBy(col("grp")).orderBy(col("slope"))
    val ranked = pairs
      .withColumn("rk", row_number().over(wSlope).cast("bigint"))
    // median = the ⌈m/2⌉-th and ⌊m/2⌋+1-th order stats averaged (equal
    // for odd m; both sides compute the identical (a+b)/2 double)
    val sen = ranked.join(sAgg.select(col("grp"), col("npairs")), "grp")
      // div, not /: Spark's / on bigints is double division
      .filter(expr("rk = (npairs + 1) div 2 OR rk = npairs div 2 + 1"))
      .groupBy(col("grp"))
      .agg(((min(col("slope")) + max(col("slope"))) / lit(2.0))
        .as("sen_slope"))
    val varS = (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
      coalesce(col("tie_term"), lit(0L))).cast("double") / lit(18.0)
    sAgg.join(n, "grp").join(ties, Seq("grp"), "left").join(sen, "grp")
      .select(col("grp"), col("n"), col("s_stat"),
        varS.as("var_s"),
        when(col("s_stat") > 0,
            (col("s_stat") - 1).cast("double") / sqrt(varS))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1).cast("double") / sqrt(varS))
          .otherwise(lit(0.0)).as("z"),
        col("sen_slope"))
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
    // widths sized for the 100 TB target, not the test SF: x is
    // decimal(12,2) (10 integer digits) and n can reach 10 digits, so
    // x·n needs 20+ integer digits — the old decimal(20,2) casts (18
    // integer digits) would NULL silently under non-ANSI Spark on
    // long/high-volume series, zeroing the statistic. All values are
    // exact decimals, so widening is value-preserving (the oracle
    // widens in lockstep).
    val tot = daily.groupBy(col("grp")).agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(col("x")).cast("decimal(30,2)").as("s"))
    val k = lit(slack.bigDecimal).cast("decimal(10,2)")
    val h = lit(threshold.bigDecimal).cast("decimal(10,2)")
    val xn = (col("x") * dec0(col("n"))).cast("decimal(32,2)")
    val nk = (dec0(col("n")) * k).cast("decimal(30,2)")
    val base = daily.join(tot, "grp").select(
      col("grp"), col("day"), col("n"),
      (xn - col("s") - nk).cast("decimal(38,2)").as("yv"),
      (xn - col("s") + nk).cast("decimal(38,2)").as("zv"),
      (dec0(col("n")) * h).cast("decimal(30,2)").as("nh"))
    val w = Window.partitionBy(col("grp")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zero = lit(BigDecimal(0).bigDecimal).cast("decimal(38,2)")
    val pq = base.select(col("grp"), col("day"), col("n"), col("nh"),
      sum(col("yv")).over(w).cast("decimal(38,2)").as("p"),
      sum(col("zv")).over(w).cast("decimal(38,2)").as("q"))
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
