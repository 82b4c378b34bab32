package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical audits over model scores and curated corpora: ROC-AUC
  * for filter-model evaluation, Spearman rank correlation between
  * quality signals, Gini concentration, rolling integer-exact anomaly
  * detection, and a k-anonymity privacy audit. The reference delegates
  * all analytics to its warehouse (SURVEY.md §2.7); these are the
  * model-eval / dataset-audit operators a training-data pipeline runs
  * on top of that stack, expressed Spark-first.
  *
  * Determinism: every operator below reduces to integer (or exact
  * decimal) aggregates with a single final double division — the
  * [[graft.queries.H]] recipe — so each is adjudicated hash-exactly by
  * the DuckDB oracle. In particular the rank-based operators avoid
  * per-row global windows: ranks are derived from cumulative counts
  * over *distinct values*, which is both the scale-correct shape
  * (the window state is O(#distinct), not O(#rows)) and trivially
  * tie-stable.
  */
object Stats {

  /** Tie-corrected ROC-AUC (Mann–Whitney U) of a score column against
    * a boolean label. Ranks ascend with the score; tied scores take
    * the average rank, tracked as the *doubled* rank `2·avg = 2·cum −
    * c + 1` so everything stays in BIGINT until the one final
    * division: `AUC = (Σ 2R⁺ − P(P+1)) / (2·P·N)`.
    *
    * Scale shape: one groupBy on the score value (map-side
    * combinable), then a cumulative window over *distinct scores* —
    * for calibrated model scores that domain is bounded (and can be
    * bucketized first if it ever is not), so the single-partition
    * window holds O(#distinct) rows, not O(#rows).
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val base = df.select(score.cast("double").as("s"),
      when(label, 1L).otherwise(0L).as("y"))
    val byScore = base.groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val cum = byScore.withColumn("cumc",
      sum(col("c")).over(Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // min rank of the tie group = cumc − c + 1, so
    // 2·avgrank = 2(cumc − c + 1) + (c − 1) = 2·cumc − c + 1
    // rank-sum products ride DECIMAL, not BIGINT: p·(2·cumc−c+1) and
    // pos·(pos+1) are O(n²) and wrap silently past n ≈ 2·10⁹ rows
    // under non-ANSI Spark while the DuckDB oracle stays exact — the
    // decimal ride is exact to 10³⁸ and nulls detectably beyond
    // (r10 decimal-width-audit convention)
    def d19(c: Column) = c.cast("decimal(19,0)")
    val sums = cum
      .select((d19(col("p")) * d19(lit(2) * col("cumc") - col("c") + 1))
          .cast("decimal(38,0)").as("r2"),
        col("p"), col("c"))
      .agg(sum(col("r2")).cast("decimal(38,0)").as("sum2r"),
        sum(col("p")).as("pos"), sum(col("c")).as("n"))
    sums.select(
      col("pos").cast("bigint").as("n_pos"),
      (col("n") - col("pos")).cast("bigint").as("n_neg"),
      ((col("sum2r") -
          (d19(col("pos")) * d19(col("pos") + 1)).cast("decimal(38,0)"))
        .cast("double") /
        (lit(2).cast("double") * col("pos").cast("double") *
          (col("n") - col("pos")).cast("double"))).as("auc"))
  }

  /** Spearman rank correlation between two numeric columns, with
    * proper average-rank tie handling. Works on centered doubled
    * ranks: `c = 2·avgrank − (n+1)` is an integer in [−n, n] with an
    * exactly-zero mean, so `ρ = Σcₓc_y / (√Σcₓ² · √Σc_y²)` needs no
    * n·Σ − Σ² cross terms and every sum fits BIGINT up to n ≈ 2M rows
    * (beyond that, swap the three sums to DECIMAL(38,0)).
    *
    * Scale shape: two distinct-value rank maps (each a groupBy plus a
    * cumulative window over distinct values) joined back onto the
    * rows — the maps broadcast whenever the domains are bounded.
    */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    // rank on the NATIVE double value — a long cast here would silently
    // truncate fractional inputs (scores in [0,1]) into collapsed ties;
    // only the ranks (exact integers) enter the sums, so fractional
    // keys cost nothing in determinism
    val base = df.select(x.cast("double").as("x"), y.cast("double").as("y"))
    def rankMap(c: String): DataFrame = {
      val g = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      g.withColumn("cumc", sum(col("cnt")).over(Window.orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col(c), (lit(2) * col("cumc") - col("cnt") + 1).as(s"r2$c"))
    }
    val n1 = base.agg((count(lit(1)) + 1).as("np1"))
    val ranked = base.join(rankMap("x"), "x").join(rankMap("y"), "y")
      .crossJoin(n1)
      .select((col("r2x") - col("np1")).as("cx"),
        (col("r2y") - col("np1")).as("cy"))
    // r10 decimal-width audit: cx·cy ≤ 4n² summed over n rows is
    // ~4n³ — a silent BIGINT wrap from n ≈ 1.3·10⁶ rows(!). The
    // centered-rank power sums ride DECIMAL(19,0)→(38,0) exact
    // (safe to n ≈ 10¹¹); only the final ratio drops to double.
    ranked
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("cx").cast("decimal(19,0)") * col("cy").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("sxy"),
        sum(col("cx").cast("decimal(19,0)") * col("cx").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("sxx"),
        sum(col("cy").cast("decimal(19,0)") * col("cy").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("syy"))
      .select(col("n"),
        (col("sxy").cast("double") /
          (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double"))))
          .as("spearman_rho"))
  }

  /** Gini coefficient of a non-negative decimal measure (revenue
    * concentration, token-count concentration): with values sorted
    * ascending and 1-based index i, `G = (2·Σ i·xᵢ − (n+1)·Σx) /
    * (n·Σx)`. Σ i·xᵢ is permutation-invariant within tied values, so
    * the index tie-break only pins determinism, never the value. All
    * arithmetic is exact decimal until the single final division.
    *
    * Scale shape: one aggregate per entity, then a global index over
    * the *entities* (O(#groups), not O(#rows)); at extreme entity
    * cardinality the drop-in replacement is a bucketed Lorenz curve
    * over equi-depth bins ([[Bins.equiDepth]]).
    *
    * r10 decimal-width audit: no silent BIGINT product here — Σ i·xᵢ
    * rides DECIMAL(25,2) (bound ~10²³: i ≤ 10⁹ entities × per-entity
    * sums ≤ 10¹⁴), and past that bound decimal overflow fails LOUDLY
    * on both engines rather than wrapping; widths stay ≤ 38 so the
    * DuckDB width-additive multiplies replay.
    */
  def gini(df: DataFrame, entity: Column, measure: Column): DataFrame = {
    val per = df.groupBy(entity.as("e"))
      .agg(sum(measure.cast("decimal(18,2)")).as("v"))
    val idx = per.withColumn("i",
      row_number().over(Window.orderBy(col("v"), col("e"))))
    // decimal widths are chosen so DuckDB's width-additive decimal
    // multiplies stay under its precision-38 ceiling: t,w ≤ 10^23 in
    // DECIMAL(25,2); the int factors ride in DECIMAL(10,0)
    idx
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("v")).cast("decimal(25,2)").as("t"),
        sum(col("i") * col("v")).cast("decimal(25,2)").as("w"))
      .select(col("n"),
        col("t").cast("double").as("total"),
        ((lit(2).cast("decimal(10,0)") * col("w") -
          (col("n") + 1).cast("decimal(10,0)") * col("t"))
          .cast("decimal(38,2)").cast("double") /
          (col("n").cast("decimal(10,0)") * col("t"))
            .cast("decimal(38,2)").cast("double")).as("gini"))
  }

  /** Rolling anomaly detection over per-group daily counts, exact in
    * integers: a day is anomalous when its count x deviates from the
    * trailing `win`-day mean by more than k standard deviations —
    * tested as `(n·x − S)² > k²·(n·Q − S²)` with S = Σcount and
    * Q = Σcount² over the trailing window, which clears both
    * denominators so no float (or sqrt) ever enters the decision.
    * Days with an incomplete trailing window are never flagged.
    *
    * "Trailing window" means the `win` most recent OBSERVED days for
    * the group, not `win` calendar days: a group with gaps compares
    * against its last `win` active days (zero-count days don't exist
    * as rows). For strict calendar semantics, densify days upstream or
    * switch the window to rangeBetween on a day ordinal.
    *
    * Scale shape: the raw events collapse to one row per (group, day)
    * first (map-side combinable), so the per-group window walks days,
    * not events.
    */
  def rollingAnomalies(df: DataFrame, group: Column, ts: Column,
      win: Int = 7, k: Int = 3): DataFrame =
    rollingAnomaliesFromDaily(df
      .groupBy(group.as("grp"), date_format(ts, "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt")), win, k)

  /** The decision rule of [[rollingAnomalies]] over pre-aggregated
    * (grp, day, cnt) rows — shared with the streaming twin
    * (`streaming/AnomalyStream`), which maintains the daily counts as
    * incremental state.
    */
  def rollingAnomaliesFromDaily(daily: DataFrame, win: Int,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("day"))
      .rowsBetween(-win, -1)
    // r10 decimal-width audit: at 10⁹-events/day groups, cnt² and the
    // cleared-denominator decision terms (n·x − S)² / n·Q − S² reach
    // ~5·10¹⁹ > 2⁶³ — a silent BIGINT wrap that FLIPS anomaly
    // decisions. Both the windowed power sum and the decision ride
    // DECIMAL(19,0)→(38,0) exact; displayed cnt/n_win/s_win keep
    // their BIGINT contract (additive, safe).
    def d19(c: Column) = c.cast("decimal(19,0)")
    val devN = (d19(col("n_win")) * d19(col("cnt")) -
      col("s_win").cast("decimal(38,0)"))
    daily
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("s_win", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("q_win", coalesce(sum(d19(col("cnt")) * d19(col("cnt")))
        .over(w).cast("decimal(38,0)"), lit(0L).cast("decimal(38,0)")))
      .select(col("grp"), col("day"), col("cnt").cast("bigint").as("cnt"),
        col("n_win").cast("bigint").as("n_win"),
        col("s_win").cast("bigint").as("s_win"),
        (col("n_win") === win &&
          devN * devN >
            lit(k.toLong * k).cast("decimal(19,0)") *
              (d19(col("n_win")) * col("q_win") -
                col("s_win").cast("decimal(38,0)") *
                  col("s_win").cast("decimal(38,0)"))).as("anomaly"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `valA` and
    * `valB` distributions: `D = max |F_A(v) − F_B(v)|` over the union
    * of observed values, computed denominator-cleared as
    * `max |cumA·nB − cumB·nA| / (nA·nB)` — the max runs over BIGINTs,
    * so the drift decision never touches a float until the one final
    * division. The distribution-shift / A-B-test primitive.
    *
    * Scale shape: each sample collapses to per-distinct-value counts
    * first (map-side combinable); the cumulative window then walks
    * O(#distinct values), not O(#rows), exactly like [[rocAuc]].
    */
  def ksTest(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    def counts(df: DataFrame, name: String) =
      df.select(value.cast("double").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as(name))
    val merged = counts(a, "ca").join(counts(b, "cb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val tot = merged.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    // cum·n cross-products ride DECIMAL (silent BIGINT wrap past
    // na·nb ≈ 2⁶³ — a few 10⁹ rows per side) and the final denominator
    // multiplies doubles, both mirrored in the oracle's hugeint ride
    def dk(c: Column) = c.cast("decimal(19,0)")
    cum.crossJoin(tot)
      .select(abs((dk(col("cuma")) * dk(col("nb"))).cast("decimal(38,0)") -
          (dk(col("cumb")) * dk(col("na"))).cast("decimal(38,0)")).as("d"),
        col("na"), col("nb"))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("d")).as("dnum"))
      .select(col("na").cast("bigint").as("n_a"),
        col("nb").cast("bigint").as("n_b"),
        (col("dnum").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")))
          .as("ks_d"))
  }

  /** Reliability-diagram bins for a score against a boolean outcome:
    * fixed-width score buckets with observed positive rate and exact
    * decimal mean score per bin — read next to [[rocAuc]], this is the
    * calibration half of filter-model evaluation. Counts are integers,
    * the mean and rate are single divisions of exact operands.
    *
    * Scale shape: one map-side-combinable groupBy on the bucket index;
    * O(#bins) rows out.
    */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      binWidth: Double, nBins: Int): DataFrame = {
    val bin = least(floor(score.cast("double") / binWidth),
      lit(nBins - 1L)).cast("bigint")
    df.select(bin.as("bin"), score.cast("double").as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("y")).cast("bigint").as("n_pos"),
        graft.queries.H.sum38(graft.queries.H.dec2(col("s")), 2, "sum_score"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("sum_score") / col("n").cast("double")).as("mean_score"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"))
  }

  /** Pearson χ² independence audit between two categorical columns:
    * one row per observed cell with its expected count `r·c/N` and χ²
    * term `(O−E)²/E` — the [[Robust.benfordAudit]] recipe generalized
    * from a fixed reference distribution to the product of the
    * marginals. Terms are double arithmetic on identical integer
    * operands, canonicalized once through DECIMAL(20,12).
    *
    * Scale shape: one cell-count groupBy; the marginals are O(|X|) and
    * O(|Y|) aggregates broadcast back onto the cells.
    */
  def chi2Independence(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.groupBy(x.as("x"), y.as("y"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("x")).agg(sum(col("o")).as("r"))
    val cols = cells.groupBy(col("y")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"))
    val e = (col("r") * col("c")).cast("double") / col("n").cast("double")
    val dev = col("o").cast("double") - e
    cells.join(rows, "x").join(cols, "y").crossJoin(n)
      .select(col("x"), col("y"), col("o").cast("bigint").as("n_obs"),
        e.cast("decimal(20,12)").cast("double").as("expected"),
        (dev * dev / e).cast("decimal(20,12)").cast("double").as("chi2_term"))
  }

  /** Mutual information (nats) between two categorical columns:
    * `MI = Σ (n_ij/N)·ln(n_ij·N / (r_i·c_j))` with every logarithm
    * taken of an exact integer product (≤ N³, exact in a double up to
    * N ≈ 200k per side) and canonicalized through DECIMAL(20,12); the
    * weighted sum runs in DECIMAL(30,14). The feature-redundancy audit
    * for categorical metadata columns.
    *
    * Scale shape: identical to [[chi2Independence]] — cell counts plus
    * broadcast marginals, one final one-row aggregate.
    */
  /** Cross-group quantile normalization: re-express every row's value
    * as the POOLED distribution's value at the row's within-group
    * quantile — the mixture-prep primitive that aligns per-source
    * score scales before sampling weights are computed from them (a
    * "0.8" from a lenient scorer and a "0.5" from a strict one land on
    * comparable pooled values).
    *
    * Mapping is pure integer arithmetic on ranks: a row at
    * within-group rank r of n (ties broken by the id for a total
    * order) maps to pooled rank `(r−1)·(N−1) div (n−1) + 1`
    * (endpoints meet exactly: rank 1 → pooled min, rank n → pooled
    * max). The pooled rank comes from [[Rank.globalRowNumber]] — the
    * range-partitioned distributed numbering, NOT a single-partition
    * window — and the normalized value is the pooled value at that
    * rank, fetched by an 8-byte equi-join. Exact end to end: decimal
    * values, integer ranks.
    *
    * Groups with n = 1 carry no distribution and map to the pooled
    * median rank `(N+1) div 2`.
    *
    * Scale shape: one global range-partitioned numbering over the
    * pool, one per-group rank window, one BIGINT equi-join on the
    * mapped rank. Nothing quadratic, no global window funnel.
    */
  def quantileNormalize(df: DataFrame, group: Column, id: Column,
      value: Column): DataFrame = {
    val base = df.select(group.as("grp"), id.cast("bigint").as("id"),
      value.cast("decimal(12,2)").as("v"))
    val pooled = Rank.globalRowNumber(base.select(col("v"), col("id")),
        Seq(col("v").asc, col("id").asc), out = "prn")
      .select(col("prn"), col("v").as("norm_value"))
    val nTot = base.agg(count(lit(1)).cast("bigint").as("nn"))
    val wg = Window.partitionBy(col("grp"))
      .orderBy(col("v").asc, col("id").asc)
    base
      .withColumn("r", row_number().over(wg).cast("bigint"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("grp"))).cast("bigint"))
      .crossJoin(broadcast(nTot))
      .withColumn("prn",
        when(col("n") > 1,
          expr("(r - 1) * (nn - 1) div (n - 1) + 1"))
          .otherwise(expr("(nn + 1) div 2")))
      .join(pooled, Seq("prn"))
      .select(col("grp"), col("id"), col("v").cast("double").as("value"),
        col("r"), col("n"),
        col("norm_value").cast("double").as("norm_value"))
  }

  /** Histogram-Based Outlier Score (Goldstein & Dengel, KI'12): per
    * row, `HBOS = Σ_features −ln(density of the row's equal-width
    * bin)` — the deterministic, embarrassingly-parallel outlier
    * detector (no model state, no iterations; what you run over a
    * 100 TB table before trusting an isolation forest). Emitted as the
    * top-k rows by score with full-key tie-breaks.
    *
    * Determinism: features are exact decimals, so bin edges
    * `⌊(x−min)/(max−min)·B⌋` are identical double expressions on
    * bit-identical inputs; densities are integer bin counts; each
    * −ln(cnt/n) term is `lnCanon(n) − lnCanon(cnt)` (the
    * [[mutualInfo]] canonicalization) and the per-row sum rides
    * DECIMAL(30,14). Constant features (max = min) carry no signal and
    * are excluded from the sum.
    *
    * Scale shape: one per-feature min/max aggregate (broadcast,
    * O(#features) rows), one count per (feature, bin) (map-side
    * combine, O(#features·B) rows, broadcast back), one narrow
    * map per row — plus the top-k. Nothing shuffles the data itself
    * except the final k-row TakeOrdered.
    */
  def hbosOutliers(df: DataFrame, keys: Seq[(String, Column)],
      features: Seq[(String, Column)], bins: Int,
      topK: Int): DataFrame = {
    val keyCols = keys.map { case (n, c) => c.as(n) }
    val keyNames = keys.map(_._1)
    // long format: one row per (row, feature)
    val long = features.map { case (fn, fc) =>
      df.select(keyCols :+ lit(fn).as("feat") :+
        fc.cast("decimal(12,2)").as("x"): _*)
    }.reduce(_ unionByName _)
    val stats = long.groupBy(col("feat"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
        count(lit(1)).cast("bigint").as("n"))
      .filter(col("mx") > col("mn"))
    val binned = long.join(broadcast(stats), "feat")
      .withColumn("bin", least(
        floor((col("x").cast("double") - col("mn").cast("double")) /
          (col("mx").cast("double") - col("mn").cast("double")) * bins)
          .cast("bigint"),
        lit(bins - 1L)))
    val densities = binned.groupBy(col("feat"), col("bin"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
    def lnCanon(c: Column) =
      log(c.cast("double")).cast("decimal(20,12)").cast("double")
    val scored = binned.join(broadcast(densities), Seq("feat", "bin"))
      .groupBy(keyNames.map(col): _*)
      .agg(sum((lnCanon(col("n")) - lnCanon(col("cnt")))
        .cast("decimal(30,14)")).as("s"))
      .select(keyNames.map(col) :+ col("s").cast("double").as("score"): _*)
    val order = col("score").desc +: keyNames.map(col(_).asc)
    // orderBy+limit = distributed TakeOrdered; the row_number window
    // then runs over only the k survivors (a global window over the
    // full score table would be the single-partition funnel this file
    // exists to avoid)
    scored.orderBy(order: _*).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(order: _*)).cast("bigint"))
  }

  def mutualInfo(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.groupBy(x.as("x"), y.as("y"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("x")).agg(sum(col("o")).as("r"))
    val cols = cells.groupBy(col("y")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"))
    def lnCanon(c: Column) =
      log(c.cast("double")).cast("decimal(20,12)").cast("double")
    val term = (col("o").cast("double") *
      (lnCanon(col("o") * col("n")) - lnCanon(col("r") * col("c"))))
      .cast("decimal(30,14)")
    cells.join(rows, "x").join(cols, "y").crossJoin(n)
      .groupBy(col("n"))
      .agg(sum(term).as("s"))
      .select(col("n").cast("bigint").as("n"),
        (col("s").cast("double") / col("n").cast("double"))
          .cast("decimal(20,12)").cast("double").as("mutual_info"))
  }

  /** Kaplan–Meier survival estimator over (duration, event-observed)
    * rows — retention/churn curves with right-censoring. Emitted in
    * LOG space: `log S(t) = Σ_{tᵢ ≤ t} ln(1 − dᵢ/nᵢ)` over event
    * times, because the cumulative product itself would be
    * order-sensitive in floats while the log-sum is an exact decimal
    * cumulative sum of canonicalized terms (each ln argument is a
    * ratio of exact integers). If a risk set is wiped out (dᵢ = nᵢ,
    * survival exactly 0) that time and everything after carry a NULL
    * log — the −∞ sentinel.
    *
    * Scale shape: rows collapse to per-duration (events, total)
    * counts first; the risk-set and survival windows then walk
    * O(#distinct durations).
    */
  def kaplanMeier(df: DataFrame, duration: Column,
      event: Column): DataFrame = {
    val base = df.select(duration.cast("long").as("t"),
      when(event, 1L).otherwise(0L).as("e"))
    val byT = base.groupBy(col("t"))
      .agg(count(lit(1)).as("m"), sum(col("e")).as("d"))
    // n_risk at t = everyone leaving at t or later (reverse cumsum)
    val nRisk = sum(col("m")).over(Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val risked = byT.withColumn("n", nRisk).filter(col("d") > 0)
    val lnTerm = when(col("d") < col("n"),
      log((col("n") - col("d")).cast("double") / col("n").cast("double"))
        .cast("decimal(20,12)").cast("double"))
    val cumW = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risked
      .withColumn("term", lnTerm)
      .withColumn("wiped", max(when(col("d") === col("n"), 1).otherwise(0))
        .over(cumW))
      .withColumn("logs", sum(col("term").cast("decimal(30,14)")).over(cumW))
      .select(col("t"), col("n").cast("bigint").as("n_risk"),
        col("d").cast("bigint").as("n_events"),
        (col("m") - col("d")).cast("bigint").as("n_censored"),
        when(col("wiped") === 1, lit(null).cast("double"))
          .otherwise(col("logs").cast("double")).as("log_survival"))
  }

  /** Time-aware exponentially weighted moving average of per-group
    * daily counts: `y_t = α·Σ_{0≤δ<K} (1−α)^δ·x_{t−δ}` with δ the REAL
    * day gap (missing days decay the weight, as they should), truncated
    * at a K-day kernel — the truncation (tail weight (1−α)^K, ~1.8% at
    * α=0.25, K=14) is part of the DEFINED computation, which the oracle
    * replays term for term. Each weight is a canonicalized pow; terms
    * are decimal-summed exactly; the final ×α is exact (α a binary
    * fraction).
    *
    * Scale shape: the kernel join is (group-key equi-join) × K rows
    * per day — never a window holding unbounded history; day count per
    * group bounds everything.
    */
  def ewmaDaily(df: DataFrame, group: Column, ts: Column,
      alpha: Double = 0.25, kernel: Int = 14): DataFrame = {
    val daily = df
      .groupBy(group.as("grp"), date_format(ts, "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val delta = datediff(to_date(col("a.day")), to_date(col("b.day")))
    val w = pow(lit(1.0 - alpha), delta.cast("double"))
      .cast("decimal(20,12)").cast("double")
    daily.as("a")
      .join(daily.as("b"),
        col("a.grp") === col("b.grp") &&
          delta >= 0 && delta < kernel)
      .groupBy(col("a.grp").as("grp"), col("a.day").as("day"))
      .agg(max(col("a.cnt")).cast("bigint").as("cnt"),
        sum((col("b.cnt").cast("double") * w).cast("decimal(30,14)")).as("s"))
      .select(col("grp"), col("day"), col("cnt"),
        (lit(alpha) * col("s").cast("double")).as("ewma"))
  }

  /** RFM customer segmentation: recency (days since last order as of
    * the data's max date), frequency (order count), monetary (exact
    * decimal revenue), each scored into quintiles with deterministic
    * (value, customer) tie-breaks — score 5 is best on every axis.
    * The classic behavioral-feature primitive; the same shape scores
    * documents by (freshness, dup-count, token-mass).
    *
    * Scale shape (r20): one per-customer aggregate, then three
    * RANGE-PARTITIONED global ranks ([[Rank.globalRowNumber]]) with
    * the ntile bucket derived closed-form from (rank, N) — the former
    * three `ntile(5) OVER (ORDER BY …)` windows each funneled the
    * whole customer table through ONE partition (the WindowExec
    * "No Partition Defined" scale-killer this repo's Rank module
    * exists to avoid). Identical values: SQL ntile assigns the first
    * N mod k buckets ⌈N/k⌉ rows and the rest ⌊N/k⌋, which is exactly
    * the closed form below over the same total order.
    */
  def rfm(orders: DataFrame, cust: Column, orderDate: Column,
      amount: Column): DataFrame = {
    val per = orders
      .groupBy(cust.as("cust"))
      .agg(max(orderDate.cast("date")).as("last_order"),
        count(lit(1)).cast("bigint").as("frequency"),
        sum(amount.cast("decimal(18,2)")).cast("decimal(25,2)")
          .as("monetary"))
      .crossJoin(orders.agg(max(orderDate.cast("date")).as("as_of")))
      .withColumn("recency",
        datediff(col("as_of"), col("last_order")).cast("bigint"))
    val (ranked1, n) = Rank.globalRowNumberWithTotal(per,
      Seq(col("recency").desc, col("cust")), out = "_rnr")
    val ranked2 = Rank.globalRowNumber(ranked1,
      Seq(col("frequency"), col("cust")), out = "_rnf")
    val ranked3 = Rank.globalRowNumber(ranked2,
      Seq(col("monetary"), col("cust")), out = "_rnm")
    // ntile(k) of 1-based rank rn over n rows, closed-form exact
    // integer arithmetic (div = integer division): the first n mod k
    // buckets take (n div k)+1 rows each, the rest n div k.
    def ntileOf(rnCol: String, k: Int): Column = {
      val q = n / k
      val r = n % k
      if (q == 0L) col(rnCol) // fewer rows than buckets: bucket = rank
      else {
        val cut = r * (q + 1)
        when(col(rnCol) <= cut,
            expr(s"($rnCol + ${q}L) div ${q + 1}L"))
          .otherwise(lit(r) +
            expr(s"($rnCol - ${cut}L + ${q - 1}L) div ${q}L"))
      }
    }
    ranked3.select(col("cust"), col("recency"), col("frequency"),
        col("monetary").cast("double").as("monetary"),
        ntileOf("_rnr", 5).cast("bigint").as("r_score"),
        ntileOf("_rnf", 5).cast("bigint").as("f_score"),
        ntileOf("_rnm", 5).cast("bigint").as("m_score"))
      .withColumn("rfm_segment",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .cast("bigint"))
  }

  /** Wilson score interval for per-group success rates (Wilson 1927;
    * the recommended binomial CI — unlike the normal approximation it
    * stays inside [0,1] and behaves at small n / extreme rates).
    * Integer trials and successes; the interval is a fixed sequence of
    * IEEE double operations on identical operands in both engines,
    * canonicalized once on output. z defaults to 1.96 (95%).
    *
    * Scale shape: one map-side-combinable groupBy; O(#groups) rows out.
    */
  def wilsonInterval(df: DataFrame, group: Column, success: Column,
      z: Double = 1.96): DataFrame = {
    val agg = df.select(group.as("grp"),
        when(success, 1L).otherwise(0L).as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("y")).cast("bigint").as("x"))
    val nD = col("n").cast("double")
    val p = col("x").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val denom = lit(1.0) + z2 / nD
    val center = p + z2 / (lit(2.0) * nD)
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))
    def canon(c: Column) = c.cast("decimal(20,12)").cast("double")
    agg.select(col("grp"), col("n"), col("x"), p.as("rate"),
      canon((center - half) / denom).as("ci_lo"),
      canon((center + half) / denom).as("ci_hi"))
  }

  /** Exact higher-moment profile per group: mean, variance, skewness,
    * excess kurtosis from EXACT decimal power sums (Σx…Σx⁴ of the
    * 2-decimal source values add exactly in decimals, so the moments
    * are order-independent); the central-moment combinations are then
    * fixed sequences of IEEE ops on identical operands, canonicalized
    * once each. The distribution-shape profiling step (heavy tails and
    * asymmetry flags) next to [[Robust.madOutliers]].
    *
    * Scale shape: one map-side-combinable groupBy carrying four sums.
    */
  def moments(df: DataFrame, group: Column, value: Column): DataFrame = {
    val x = value.cast("decimal(10,2)")
    val agg = df.select(group.as("grp"), x.as("x"))
      .groupBy(col("grp"))
      // count x, not *: with ANSI off a value ≥ 10^8 overflows the
      // decimal cast to NULL and drops out of the power sums — counting
      // the row anyway would silently skew every moment, whereas
      // count(x) keeps n consistent with the sums (and the n-vs-total
      // gap is the caller-visible overflow signal)
      .agg(count(col("x")).cast("bigint").as("n"),
        sum(col("x")).cast("decimal(38,2)").as("s1"),
        sum((col("x") * col("x")).cast("decimal(30,4)"))
          .cast("decimal(38,4)").as("s2"),
        sum((col("x") * col("x") * col("x")).cast("decimal(32,6)"))
          .cast("decimal(38,6)").as("s3"),
        sum((col("x") * col("x") * col("x") * col("x"))
          .cast("decimal(34,8)")).cast("decimal(38,8)").as("s4"))
    val nD = col("n").cast("double")
    val mean = col("s1").cast("double") / nD
    val m2 = col("s2").cast("double") / nD - mean * mean
    val m3 = col("s3").cast("double") / nD -
      lit(3.0) * mean * (col("s2").cast("double") / nD) +
      lit(2.0) * mean * mean * mean
    val m4 = col("s4").cast("double") / nD -
      lit(4.0) * mean * (col("s3").cast("double") / nD) +
      lit(6.0) * mean * mean * (col("s2").cast("double") / nD) -
      lit(3.0) * mean * mean * mean * mean
    def canon(c: Column) = c.cast("decimal(20,12)").cast("double")
    agg.select(col("grp"), col("n"),
      canon(mean).as("mean"),
      canon(m2).as("variance"),
      canon(m3 / (sqrt(m2) * m2)).as("skewness"),
      canon(m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
  }

  /** Cramér's V association strength between two categoricals:
    * `V = √(χ² / (N·min(r−1, c−1)))` over the [[chi2Independence]]
    * cells — the 0..1 summary of the per-cell audit. χ² terms are
    * canonicalized and decimal-summed so the one-row answer is exact.
    */
  def cramersV(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.groupBy(x.as("x"), y.as("y"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("x")).agg(sum(col("o")).as("r"))
    val cols = cells.groupBy(col("y")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("x")).as("nr"), countDistinct(col("y")).as("nc"))
    val e = (col("r") * col("c")).cast("double") / col("n").cast("double")
    val dev = col("o").cast("double") - e
    val term = (dev * dev / e).cast("decimal(20,12)")
    cells.join(rows, "x").join(cols, "y").crossJoin(n)
      .groupBy(col("n"), col("nr"), col("nc"))
      .agg(sum(term).as("chi2"))
      .select(col("n").cast("bigint").as("n"),
        col("chi2").cast("double").as("chi2"),
        sqrt(col("chi2").cast("double") /
          (col("n").cast("double") *
            least(col("nr") - 1, col("nc") - 1).cast("double")))
          .cast("decimal(20,12)").cast("double").as("cramers_v"))
  }

  /** Day-of-week seasonality strength per group: ANOVA η² of daily
    * counts against the weekday — `SS_between / SS_total` of the
    * (group, day) count series, 1 when weekday fully explains volume,
    * 0 when flat. Counts are integers; the sums of squares are fixed
    * double sequences over exact-decimal sums, canonicalized once.
    *
    * Scale shape: events collapse to (group, day) counts, then to
    * O(#groups·7) weekday aggregates.
    */
  def seasonalityStrength(df: DataFrame, group: Column,
      ts: Column): DataFrame = {
    val daily = df
      .groupBy(group.as("grp"), date_format(ts, "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", dayofweek(to_date(col("day"))).cast("long"))
    // r10 decimal-width audit: Σx² over 10⁹-events/day counts reaches
    // 10²² — the quadratic power sum rides DECIMAL(19,0)→(38,0); the
    // additive n/s sums stay BIGINT (safe).
    val byDow = daily.groupBy(col("grp"), col("dow"))
      .agg(count(lit(1)).as("nd"), sum(col("x")).as("sd"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("qd"))
    val tot = byDow.groupBy(col("grp"))
      .agg(sum(col("nd")).cast("bigint").as("n"),
        sum(col("sd")).cast("bigint").as("s"),
        sum(col("qd")).cast("decimal(38,0)").as("q"))
    val nD = col("n").cast("double")
    val mean = col("s").cast("double") / nD
    // SS_between = Σ_d nd·(mean_d − mean)²; SS_total = Q − n·mean²
    val meanD = col("sd").cast("double") / col("nd").cast("double")
    val ssb = sum((col("nd").cast("double") *
      (meanD - mean) * (meanD - mean)).cast("decimal(30,12)"))
    byDow.join(tot, "grp")
      .groupBy(col("grp"), col("n"), col("s"), col("q"))
      .agg(ssb.as("ssb"))
      .select(col("grp"), col("n").as("n_days"),
        (col("ssb").cast("double") /
          (col("q").cast("double") -
            (col("s").cast("double") / col("n").cast("double")) *
              col("s").cast("double")))
          .cast("decimal(20,12)").cast("double").as("eta_sq"))
  }

  /** k-anonymity audit: quasi-identifier combinations shared by fewer
    * than k rows — each is a re-identification risk in released
    * training data. Returns the risky combinations with their counts;
    * generalization (e.g. bucketing a continuous column) is the
    * caller's move, applied in the `qids` expressions.
    *
    * Scale shape: one map-side-combinable groupBy on the
    * quasi-identifier tuple; the k-filter prunes on the aggregated
    * side so only risk rows ever leave the exchange.
    */
  def kAnonymityAudit(df: DataFrame, qids: Seq[Column], k: Long): DataFrame =
    df.groupBy(qids: _*)
      .agg(count(lit(1)).cast("bigint").as("n"))
      .filter(col("n") < k)

  /** l-diversity audit (Machanavajjhala et al., ICDE 2006 — the
    * standard strengthening of k-anonymity): a quasi-identifier group
    * can be large yet still leak if every member shares the SAME
    * sensitive value, so each group must carry at least `l` DISTINCT
    * sensitive values. Returns the violating groups with their row
    * count and distinct-sensitive count — the release screen run
    * alongside [[kAnonymityAudit]] before a table ships as training
    * data.
    *
    * Scale shape: one exact distinct aggregate on the QI key — the
    * same single-shuffle shape as the k-anonymity audit.
    */
  def lDiversityAudit(df: DataFrame, qids: Seq[Column],
      sensitive: Column, l: Long): DataFrame =
    df.groupBy(qids: _*)
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(sensitive).cast("bigint").as("n_sensitive"))
      .filter(col("n_sensitive") < l)
}
