package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median-based) outlier detection: the modified z-score of
  * Iglewicz–Hoaglin, 0.6745·(x − median)/MAD with MAD = median(|x −
  * median|) — the standard data-quality screen that, unlike
  * mean/stddev z-scores (q66's rolling variant), is not dragged by the
  * outliers it is trying to find.
  *
  * Scale shape: two per-group aggregations (median, then MAD over the
  * residuals) and one join of O(#groups) stats back onto the rows —
  * the stats side broadcasts at any corpus size. Exact medians keep
  * the operator oracle-adjudicable; at extreme group cardinality the
  * drop-in replacement is approx_percentile (the x_sketch_quantiles
  * band argument applies).
  */
object Robust {

  /** Rows whose |modified z| exceeds `threshold` (3.5 is the
    * Iglewicz–Hoaglin recommendation), with their group's median/MAD
    * and the score. Groups with MAD = 0 (over half the values
    * identical) flag nothing — degenerate by definition, documented
    * rather than special-cased with the 0-MAD fallback variants.
    */
  def madOutliers(df: DataFrame, group: Column, value: Column,
      threshold: Double = 3.5): DataFrame = {
    val base = df.select(group.as("grp"), value.cast("double").as("v"))
    val med = base.groupBy(col("grp"))
      .agg(expr("percentile(v, 0.5)").as("med"))
    val withMed = base.join(med, "grp")
    val mad = withMed.groupBy(col("grp"))
      .agg(expr("percentile(abs(v - med), 0.5)").as("mad"))
    withMed.join(mad, "grp")
      .withColumn("mod_z", lit(0.6745) * (col("v") - col("med")) / col("mad"))
      .filter(col("mad") > 0 && abs(col("mod_z")) > threshold)
      .select(col("grp"), col("v"), col("med"), col("mad"),
        format_string("%.6f", col("mod_z")).as("mod_z"))
  }

  /** Winsorized aggregation: values clipped to the group's
    * [pLo, pHi] exact quantiles before averaging — the robust mean
    * companion of [[madOutliers]] (outliers bounded instead of
    * dropped, so sample size is preserved). Same shape: one quantile
    * aggregate, broadcast-sized bounds join, exact-decimal mean.
    */
  def winsorizedMean(df: DataFrame, group: Column, value: Column,
      pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val base = df.select(group.as("grp"), value.cast("double").as("v"))
    val bounds = base.groupBy(col("grp")).agg(
      expr(s"percentile(v, $pLo)").as("lo"),
      expr(s"percentile(v, $pHi)").as("hi"))
    base.join(bounds, "grp")
      .withColumn("w", least(greatest(col("v"), col("lo")), col("hi")))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        // decimal-exact sum so the mean is partitioning-independent;
        // (30,6), not (20,6): 14 integer digits silently nulled
        // large-magnitude values out of the sum under non-ANSI casts
        // (the r10 decimal-width-audit class) — 24 digits covers any
        // realistic magnitude, and past that the sum nulls DETECTABLY
        (sum(col("w").cast("decimal(30,6)")).cast("double") / count(lit(1)))
          .as("winsorized_mean"))
  }

  /** Benford's-law first-digit audit — the classic fabricated-data /
    * unit-mixing screen: naturally-occurring magnitudes put digit d
    * first with probability log₁₀(1 + 1/d); synthetic or truncated
    * feeds don't. Emits per digit the observed count, the expected
    * count, and its χ² contribution.
    *
    * Determinism: the first significant digit comes from the STRING of
    * the DECIMAL(18,2)-canonicalized value (a float log₁₀ would flip
    * at exact powers of ten where log10(100) evaluates 1.999…), and
    * the Benford probabilities are compile-time literals, so expected
    * counts and χ² terms replay exactly. The 2-decimal canonicalization
    * means magnitudes below 0.005 round to 0.00 and drop out, and a
    * sub-cent first digit can shift with the rounding — fine for
    * currency-scale feeds, use a wider DECIMAL for micro-magnitudes.
    * One count aggregate over a 9-value key space plus a 1-row total —
    * trivially map-side combinable at any scale.
    */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val digits = df
      .select(value.cast("decimal(18,2)").cast("string").as("s"))
      .select(regexp_extract(col("s"), "[1-9]", 0).as("digit"))
      .filter(col("digit") =!= "")
      .groupBy(col("digit")).agg(count(lit(1)).cast("bigint").as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).cast("bigint").as("n"))
    val p = (1 to 9).foldLeft(lit(0.0)) { (acc, d) =>
      when(col("digit") === d.toString, lit(math.log10(1 + 1.0 / d)))
        .otherwise(acc)
    }
    digits.crossJoin(tot)
      .withColumn("expected",
        (col("n").cast("double") * p).cast("decimal(20,12)").cast("double"))
      .withColumn("chi2_term",
        (((col("n_obs").cast("double") - col("n").cast("double") * p) *
          (col("n_obs").cast("double") - col("n").cast("double") * p)) /
          (col("n").cast("double") * p))
          .cast("decimal(20,12)").cast("double"))
      .select(col("digit"), col("n_obs"), col("expected"), col("chi2_term"))
  }
}
