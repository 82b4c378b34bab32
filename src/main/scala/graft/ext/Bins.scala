package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth (quantile) binning — the feature-engineering complement
  * of q67's equal-WIDTH histogram: bin boundaries at the
  * 1/n .. (n−1)/n exact quantiles, so every bin holds ~the same row
  * count no matter how skewed the distribution (equal-width bins
  * collapse under skew: one bin takes 90% of rows).
  *
  * Scale shape: one aggregate computes ALL cutoffs (O(nBins) result,
  * broadcast via crossJoin), assignment is a narrow per-row HOF over
  * that tiny array, and the stats are one groupBy(bin). Exact
  * percentiles keep it oracle-adjudicable; approx_percentile is the
  * drop-in at extreme scale (x_sketch_quantiles' band argument).
  */
object Bins {

  def equiDepth(df: DataFrame, value: Column, nBins: Int): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val vals = df.select(value.cast("double").as("v"))
    val cuts = vals.agg(
      expr(s"percentile(v, array(${qs.mkString(", ")}))").as("cuts"))
    vals.crossJoin(cuts)
      .withColumn("bin",
        size(filter(col("cuts"), c => col("v") > c)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
  }
}
