package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift monitoring: compare the token distributions of two
  * corpus slices (yesterday's crawl vs today's; the training mix
  * before and after a pipeline change) — the data-drift alarm every
  * continuously-ingesting training pipeline needs before a silent
  * distribution shift reaches the loss curve.
  *
  * Metrics over the add-one-smoothed unigram distributions p (old) and
  * q (new) on the union vocabulary:
  *  - total variation distance 0.5·Σ|p−q| — per-term values are IEEE
  *    doubles of identical operands, decimal-rounded and summed
  *    exactly (order-independent);
  *  - KL(p‖q) = Σ p·ln(p/q) — ln through the 12-decimal discipline,
  *    same as the language-model scores;
  *  - type churn: tokens appearing only in new / only in old.
  *
  * Scale shape: two token-count aggregations (map-side combinable),
  * one full-outer equi-join on the token, one global aggregate of
  * O(vocabulary) rows. Document bodies never shuffle.
  */
object Drift {

  def tokenDrift(oldDocs: DataFrame, newDocs: DataFrame,
      textCol: String): DataFrame = {
    def counts(df: DataFrame) = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

    val oc = counts(oldDocs).withColumnRenamed("c", "co")
    val nc = counts(newDocs).withColumnRenamed("c", "cn")
    val joined = oc.join(nc, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("co"), lit(0L)).as("co"),
        coalesce(col("cn"), lit(0L)).as("cn"))

    val totals = joined.agg(
      sum(col("co")).as("n_old"), sum(col("cn")).as("n_new"),
      count(lit(1)).as("v"))

    val dec = "decimal(20,12)"
    val p = (col("co") + 1).cast("double") / (col("n_old") + col("v")).cast("double")
    val q = (col("cn") + 1).cast("double") / (col("n_new") + col("v")).cast("double")
    val lnRatio = log(p / q).cast(dec).cast("double")

    joined.crossJoin(totals)
      .select(col("co"), col("cn"), col("n_old"), col("n_new"), col("v"),
        abs(p - q).cast(dec).as("tv_term"),
        (p * lnRatio).cast(dec).as("kl_term"))
      .groupBy(col("n_old"), col("n_new"), col("v"))
      .agg(
        sum(when(col("co") === 0, 1).otherwise(0)).cast("bigint").as("n_new_types"),
        sum(when(col("cn") === 0, 1).otherwise(0)).cast("bigint").as("n_lost_types"),
        (sum(col("tv_term")).cast("double") * 0.5).as("tvd"),
        sum(col("kl_term")).cast("double").as("kl_old_new"))
      .select(col("n_old").cast("bigint").as("n_tokens_old"),
        col("n_new").cast("bigint").as("n_tokens_new"),
        col("v").cast("bigint").as("vocab_union"),
        col("n_new_types"), col("n_lost_types"),
        col("tvd"), col("kl_old_new"))
  }

  /** Embedding-centroid drift between two corpus snapshots: per label,
    * the cosine between the old and new mean DIRECTIONS — the
    * embedding-space companion of [[tokenDrift]] (a re-trained encoder
    * or a shifted corpus shows up as per-label cosine < 1 long before
    * downstream metrics move). Directions use the deterministic
    * fixed-point trick from the Lloyd trainer: unit vectors, per-
    * dimension DECIMAL(25,0) sums of floor(x·1e9) — partition-
    * invariant and SQL-replayable. 1e9, not the Lloyd 1e12: the
    * dot/norm aggregates SQUARE these sums, and the failure ORDER
    * must put the detectable cliff first — at 1e9 the (38,0) product
    * sum overflows (whole aggregate nulls, detectable) at ~10⁹ rows
    * per label, BEFORE any per-product null could be silently skipped
    * (~10¹⁰); at 1e12 the silent skip came first (~10⁷). The oracle's
    * hugeint ride errors loudly at the same magnitudes.
    *
    * Scale shape: one (label, dimension) sum per side (map-side
    * combinable), joined on O(#labels·dim) rows.
    */
  def embeddingDrift(oldEmb: DataFrame, newEmb: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    def dirs(df: DataFrame, tag: String) = {
      val v = transform(col(vecCol), x => x.cast("double"))
      val nrm = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
      df.select(col(labelCol).as("label"), v.as("_v"), nrm.as("_n"))
        .filter(col("_n") > 0)
        .select(col("label"),
          posexplode(transform(col("_v"), x => x / col("_n"))))
        .groupBy(col("label"), col("pos"))
        // decimal, not long: the long sum wrapped SILENTLY at ~9.2M
        // rows per label; see the scaladoc for the 1e9 scale choice
        // (failure order: detectable sum-overflow before silent skip)
        .agg(sum(floor(col("col") * lit(1e9)).cast("decimal(25,0)"))
          .cast("decimal(25,0)").as(s"s_$tag"))
    }
    val o = dirs(oldEmb, "o")
    val n = dirs(newEmb, "n")
    val cnts = (df: DataFrame, name: String) =>
      df.groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).cast("bigint").as(name))
    val joined = o.join(n, Seq("label", "pos"))
    val dec = (c: Column) => c.cast("decimal(19,0)")
    joined
      .groupBy(col("label"))
      .agg(
        sum(dec(col("s_o")) * dec(col("s_n"))).cast("decimal(38,0)").as("dp"),
        sum(dec(col("s_o")) * dec(col("s_o"))).cast("decimal(38,0)").as("no"),
        sum(dec(col("s_n")) * dec(col("s_n"))).cast("decimal(38,0)").as("nn"))
      .join(cnts(oldEmb, "n_old"), "label")
      .join(cnts(newEmb, "n_new"), "label")
      .select(col("label"), col("n_old"), col("n_new"),
        (col("dp").cast("double") /
          (sqrt(col("no").cast("double")) * sqrt(col("nn").cast("double"))))
          .cast("decimal(20,12)").cast("double").as("drift_cosine"))
  }

  /** Population Stability Index between two numeric samples over
    * fixed-width value bins — the standard model-monitoring drift
    * score (PSI < 0.1 stable, > 0.25 shifted). Same conventions as
    * [[tokenDrift]]: add-one smoothing over the union of OBSERVED
    * bins, ln through the 12-decimal discipline, per-bin terms
    * decimal-rounded and summed exactly. `PSI = Σ (p−q)·ln(p/q)`,
    * symmetric by construction.
    *
    * Scale shape: each sample collapses to per-bin counts (map-side
    * combinable); the rest is one full-outer join + one aggregate of
    * O(#bins) rows.
    */
  def psi(oldDf: DataFrame, newDf: DataFrame, value: Column,
      binWidth: Double, nBins: Int): DataFrame = {
    def bins(df: DataFrame, name: String) = df
      .select(least(floor(value.cast("double") / binWidth),
        lit(nBins - 1L)).cast("bigint").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(name))
    val j = bins(oldDf, "co").join(bins(newDf, "cn"), Seq("bin"),
        "full_outer")
      .select(col("bin"), coalesce(col("co"), lit(0L)).as("co"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    val tot = j.agg(sum(col("co")).as("n_old"), sum(col("cn")).as("n_new"),
      count(lit(1)).as("v"))
    val dec = "decimal(20,12)"
    val p = (col("co") + 1).cast("double") /
      (col("n_old") + col("v")).cast("double")
    val q = (col("cn") + 1).cast("double") /
      (col("n_new") + col("v")).cast("double")
    val term = ((p - q) * log(p / q).cast(dec).cast("double")).cast(dec)
    j.crossJoin(tot)
      .select(col("n_old"), col("n_new"), col("v"), term.as("psi_term"))
      .groupBy(col("n_old"), col("n_new"), col("v"))
      .agg(sum(col("psi_term")).cast("double").as("psi"))
      .select(col("n_old").cast("bigint").as("n_old"),
        col("n_new").cast("bigint").as("n_new"),
        col("v").cast("bigint").as("n_bins"), col("psi"))
  }
}
