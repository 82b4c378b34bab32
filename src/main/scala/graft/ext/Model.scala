package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the FineWeb-Edu/CCNet "classifier
  * filter" stage (Penedo et al. 2024, Wenzek et al. 2020 — public
  * literature): train a lightweight classifier on corpus-derived
  * labels, score every document, filter on the verdict.
  *
  * The classifier is multinomial Naive Bayes with add-1 smoothing —
  * chosen over logistic regression because its training IS a pair of
  * count aggregations: sufficient statistics are exact integers, the
  * learned parameters are single ln's of integer ratios, and both
  * train and inference replay in ANSI SQL (the bpeTrain/lloydCentroids
  * oracle discipline — the DuckDB oracle re-derives the model itself,
  * not just the scores).
  *
  * Determinism: every ln goes through DECIMAL(20,12) canonicalization
  * ([[Text.lnStable]]); per-token contributions tf·ln p are rounded to
  * DECIMAL(30,14) and summed exactly, so partitioning cannot perturb a
  * score; the final score is one double add of identical operands on
  * both engines, and the verdict one comparison of identical doubles.
  *
  * Scale shape (100 TB): training is two corpus-scale token-count
  * aggregations (map-side combinable, keyed by token); the model table
  * is O(vocabulary) ≪ corpus and BROADCASTS; scoring shuffles the
  * corpus once on (doc, token) and probes the broadcast model — the
  * same shape as [[Text.tfIdf]]. Nothing is iterative.
  */
object Model {

  /** Learn the NB model table from documents carrying a boolean
    * `labelCol`: one row per token with class counts and smoothed
    * log-likelihoods lp_c = ln((cnt_c + 1) / (N_c + V)), plus the
    * log-likelihood ratio the filter thresholds on. O(vocab) rows.
    */
  def naiveBayesModel(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String): DataFrame = {
    val tok = docs.select(col(idCol), col(labelCol).as("_y"),
        explode(Text.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val counts = tok.groupBy(col("token")).agg(
      sum(when(col("_y"), 1L).otherwise(0L)).cast("bigint").as("cnt_pos"),
      sum(when(col("_y"), 0L).otherwise(1L)).cast("bigint").as("cnt_neg"))
    val totals = counts.agg(
      sum(col("cnt_pos")).cast("bigint").as("n_pos"),
      sum(col("cnt_neg")).cast("bigint").as("n_neg"),
      count(lit(1)).cast("bigint").as("v"))
    counts.crossJoin(broadcast(totals))
      .withColumn("lp_pos", Text.lnStable(
        (col("cnt_pos") + 1L).cast("double") /
          (col("n_pos") + col("v")).cast("double")))
      .withColumn("lp_neg", Text.lnStable(
        (col("cnt_neg") + 1L).cast("double") /
          (col("n_neg") + col("v")).cast("double")))
      .select(col("token"), col("cnt_pos"), col("cnt_neg"),
        col("lp_pos"), col("lp_neg"),
        (col("lp_pos") - col("lp_neg")).as("llr"))
  }

  /** Score every document under the model trained on the SAME corpus
    * and emit the filter verdict: per doc, token count, both class
    * scores (log prior + Σ tf·lp), the argmax prediction, the training
    * label, and whether they agree. Docs with zero tokens score on the
    * priors alone. Ties (score_pos == score_neg) predict negative —
    * the conservative direction for a quality filter.
    *
    * Broadcast guard: the model is O(vocabulary) rows and broadcasts
    * only while `vocab ≤ maxBroadcastVocab` (default 8M tokens ≈
    * low-hundreds of MB — comfortably inside a production executor's
    * broadcast budget). A web-scale vocabulary auto-degrades to a
    * shuffle equi-join on `token` — same result (the per-token decimal
    * contributions commute exactly), one extra corpus-sized exchange.
    * The model is pinned once (localCheckpoint) so the guard's count
    * and the scoring probe share a single training pass.
    */
  def naiveBayesFilter(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, maxBroadcastVocab: Long = 8000000L): DataFrame = {
    require(maxBroadcastVocab >= 0, "maxBroadcastVocab must be >= 0")
    val model = naiveBayesModel(docs, textCol, idCol, labelCol)
      .localCheckpoint(true)
    val vocab = model.count()
    val modelSide =
      if (vocab <= maxBroadcastVocab) broadcast(model) else model
    val priors = docs.agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col(labelCol), 1L).otherwise(0L)).cast("bigint")
          .as("n_pos_docs"))
      .select(
        Text.lnStable(col("n_pos_docs").cast("double") /
          col("n_docs").cast("double")).as("lprior_pos"),
        Text.lnStable((col("n_docs") - col("n_pos_docs")).cast("double") /
          col("n_docs").cast("double")).as("lprior_neg"))
    val tf = docs.select(col(idCol), explode(Text.tokens(col(textCol)))
        .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    val sums = tf.join(modelSide, "token")
      .withColumn("c_pos",
        (col("tf").cast("double") * col("lp_pos")).cast("decimal(30,14)"))
      .withColumn("c_neg",
        (col("tf").cast("double") * col("lp_neg")).cast("decimal(30,14)"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("bigint").as("n_tokens"),
        sum(col("c_pos")).cast("decimal(38,14)").cast("double").as("s_pos"),
        sum(col("c_neg")).cast("decimal(38,14)").cast("double").as("s_neg"))
    docs.select(col(idCol), col(labelCol).as("label"))
      .join(sums, Seq(idCol), "left")
      .crossJoin(broadcast(priors))
      .select(col(idCol).as("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("s_pos"), lit(0.0)) + col("lprior_pos")).as("score_pos"),
        (coalesce(col("s_neg"), lit(0.0)) + col("lprior_neg")).as("score_neg"),
        col("label"))
      .withColumn("predicted", col("score_pos") > col("score_neg"))
      .withColumn("correct", col("predicted") === col("label"))
  }
}
