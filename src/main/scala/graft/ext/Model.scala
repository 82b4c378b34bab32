package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.math.{BigDecimal => JBigDecimal}

/** Model-based quality scoring — the FineWeb-Edu/CCNet "classifier
  * filter" stage (Penedo et al. 2024, Wenzek et al. 2020 — public
  * literature): train a lightweight classifier on corpus-derived
  * labels, score every document, filter on the verdict.
  *
  * Two classifier families: multinomial Naive Bayes with add-1
  * smoothing — its training IS a pair of count aggregations:
  * sufficient statistics are exact integers, the learned parameters
  * single ln's of integer ratios — and (r16) hashing-trick logistic
  * regression trained by full-batch gradient descent
  * ([[logRegFilter]]), whose every weight update is exact decimal
  * arithmetic. Both train AND inference replay in ANSI SQL (the
  * bpeTrain/lloydCentroids oracle discipline — the DuckDB oracle
  * re-derives the model itself, not just the scores).
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
      labelCol: String, maxBroadcastVocab: Long = 8000000L): DataFrame =
    naiveBayesFilterUnder(docs, docs, textCol, idCol, labelCol,
      maxBroadcastVocab)

  /** Train/score split of [[naiveBayesFilter]] — the production shape
    * (FineWeb-Edu trains the quality classifier on a curated SEED and
    * applies it to the crawl; Penedo et al. 2024): the model and the
    * class priors come from `modelDocs`, every row of `docs` is
    * scored and compared against its own (held-out) label. With
    * `modelDocs eq docs` this is exactly [[naiveBayesFilter]] — same
    * plan, same values.
    *
    * Out-of-vocabulary restriction (the [[Text.bigramLogProbUnder]]
    * convention): tokens absent from the MODEL vocabulary are
    * EXCLUDED from the score (inner join against the model table), so
    * a scored doc's `n_tokens` counts its in-vocabulary tokens; a doc
    * with no in-vocabulary token scores on the priors alone.
    */
  def naiveBayesFilterUnder(docs: DataFrame, modelDocs: DataFrame,
      textCol: String, idCol: String, labelCol: String,
      maxBroadcastVocab: Long = 8000000L): DataFrame = {
    require(maxBroadcastVocab >= 0, "maxBroadcastVocab must be >= 0")
    val model = naiveBayesModel(modelDocs, textCol, idCol, labelCol)
      .localCheckpoint(true)
    val vocab = model.count()
    val modelSide =
      if (vocab <= maxBroadcastVocab) broadcast(model) else model
    val priors = modelDocs.agg(
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

  /** Multiclass character-n-gram Naive Bayes language identifier —
    * the fastText-supervised shape (Joulin et al. 2016, "Bag of Tricks
    * for Efficient Text Classification" — public literature; fastText
    * classifies languages from char n-gram bags) on
    * [[naiveBayesModel]]'s replay discipline: training is two count
    * aggregations over (class, gram); parameters are single
    * canonicalized ln's of integer ratios (add-1 smoothing — an
    * unseen (class, gram) contributes ln(1/(N_c + V))); scoring is
    * one (doc, gram) tf pass fanned over the O(classes) class table;
    * the verdict is the deterministic argmax (score DESC, class ASC).
    *
    * Returns one row per input doc: (doc_id, pred_lang, score_best) —
    * the predicted class and its log posterior.
    *
    * The model parameters are DEFINED as 6-decimal quantized
    * log-likelihoods (DECIMAL(20,6) — the int8-quantization move
    * fastText itself ships, in decimal): a char-gram vocabulary is
    * tens of thousands of distinct ln calls, and at 12-decimal
    * canonicalization the residual 1-ulp libm disagreements between
    * engines land on a rounding boundary with near-certainty
    * (measured: 440/500 docs off by ~5e-12 at sf0.01). At 6 decimals
    * the boundary odds drop to ~1e-4 per corpus while the quantization
    * error (≤5e-7/gram) is ~8 orders below the inter-class margins;
    * every product/sum/prior-add then runs in EXACT decimal
    * arithmetic, so the whole train+score chain replays hash-exact in
    * SQL (with the oracle's VARCHAR-roundtrip ln casts).
    *
    * Scale shape (100 TB): gram extraction is a compiled flatMap (the
    * shingleIndex rationale — interpreted array HOFs dominate at
    * corpus scale); training aggregates are map-side combinable keyed
    * by (class, gram); the model is O(classes × vocab) rows, pinned
    * once and broadcast only under `maxBroadcastVocab` (the
    * [[naiveBayesFilter]] guard — a web-scale gram vocabulary
    * auto-degrades to a shuffle equi-join on gram); scoring shuffles
    * the corpus once on (doc, gram). Chars are UTF-16 code units on
    * the engine side and Unicode code points in the SQL replay —
    * identical for BMP text (keep supplementary-plane characters out
    * of marker fixtures).
    */
  def naiveBayesLangId(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, n: Int = 3,
      maxBroadcastVocab: Long = 8000000L): DataFrame = {
    require(n > 0, "gram size must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long"),
        col(labelCol).cast("string"), col(textCol).cast("string"))
      .as[(Long, String, String)]
    val grams = base.flatMap { case (id, y, t) =>
      if (t == null || t.length < n) Iterator.empty
      else (0 to t.length - n).iterator.map(i => (id, y, t.substring(i, i + n)))
    }.toDF("doc_id", "_y", "gram")
    val tf = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    // class-gram counts: pinned once — consumed by the totals, the
    // vocab probe (which doubles as the broadcast guard), and scoring
    val cg = grams.groupBy(col("_y"), col("gram"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .localCheckpoint(true)
    val v = cg.select(col("gram")).distinct().count()
    val cgSide =
      if (cg.count() <= maxBroadcastVocab) broadcast(cg) else cg
    val nGramsC = cg.groupBy(col("_y"))
      .agg(sum(col("cnt")).cast("bigint").as("n_grams"))
    // class table: doc-count priors + per-class gram totals (a class
    // whose docs are all shorter than n grams still scores on its
    // prior — left join, zero totals)
    val cls = docs.groupBy(col(labelCol).cast("string").as("_y"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"))
      .join(nGramsC, Seq("_y"), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
    // EXACT-DECIMAL score path (not the tf·lp double-multiply idiom of
    // naiveBayesFilter): at per-class score magnitudes ~1e3 the double
    // product's binary residue lands inside the decimal cast's
    // precision and the two engines' double→decimal rounding rules
    // (shortest-string vs binary value) disagree on the last digit —
    // measured 172/500 rows off by ~1e-11. An integer tf times a
    // 12-decimal canonical ln is EXACTLY a 12-decimal value, so the
    // whole chain (product, sum, prior add) runs in decimal and both
    // engines surface the identical double at the very end.
    val pri = cls.crossJoin(broadcast(
        cls.agg(sum(col("n_docs")).cast("bigint").as("_n"))))
      .select(col("_y"),
        log(col("n_docs").cast("double") / col("_n").cast("double"))
          .cast("decimal(20,6)").as("lprior"),
        col("n_grams"))
      .localCheckpoint(true) // O(classes) rows; pins the prior pass
    val sums = tf.crossJoin(broadcast(pri.select(col("_y"), col("n_grams"))))
      .join(cgSide, Seq("_y", "gram"), "left")
      .withColumn("lp", log(
        (coalesce(col("cnt"), lit(0L)) + 1L).cast("double") /
          (col("n_grams") + lit(v)).cast("double")).cast("decimal(20,6)"))
      .withColumn("contrib", col("tf").cast("decimal(12,0)") * col("lp"))
      .groupBy(col("doc_id"), col("_y"))
      .agg(sum(col("contrib")).cast("decimal(38,6)").as("s"))
    val scores = docs.select(col(idCol).cast("long").as("doc_id"))
      .crossJoin(broadcast(pri.select(col("_y"), col("lprior"))))
      .join(sums, Seq("doc_id", "_y"), "left")
      .select(col("doc_id"), col("_y"),
        (coalesce(col("s"), lit(0.0).cast("decimal(38,6)")) +
          col("lprior")).cast("double").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("_y").asc)
    scores.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("_y").as("pred_lang"),
        col("score").as("score_best"))
  }

  /** Hashing-trick logistic regression trained by full-batch gradient
    * descent — the ACTUALLY-ITERATIVE classifier face beside
    * [[naiveBayesFilter]]'s closed-form counts (fastText's linear
    * classifier is trained exactly this way: hashed bag-of-words
    * features, gradient steps — Joulin et al. 2016; Weinberger et al.
    * 2009 for the hashing trick — public literature). Features are
    * token counts hashed into `dims` buckets (bucket = first 60 bits
    * of sha-256 mod dims — the engine's replayable-hash idiom) plus a
    * constant bias feature at bucket id `dims`; the model is the
    * (dims+1)-row weight vector after `iters` full-batch steps
    *
    *   w ← w − step · Σ_i (σ(xᵢ·w) − yᵢ) xᵢ
    *
    * (sum-of-errors gradient; the conventional 1/n mean is folded into
    * `step`, which keeps the update EXACT — see below).
    *
    * Determinism — the whole train loop replays hash-exact in SQL:
    * weights live at scale 12, features are integers, so every logit
    * z = x·w is EXACT decimal; the one nonlinearity per (doc, iter) —
    * σ(z) computed in double — is immediately quantized to
    * DECIMAL(20,6) (the [[naiveBayesLangId]] move; the oracle's
    * VARCHAR-roundtrip cast mirrors Spark's shortest-string rounding);
    * residuals (σ−y), gradients Σ(σ−y)·x, and the update step·g (step
    * is an exact scale-6 decimal, so step·g lands exactly on scale 12)
    * are then all EXACT decimal arithmetic — partitioning cannot
    * perturb a weight, and both engines walk the identical parameter
    * trajectory. Logit-to-double casts are exact-deterministic while
    * |z| < 2⁵³/10¹² ≈ 9·10³ (far beyond σ's saturation).
    *
    * Scale shape (100 TB): the model is O(dims) — INDEPENDENT of
    * vocabulary (the hashing trick's point, vs the NB model's O(vocab)
    * rows) and broadcasts at any corpus size with no guard needed;
    * each iteration is two corpus passes (logits keyed by doc,
    * gradient keyed by bucket — both map-side combinable) over the
    * PINNED feature table (hash once, iterate on integers); the only
    * driver-side state is the (dims+1)-element weight vector
    * (bounded by dims, never by data — the lshPlaneEntry collect
    * budget).
    */
  private def logRegTrain(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, dims: Int, iters: Int, step: String)
      : (DataFrame, IndexedSeq[JBigDecimal]) = {
    require(dims > 0, "dims must be positive")
    // documented dims CEILING (r20, ADVICE r19): the per-iteration
    // logit inlines the weight vector as an O(dims) literal array in
    // the plan (twice per iteration — logit + scoring projection); at
    // the registered dims=64 that is bytes, but an unbounded dims
    // would grow the expression tree toward codegen limits. Callers
    // needing more features than this should reintroduce the
    // broadcast-weight join (the retired pre-r19 shape, which scales
    // to any dims at the cost of two corpus shuffles per iteration).
    require(dims <= 4096,
      s"dims=$dims exceeds the inlined-weight ceiling (4096); " +
        "use a broadcast-weight join for wider models")
    require(iters >= 0, "iters must be >= 0")
    val stepDec = new JBigDecimal(step).setScale(6)
    val spark = docs.sparkSession
    import spark.implicits._
    val lab = docs.select(col(idCol).as("doc_id"),
      when(col(labelCol), 1).otherwise(0).cast("decimal(2,0)").as("y"))
    // shuffle the DOCS, not the explode (r19, the bigramLogProbUnder
    // move): doc-id clustering before the token explode makes the
    // (doc, bucket) aggregation AND the per-doc array packing below
    // partition-local — one raw-docs exchange instead of two exploded
    val hashed = docs.repartition(col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(Text.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("b",
        conv(substring(sha2(col("token").cast("binary"), 256), 1, 15),
          16, 10).cast("long") % dims) // 60-bit value: non-negative
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    // ONE ROW PER DOC (r19 optimization): the row-shaped (doc_id, b,
    // tf, y) table re-shuffled the whole corpus TWICE per iteration —
    // the logit groupBy(doc_id, y) exchange plus the gradient pass's
    // join back on doc_id (the union + broadcast-label join left the
    // pin UnknownPartitioning, and a repartition pin cannot fix it:
    // AdaptiveSparkPlanExec does not expose outputPartitioning, so a
    // checkpoint under AQE always reports Unknown). Packing each doc's
    // feature buckets and counts into index-aligned arrays (bias b =
    // dims, tf = 1 appended) makes every iteration a NARROW
    // partition-local pass: the logit is a per-row fold over the
    // arrays against the weight vector inlined as an O(dims) literal
    // array, the residual never joins back (it is a sibling column),
    // and the only exchange per step is the O(dims·partitions)
    // partial-gradient rows — at any corpus size. Values are
    // unchanged: z, σ, residuals and gradients are the SAME exact
    // decimal terms summed in a different order, and every sum here is
    // exact decimal arithmetic (scaladoc above), so regrouping cannot
    // perturb a weight; array element order is likewise value-neutral.
    val packed = hashed.groupBy(col("doc_id"))
      .agg(collect_list(col("b")).as("bs"), collect_list(col("tf")).as("tfs"))
    val feat = lab.join(packed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        concat(coalesce(col("bs"), array().cast("array<bigint>")),
          array(lit(dims.toLong))).as("bs"),
        concat(coalesce(col("tfs"), array().cast("array<bigint>")),
          array(lit(1L))).as("tfs"))
      .localCheckpoint(true) // hash once, iterate on integers
    val zero12 = JBigDecimal.ZERO.setScale(12)
    val zero6 = JBigDecimal.ZERO.setScale(6)
    var w: IndexedSeq[JBigDecimal] = Vector.fill(dims + 1)(zero12)
    for (_ <- 1 to iters) {
      val g = feat
        .withColumn("z", logitCol(w))
        .withColumn("p", sigmaCol(col("z")))
        .withColumn("r", col("p") - col("y"))
        .select(explode(zip_with(col("bs"), col("tfs"),
          (b, t) => struct(b.as("b"),
            (col("r") * t.cast("decimal(10,0)")).as("gc")))).as("e"))
        // DECIMAL(32,6): |g| is bounded by the label class's total
        // token count — 18,6 (max ~10^12) would overflow to null on a
        // 100 TB corpus and NPE the driver-side update mid-training
        .groupBy(col("e.b").as("b"))
        .agg(sum(col("e.gc")).cast("decimal(32,6)").as("g"))
        .collect() // O(dims) rows — bounded by dims, never by data
        .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      w = w.indices.map(j =>
        w(j).subtract(stepDec.multiply(g.getOrElse(j.toLong, zero6))))
    }
    (feat, w)
  }

  /** The exact-decimal logit x·w over the packed feature arrays, the
    * weight vector inlined as an O(dims) literal array (no broadcast,
    * no join — the per-iteration pass stays narrow). Term type
    * DECIMAL(10,0)·DECIMAL(20,12) and the running sum's DECIMAL(38,12)
    * mirror the retired row-shaped sum(zc) exactly.
    */
  private def logitCol(w: IndexedSeq[JBigDecimal]): Column = {
    val wLit = array(w.map(wj =>
      lit(scala.math.BigDecimal(wj)).cast("decimal(20,12)")): _*)
    aggregate(
      zip_with(col("bs"), col("tfs"), (b, t) =>
        t.cast("decimal(10,0)") *
          element_at(wLit, (b + lit(1L)).cast("int"))),
      lit(scala.math.BigDecimal(0)).cast("decimal(38,12)"),
      (acc, x) => (acc + x).cast("decimal(38,12)"))
  }

  /** σ(z) quantized to DECIMAL(20,6) — the one per-(doc, iter)
    * nonlinearity (see [[logRegFilter]]'s determinism note).
    */
  private def sigmaCol(z: Column): Column =
    (lit(1.0) / (lit(1.0) + exp(-z.cast("double")))).cast("decimal(20,6)")

  /** The trained weight vector of [[logRegFilter]]'s model: one row
    * per bucket (bias at bucket id `dims`), weight after `iters`
    * full-batch steps. The oracle re-derives the whole gradient
    * trajectory, so this adjudicates TRAINING (the bpeTrain
    * discipline applied to iterative optimization).
    */
  def logRegModel(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, dims: Int = 64, iters: Int = 30,
      step: String = "0.000200"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (_, w) = logRegTrain(docs, textCol, idCol, labelCol, dims, iters, step)
    w.zipWithIndex.map { case (wj, j) => (j.toLong, wj.doubleValue) }
      .toDF("bucket", "weight")
  }

  /** Score every document under the gradient-trained model: per doc,
    * token count, the exact-decimal logit (as double), the quantized
    * sigmoid, the verdict z > 0, the training label, and agreement.
    */
  def logRegFilter(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, dims: Int = 64, iters: Int = 30,
      step: String = "0.000200"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (feat, w) = logRegTrain(docs, textCol, idCol, labelCol, dims, iters, step)
    // scoring rides the same narrow per-row pass as the train loop:
    // no weight join, no doc_id re-aggregation — one projection over
    // the pinned packed table (r19; values unchanged, see logRegTrain)
    feat
      .withColumn("n_tokens", aggregate(
        zip_with(col("bs"), col("tfs"),
          (b, t) => when(b < dims, t).otherwise(0L)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("z", logitCol(w))
      .withColumn("p", sigmaCol(col("z")))
      .select(col("doc_id"), col("n_tokens"),
        col("z").cast("double").as("score"),
        col("p").cast("double").as("p"),
        (col("y") === lit(1)).as("label"),
        (col("z") > lit(0)).as("predicted"))
      .withColumn("correct", col("predicted") === col("label"))
  }
}
