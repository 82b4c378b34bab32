package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage, Fellegi–Sunter model (JASA 1969 — the
  * standard framework behind Splink/dedupe-style matchers): candidate
  * pairs get a log-likelihood score Σᵢ wᵢ where each field comparison i
  * contributes log₂(mᵢ/uᵢ) on agreement and log₂((1−mᵢ)/(1−uᵢ)) on
  * disagreement (m = P(agree | match), u = P(agree | non-match)).
  *
  * m/u are caller-supplied constants here (production fits them by EM —
  * a corpus-level iteration deliberately out of scope); with fixed
  * parameters every weight is a compile-time double, so scores are sums
  * of constants selected by the agreement pattern and an external
  * oracle replays them exactly.
  *
  * Scale shape: candidates come from a BLOCKED equi-join (never
  * all-pairs — same discipline as every near-dup operator in
  * [[Dedup]]); each comparison is a narrow expression (the Jaro–Winkler
  * comparisons ride the codegen'd [[graft.plans.JaroWinkler]] kernel).
  */
object Linkage {

  /** One field comparison: `agree` is any Column predicate over the
    * aliased pair sides; weights derive from (m, u).
    */
  final case class FieldRule(name: String, agree: Column,
      m: Double, u: Double) {
    require(0 < m && m < 1 && 0 < u && u < 1 && m > u,
      s"field $name needs 0 < u < m < 1")
    def agreeWeight: Double = math.log(m / u) / math.log(2.0)
    def disagreeWeight: Double =
      math.log((1 - m) / (1 - u)) / math.log(2.0)
  }

  /** Score blocked candidate pairs of `records` (self-linkage). The
    * two sides are aliased `a` and `b`; `blockCols` build the equi-join
    * key; `idCol` orders the pair (a.id < b.id). Output: ids, one
    * boolean per rule, the total score, and the decision class.
    */
  def scorePairs(records: DataFrame, idCol: String,
      blockCols: Seq[String], rules: Seq[FieldRule],
      upper: Double, lower: Double): DataFrame = {
    // probe-side repartition (r19 optimization): the blocked self-join
    // broadcasts one side, so pair GENERATION runs at the probe side's
    // scan parallelism — and a small single-row-group input file means
    // ONE task doing every blocked pair × every rule comparison (the
    // pair work is quadratic per block while the input is row-group-
    // bound; measured single-core on the bench fixture). One cheap
    // record-sized hash exchange on the id spreads the quadratic
    // compute across the session's shuffle parallelism — deterministic
    // key (guide §2.5: never rand-derived), scale-adaptive via
    // spark.sql.shuffle.partitions rather than a local constant; at
    // cluster scale a well-split input makes it a near-no-op cost.
    val pairs = records.repartition(col(idCol)).as("a").join(records.as("b"),
      blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
        .reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol"))
    val score = rules.map { r =>
      // constant weights — selected, not computed, per pair, so both
      // engines sum the identical doubles in the identical order
      when(r.agree, lit(r.agreeWeight)).otherwise(lit(r.disagreeWeight))
    }.reduce(_ + _)
    val flagged = rules.foldLeft(pairs) { (df, r) =>
      df.withColumn(s"agree_${r.name}", r.agree)
    }
    flagged
      .withColumn("score", score.cast("decimal(20,12)").cast("double"))
      .withColumn("decision",
        when(col("score") >= upper, "match")
          .when(col("score") >= lower, "possible")
          .otherwise("non_match"))
      .select((Seq(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b")) ++
        rules.map(r => col(s"agree_${r.name}")) ++
        Seq(col("score"), col("decision"))): _*)
  }
}
