package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage survivorship: collapse matched entity records into
  * one golden record per cluster with explicit, deterministic
  * field-level rules — the step after blocking (q61-style fuzzy join)
  * and clustering ([[Dedup.nearDupLabels]]) in an MDM / entity-
  * resolution pipeline.
  *
  * Every rule is an order-independent aggregate (min/max over a
  * deterministic key), so golden records are identical on any
  * partitioning — the same discipline as the dedup survivor choices.
  *
  * Scale shape: one CC label propagation over the MATCH PAIRS (edges
  * only — pairs are sparse output of a blocked matcher, never O(n²)),
  * then one groupBy(cluster) over the entities. Nothing else shuffles.
  */
object Survivor {

  sealed trait Rule { def field: String }
  /** Value from the lowest-id member — "oldest record wins". */
  final case class OldestWins(field: String) extends Rule
  /** Greatest value wins (most-recent timestamp, highest balance). */
  final case class MaxWins(field: String) extends Rule
  /** Value from the lowest-id member whose field is non-null. */
  final case class FirstNonNull(field: String) extends Rule

  /** One golden record per cluster: cluster_id, canonical_id (min
    * member id), n_members, plus one column per rule (named after its
    * field). Entities absent from `pairs` are singleton clusters.
    */
  def goldenRecords(entities: DataFrame, idCol: String, pairs: DataFrame,
      rules: Seq[Rule]): DataFrame = {
    val id = col(idCol).cast("long")
    val labels = Dedup.nearDupLabels(pairs)
      .select(col("id").as("_lid"), col("lbl"))
    val lab = entities.join(labels, id === col("_lid"), "left")
      .withColumn("cluster_id", coalesce(col("lbl"), id))
      .drop("_lid", "lbl")
    val aggs: Seq[Column] = Seq(
      min(id).as("canonical_id"),
      count(lit(1)).cast("bigint").as("n_members")) ++ rules.map {
      case OldestWins(f) =>
        min(struct(id.as("_k"), col(f).as("_v"))).getField("_v").as(f)
      case MaxWins(f) => max(col(f)).as(f)
      case FirstNonNull(f) =>
        min(struct(
          when(col(f).isNull, lit(Long.MaxValue)).otherwise(id).as("_k"),
          col(f).as("_v"))).getField("_v").as(f)
    }
    lab.groupBy(col("cluster_id")).agg(aggs.head, aggs.tail: _*)
  }
}
