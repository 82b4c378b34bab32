package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: primary-key diff of two versions of a
  * table — the CDC-validation / anti-entropy audit every replicated
  * pipeline runs ("did the copy land exactly?"). Emits one row per
  * difference: added (pk only in new), removed (pk only in old),
  * changed (any compared column differs, null-safely) — unchanged rows
  * are filtered before they reach the output.
  *
  * Comparison is column-by-column with null-safe equality (`<=>`), not
  * string/digest concatenation, so no cross-engine value-to-string
  * representation can confuse the verdict and NULL→value transitions
  * count as changes.
  *
  * Scale shape: ONE full-outer shuffle join on the pk; the per-column
  * comparison is a narrow codegen'd predicate. At 100 TB both sides
  * would be bucketed on the pk (LayoutSpec's exchange-free shape) so
  * repeated audits never reshuffle; output is only the diff rows,
  * which is what makes the audit cheap to persist and alert on.
  */
object Diff {

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, pkCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    val o = oldDf.select((pkCol +: compareCols).map(col): _*)
      .withColumn("__old", lit(true))
      .select(col(pkCol).as("pk"), col("__old"),
        struct(compareCols.map(col): _*).as("__ov"))
    val n = newDf.select((pkCol +: compareCols).map(col): _*)
      .withColumn("__new", lit(true))
      .select(col(pkCol).as("pk"), col("__new"),
        struct(compareCols.map(col): _*).as("__nv"))
    val anyDiff: Column = compareCols
      .map(c => !(col(s"__ov.$c") <=> col(s"__nv.$c")))
      .reduce(_ || _)
    o.join(n, Seq("pk"), "full_outer")
      .withColumn("status",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(anyDiff, "changed"))
      .filter(col("status").isNotNull)
      .select(col("pk"), col("status"))
  }
}
