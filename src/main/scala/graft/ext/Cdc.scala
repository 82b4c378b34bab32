package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog materialization — turn a CDC event stream (Debezium-style
  * insert/update/delete rows with a version/LSN) into current table
  * state: per primary key the HIGHEST version wins regardless of
  * arrival order, and a winning delete removes the row. The
  * out-of-order-safe complement of q60's single-batch MERGE.
  *
  * Scale shape: ONE groupBy(pk) whose only aggregate is a max over
  * (version, payload) structs — map-side combinable, so replaying a
  * billion-event changelog reduces per map task before the exchange;
  * arrival order and partitioning can never change the winner
  * (versions are required unique per key — standard for LSNs).
  */
object Cdc {

  /** @param changelog rows with `pkCol`, `versionCol`, `opCol`
    *                  ("insert" | "update" | "delete") + payload columns
    * @return current state: one row per surviving pk with the payload
    *         of its latest version, plus that version and op
    */
  def materialize(changelog: DataFrame, pkCol: String, versionCol: String,
      opCol: String): DataFrame = {
    val payloadCols = changelog.columns.toSeq
      .filterNot(c => c == pkCol || c == versionCol || c == opCol)
    val packed = struct(
      (col(versionCol).as("_ver") +: col(opCol).as("_op") +:
        payloadCols.map(col)): _*)
    changelog.groupBy(col(pkCol))
      .agg(max(packed).as("_w"))
      .filter(col("_w._op") =!= "delete")
      .select((col(pkCol) +: col("_w._ver").as(versionCol) +:
        col("_w._op").as(opCol) +: payloadCols.map(c => col(s"_w.$c").as(c))): _*)
  }
}
