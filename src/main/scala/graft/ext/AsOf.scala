package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row
  * with the same key at-or-before the left row's time. Spark has no
  * built-in as-of join; this is the scalable union+window formulation:
  *
  *   tag both inputs → union → ONE shuffle on the key → per-key
  *   time-ordered `last(value, ignoreNulls)` carries the most recent
  *   right-side id forward onto each left row.
  *
  * Never an O(left × right) join and never a per-key collect; the only
  * data movement is the single exchange both inputs need anyway. Skew
  * appears only if one key dominates both inputs (then: salt by
  * time-bucket and merge).
  */
object AsOf {

  /** @param left      rows to annotate (keeps one output row per left row)
    * @param right     timeline providing the carried value
    * @param keyCol    equi-join key present in both inputs
    * @param leftTime  event-time column of `left`
    * @param rightTime event-time column of `right`
    * @param rightVal  right-side column to carry (e.g. its id)
    * @param out       name of the carried column in the output
    *
    * Ties: a right row at exactly the left row's time MATCHES (<=); among
    * simultaneous right rows the one with the greatest `rightVal` wins
    * (deterministic via the window order).
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, rightVal: String,
      out: String): DataFrame = {
    val leftNames = left.columns.toSeq
    val vType = right.schema(rightVal).dataType
    val l = left.select(
      (Seq(col(keyCol).as("_k"), col(leftTime).as("_at"),
        lit(null).cast(vType).as("_v"), lit(1).as("_tag")) ++
        leftNames.map(col)): _*)
    val r = right.select(
      (Seq(col(keyCol).as("_k"), col(rightTime).as("_at"),
        col(rightVal).as("_v"), lit(0).as("_tag")) ++
        leftNames.map(n => lit(null).cast(left.schema(n).dataType).as(n))): _*)
    // right rows sort before left rows at the same instant (tag 0 < 1);
    // among simultaneous right rows the largest _v wins via last()
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_at"), col("_tag"), col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(out, last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select((leftNames.map(col) :+ col(out)): _*)
  }
}
