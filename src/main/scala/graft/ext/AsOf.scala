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

  /** Nearest-in-time join — the sensor-fusion variant of [[join]]: for
    * each left row, the right row with the same key whose time is
    * CLOSEST in either direction (backward OR forward). Built from two
    * directional carries over the SAME single exchange shape (the
    * forward pass is the backward pass over a descending window — no
    * extra shuffle family), then an arithmetic pick of the smaller
    * absolute gap; ties (equidistant before/after) go to the earlier
    * right row, deterministically.
    *
    * Carries (value, time) pairs so the gap is computable without
    * re-joining the right side. Output: left columns + `out` (the
    * chosen right value) + `<out>_gap_us` (absolute gap, microseconds).
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String,
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
    // integer microseconds end to end — double seconds would round the
    // gap by 1 ulp and flip bigint truncation
    val pair = when(col("_tag") === 0,
      struct(unix_micros(col("_at").cast("timestamp_ltz")).as("_t"),
        col("_v").as("_pv")))
    val wB = Window.partitionBy(col("_k"))
      .orderBy(col("_at"), col("_tag"), col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // _v ASCENDING here too: last() then takes the max _v among
    // simultaneous right rows — the same tie-winner as the backward pass
    val wF = Window.partitionBy(col("_k"))
      .orderBy(col("_at").desc, col("_tag"), col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val at = unix_micros(col("_at").cast("timestamp_ltz"))
    val back = last(pair, ignoreNulls = true).over(wB)
    val fwd = last(pair, ignoreNulls = true).over(wF)
    val gapB = at - col("_b._t")
    val gapF = col("_f._t") - at
    val pickBack = col("_f").isNull ||
      (col("_b").isNotNull && gapB <= gapF)
    l.unionByName(r)
      .withColumn("_b", back)
      .withColumn("_f", fwd)
      .filter(col("_tag") === 1)
      .withColumn(out, when(pickBack, col("_b._pv")).otherwise(col("_f._pv")))
      .withColumn(s"${out}_gap_us",
        when(pickBack, gapB).otherwise(gapF).cast("bigint"))
      .select((leftNames.map(col) ++ Seq(col(out), col(s"${out}_gap_us"))): _*)
  }
}
