package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-dimension int8 scalar quantization of an embedding
  * column — the standard 4× memory cut (float32 → int8) that makes
  * billion-vector ANN shards fit executor RAM, and the usual companion
  * to the PQ/IVF paths in [[Similarity]].
  *
  * Two-phase shape:
  *  1. calibration: per-dimension abs-max over the corpus — one
  *     (pos)-keyed aggregate whose key space is `dim`, never data-sized;
  *  2. encoding: scales are O(dim) so they COLLECT to the driver and
  *     fold into a single narrow projection (same O(model)-to-literal
  *     move as [[Bpe.encode]]'s merge table) — quantization itself is a
  *     zero-shuffle pass.
  *
  * code = clamp(round(x · 127/absmax), ±127); all arithmetic is plain
  * IEEE double + HALF_UP rounding, so an external oracle replays codes
  * and reconstruction errors bit-for-bit.
  */
object Quant {

  /** Per-dimension (pos, absmax, scale); pos is 0-based. */
  def calibrate(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(Similarity.toDoubleVec(col(vecCol)))
        .as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(max(abs(col("x"))).as("absmax"))
      .select(col("pos"), col("absmax"),
        when(col("absmax") > 0, lit(127.0) / col("absmax"))
          .otherwise(lit(0.0)).as("scale"))

  /** Percentile calibration — the production alternative to [[calibrate]]:
    * abs-max is a single-outlier hostage (one corrupt vector crushes the
    * whole dimension's resolution), so the range is set at the `p`-th
    * exact percentile of |x| and the tail beyond it CLIPS to ±127 — the
    * standard resolution-vs-saturation trade. Same output contract, so
    * it drops into [[quantizeInt8]] unchanged.
    */
  def calibratePercentile(emb: DataFrame, vecCol: String,
      p: Double): DataFrame = {
    require(0 < p && p <= 1, "need 0 < p <= 1")
    emb.select(posexplode(Similarity.toDoubleVec(col(vecCol)))
        .as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(expr(s"percentile(abs(x), $p)").as("absmax"))
      .select(col("pos"), col("absmax"),
        when(col("absmax") > 0, lit(127.0) / col("absmax"))
          .otherwise(lit(0.0)).as("scale"))
  }

  /** Quantize each vector with the given calibration. Output per id:
    * the int8 codes (serialized — list cells don't survive the driver
    * compare), the clip count, and the max absolute reconstruction
    * error (decimal-canonicalized double).
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String,
      calibration: DataFrame): DataFrame = {
    // O(dim) driver state, like Bpe.encode's merge table
    val scales = calibration.select(col("pos"), col("scale"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
      .map(_._2)
    val scaleArr = typedlit(scales.toSeq)
    val v = Similarity.toDoubleVec(col(vecCol))
    val code = transform(v, (x, i) =>
      least(greatest(round(x * element_at(scaleArr, i + 1)), lit(-127.0)),
        lit(127.0)).cast("int"))
    val errs = transform(v, (x, i) => {
      val s = element_at(scaleArr, i + 1)
      val c = least(greatest(round(x * s), lit(-127.0)), lit(127.0))
      when(s > 0, abs(x - c / s)).otherwise(abs(x))
    })
    val clipped = filter(v, (x, i) =>
      abs(round(x * element_at(scaleArr, i + 1))) > 127)
    emb.select(col(idCol),
      concat_ws(",", transform(code, c => c.cast("string"))).as("codes"),
      size(clipped).cast("bigint").as("n_clipped"),
      array_max(errs).cast("decimal(20,12)").cast("double").as("max_err"))
  }
}
