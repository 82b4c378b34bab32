package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning: build a Bloom filter over the dim
  * side's join keys, broadcast it, and drop fact rows that cannot join
  * BEFORE the join's exchange — the manual form of the runtime filters
  * engines inject (Spark's own `spark.sql.optimizer.runtime.bloomFilter`
  * applies only under narrow triggers; this operator makes the shape
  * explicit and unconditional).
  *
  * Semantics are invisible: false positives are re-checked by the real
  * join that follows, so `prunedEquiJoin` ≡ plain inner equi-join (the
  * oracle adjudicates exactly that). What changes is the exchange: at
  * 100 TB a fact table shuffles only the rows whose key *might* exist
  * on the dim side — with a selective dim filter that is a
  * 10-1000× cut in shuffle bytes for ~8 KB of broadcast.
  *
  * Determinism: the filter's bit array is an OR-fold of per-key bit
  * positions — order-independent, so the pruned set is a pure function
  * of (dim keys, numBits, numHashes) on any partitioning. The driver
  * collect is bounded by numBits DISTINCT positions (≤ 8 K longs here),
  * never by dim cardinality — same driver-side footprint as Spark's own
  * broadcast runtime filters.
  */
object BloomJoin {

  /** Kirsch–Mitzenmacher double hashing off two xxhash64 seeds:
    * position_i = (h1 + i·h2) mod numBits.
    */
  private def positions(key: Column, numBits: Int, numHashes: Int): Column = {
    val h1 = xxhash64(key)
    val h2 = xxhash64(key, lit(1))
    array((0 until numHashes).map(i =>
      pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong))): _*)
  }

  /** Aggregate the dim side's key positions into a bit array. */
  def buildBloom(dim: DataFrame, key: Column, numBits: Int,
      numHashes: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a multiple of 64")
    val pos = dim.select(explode(positions(key, numBits, numHashes)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](numBits / 64)
    pos.foreach(p => words(p.toInt / 64) |= 1L << (p.toInt % 64))
    words
  }

  /** Codegen-friendly membership probe: k bit tests against the
    * broadcast literal array — narrow, no UDF, no shuffle.
    */
  def mightContain(key: Column, bloom: Array[Long], numBits: Int,
      numHashes: Int): Column = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a multiple of 64")
    require(bloom.length == numBits / 64,
      s"bloom array length ${bloom.length} does not match numBits=$numBits " +
        s"(expected ${numBits / 64} words) — probe positions would be wrong")
    val pos = positions(key, numBits, numHashes)
    (0 until numHashes).map { i =>
      val p = element_at(pos, i + 1)
      // integral floor-div (`div`), not `/`: Column `/` is double
      // division and only int-casts back afterwards
      val word = element_at(typedlit(bloom.toSeq),
        call_function("div", p, lit(64L)).cast("int") + 1)
      call_function("shiftright", word, pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Inner equi-join with the fact side Bloom-pruned first. Result is
    * identical to `fact.join(dim, factKey === dimKey)` — only the plan
    * changes (Filter below the fact-side exchange).
    */
  def prunedEquiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, numBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    val bloom = buildBloom(dim, col(dimKey), numBits, numHashes)
    fact.filter(mightContain(col(factKey), bloom, numBits, numHashes))
      .join(dim, col(factKey) === col(dimKey))
  }
}
