package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer training (Sennrich et al., ACL 2016) as a distributed
  * operator: learn the first `merges` byte-pair merges of the corpus —
  * the step that turns a curated text corpus into a tokenizer, closing
  * the training-data pipeline.
  *
  * Shape (and why it scales): BPE trains on the WORD-FREQUENCY table,
  * not the corpus — one corpus-scale groupBy produces (word, freq),
  * and every merge round then operates on O(vocabulary) rows: count
  * adjacent symbol pairs (freq-weighted), pick the best pair
  * (max count, ties by pair string ascending — deterministic), apply
  * the merge to every word's symbol string. Rounds are dataframe
  * transformations with lineage cut per round.
  *
  * Merge application uses non-overlapping left-to-right string
  * `replace` on the space-separated symbol string (with sentinel
  * spaces). A single replace pass misses alternating occurrences in
  * runs ("a b a b" consumes the separator); THREE fixed passes are
  * applied — not "until converged" (data-dependent iteration counts
  * break replay) but a fixed count, identical in the SQL oracle, so
  * both engines transform every word identically at every round.
  *
  * Determinism: pair counts are integer sums; the best-pair choice is
  * an integer/string ordering; merges touch no floats at all.
  */
object Bpe {

  /** Space-separated symbol string with sentinel spaces: "ab" → " a b ". */
  private def symbolize(word: org.apache.spark.sql.Column) =
    concat(lit(" "), array_join(
      transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1))),
      " "), lit(" "))

  /** Learn `merges` merges from whitespace-tokenized `textCol`.
    * Returns (step, pair, merged, pair_count) — the ordered merge
    * table a tokenizer ships with.
    */
  def trainMerges(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges > 0)
    val spark = docs.sparkSession

    var words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(symbolize(col("w")).as("repr"), col("freq"))
      .localCheckpoint(true)

    val steps = (1 to merges).map { step =>
      val pairs = words
        .select(col("freq"), explode(
          // single-symbol words have no pairs; sequence(1, 0) would
          // DESCEND to index 0, so guard before building the range
          expr("CASE WHEN size(split(trim(repr), ' ')) < 2 THEN array() " +
            "ELSE transform(sequence(1, size(split(trim(repr), ' ')) - 1), " +
            "k -> concat(element_at(split(trim(repr), ' '), k), ' ', " +
            "element_at(split(trim(repr), ' '), k + 1))) END")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("c"))
      val best = pairs.orderBy(col("c").desc, col("pair")).limit(1)
        .select(col("pair"), col("c"))
        .localCheckpoint(true)

      val search = concat(lit(" "), col("pair"), lit(" "))
      val merged = concat(lit(" "), regexp_replace(col("pair"), " ", ""), lit(" "))
      words = words.crossJoin(best)
        .withColumn("repr",
          (1 to 3).foldLeft(col("repr"))((r, _) => replace(r, search, merged)))
        .select(col("repr"), col("freq"))
        .localCheckpoint(true)

      best.select(lit(step).cast("int").as("step"), col("pair"),
        regexp_replace(col("pair"), " ", "").as("merged"),
        col("c").cast("bigint").as("pair_count"))
    }
    steps.reduce(_ union _)
  }

  /** The unrolled DuckDB oracle for [[trainMerges]], generated from the
    * same constants (mirrors the three replace passes).
    */
  def trainMergesSql(merges: Int): String = {
    val head = """WITH w0 AS (
        SELECT ' ' || array_to_string(list_transform(range(1, length(w) + 1),
            i -> w[i]), ' ') || ' ' AS repr,
          COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0 GROUP BY w)"""
    val rounds = (1 to merges).map { i =>
      s"""p$i AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS c FROM (
          SELECT freq, unnest(list_transform(range(1, len(sp)),
            k -> sp[k] || ' ' || sp[k + 1])) AS pair
          FROM (SELECT string_split(trim(repr), ' ') AS sp, freq FROM w${i - 1}))
        GROUP BY pair),
      b$i AS (SELECT pair, c FROM p$i ORDER BY c DESC, pair LIMIT 1),
      w$i AS (SELECT replace(replace(replace(repr,
            ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
            ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
            ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ')
          AS repr, freq
        FROM w${i - 1}, b$i b)"""
    }.mkString(",\n")
    val out = (1 to merges).map(i =>
      s"""SELECT $i AS step, pair, replace(pair, ' ', '') AS merged,
        c AS pair_count FROM b$i""").mkString("\nUNION ALL\n")
    s"$head,\n$rounds\n$out"
  }
}
