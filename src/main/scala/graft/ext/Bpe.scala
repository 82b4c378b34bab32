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
      .transform(Iter.pin)

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
        .transform(Iter.pin)
      // an empty best would crossJoin `words` to empty and silently
      // truncate every later round — fail fast instead
      if (best.isEmpty) throw new IllegalStateException(
        s"BPE training exhausted at step $step of $merges: no symbol " +
          "pairs remain (every word reduced to a single symbol); " +
          "request fewer merges or supply a larger corpus")

      val search = concat(lit(" "), col("pair"), lit(" "))
      val merged = concat(lit(" "), regexp_replace(col("pair"), " ", ""), lit(" "))
      words = words.crossJoin(best)
        .withColumn("repr",
          (1 to 3).foldLeft(col("repr"))((r, _) => replace(r, search, merged)))
        .select(col("repr"), col("freq"))
        .transform(Iter.pin)

      best.select(lit(step).cast("int").as("step"), col("pair"),
        regexp_replace(col("pair"), " ", "").as("merged"),
        col("c").cast("bigint").as("pair_count"))
    }
    steps.reduce(_ union _)
  }

  /** Apply learned merges to tokenize documents: the whole document is
    * symbolized (every character followed by a space, so the original
    * inter-word space becomes a DOUBLE space — a boundary no
    * single-spaced merge pattern can bridge), then each merge is
    * applied in training order with the same three fixed replace
    * passes. Output per doc: symbol count before/after and the
    * compression ratio — the tokens-per-byte statistic corpus work is
    * budgeted in.
    *
    * The merge table is O(merges) — collected and folded into a single
    * narrow column expression: encoding is a zero-shuffle per-row pass
    * at any corpus size.
    */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      mergePairs: Seq[String]): DataFrame = {
    val sym = concat(lit(" "),
      regexp_replace(col(textCol), "(.)", "$1 "))
    val encoded = mergePairs.foldLeft(sym) { (r, pair) =>
      val search = s" $pair "
      val merged = " " + pair.replace(" ", "") + " "
      (1 to 3).foldLeft(r)((c, _) => replace(c, lit(search), lit(merged)))
    }
    docs.select(col(idCol).as("doc_id"),
        size(regexp_extract_all(sym, lit("[^ ]+"), lit(0)))
          .cast("bigint").as("n_symbols"),
        size(regexp_extract_all(encoded, lit("[^ ]+"), lit(0)))
          .cast("bigint").as("n_bpe_tokens"))
      .withColumn("compression",
        col("n_symbols").cast("double") / col("n_bpe_tokens").cast("double"))
  }

  /** Shared CTE block (w0 + per-round p/b/w) for the unrolled oracles. */
  /* MATERIALIZED hints throughout: DuckDB re-inlines plain CTEs per
   * reference, and w$i references w${i-1} TWICE (directly and via
   * b$i -> p$i) — an unrolled 8-merge chain re-evaluated the base
   * representation 2^8 times (x_bpe_encode measured 183 s at sf0.01;
   * materialized: ~2 s, identical output). */
  private def cteSql(merges: Int): String = {
    val head = """WITH w0 AS MATERIALIZED (
        SELECT ' ' || array_to_string(list_transform(range(1, length(w) + 1),
            i -> w[i]), ' ') || ' ' AS repr,
          COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0 GROUP BY w)"""
    val rounds = (1 to merges).map { i =>
      s"""p$i AS MATERIALIZED (SELECT pair, CAST(SUM(freq) AS BIGINT) AS c FROM (
          SELECT freq, unnest(list_transform(range(1, len(sp)),
            k -> sp[k] || ' ' || sp[k + 1])) AS pair
          FROM (SELECT string_split(trim(repr), ' ') AS sp, freq FROM w${i - 1}))
        GROUP BY pair),
      b$i AS MATERIALIZED (SELECT pair, c FROM p$i ORDER BY c DESC, pair LIMIT 1),
      w$i AS MATERIALIZED (SELECT replace(replace(replace(repr,
            ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
            ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' '),
            ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ')
          AS repr, freq
        FROM w${i - 1}, b$i b)"""
    }.mkString(",\n")
    s"$head,\n$rounds"
  }

  /** The unrolled DuckDB oracle for [[trainMerges]], generated from the
    * same constants (mirrors the three replace passes).
    */
  def trainMergesSql(merges: Int): String = {
    val out = (1 to merges).map(i =>
      s"""SELECT $i AS step, pair, replace(pair, ' ', '') AS merged,
        c AS pair_count FROM b$i""").mkString("\nUNION ALL\n")
    s"${cteSql(merges)}\n$out"
  }

  /** The unrolled DuckDB oracle for [[encode]] run with the merges the
    * training oracle itself derives (scalar subqueries against b1..bN).
    */
  def encodeSql(merges: Int): String = {
    val folded = (1 to merges).foldLeft("sym") { (acc, i) =>
      val p = s"(SELECT pair FROM b$i)"
      val m = s"' ' || replace($p, ' ', '') || ' '"
      (1 to 3).foldLeft(acc)((a, _) => s"replace($a, ' ' || $p || ' ', $m)")
    }
    s"""${cteSql(merges)},
      docsym AS (SELECT doc_id,
        ' ' || regexp_replace(text, '(.)', '\\1 ', 'g') AS sym
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(sym, '[^ ]+')) AS BIGINT) AS n_symbols,
        CAST(len(regexp_extract_all($folded, '[^ ]+')) AS BIGINT)
          AS n_bpe_tokens,
        CAST(len(regexp_extract_all(sym, '[^ ]+')) AS DOUBLE)
          / CAST(len(regexp_extract_all($folded, '[^ ]+')) AS DOUBLE)
          AS compression
      FROM docsym"""
  }
}
