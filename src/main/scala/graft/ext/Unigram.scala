package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training (Kudo 2018 —
  * public literature): the complement to [[Bpe]] in the tokenizer
  * family. Fixed-round HARD EM over the word-frequency table:
  *
  *  - seed vocabulary: every substring of length ≤ `maxPiece` of every
  *    corpus word (single characters included, so a segmentation always
  *    exists), seeded with occurrence counts weighted by word frequency;
  *  - E-step: Viterbi-segment each word under the current piece
  *    log-probs (DP over character positions, pieces up to `maxPiece`
  *    long; ties prefer the LONGER last piece, then induction makes the
  *    whole path deterministic);
  *  - M-step: piece counts = Viterbi occurrences weighted by word freq;
  *    new probs = add-1-smoothed (cnt + 1)/(total + V) over the FULL
  *    seed vocabulary (smoothing in place of SentencePiece's pruning —
  *    data-dependent vocab shrinkage would break fixed-round replay;
  *    the seed vocab is the V the probabilities live on).
  *
  * Exactly `rounds` EM rounds — fixed, never "until converged"
  * (data-dependent iteration counts break the oracle replay) — then
  * encoding is one more Viterbi pass under the final probs.
  *
  * Determinism: counts are exact integers; every ln is canonicalized
  * through DECIMAL(20,12) ([[Text.lnStable]]); each DP cell is ONE
  * IEEE add of a previous cell and a canonical log-prob, so by
  * induction every cell, comparison, and backpointer is bit-identical
  * cross-engine. The DuckDB oracle unrolls every pass — seed counts,
  * each round's DP cells (lateral aliases + correlated piece lookups),
  * the backpointer walk, the count re-estimation — from the same
  * constants (the [[Bpe.trainMergesSql]] discipline).
  *
  * Scale shape (100 TB): training runs on the WORD-FREQUENCY table
  * (one corpus-scale groupBy, then O(vocabulary) rows per round — the
  * [[Bpe]] shape). Candidate piece scores come from ONE broadcast
  * equi-join of the O(n·maxPiece) exploded (word, j, len) candidates
  * against the O(seed) prob table (outgrows a broadcast → becomes a
  * shuffle equi-join on the piece key, never all-pairs); the DP itself
  * is a narrow per-row pass over the per-word score map. Encoding
  * joins the corpus token stream against the O(vocabulary) learned
  * segmentation — broadcast again.
  *
  * Unroll bound: words longer than `maxN` characters raise loudly
  * (the pid-guard discipline) — the oracle's DP reach is `maxN` cells,
  * and a silent truncation would corrupt both sides differently.
  */
object Unigram {

  /** Corpus word-frequency table: (w, freq). */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).cast("bigint").as("freq"))

  /** Seed piece occurrence counts: every substring of length ≤ maxPiece
    * at every start position, weighted by word frequency.
    */
  def seedCounts(wq: DataFrame, maxPiece: Int): DataFrame =
    wq.withColumn("_j", explode(sequence(lit(0), length(col("w")) - 1)))
      .withColumn("_l", explode(sequence(lit(1),
        least(lit(maxPiece), length(col("w")) - col("_j")))))
      .select(col("w").substr(col("_j") + 1, col("_l")).as("piece"),
        col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).cast("bigint").as("c"))

  /** Add-1-smoothed canonical log-probs over the seed vocabulary from
    * a (piece, cnt) table (cnt may be missing → 0).
    */
  private def smoothedProbs(seedPieces: DataFrame, cnts: DataFrame): DataFrame = {
    val tot = cnts.agg(sum(col("cnt")).cast("bigint").as("tot"))
    val v = seedPieces.agg(count(lit(1)).cast("bigint").as("v"))
    seedPieces.select(col("piece"))
      .join(cnts, Seq("piece"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(v))
      .select(col("piece"), col("cnt"),
        Text.lnStable((col("cnt") + 1L).cast("double") /
          (col("tot") + col("v")).cast("double")).as("lp"))
  }

  /** One Viterbi pass: segment every word of `wq` under `probs`
    * (piece, lp). Returns (w, freq, pieces) with pieces in REVERSE
    * order (backpointer walk order — count-invariant; reverse for
    * display). DP cells are materialized COLUMNS (b1..bN, p1..pN):
    * composing them as nested expressions would grow the tree
    * 4^maxN-fold (the winnow staging lesson).
    */
  def viterbiPass(wq: DataFrame, probs: DataFrame, maxPiece: Int,
      maxN: Int): DataFrame = {
    // the score-map key is j*100+i — maxN >= 100 would silently
    // collide keys and mis-segment rather than error (r13 advice)
    require(maxN < 100,
      s"unigram: maxN=$maxN collides the j*100+i score-map key space")
    val NEG = lit(-1e9)
    // per-word candidate score map: key j*100 + i for the piece
    // spanning (j, i]; ONE broadcast equi-join for all lookups
    val scored = wq
      .withColumn("_j", explode(sequence(lit(0), length(col("w")) - 1)))
      .withColumn("_l", explode(sequence(lit(1),
        least(lit(maxPiece), length(col("w")) - col("_j")))))
      .withColumn("piece", col("w").substr(col("_j") + 1, col("_l")))
      .join(broadcast(probs.select(col("piece"), col("lp"))),
        Seq("piece"), "left")
      .groupBy(col("w"), col("freq"))
      .agg(map_from_entries(collect_list(struct(
        (col("_j") * 100 + col("_j") + col("_l")).as("k"),
        coalesce(col("lp"), NEG).as("v")))).as("_scm"))

    def sc(j: Int, i: Int): Column =
      coalesce(element_at(col("_scm"), lit(j * 100 + i)), NEG)

    var df = scored
      .withColumn("_n", length(col("w")))
      // loud unroll guard: the oracle's DP reach is maxN cells
      .withColumn("_b0",
        when(col("_n") > maxN, raise_error(concat(
          lit(s"unigram: word longer than the $maxN-cell DP unroll: '"),
          col("w"), lit("' — raise maxN (and regenerate the oracle)"))))
          .otherwise(lit(0.0)))
    for (i <- 1 to maxN) {
      val js = math.max(0, i - maxPiece) until i
      val cands = js.map(j => col(s"_b$j") + sc(j, i))
      val best = if (cands.size == 1) cands.head else greatest(cands: _*)
      df = df.withColumn(s"_b$i", best)
      // first j (ascending) achieving the max = longest last piece wins
      val ptrChain = js.zip(cands).tail
        .foldLeft(when(cands.head === col(s"_b$i"), js.head)) {
          case (acc, (j, c)) => acc.when(c === col(s"_b$i"), j)
        }
      df = df.withColumn(s"_p$i", ptrChain)
    }
    // backpointer walk: e0 = n, e_{k+1} = ptr[e_k] (0 once done)
    def ptrAt(e: Column): Column =
      (1 to maxN).foldLeft(lit(0)) { (acc, i) =>
        when(e === i, col(s"_p$i")).otherwise(acc)
      }
    df = df.withColumn("_e0", col("_n"))
    for (k <- 0 until maxN)
      df = df.withColumn(s"_e${k + 1}", ptrAt(col(s"_e$k")))
    val pcs = (0 until maxN).map { k =>
      when(col(s"_e$k") > 0,
        col("w").substr(col(s"_e${k + 1}") + 1,
          col(s"_e$k") - col(s"_e${k + 1}")))
    }
    // PINNED before returning (Iter round discipline, and a hard
    // requirement here): stacking explode/groupBy on the staged DP
    // column chain sends the optimizer into exponential alias
    // re-inlining of the walk CASE chains (each e_{k+1} references e_k
    // once per CASE arm — measured: cnt-over-DP never finishes
    // optimizing even at maxN=6, while the pass alone optimizes to a
    // 45-node plan). The pass output is O(word vocabulary) rows.
    Iter.pin(df.select(col("w"), col("freq"),
      filter(array(pcs: _*), x => x.isNotNull).as("pieces")))
  }

  /** Train the unigram LM: `rounds` hard-EM rounds from the seed.
    * Returns the final model table (piece, cnt, lp) — cnt is the last
    * round's Viterbi count, lp the smoothed final log-prob.
    */
  def train(docs: DataFrame, textCol: String, maxPiece: Int = 4,
      maxN: Int = 12, rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && maxPiece >= 1 && maxN >= maxPiece)
    require(maxN < 100,
      s"unigram: maxN=$maxN collides the j*100+i score-map key space")
    val wq = wordFreqs(docs, textCol).transform(Iter.pin)
    val seed = seedCounts(wq, maxPiece).transform(Iter.pin)
    var probs = smoothedProbs(seed,
      seed.select(col("piece"), col("c").as("cnt"))).transform(Iter.pin)
    for (_ <- 1 to rounds) {
      val segged = viterbiPass(wq, probs, maxPiece, maxN)
      val cnt = segged
        .select(col("freq"), explode(col("pieces")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).cast("bigint").as("cnt"))
      probs = smoothedProbs(seed, cnt).transform(Iter.pin)
    }
    probs
  }

  /** Encode the corpus with the trained model: one more Viterbi pass
    * under the final probs, then a per-doc rollup over the token
    * stream (broadcast word → piece-count map). Output per doc:
    * token/char/piece counts and chars-per-piece (the tokenizer
    * fertility statistic corpus work budgets with).
    */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      maxPiece: Int = 4, maxN: Int = 12, rounds: Int = 2): DataFrame = {
    val probs = train(docs, textCol, maxPiece, maxN, rounds)
    val wq = wordFreqs(docs, textCol)
    val wseg = viterbiPass(wq, probs, maxPiece, maxN)
      .select(col("w"), size(col("pieces")).cast("bigint").as("n_pieces"))
    docs.select(col(idCol).as("doc_id"),
        explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(wseg), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_tokens"),
        sum(length(col("w"))).cast("bigint").as("n_chars"),
        sum(col("n_pieces")).cast("bigint").as("n_pieces"))
      .withColumn("chars_per_piece",
        col("n_chars").cast("double") / col("n_pieces").cast("double"))
  }

  // ---- DuckDB oracle generators (unrolled, from the same constants) ----

  /** One DP + walk + segmentation pass reading probs from `vt`,
    * emitting CTEs scm$t / dp$t_* / wk$t / seg$t. The candidate scores
    * are pre-joined into WIDE COLUMNS (s{j}_{i}) by one equi-join of
    * the exploded (word, j, len) candidates against the prob table —
    * the engine's score-map formulation exactly, and a necessity here:
    * DuckDB cannot re-reference a lateral alias whose expression
    * contains a subquery, so the DP must be subquery-free.
    *
    * STAGING (the r13 red-gate fix): every DP cell and every
    * backpointer-walk step is its OWN MATERIALIZED CTE — the r12
    * lateral-alias formulation chained b_i → b_{i−1} → … inside one
    * SELECT, and DuckDB re-inlines lateral aliases per reference, so
    * the expression tree grew ~maxPiece^maxN-fold (measured: the walk
    * CTE alone exceeded 60 s on a 31-word vocabulary and the full
    * oracle never finished — the driver's compare hung and the round's
    * correctness artifact came back empty). Here each stage reads only
    * MATERIALIZED columns of the previous stage, so every cell is
    * computed once — the exact mirror of the engine's staged-column /
    * Iter.pin discipline, and the same fix the curate oracles use for
    * DuckDB's plain-CTE re-inlining.
    */
  private def passSql(t: Int, vt: String, maxPiece: Int, maxN: Int): String = {
    val pairs = for {
      j <- 0 until maxN; l <- 1 to maxPiece if j + l <= maxN
    } yield (j, j + l)
    val scCols = pairs.map { case (j, i) =>
      s"          MAX(CASE WHEN j = $j AND j + l = $i THEN lp END) AS s${j}_$i"
    }.mkString(",\n")
    // one MATERIALIZED CTE per DP cell: b_i/p_i from stage i-1's
    // materialized columns only (expanded GREATEST per CASE arm — no
    // lateral aliases anywhere, so nothing can re-inline)
    val dpStages = (1 to maxN).map { i =>
      val js = math.max(0, i - maxPiece) until i
      val cands = js.map(j => s"(b$j + COALESCE(s${j}_$i, -1000000000.0))")
      val bExpr =
        if (cands.size == 1) cands.head
        else cands.mkString("GREATEST(", ", ", ")")
      // first j (ascending) achieving the max = longest last piece wins
      val pExpr = "CASE " + js.zip(cands).map { case (j, c) =>
        s"WHEN $c = $bExpr THEN $j" }.mkString(" ") + " END"
      val prev = if (i == 1) s"dp${t}_0" else s"dp${t}_${i - 1}"
      s"""      dp${t}_$i AS MATERIALIZED (SELECT *, $bExpr AS b$i,
          $pExpr AS p$i FROM $prev)"""
    }.mkString(",\n")
    // one MATERIALIZED CTE per walk step: e_{k+1} = ptr[e_k]
    val wkStages = (0 until maxN).map { k =>
      val cases = (1 to maxN).map(i => s"WHEN $i THEN p$i").mkString(" ")
      val prev = if (k == 0) s"wk${t}_0" else s"wk${t}_$k"
      s"""      wk${t}_${k + 1} AS MATERIALIZED (SELECT *,
          CASE e$k $cases ELSE 0 END AS e${k + 1} FROM $prev)"""
    }.mkString(",\n")
    val pcs = (0 until maxN).map { k =>
      s"          CASE WHEN e$k > 0 THEN substr(w, e${k + 1} + 1, e$k - e${k + 1}) END AS pc$k"
    }.mkString(",\n")
    val pcList = (0 until maxN).map(k => s"pc$k").mkString("[", ", ", "]")
    s"""scm$t AS MATERIALIZED (SELECT w, freq,
$scCols
        FROM (SELECT wq.w, wq.freq, t1.j, t2.l, v.lp
          FROM wq CROSS JOIN range(0, $maxN) t1(j)
            CROSS JOIN range(1, ${maxPiece + 1}) t2(l)
          LEFT JOIN $vt v
            ON v.piece = substr(w, CAST(j AS INT) + 1, CAST(l AS INT))
          WHERE j < length(w) AND j + l <= length(w))
        GROUP BY w, freq),
      dp${t}_0 AS (SELECT *, length(w) AS n,
          CAST(0.0 AS DOUBLE) AS b0 FROM scm$t),
$dpStages,
      wk${t}_0 AS (SELECT *, n AS e0 FROM dp${t}_$maxN),
$wkStages,
      wk$t AS MATERIALIZED (SELECT *,
$pcs
        FROM wk${t}_$maxN),
      seg$t AS (SELECT w, freq,
          unnest(list_filter($pcList, x -> x IS NOT NULL)) AS piece
        FROM wk$t)"""
  }

  /** Count re-estimation + smoothing after pass `t` → prob CTE v$t. */
  private def restimateSql(t: Int): String =
    s"""cnt$t AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM seg$t GROUP BY piece),
      tot$t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM cnt$t),
      v$t AS MATERIALIZED (SELECT s.piece, COALESCE(c.cnt, 0) AS cnt,
          CAST(CAST(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
            CAST(tt.tot + t0.v AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE) AS lp
        FROM seed s LEFT JOIN cnt$t c USING (piece), tot$t tt, tot0 t0)"""

  /** Shared CTE head: word freqs, seed counts, seed probs v0, then
    * `rounds` unrolled EM passes ending in v$rounds.
    */
  private def cteSql(maxPiece: Int, maxN: Int, rounds: Int): String = {
    val head = s"""WITH wq AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0 GROUP BY w),
      so AS (SELECT substr(w, j + 1, l) AS piece, freq
        FROM wq, range(0, $maxN) t1(j), range(1, ${maxPiece + 1}) t2(l)
        WHERE j < length(w) AND j + l <= length(w)),
      seed AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS c
        FROM so GROUP BY piece),
      tot0 AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS tot,
        CAST(COUNT(*) AS BIGINT) AS v FROM seed),
      v0 AS MATERIALIZED (SELECT piece, c AS cnt,
          CAST(CAST(ln(CAST(c + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE))
            AS DECIMAL(20,12)) AS DOUBLE) AS lp
        FROM seed, tot0)"""
    val passes = (1 to rounds).map { t =>
      s"${passSql(t, s"v${t - 1}", maxPiece, maxN)},\n      ${restimateSql(t)}"
    }.mkString(",\n      ")
    s"$head,\n      $passes"
  }

  /** Unrolled oracle for [[train]]. */
  def trainSql(maxPiece: Int = 4, maxN: Int = 12, rounds: Int = 2): String =
    s"""${cteSql(maxPiece, maxN, rounds)}
      SELECT piece, cnt, lp FROM v$rounds ORDER BY piece"""

  /** Unrolled oracle for [[encode]]: one more pass under v$rounds,
    * then the per-doc rollup.
    */
  def encodeSql(maxPiece: Int = 4, maxN: Int = 12, rounds: Int = 2): String = {
    val enc = rounds + 1
    s"""${cteSql(maxPiece, maxN, rounds)},
      ${passSql(enc, s"v$rounds", maxPiece, maxN)},
      wseg AS MATERIALIZED (SELECT w,
          CAST(len(list_filter(${(0 until maxN).map(k => s"pc$k").mkString("[", ", ", "]")},
            x -> x IS NOT NULL)) AS BIGINT) AS n_pieces
        FROM wk$enc),
      tokd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(length(w)) AS BIGINT) AS n_chars,
        CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
        CAST(SUM(length(w)) AS DOUBLE) / CAST(SUM(n_pieces) AS DOUBLE)
          AS chars_per_piece
      FROM tokd JOIN wseg USING (w) WHERE length(w) > 0
      GROUP BY doc_id ORDER BY doc_id"""
  }
}
