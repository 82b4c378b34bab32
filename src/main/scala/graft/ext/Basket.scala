package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association mining over (transaction, item) rows:
  * support / confidence / lift for co-occurring item pairs — the
  * affinity primitive behind recommendations and assortment audits
  * (and, over (document, entity) rows, entity co-occurrence mining).
  * The reference delegates all analytics to its warehouse
  * (SURVEY.md §2.7); this is a standard post-load workload.
  *
  * Every metric is a single double division (or one product each side)
  * of exact integer counts, so rules adjudicate hash-exactly.
  */
object Basket {

  /** Item-pair association rules with pair count ≥ `minSupport`.
    * One row per unordered pair (item_a < item_b): counts, support
    * `n_ab/N`, both directional confidences, and the symmetric lift
    * `n_ab·N / (n_a·n_b)` (>1 = positively associated).
    *
    * Scale shape: the only quadratic-ish step is the within-basket
    * self-join, whose fan-out is the basket size (bounded in real
    * carts; cap pathological baskets upstream). Everything shuffles on
    * transaction or item keys; the item-count side is O(#items) and
    * broadcasts back onto the pairs.
    */
  def associationRules(df: DataFrame, txnCol: Column, itemCol: Column,
      minSupport: Long): DataFrame = {
    val items = df.select(txnCol.as("txn"), itemCol.as("item")).distinct()
    val total = items.select(col("txn")).distinct()
      .agg(count(lit(1)).as("n_txn"))
    val itemCnt = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.txn") === col("b.txn") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(itemCnt.select(col("item").as("item_a"),
        col("n_item").as("n_a")), "item_a")
      .join(itemCnt.select(col("item").as("item_b"),
        col("n_item").as("n_b")), "item_b")
      .crossJoin(total)
      .select(col("item_a"), col("item_b"),
        col("n_ab").cast("bigint").as("n_ab"),
        col("n_a").cast("bigint").as("n_a"),
        col("n_b").cast("bigint").as("n_b"),
        (col("n_ab").cast("double") / col("n_txn").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_to_b"),
        (col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_b_to_a"),
        // multiply in DOUBLE, not BIGINT (the lift3 fix, applied to
        // the 2-way lift it was copied from): n_ab*n_txn wraps
        // silently past ~3e9 transactions under non-ANSI Spark while
        // DuckDB errors — a cross-engine divergence at corpus scale
        (col("n_ab").cast("double") * col("n_txn").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
  }

  /** Item-item neighborhood model (Sarwar et al., WWW'01): for every
    * item, the top-k most similar items by JACCARD of their
    * transaction sets `n_ab / (n_a + n_b − n_ab)` — the
    * memory-based collaborative-filtering primitive ("users who took
    * X also took Y") and, over (document, entity) rows, the
    * entity-neighborhood builder. Similarity is an exact rational of
    * integer counts (one double division at the end); ranking
    * tie-breaks on the neighbor id, and because the doubles come from
    * identical integer operands the order adjudicates exactly.
    *
    * Scale shape: co-occurrence pairs shuffle on the transaction key
    * with per-basket fan-out (the [[associationRules]] trade), counts
    * broadcast back, and the top-k is a per-item rank window over
    * pairs with co-count ≥ `minCo` — output-bound.
    *
    * r10 decimal-width audit: the Jaccard denominator n_i + n_j − n_ab
    * is ADDITIVE in row counts (≤ 3·rows « 2⁶³) — unlike the lift
    * family there is no integer product on this path, so the BIGINT
    * ride is safe at any corpus size.
    */
  def itemNeighbors(df: DataFrame, txnCol: Column, itemCol: Column,
      minCo: Long, k: Int): DataFrame = {
    val items = df.select(txnCol.as("txn"), itemCol.as("item")).distinct()
    val itemCnt = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
    val co = items.as("a")
      .join(items.as("b"),
        col("a.txn") === col("b.txn") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCo)
    val sym = co.select(col("ia").as("item"), col("ib").as("nbr"),
        col("n_ab"))
      .unionByName(co.select(col("ib").as("item"), col("ia").as("nbr"),
        col("n_ab")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item")).orderBy(col("jaccard").desc, col("nbr"))
    sym
      .join(broadcast(itemCnt.select(col("item"), col("n_item").as("n_i"))),
        "item")
      .join(broadcast(itemCnt.select(col("item").as("nbr"),
        col("n_item").as("n_j"))), "nbr")
      .withColumn("jaccard", col("n_ab").cast("double") /
        (col("n_i") + col("n_j") - col("n_ab")).cast("double"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("nbr"),
        col("n_ab").cast("bigint").as("n_ab"),
        col("n_i").cast("bigint").as("n_i"),
        col("n_j").cast("bigint").as("n_j"), col("jaccard"))
  }

  /** Frequent item TRIPLES at `minSupport` — Apriori level 3
    * (Agrawal & Srikant, VLDB'94): per-basket triple enumeration with
    * the level-wise prune applied WHERE IT PAYS, per basket — a
    * basket's items are first restricted to frequent singletons, then
    * its pairs to frequent pairs, so the b·(b−1)·(b−2)/6 triple
    * fan-out only materializes over items that can still qualify.
    * The prune is pure performance: the final support filter alone
    * defines the output (which is how the oracle computes it,
    * prune-free — an independent implementation).
    *
    * Output: ordered triple (a < b < c), count, support n_abc/N, and
    * the 3-way lift n_abc·N² / (n_a·n_b·n_c).
    *
    * Scale shape: everything shuffles on transaction or item keys;
    * the frequent-pair set broadcasts onto the per-basket joins;
    * fan-out is bounded by (frequent items per basket)³ — the
    * documented Apriori trade.
    */
  def frequentTriples(df: DataFrame, txnCol: Column, itemCol: Column,
      minSupport: Long): DataFrame = {
    val items = df.select(txnCol.as("txn"), itemCol.as("item")).distinct()
    val total = items.select(col("txn")).distinct()
      .agg(count(lit(1)).as("n_txn"))
    val itemCnt = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
    val freq1 = itemCnt.filter(col("n_item") >= minSupport)
      .select(col("item"))
    val itemsF = items.join(broadcast(freq1), Seq("item"), "left_semi")
    val freqPairs = itemsF.as("a")
      .join(itemsF.as("b"),
        col("a.txn") === col("b.txn") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("pa"), col("b.item").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
      .select(col("pa"), col("pb"))
    val basketPairs = itemsF.as("a")
      .join(itemsF.as("b"),
        col("a.txn") === col("b.txn") && col("a.item") < col("b.item"))
      .select(col("a.txn").as("txn"), col("a.item").as("ia"),
        col("b.item").as("ib"))
      .join(broadcast(freqPairs),
        col("ia") === col("pa") && col("ib") === col("pb"), "left_semi")
    val triples = basketPairs.as("p")
      .join(itemsF.as("c"),
        col("p.txn") === col("c.txn") && col("c.item") > col("p.ib"))
      .select(col("p.txn").as("txn"), col("ia"), col("ib"),
        col("c.item").as("ic"))
      // Apriori prune: (ia, ic) and (ib, ic) must also be frequent
      .join(broadcast(freqPairs),
        col("ia") === col("pa") && col("ic") === col("pb"), "left_semi")
      .join(broadcast(freqPairs),
        col("ib") === col("pa") && col("ic") === col("pb"), "left_semi")
      .groupBy(col("ia").as("item_a"), col("ib").as("item_b"),
        col("ic").as("item_c"))
      .agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= minSupport)
    triples
      .join(itemCnt.select(col("item").as("item_a"),
        col("n_item").as("n_a")), "item_a")
      .join(itemCnt.select(col("item").as("item_b"),
        col("n_item").as("n_b")), "item_b")
      .join(itemCnt.select(col("item").as("item_c"),
        col("n_item").as("n_c")), "item_c")
      .crossJoin(total)
      .select(col("item_a"), col("item_b"), col("item_c"),
        col("n_abc").cast("bigint").as("n_abc"),
        (col("n_abc").cast("double") / col("n_txn").cast("double"))
          .as("support"),
        // multiply in DOUBLE, not BIGINT: n_txn² passes Long.MaxValue
        // near 1e9 transactions and non-ANSI Spark would wrap silently
        // (DuckDB errors) — a cross-engine divergence at 100 TB scale
        (col("n_abc").cast("double") * col("n_txn").cast("double") *
          col("n_txn").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double") *
            col("n_c").cast("double")))
          .as("lift3"))
  }
}
