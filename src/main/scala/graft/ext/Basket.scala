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
        ((col("n_ab") * col("n_txn")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
