package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.H._

/** Relational query surface, part 6: classic TPC-H query shapes adapted
  * to the test schema (no partsupp table; p_type/n_name are synthetic
  * values). Each exercises a distinct multi-join + aggregation pattern
  * the earlier batteries don't: bidirectional nation pairs (Q7), market
  * share with conditional share ratio (Q8), returned-item top-k (Q10),
  * promo-revenue percentage (Q14), avg-quantity threshold subquery (Q17).
  */
object TpcH {

  /** Q7 shape: volume between two nations, both directions, by year.
    * nation broadcast twice (supplier side + customer side); the
    * direction predicate is an OR over the pair.
    */
  val h7VolumeShipping = Q(
    "h7_volume_shipping",
    (s, dir) => {
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("sk"))
        .join(n2, col("c_nationkey") === col("ck"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum38(revenue(col("l_extendedprice"), col("l_discount")), 4, "volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""SELECT supp_nation, cust_nation, l_year,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS volume
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INTEGER) AS l_year,
          l_extendedprice, l_discount
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""))

  /** Q8 shape: market share — one nation's fraction of regional revenue
    * by year; the share is a conditional-sum ratio over the same rows
    * (exact decimal sums, double division at the end).
    */
  val h8MarketShare = Q(
    "h8_market_share",
    (s, dir) => {
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val regionNations = broadcast(nat
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("ck")))
      val suppNation = broadcast(nat
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(regionNations, col("c_nationkey") === col("ck"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("sk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum38(when(col("supp_nation") === "NATION_3",
            revenue(col("l_extendedprice"), col("l_discount")))
            .otherwise(lit(0).cast("decimal(10,2)") * lit(0).cast("decimal(10,2)")), 4, "nation_volume"),
          sum38(revenue(col("l_extendedprice"), col("l_discount")), 4, "total_volume"))
        .withColumn("mkt_share",
          col("nation_volume").cast("double") / col("total_volume").cast("double"))
        .orderBy(col("o_year"))
    },
    Some("""SELECT o_year,
      CAST(CAST(nation_volume AS DECIMAL(38,4)) AS DOUBLE) AS nation_volume,
      CAST(CAST(total_volume AS DECIMAL(38,4)) AS DOUBLE) AS total_volume,
      CAST(nation_volume AS DOUBLE) / CAST(total_volume AS DOUBLE) AS mkt_share
      FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        SUM(CASE WHEN n1.n_name = 'NATION_3'
          THEN CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))
          ELSE CAST(0 AS DECIMAL(10,2)) * CAST(0 AS DECIMAL(10,2)) END) AS nation_volume,
        SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS total_volume
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY 1)
      ORDER BY o_year"""),
    bench = true)

  /** Q10 shape: returned-item revenue, top 20 customers. */
  val h10ReturnedItems = Q(
    "h10_returned_items",
    (s, dir) => {
      val cutoffLo = lit("1996-01-01").cast("timestamp")
      val cutoffHi = lit("1997-01-01").cast("timestamp")
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= cutoffLo && col("o_orderdate") < cutoffHi),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .agg(sum38(revenue(col("l_extendedprice"), col("l_discount")), 4, "revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, c_acctbal,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY c_custkey, c_name, c_acctbal
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** Q14 shape: promo revenue percentage — conditional-sum ratio over a
    * month of shipments joined to part.
    */
  val h14PromoEffect = Q(
    "h14_promo_effect",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          sum38(when(col("p_type") === "PROMO",
            revenue(col("l_extendedprice"), col("l_discount")))
            .otherwise(lit(0).cast("decimal(10,2)") * lit(0).cast("decimal(10,2)")), 4, "promo_rev"),
          sum38(revenue(col("l_extendedprice"), col("l_discount")), 4, "total_rev"))
        .withColumn("promo_pct",
          lit(100.0) * col("promo_rev").cast("double") / col("total_rev").cast("double")),
    Some("""SELECT CAST(CAST(promo_rev AS DECIMAL(38,4)) AS DOUBLE) AS promo_rev,
      CAST(CAST(total_rev AS DECIMAL(38,4)) AS DOUBLE) AS total_rev,
      100.0 * CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS promo_pct
      FROM (SELECT
        SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))
          ELSE CAST(0 AS DECIMAL(10,2)) * CAST(0 AS DECIMAL(10,2)) END) AS promo_rev,
        SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS total_rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01')"""))

  /** Q17 shape: revenue from small-quantity orders of a brand — the
    * per-part average-quantity threshold computed as a grouped aggregate
    * joined back (what Catalyst decorrelates the subquery into).
    */
  val h17SmallQuantity = Q(
    "h17_small_quantity",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val partAvg = li.groupBy(col("l_partkey").as("pk"))
        .agg((lit(0.2) * (sum(dec2(col("l_quantity"))).cast("double") / count(col("l_quantity"))))
          .as("qty_threshold"))
      li.join(t(s, dir, "part").filter(col("p_brand") === "Brand#1"),
          col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .agg(
          (sum(dec2(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#1'
        AND l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(10,2))) AS DOUBLE) / COUNT(l2.l_quantity))
          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)"""))

  val queries: Seq[Q] = Seq(
    h7VolumeShipping, h8MarketShare, h10ReturnedItems, h14PromoEffect,
    h17SmallQuantity)
}
