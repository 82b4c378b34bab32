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

  /** Q12 shape: shipping-delay vs order-priority cross-tab. The test
    * lineitem has no shipmode/commitdate/receiptdate, so "mode" becomes
    * l_linestatus and "late" becomes shipped more than 90 days after the
    * order date — same join + conditional-count skeleton: for each
    * status, how many late lines belonged to critical-priority orders
    * vs not.
    */
  val h12ShippingPriority = Q(
    "h12_shipping_priority",
    (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).cast("bigint").as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).cast("bigint").as("low_line_count"))
        .orderBy(col("l_linestatus")),
    Some("""SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Q13 shape: customer order-count distribution (custdist) — the
    * canonical LEFT-join-then-histogram: customers with zero orders must
    * survive into the c_count=0 bucket, which an inner join would lose.
    * The "special requests" exclusion maps to dropping NOT-SPECIFIED
    * priority orders before the join.
    */
  val h13CustDist = Q(
    "h13_cust_dist",
    (s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_custkey"), col("o_orderkey"))
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).cast("bigint").as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN (
          SELECT o_custkey, o_orderkey FROM orders
          WHERE o_orderpriority <> '4-NOT SPECIFIED') ON c_custkey = o_custkey
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** Q15 shape: top supplier by revenue over a quarter — the
    * revenue-view + scalar-MAX-subquery pattern. The max comparison
    * happens on the EXACT decimal sums (cast to double only at output),
    * so both engines select identical winners even in principle-tie
    * cases.
    */
  val h15TopSupplier = Q(
    "h15_top_supplier",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("decimal(38,4)").as("total_rev"))
      val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.join(broadcast(maxRev), col("total_rev") === col("max_rev"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DECIMAL(38,4)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      ORDER BY s_suppkey"""))

  /** Q18 shape: large-volume customers — orders whose total quantity
    * clears a threshold, with customer attribution and the quantity sum
    * re-aggregated in the outer query. The IN-subquery half of the
    * pattern is q48; this is the full join + double-aggregation form.
    */
  val h18LargeVolume = Q(
    "h18_large_volume",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("bk"))
        .agg(sum(dec2(col("l_quantity"))).as("q"))
        .filter(col("q") > 300)
        .select(col("bk"))
      t(s, dir, "lineitem")
        .join(big, col("l_orderkey") === col("bk"), "left_semi")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(dec2(col("l_quantity"))).cast("decimal(38,2)")
          .cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 300)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** Q21 shape: suppliers who kept orders waiting — the only supplier
    * that shipped late in a multi-supplier finished order. Without
    * commit/receipt dates, "late" is shipped >60 days after the order
    * date. The EXISTS (another supplier in the order) becomes a
    * left-semi self-join, the NOT EXISTS (another LATE supplier)
    * a left-anti self-join — the classic double-correlated-subquery
    * decorrelation.
    */
  val h21WaitingSupplier = Q(
    "h21_waiting_supplier",
    (s, dir) => {
      val lateCut = expr("INTERVAL 60 DAYS")
      val ordersF = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      // distinct (order, supplier) pairs, flagged late if ANY of the
      // supplier's lines in that order shipped late
      val pairs = t(s, dir, "lineitem")
        .join(ordersF, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") > col("o_orderdate") + lateCut, 1L)
          .otherwise(0L)).as("late"))
      val l1 = pairs.filter(col("late") === 1L)
        .select(col("l_orderkey").as("k1"), col("l_suppkey").as("s1"))
      val others = pairs
        .select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val otherLate = pairs.filter(col("late") === 1L)
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      val waiting = l1
        .join(others, col("k1") === col("k2") && col("s1") =!= col("s2"),
          "left_semi")
        .join(otherLate, col("k1") === col("k3") && col("s1") =!= col("s3"),
          "left_anti")
      waiting
        .join(t(s, dir, "supplier"), col("s1") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).cast("bigint").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""WITH pairs AS (
        SELECT l_orderkey, l_suppkey,
          MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey)
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM pairs l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE l1.late = 1
        AND EXISTS (SELECT 1 FROM pairs l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM pairs l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** Q22 shape: global sales opportunity — customers in a set of
    * "country codes" (nationkey mod 10 stands in for the phone prefix)
    * with above-average positive balances and no RECENT orders (the
    * generated data is FK-complete — every customer has SOME order —
    * so the anti-join is scoped to orders since 1999, keeping the
    * NOT-EXISTS shape substantive): scalar AVG subquery + scoped
    * NOT EXISTS anti-join + final per-code rollup.
    */
  val h22GlobalSales = Q(
    "h22_global_sales",
    (s, dir) => {
      val codes = Seq(1, 2, 3, 4, 5).map(lit(_))
      val cust = t(s, dir, "customer")
        .withColumn("cntrycode", pmod(col("c_nationkey"), lit(10)))
        .filter(col("cntrycode").isin(codes: _*))
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(dec2(col("c_acctbal"))).cast("double") /
          count(lit(1))).as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal").cast("double") > col("avg_bal"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).cast("bigint").as("numcust"),
          sum38(dec2(col("c_acctbal")), 2, "totacctbal"))
        .orderBy(col("cntrycode"))
    },
    Some("""SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
      CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
      FROM (SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey
        FROM customer WHERE c_nationkey % 10 IN (1,2,3,4,5)) cs
      WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*)
          FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1,2,3,4,5))
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY cntrycode ORDER BY cntrycode"""))

  /** Q2 shape: minimum-cost supplier — the correlated-scalar-MIN
    * subquery. No partsupp table, so "cost" is the supplier's account
    * balance and the part-supplier relation is the distinct
    * (l_partkey, l_suppkey) pairs observed in lineitem: for each
    * qualifying part, keep only the supplier(s) at the per-part MIN
    * balance. The min is taken on the exact decimal, so tie selection
    * is engine-independent.
    */
  val h2MinCostSupplier = Q(
    "h2_min_cost_supplier",
    (s, dir) => {
      val pf = t(s, dir, "part")
        .filter(col("p_type") === "SMALL" && col("p_size") <= 10)
        .select(col("p_partkey"), col("p_name"))
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(pf, col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
      val minBal = ps.groupBy(col("p_partkey").as("mk"))
        .agg(min(dec2(col("s_acctbal"))).as("min_bal"))
      ps.join(minBal,
          col("p_partkey") === col("mk") && dec2(col("s_acctbal")) === col("min_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    Some("""WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      FROM ps
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'SMALL' AND p_size <= 10
        AND CAST(s_acctbal AS DECIMAL(10,2)) = (
          SELECT MIN(CAST(s2.s_acctbal AS DECIMAL(10,2)))
          FROM ps ps2 JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
          WHERE ps2.l_partkey = ps.l_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""))

  /** Q4 shape: order-priority checking — EXISTS decorrelated to a
    * left-semi join whose extra predicate references BOTH sides
    * (l_shipdate vs o_orderdate+30), then a priority histogram over a
    * one-quarter order window.
    */
  val h4OrderPriority = Q(
    "h4_order_priority",
    (s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      ord.join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("bigint").as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Q6 shape: forecast revenue change — the pure scan-aggregate with
    * three stacked selective predicates; everything should reach the
    * parquet scan as pushed filters, no join, no shuffle beyond the
    * final 1-row reduce.
    */
  val h6ForecastRevenue = Q(
    "h6_forecast_revenue",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          dec2(col("l_discount")).between(
            lit("0.03").cast("decimal(10,2)"), lit("0.07").cast("decimal(10,2)")) &&
          col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("decimal(38,4)").cast("double").as("revenue")),
    Some("""SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(l_discount AS DECIMAL(10,2))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND CAST(l_discount AS DECIMAL(10,2)) BETWEEN 0.03 AND 0.07
        AND l_quantity < 24"""))

  /** Q9 shape: product-type profit — the expression-heavy 5-way join
    * with a LIKE filter and a profit term mixing two decimal products
    * of different scales. No partsupp, so supply cost is modeled as
    * 10% of the part's retail price per unit.
    */
  val h9ProductProfit = Q(
    "h9_product_profit",
    (s, dir) => {
      val pf = t(s, dir, "part")
        .filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val amount = revenue(col("l_extendedprice"), col("l_discount")) -
        dec2(col("p_retailprice")) * dec2(col("l_quantity")) *
          lit("0.1").cast("decimal(10,2)")
      t(s, dir, "lineitem")
        .join(pf, col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount).cast("decimal(38,6)").cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      CAST(CAST(SUM(
        CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))
        - CAST(p_retailprice AS DECIMAL(10,2)) * CAST(l_quantity AS DECIMAL(10,2)) * CAST(0.1 AS DECIMAL(10,2))
      ) AS DECIMAL(38,6)) AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC"""))

  /** Q11 shape: important stock — per-key aggregate kept only if it
    * clears a FRACTION of the same aggregate over the whole scope
    * (group-HAVING against a scalar subquery over identical rows).
    * Scope is one supplier nation; "value" is shipped extended price.
    */
  val h11ImportantStock = Q(
    "h11_important_stock",
    (s, dir) => {
      val scoped = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
      val perPart = scoped.groupBy(col("l_partkey"))
        .agg(sum(dec2(col("l_extendedprice"))).cast("decimal(38,2)").as("v"))
      val total = perPart.agg(sum(col("v")).cast("decimal(38,2)").as("tot"))
      perPart.crossJoin(broadcast(total))
        .filter(col("v").cast("double") > col("tot").cast("double") * 0.001)
        .select(col("l_partkey"), col("v").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("""WITH scoped AS (
        SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(10,2)) AS ep
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1')
      SELECT l_partkey, CAST(CAST(SUM(ep) AS DECIMAL(38,2)) AS DOUBLE) AS value
      FROM scoped GROUP BY l_partkey
      HAVING CAST(CAST(SUM(ep) AS DECIMAL(38,2)) AS DOUBLE) > (
        SELECT CAST(CAST(SUM(ep) AS DECIMAL(38,2)) AS DOUBLE) * 0.001 FROM scoped)
      ORDER BY value DESC, l_partkey"""))

  /** Q16 shape: parts/supplier relationship — NOT IN decorrelated to a
    * left-anti join, then COUNT(DISTINCT) over a three-column group.
    * The excluded-supplier set stands in for the comment-LIKE filter.
    */
  val h16SupplierCnt = Q(
    "h16_supplier_cnt",
    (s, dir) => {
      val pf = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" &&
          !col("p_type").like("PROMO%") &&
          col("p_size").isin(1, 5, 10, 15, 20, 25))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val excl = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 1000.0).select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(pf, col("l_partkey") === col("p_partkey"))
        .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).cast("bigint").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
        CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (1, 5, 10, 15, 20, 25)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** Q19 shape: discounted revenue — the disjunction-of-conjunctions
    * join predicate (brand × size-range × quantity-range, OR'd three
    * ways). Catalyst must keep the common join key conjunct
    * (l_partkey = p_partkey) out of the OR so the join stays an
    * equi-join with a residual filter.
    */
  val h19DiscountedRevenue = Q(
    "h19_discounted_revenue",
    (s, dir) => {
      val branch = (brand: String, sizeMax: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand &&
          col("p_size").between(1, sizeMax) &&
          col("l_quantity").between(qLo, qHi)
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(branch("Brand#12", 5, 1, 11) ||
          branch("Brand#23", 10, 10, 20) ||
          branch("Brand#34", 15, 20, 30))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("decimal(38,4)").cast("double").as("revenue"))
    },
    Some("""SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
          AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
          AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 20 AND 30)"""))

  /** Q20 shape: potential part promotion — the double-nested semi-join
    * with a correlated 0.5× threshold. Without partsupp availqty, a
    * supplier qualifies when its 1997 shipped quantity of some
    * small-part exceeds half that part's total 1997 quantity
    * (a "dominant supplier": at most one per part, naturally sparse).
    * Threshold compares doubles derived from exact decimal sums.
    */
  val h20PotentialPromotion = Q(
    "h20_potential_promotion",
    (s, dir) => {
      val pf = t(s, dir, "part")
        .filter(col("p_name").like("small%")).select(col("p_partkey"))
      val q97 = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(pf, col("l_partkey") === col("p_partkey"), "left_semi")
      val perPS = q97.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec2(col("l_quantity"))).cast("decimal(38,2)").as("sq"))
      val perP = q97.groupBy(col("l_partkey").as("pk"))
        .agg(sum(dec2(col("l_quantity"))).cast("decimal(38,2)").as("tq"))
      val dominant = perPS.join(perP, col("l_partkey") === col("pk"))
        .filter(col("sq").cast("double") > col("tq").cast("double") * 0.5)
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },
    Some("""WITH q97 AS (
        SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(10,2)) AS q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part
            WHERE p_name LIKE 'small%')),
      per_ps AS (SELECT l_partkey, l_suppkey,
          CAST(SUM(q) AS DECIMAL(38,2)) AS sq
        FROM q97 GROUP BY l_partkey, l_suppkey),
      per_p AS (SELECT l_partkey, CAST(SUM(q) AS DECIMAL(38,2)) AS tq
        FROM q97 GROUP BY l_partkey)
      SELECT s_name, s_acctbal
      FROM supplier
      WHERE s_suppkey IN (
        SELECT DISTINCT per_ps.l_suppkey
        FROM per_ps JOIN per_p ON per_ps.l_partkey = per_p.l_partkey
        WHERE CAST(sq AS DOUBLE) > CAST(tq AS DOUBLE) * 0.5)
      ORDER BY s_name"""))

  val queries: Seq[Q] = Seq(
    h7VolumeShipping, h8MarketShare, h10ReturnedItems, h14PromoEffect,
    h17SmallQuantity, h12ShippingPriority, h13CustDist, h15TopSupplier,
    h18LargeVolume, h21WaitingSupplier, h22GlobalSales,
    h2MinCostSupplier, h4OrderPriority, h6ForecastRevenue, h9ProductProfit,
    h11ImportantStock, h16SupplierCnt, h19DiscountedRevenue,
    h20PotentialPromotion)
}
