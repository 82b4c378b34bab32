package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.H._

/** Relational query surface, part 5: classic semantic traps and
  * optimizer-shaped TPC-H patterns — NOT IN null semantics (null-aware
  * anti join), disjunctive predicate pushdown (Q19 shape), min-per-group
  * join-back (Q2 shape), IN + grouped-HAVING subquery (Q18 shape).
  */
object Traps {

  /** NOT IN three-valued logic: against a NULL-free subquery NOT IN
    * behaves like an anti join; one NULL in the subquery makes NOT IN
    * never-true (x <> NULL is UNKNOWN). Both branches run, tagged — the
    * poisoned branch must contribute ZERO rows in both engines. Spark
    * plans this as a null-aware anti join (BroadcastNestedLoopJoin for
    * the null check); rows prove the semantics match ANSI.
    */
  val q45NotInNulls = Q(
    "q45_notin_nulls",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql("""
        SELECT 'clean' AS op, c_custkey FROM customer
        WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_suppkey <= 10)
        UNION ALL
        SELECT 'poisoned' AS op, c_custkey FROM customer
        WHERE c_nationkey NOT IN
          (SELECT CASE WHEN s_suppkey = 1 THEN NULL ELSE s_nationkey END
           FROM supplier WHERE s_suppkey <= 10)
        ORDER BY op, c_custkey""")
    },
    Some("""
      SELECT 'clean' AS op, c_custkey FROM customer
      WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_suppkey <= 10)
      UNION ALL
      SELECT 'poisoned' AS op, c_custkey FROM customer
      WHERE c_nationkey NOT IN
        (SELECT CASE WHEN s_suppkey = 1 THEN NULL ELSE s_nationkey END
         FROM supplier WHERE s_suppkey <= 10)
      ORDER BY op, c_custkey"""))

  /** TPC-H Q19 shape: OR-of-ANDs across join columns — the optimizer
    * must push the common conjuncts below the join and keep the
    * disjunction as a join-level filter; the join itself stays an
    * equi-join on partkey (never a nested loop).
    */
  val q46Disjunctive = Q(
    "q46_disjunctive",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)))
        .agg(sum38(revenue(col("l_extendedprice"), col("l_discount")), 4, "revenue"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)"""))

  /** TPC-H Q2 shape: rows equal to their group's minimum — grouped
    * min + join-back (the scalable idiom; a correlated subquery would
    * decorrelate to exactly this).
    */
  val q47MinPerGroup = Q(
    "q47_min_per_group",
    (s, dir) => {
      val p = t(s, dir, "part")
      val minPrice = p.groupBy(col("p_type").as("t"))
        .agg(min(col("p_retailprice")).as("min_price"))
      p.join(minPrice,
          col("p_type") === col("t") && col("p_retailprice") === col("min_price"))
        .select(col("p_type"), col("p_partkey"), col("p_retailprice"))
        .orderBy(col("p_type"), col("p_partkey"))
    },
    Some("""SELECT p_type, p_partkey, p_retailprice FROM part p
      WHERE p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type)
      ORDER BY p_type, p_partkey"""))

  /** TPC-H Q18 shape: IN over a grouped-HAVING subquery — the large-
    * order customers. Spark plans the IN as a left-semi join on the
    * aggregated key set.
    */
  val q48InHaving = Q(
    "q48_in_having",
    (s, dir) => {
      val bigOrders = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_quantity"))).as("q"))
        .filter(col("q") > 150)
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 150)
      ORDER BY o_orderkey"""))

  /** Outer joins with null extension: left join keeps unmatched left
    * rows (counted via the null-extended side), full outer keeps both.
    * Grouped so the result is stable under any join order/partitioning.
    */
  val q49OuterJoins = Q(
    "q49_outer_joins",
    (s, dir) => {
      val cn = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val sn = t(s, dir, "supplier")
        .filter(col("s_suppkey") <= 10)
        .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_supp"))
      val left = cn.join(sn, col("nk") === col("snk"), "left")
        .select(lit("left").as("op"), col("nk"),
          col("n_cust"), col("n_supp"))
      val full = cn.join(sn, col("nk") === col("snk"), "full")
        .select(lit("full").as("op"),
          coalesce(col("nk"), col("snk")).as("nk"),
          col("n_cust"), col("n_supp"))
      left.unionByName(full).orderBy(col("op"), col("nk"))
    },
    Some("""WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        FROM customer GROUP BY 1),
      sn AS (SELECT s_nationkey AS snk, COUNT(*) AS n_supp
        FROM supplier WHERE s_suppkey <= 10 GROUP BY 1)
      SELECT op, nk, n_cust, n_supp FROM (
        SELECT 'left' AS op, nk, n_cust, n_supp
        FROM cn LEFT JOIN sn ON nk = snk
        UNION ALL
        SELECT 'full' AS op, coalesce(nk, snk) AS nk, n_cust, n_supp
        FROM cn FULL OUTER JOIN sn ON nk = snk)
      ORDER BY op, nk"""))

  /** Explicit NULLS FIRST / NULLS LAST ordering: Spark's default for
    * ascending is NULLS FIRST while DuckDB's is NULLS LAST — both sides
    * spell the placement out, and row_number makes the placement
    * hash-visible (a sort-order bug flips the assigned ranks).
    */
  val q50NullOrdering = Q(
    "q50_null_ordering",
    (s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      val e = t(s, dir, "events")
        // k ≡ 0 (mod 5) nulled so both null placements are exercised
        .select(col("event_id"),
          when(k % 5 === 0, lit(null)).otherwise(k).as("k"))
        .filter(col("event_id") <= 500)
      e.select(col("event_id"), col("k"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("k").asc_nulls_first, col("event_id"))).as("rn_nf"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("k").asc_nulls_last, col("event_id"))).as("rn_nl"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, k,
      CAST(row_number() OVER (ORDER BY k ASC NULLS FIRST, event_id) AS INTEGER) AS rn_nf,
      CAST(row_number() OVER (ORDER BY k ASC NULLS LAST, event_id) AS INTEGER) AS rn_nl
      FROM (SELECT event_id,
        CASE WHEN k % 5 = 0 THEN NULL ELSE k END AS k
        FROM (SELECT event_id,
          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          FROM events) WHERE event_id <= 500)
      ORDER BY event_id"""))

  /** Recursive CTE (Spark 4 WITH RECURSIVE): generate the full month
    * series of the orders date range and LEFT JOIN per-month counts —
    * the gap-filling idiom (months with zero orders still appear).
    */
  val q51RecursiveCte = Q(
    "q51_recursive_cte",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL SELECT add_months(m, 1) FROM months WHERE m < DATE '1998-12-01')
        SELECT m, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON trunc(o_orderdate, 'month') = m
        GROUP BY m ORDER BY m""")
    },
    Some("""WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        WHERE m < DATE '1998-12-01')
      SELECT m, COUNT(o_orderkey) AS n_orders
      FROM months LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
      GROUP BY m ORDER BY m"""))

  val queries: Seq[Q] = Seq(q45NotInNulls, q46Disjunctive, q47MinPerGroup,
    q48InHaving, q49OuterJoins, q50NullOrdering, q51RecursiveCte)
}
