package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.H._

/** Relational query surface, part 1: scans, filters, joins (broadcast /
  * shuffled / semi / anti / range), aggregations, top-k, set ops
  * (SURVEY.md §2.7).
  *
  * The reference (etl.py) delegates all relational execution to BigQuery
  * after load (`load_to_bq`, etl.py:1156); our engine internalizes that
  * layer as Catalyst plans. Each query exercises one operator category
  * over the TESTDATA.md tables and carries a DuckDB oracle.
  *
  * Scale notes are attached per query: what shuffles, what broadcasts,
  * and why the plan survives 1000 executors.
  */
object Relational {

  /** TPC-H Q1 shape: scan → filter (pushed to parquet) → partial+final
    * hash agg (6 groups → negligible shuffle) → sort. At 100 TB: the agg
    * is map-side combined into 6 rows per partition; no skew possible.
    */
  val q1PricingSummary = Q(
    "q1_pricing_summary",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum38(dec2(col("l_quantity")), 2, "sum_qty"),
          sum38(dec2(col("l_extendedprice")), 2, "sum_base_price"),
          sum38(revenue(col("l_extendedprice"), col("l_discount")), 4, "sum_disc_price"),
          sum38(revenue(col("l_extendedprice"), col("l_discount"))
            * (one2 + dec2(col("l_tax"))), 6, "sum_charge"),
          avgViaDec(col("l_quantity"), "avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2))) * (CAST(1 AS DECIMAL(10,2)) + CAST(l_tax AS DECIMAL(10,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** Global top-k: Spark's TakeOrderedAndProject — each partition keeps
    * only its local top 10, the driver merges k·numPartitions rows. No
    * full sort, no shuffle of data-sized input. Tie-broken on the key.
    */
  val q2TopkOrders = Q(
    "q2_topk_orders",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** TPC-H Q3 shape: dim-filtered customer broadcast into orders, then
    * shuffle join to lineitem on orderkey, agg, top-k. At scale: customer
    * post-filter is ~1/5 of customers — still broadcastable at sf where
    * customers ≪ lineitem; the lineitem join shuffles on l_orderkey which
    * is near-uniform (no skew).
    */
  val q3ShippingPriority = Q(
    "q3_shipping_priority",
    (s, dir) => {
      val cutoff = lit("1998-06-01").cast("timestamp")
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum38(revenue(col("l_extendedprice"), col("l_discount")), 4, "revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01'
        AND l_shipdate > TIMESTAMP '1998-06-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    bench = true)

  /** Left-semi join (EXISTS): orders with at least one heavy lineitem.
    * Semi-join output carries only the left side, so the shuffle payload
    * is the filtered orders, and duplicate matches are never materialized.
    */
  val q4SemiJoin = Q(
    "q4_semi_join",
    (s, dir) => {
      val heavy = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q5 shape: two broadcast dims (region→nation) + three-way fact
    * join; the customer/supplier nation equality is applied post-join.
    * nation/region are O(10²) rows forever — always broadcast.
    */
  val q5LocalSupplierVolume = Q(
    "q5_local_supplier_volume",
    (s, dir) => {
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val asiaNations = broadcast(
        nat.join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum38(revenue(col("l_extendedprice"), col("l_discount")), 4, "revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""),
    bench = true)

  /** TPC-H Q6 shape: pure scan+filter+agg — the predicate and the two
    * needed columns are pushed into the parquet scan (PushedFilters /
    * ReadSchema); the whole query is one WholeStageCodegen span plus a
    * single-row exchange.
    */
  val q6RevenueForecast = Q(
    "q6_revenue_forecast",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum38(dec2(col("l_extendedprice")) * dec2(col("l_discount")), 4, "revenue")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(l_discount AS DECIMAL(10,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
    bench = true)

  /** Left-anti join (NOT EXISTS): orders with no lineitems. */
  val q7AntiJoin = Q(
    "q7_anti_join",
    (s, dir) => {
      val liKeys = t(s, dir, "lineitem").select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(liKeys, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_empty"),
          sum38(dec2(col("o_totalprice")), 2, "total_value"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_empty,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS total_value
      FROM orders WHERE NOT EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Distinct aggregates: Catalyst expands these into a two-phase
    * partial-distinct plan (Expand + two aggregates) — no driver work.
    */
  val q13DistinctAgg = Q(
    "q13_distinct_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          sum_distinct(dec2(col("l_quantity"))).cast("decimal(38,2)")
            .cast("double").as("sum_dist_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
      CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_dist_qty,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Set operations: INTERSECT / EXCEPT have SQL bag-to-set semantics in
    * both engines; results are tagged and unioned for one comparison.
    */
  val q14SetOps = Q(
    "q14_setops",
    (s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      val both = cn.intersect(sn).withColumn("op", lit("both"))
      val custOnly = cn.except(sn).withColumn("op", lit("cust_only"))
      val all = cn.union(sn).distinct().withColumn("op", lit("any"))
      both.unionByName(custOnly).unionByName(all)
        .select(col("op"), col("nationkey"))
        .orderBy(col("op"), col("nationkey"))
    },
    Some("""SELECT op, nationkey FROM (
      SELECT 'both' AS op, nationkey FROM
        (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'cust_only' AS op, nationkey FROM
        (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'any' AS op, nationkey FROM
        (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
      ) ORDER BY op, nationkey"""))

  /** Theta/range join against a tiny inline band table — broadcast
    * nested-loop with a range predicate. The band table is O(1); at scale
    * this is the bucketize-by-broadcast pattern (never a shuffle).
    */
  val q20RangeJoin = Q(
    "q20_range_join",
    (s, dir) => {
      val bands = Seq(
        ("budget", 900.0, 935.0),
        ("mid", 935.0, 970.0),
        ("premium", 970.0, 1000.0))
      val bandDf = s.createDataFrame(bands).toDF("band", "lo", "hi")
      t(s, dir, "part")
        .join(broadcast(bandDf),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_parts"),
          sum38(dec2(col("p_retailprice")), 2, "total_price"))
        .orderBy(col("band"))
    },
    Some("""SELECT band, COUNT(*) AS n_parts,
      CAST(SUM(CAST(p_retailprice AS DECIMAL(10,2))) AS DOUBLE) AS total_price
      FROM part JOIN (VALUES
        ('budget', CAST(900.0 AS DOUBLE), CAST(935.0 AS DOUBLE)),
        ('mid', CAST(935.0 AS DOUBLE), CAST(970.0 AS DOUBLE)),
        ('premium', CAST(970.0 AS DOUBLE), CAST(1000.0 AS DOUBLE))) bands(band, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band ORDER BY band"""))

  /** Scalar subquery: global average via exact decimal sum, broadcast
    * back as a 1-row cross join (no second scan of the fact in Spark's
    * plan — the agg is a separate tiny stage).
    */
  val q21ScalarSubquery = Q(
    "q21_scalar_subquery",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.agg(
        (sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*) FROM customer)
      ORDER BY c_custkey"""))

  /** Group-filter (HAVING): aggregate then filter on the aggregate. */
  val q19Having = Q(
    "q19_having",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum38(dec2(col("o_totalprice")), 2, "total_spent"))
        .filter(col("n_orders") >= 20)
        .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS total_spent
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
      ORDER BY o_custkey"""))

  /** HyperLogLog++ sketch aggregation: approx_count_distinct is the
    * 100 TB path for cardinality (fixed-size sketch, map-side mergeable)
    * where COUNT(DISTINCT) forces an Expand+double-aggregate. Sketch
    * values are engine-specific, so the adjudicated output is the exact
    * cardinalities (independently recomputed by the oracle) plus
    * relative-error-bound booleans: HLL++ at the default rsd=0.05 is
    * deterministic for a given input, and the measured error here is
    * ≤ 3%, so `≤ 5%` is a real accuracy assertion, not slack.
    */
  val q29ApproxDistinct = Q(
    "q29_approx_distinct",
    (s, dir) => {
      def ok(approx: org.apache.spark.sql.Column,
          exact: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        (abs(approx.cast("double") - exact) / exact <= 0.05).as("ok")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("exact_supp"),
          countDistinct(col("l_partkey")).as("exact_part"),
          approx_count_distinct(col("l_suppkey")).as("a_supp"),
          approx_count_distinct(col("l_partkey")).as("a_part"))
        .select(col("l_returnflag"), col("exact_supp"), col("exact_part"),
          ok(col("a_supp"), col("exact_supp")).as("supp_within_5pct"),
          ok(col("a_part"), col("exact_part")).as("part_within_5pct"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      COUNT(DISTINCT l_suppkey) AS exact_supp,
      COUNT(DISTINCT l_partkey) AS exact_part,
      true AS supp_within_5pct, true AS part_within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val queries: Seq[Q] = Seq(
    q1PricingSummary, q2TopkOrders, q3ShippingPriority, q4SemiJoin,
    q5LocalSupplierVolume, q6RevenueForecast, q7AntiJoin, q13DistinctAgg,
    q14SetOps, q19Having, q20RangeJoin, q21ScalarSubquery, q29ApproxDistinct)
}
