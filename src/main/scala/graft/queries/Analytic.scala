package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.H._

/** Relational query surface, part 2: window functions, multi-dimensional
  * aggregation (rollup/cube/grouping sets), pivot, percentiles, as-of
  * join (SURVEY.md §2.7 + the as-of extension).
  */
object Analytic {

  /** Grouped top-k via row_number — the scalable "top N per key" idiom:
    * one shuffle on the partition key, no global sort.
    */
  val q8WindowTopk = Q(
    "q8_window_topk",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
        .orderBy(col("o_custkey"), col("rk"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
      FROM orders)
      WHERE rk <= 3 ORDER BY o_custkey, rk"""))

  /** Running total + lag over a per-customer ordered frame. Decimal sums
    * keep the prefix-sum exact; lag carries the raw double (no
    * arithmetic, so bit-equal across engines).
    */
  val q9WindowRunning = Q(
    "q9_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("decimal(38,2)").cast("double").as("running_total"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      lag(o_totalprice, 1) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
      FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Sliding-frame aggregate: 3-row moving sum/min/max per customer. */
  val q24WindowFrames = Q(
    "q24_window_frames",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w)
            .cast("decimal(38,2)").cast("double").as("mov_sum"),
          min(col("o_totalprice")).over(w).as("mov_min"),
          max(col("o_totalprice")).over(w).as("mov_max"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) OVER w AS DOUBLE) AS mov_sum,
      min(o_totalprice) OVER w AS mov_min,
      max(o_totalprice) OVER w AS mov_max
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  /** ROLLUP: hierarchical subtotals + grand total, disambiguated by the
    * grouping id (MSB-first over the listed columns in both engines).
    */
  val q10Rollup = Q(
    "q10_rollup",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum38(dec2(col("l_quantity")), 2, "sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().cast("bigint").as("gid")),
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n,
      CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""))

  /** CUBE: all 2^d grouping combinations. */
  val q11Cube = Q(
    "q11_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum38(dec2(col("o_totalprice")), 2, "total"),
          grouping_id().cast("bigint").as("gid")),
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS total,
      CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"""))

  /** Explicit GROUPING SETS through the SQL front end (same Expand-based
    * physical plan as rollup/cube).
    */
  val q12GroupingSets = Q(
    "q12_grouping_sets",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n,
        CAST(grouping_id() AS BIGINT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n,
      CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""))

  /** Pivot: conditional aggregation fan-out to columns. Spark's .pivot
    * with an explicit value list compiles to the same CASE-sum plan the
    * oracle spells out (one pass, no join).
    */
  val q18Pivot = Q(
    "q18_pivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(dec2(col("l_quantity"))).cast("decimal(38,2)").cast("double"))
        .orderBy(col("l_linestatus")),
    Some("""SELECT l_linestatus,
      CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(10,2)) END) AS DOUBLE) AS "A",
      CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(10,2)) END) AS DOUBLE) AS "N",
      CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(10,2)) END) AS DOUBLE) AS "R"
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Exact percentiles (interpolating, like SQL percentile_cont). */
  val q25Percentiles = Q(
    "q25_percentiles",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS median_qty,
      quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS p90_price,
      min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** As-of join: each event matched to the latest order (by orderdate,
    * then orderkey) of the same customer at-or-before the event time —
    * the reusable [[graft.ext.AsOf]] operator (union + one shuffle +
    * running last; see its scale notes).
    */
  val q22AsofJoin = Q(
    "q22_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val ord = t(s, dir, "orders").select(
        col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      graft.ext.AsOf.join(ev, ord, keyCol = "user_id",
          leftTime = "ts", rightTime = "o_orderdate",
          rightVal = "o_orderkey", out = "o_orderkey")
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, o_orderkey FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey,
        row_number() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      WHERE rn = 1 ORDER BY event_id"""),
    bench = true)

  val queries: Seq[Q] = Seq(
    q8WindowTopk, q9WindowRunning, q10Rollup, q11Cube, q12GroupingSets,
    q18Pivot, q22AsofJoin, q24WindowFrames, q25Percentiles)
}
