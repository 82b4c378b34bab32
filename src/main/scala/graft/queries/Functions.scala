package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.H._

/** Relational query surface, part 3: scalar function coverage — string,
  * date/time, JSON, conditional (SURVEY.md §2.7 "scalar functions").
  * All per-row (narrow, codegen'd, no shuffle); the oracle verifies that
  * our function semantics match ANSI/DuckDB behavior exactly.
  */
object Functions {

  /** String function battery over part. */
  val q15StringFuncs = Q(
    "q15_string_funcs",
    (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name5"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        reverse(col("p_type")).as("rtype"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        trim(lit("  x  ")).as("trimmed"),
        replace(col("p_name"), lit(" "), lit("_")).as("snake"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
      upper(p_name) AS uname,
      CAST(length(p_name) AS INTEGER) AS name_len,
      substring(p_name, 1, 5) AS name5,
      concat_ws('-', p_brand, p_type) AS brand_type,
      regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
      lpad(p_brand, 12, '*') AS padded,
      reverse(p_type) AS rtype,
      split_part(p_type, ' ', 1) AS type_head,
      trim('  x  ') AS trimmed,
      replace(p_name, ' ', '_') AS snake
      FROM part ORDER BY p_partkey"""))

  /** Date/time function battery over orders. Spark `weekday` (Mon=0) is
    * aligned to DuckDB `isodow` (Mon=1) by +1; DuckDB date_trunc yields
    * DATE where Spark's yields TIMESTAMP, so Spark uses trunc()/casts.
    */
  val q16DateFuncs = Q(
    "q16_date_funcs",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        quarter(col("o_orderdate")).as("q"),
        (weekday(col("o_orderdate")) + 1).as("isodow"),
        col("o_orderdate").cast("date").as("d"),
        trunc(col("o_orderdate"), "month").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
      CAST(year(o_orderdate) AS INTEGER) AS y,
      CAST(month(o_orderdate) AS INTEGER) AS m,
      CAST(quarter(o_orderdate) AS INTEGER) AS q,
      CAST(isodow(o_orderdate) AS INTEGER) AS isodow,
      CAST(o_orderdate AS DATE) AS d,
      date_trunc('month', o_orderdate) AS month_start,
      last_day(CAST(o_orderdate AS DATE)) AS month_end,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
      FROM orders ORDER BY o_orderkey"""))

  /** JSON extraction from the events.props string column, then a grouped
    * aggregate over the extracted value.
    */
  val q17Json = Q(
    "q17_json",
    (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("bigint").as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(*) AS n,
      CAST(SUM(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
      FROM (SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
      GROUP BY event_type ORDER BY event_type"""))

  /** Conditional expressions: CASE WHEN / coalesce / nullif driving a
    * conditional aggregation.
    */
  val q23Conditional = Q(
    "q23_conditional",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") >= 300000, "big")
            .when(col("o_totalprice") >= 150000, "mid")
            .otherwise("small").as("size_class"),
          nullif(col("o_orderstatus"), lit("O")).as("closed_status"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"))
        .groupBy(col("size_class"), col("status_or_open"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("size_class"), col("status_or_open")),
    Some("""SELECT size_class, status_or_open, COUNT(*) AS n FROM (
      SELECT o_orderkey,
        CASE WHEN o_totalprice >= 300000 THEN 'big'
             WHEN o_totalprice >= 150000 THEN 'mid'
             ELSE 'small' END AS size_class,
        coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open
      FROM orders)
      GROUP BY size_class, status_or_open ORDER BY size_class, status_or_open"""))

  /** Generator/UDTF surface: explode a split array to rows — Spark's
    * Generate operator (the lateral-view path), word frequencies over
    * documents.
    */
  val q30Explode = Q(
    "q30_explode",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("word")),
    Some("""SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word ORDER BY word"""))

  /** Bag semantics set ops: UNION ALL / INTERSECT ALL / EXCEPT ALL. */
  val q31SetopsAll = Q(
    "q31_setops_all",
    (s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      val unionAll = cn.unionAll(sn).withColumn("op", lit("union_all"))
      val interAll = cn.intersectAll(sn).withColumn("op", lit("intersect_all"))
      val exceptAll = cn.exceptAll(sn).withColumn("op", lit("except_all"))
      unionAll.unionByName(interAll).unionByName(exceptAll)
        .groupBy(col("op"), col("nationkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("op"), col("nationkey"))
    },
    Some("""SELECT op, nationkey, COUNT(*) AS n FROM (
      SELECT 'union_all' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'intersect_all' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'except_all' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
      ) GROUP BY op, nationkey ORDER BY op, nationkey"""))

  /** Math + null-semantics battery: per-row IEEE arithmetic is
    * deterministic across engines; null-safe equality maps to DuckDB's
    * IS NOT DISTINCT FROM.
    */
  val q32MathNulls = Q(
    "q32_math_nulls",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 2)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("abs_dev"),
          // round to INTEGER only: Spark rounds the double's shortest
          // string (HALF_UP) while DuckDB rounds the exact binary value
          // — they diverge at fractional half-boundaries, but .50 is
          // exactly representable so integer rounding agrees
          round(col("l_extendedprice")).as("price_r"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          pow(col("l_discount"), 2).as("disc_sq"),
          exp(col("l_tax")).as("exp_tax"),
          // ln: JVM Math.log and DuckDB std::log differ by 1 ulp on some
          // inputs (libm is not correctly-rounded); both sides round to
          // 12 decimals, which absorbs the ulp away from grid boundaries,
          // then surface the rounded value as DOUBLE (decimal repr is
          // engine-specific downstream)
          log(col("l_quantity") + 1).cast("decimal(20,12)")
            .cast("double").as("ln1p_qty"),
          signum(col("l_quantity") - 25).as("sign_dev"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
          least(col("l_quantity"), col("l_tax") * 100).as("l"),
          floor(col("l_extendedprice")).cast("bigint").as("floor_price"),
          ceil(col("l_extendedprice")).cast("bigint").as("ceil_price"),
          (col("l_linenumber") % 2 === 0).as("is_even"),
          nullif(col("l_returnflag"), lit("N")).eqNullSafe(lit("A")).as("nsafe_a"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber,
      abs(l_quantity - 25) AS abs_dev,
      round(l_extendedprice) AS price_r,
      sqrt(l_quantity) AS sqrt_qty,
      pow(l_discount, 2) AS disc_sq,
      exp(l_tax) AS exp_tax,
      CAST(CAST(ln(1 + l_quantity) AS DECIMAL(20,12)) AS DOUBLE) AS ln1p_qty,
      CAST(sign(l_quantity - 25) AS DOUBLE) AS sign_dev,
      greatest(l_quantity, l_discount * 100) AS g,
      least(l_quantity, l_tax * 100) AS l,
      CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
      CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
      (l_linenumber % 2 = 0) AS is_even,
      nullif(l_returnflag, 'N') IS NOT DISTINCT FROM 'A' AS nsafe_a
      FROM lineitem WHERE l_linenumber <= 2
      ORDER BY l_orderkey, l_linenumber"""))

  val queries: Seq[Q] = Seq(q15StringFuncs, q16DateFuncs, q17Json, q23Conditional,
    q30Explode, q31SetopsAll, q32MathNulls)
}
