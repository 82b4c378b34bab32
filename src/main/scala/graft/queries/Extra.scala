package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.H._

/** Relational query surface, part 4: ordered string aggregation, window
  * distribution functions, correlated subqueries, unpivot/melt, array
  * functions, regex extraction, interval arithmetic, arg-min/max
  * aggregates, sampling (SURVEY.md §2.7 long tail).
  *
  * All shapes remain scale-clean: per-group aggregates shuffle once on
  * their key; per-row function batteries are narrow + codegen'd.
  */
object Extra {

  /** Ordered string aggregation (LISTAGG/STRING_AGG): collect_list has
    * nondeterministic arrival order under parallelism, so the list is
    * array_sort'ed before joining — same result on any partitioning.
    */
  val q33Listagg = Q(
    "q33_listagg",
    (s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey")),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      COUNT(*) AS n
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** Window distribution functions: ntile, percent_rank, cume_dist,
    * first_value, nth_value over a deterministic (unique-key) order.
    */
  val q34WindowDist = Q(
    "q34_window_dist",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 200)
        .select(
          col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first_value(col("o_orderkey")).over(w).as("top_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      ntile(4) OVER w AS quartile,
      percent_rank() OVER w AS pr,
      cume_dist() OVER w AS cd,
      first_value(o_orderkey) OVER w AS top_order,
      nth_value(o_orderkey, 2) OVER w AS second_order
      FROM orders WHERE o_custkey <= 200
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  /** Correlated scalar subquery (decorrelated by hand into a grouped
    * aggregate + equi-join — exactly what Catalyst's decorrelation does;
    * the per-nation average is tiny and broadcasts).
    */
  val q35Correlated = Q(
    "q35_correlated",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val natAvg = cust.groupBy(col("c_nationkey").as("nk"))
        .agg((sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1))).as("nat_avg"))
      cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nat_avg"))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey"""))

  /** Unpivot/melt: wide numeric columns to (key, metric, value) rows —
    * Spark's native unpivot operator (no Generate, no shuffle).
    */
  val q36Unpivot = Q(
    "q36_unpivot",
    (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")
        .orderBy(col("p_partkey"), col("metric")),
    Some("""SELECT p_partkey, metric, value FROM (
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part)
      ORDER BY p_partkey, metric"""))

  /** Array function battery over the embeddings table (scalar floats
    * are bit-compared — no arithmetic, only selection/reordering; the
    * array-valued outputs go through H.arrStr because raw list columns
    * are unhashable in the driver's pandas compare).
    */
  val q37ArrayFuncs = Q(
    "q37_array_funcs",
    (s, dir) =>
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast("bigint").as("dim"),
          element_at(col("embedding"), 1).as("first_c"),
          element_at(col("embedding"), -1).as("last_c"),
          array_max(col("embedding")).as("max_c"),
          array_min(col("embedding")).as("min_c"),
          arrStr(slice(col("embedding"), 1, 3)).as("head3"),
          arrStr(sort_array(slice(col("embedding"), 1, 4))).as("sorted4"),
          array_position(col("embedding"), array_max(col("embedding")))
            .cast("bigint").as("argmax1"))
        .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
      len(embedding) AS dim,
      embedding[1] AS first_c,
      embedding[-1] AS last_c,
      list_aggregate(embedding, 'max') AS max_c,
      list_aggregate(embedding, 'min') AS min_c,
      array_to_string(list_transform(embedding[1:3],
        x -> printf('%.6f', CAST(x AS DOUBLE))), ',') AS head3,
      array_to_string(list_transform(list_sort(embedding[1:4]),
        x -> printf('%.6f', CAST(x AS DOUBLE))), ',') AS sorted4,
      CAST(list_position(embedding, list_aggregate(embedding, 'max')) AS BIGINT) AS argmax1
      FROM embeddings ORDER BY vec_id"""))

  /** Regex extraction battery over documents. */
  val q38Regex = Q(
    "q38_regex",
    (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
          size(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).cast("bigint").as("n_words_re"),
          col("text").rlike("data").as("mentions_data"),
          regexp_count(col("text"), lit("[aeiou]")).cast("bigint").as("n_vowels"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      coalesce(regexp_extract(text, '([A-Za-z]+)', 1), '') AS first_word,
      len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words_re,
      regexp_matches(text, 'data') AS mentions_data,
      len(regexp_extract_all(text, '[aeiou]')) AS n_vowels
      FROM documents ORDER BY doc_id"""))

  /** Interval / date arithmetic battery. */
  val q39Intervals = Q(
    "q39_intervals",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_add(col("o_orderdate").cast("date"), 30).as("due30"),
          add_months(col("o_orderdate").cast("date"), -1).as("prev_month"),
          ((lit(1998) - year(col("o_orderdate"))) * 12
            + (lit(1) - month(col("o_orderdate")))).cast("bigint").as("months_to_98"),
          (unix_timestamp(col("o_orderdate")) + 86400L).as("next_day_epoch"),
          make_date(year(col("o_orderdate")), lit(12), lit(31)).as("year_end"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due30,
      CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE) AS prev_month,
      (1998 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS months_to_98,
      CAST(epoch(o_orderdate) + 86400 AS BIGINT) AS next_day_epoch,
      make_date(CAST(year(o_orderdate) AS INTEGER), 12, 31) AS year_end
      FROM orders ORDER BY o_orderkey"""))

  /** arg-min/arg-max aggregates (min_by/max_by), tie-free by using the
    * unique order key as the ordering value.
    */
  val q40ArgMinMax = Q(
    "q40_argminmax",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          min_by(col("o_orderdate"), col("o_orderkey")).as("first_key_date"),
          max_by(col("o_orderdate"), col("o_orderkey")).as("last_key_date"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey,
      arg_min(o_orderdate, o_orderkey) AS first_key_date,
      arg_max(o_orderdate, o_orderkey) AS last_key_date,
      min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  /** Bernoulli sampling with a fixed seed: per-row RNG decision →
    * narrow, no shuffle. The drawn count is engine-specific (Spark's
    * per-partition XORShift vs anything DuckDB would do), so the
    * adjudicated output is the exact group totals plus a
    * concentration-bound boolean: at these group sizes (~20k rows)
    * sampled/total is within ±0.02 of the 0.1 target with ≥10σ margin,
    * so `frac_ok` failing would mean the sampler is actually broken,
    * not unlucky.
    */
  val q41Sample = Q(
    "q41_sample",
    (s, dir) => {
      val sampled = t(s, dir, "lineitem")
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_sampled"))
      val totals = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_total"))
      totals.join(sampled, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("n_total"),
          (abs(coalesce(col("n_sampled"), lit(0L)).cast("double") / col("n_total")
            - 0.1) <= 0.02).as("frac_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_total, true AS frac_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Correlated LATERAL subquery (top-2 orders per customer) through the
    * SQL front end — Catalyst decorrelates the per-row subquery into a
    * ranked window join; DuckDB executes the same LATERAL directly.
    */
  val q42Lateral = Q(
    "q42_lateral",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c_custkey <= 300
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    },
    Some("""SELECT c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c_custkey <= 300
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey"""))

  /** Sketch-aggregate family: GK percentile sketch + HLL distinct per
    * group — fixed-size, map-side mergeable, the 100 TB path where
    * exact percentile needs a full sort. Sketch outputs are
    * engine-specific, so the adjudicated columns are the exact
    * percentiles (cross-engine-stable per q25) plus accuracy booleans:
    * measured sketch error here is ≤ 0.2% (percentiles, accuracy=1000)
    * and ≤ 3% (HLL), so the 2%/5% bounds are live assertions.
    */
  val q43ApproxSketches = Q(
    "q43_approx_sketches",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("exact_median"),
          expr("percentile(l_extendedprice, 0.99)").as("exact_p99"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("a_med"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("a_p99"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("a_parts"))
        .select(col("l_returnflag"), col("exact_median"), col("exact_p99"),
          col("exact_parts"),
          (abs(col("a_med") - col("exact_median")) / col("exact_median") <= 0.02)
            .as("median_within_2pct"),
          (abs(col("a_p99") - col("exact_p99")) / col("exact_p99") <= 0.02)
            .as("p99_within_2pct"),
          (abs(col("a_parts").cast("double") - col("exact_parts")) / col("exact_parts") <= 0.05)
            .as("parts_within_5pct"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS exact_median,
      quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99) AS exact_p99,
      COUNT(DISTINCT l_partkey) AS exact_parts,
      true AS median_within_2pct, true AS p99_within_2pct,
      true AS parts_within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Map-type functions (the reference has no nested types — engine
    * extension): build a map from scalar columns, then keys/values/
    * lookup/size round-trip.
    */
  val q44MapFuncs = Q(
    "q44_map_funcs",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          map(lit("size"), col("p_size").cast("double"),
            lit("price"), col("p_retailprice")).as("m"))
        .select(
          col("p_partkey"),
          concat_ws(",", map_keys(col("m"))).as("ks"),
          arrStr(map_values(col("m"))).as("vs"),
          element_at(col("m"), "price").as("price_v"),
          size(col("m")).cast("bigint").as("m_size"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
      array_to_string(map_keys(m), ',') AS ks,
      array_to_string(list_transform(map_values(m),
        x -> printf('%.6f', CAST(x AS DOUBLE))), ',') AS vs,
      m['price'][1] AS price_v,
      CAST(cardinality(m) AS BIGINT) AS m_size
      FROM (SELECT p_partkey,
        MAP {'size': CAST(p_size AS DOUBLE), 'price': p_retailprice} AS m
        FROM part)
      ORDER BY p_partkey"""))

  /** Value-based (RANGE) window frames: sum/count over all orders of
    * the same customer within ±30 days of each row's date — RANGE
    * frames bound by VALUE distance, where ROWS frames (q24) bound by
    * position. Spark needs a numeric sort key for rangeBetween, so both
    * engines frame over epoch days.
    */
  val q52RangeFrames = Q(
    "q52_range_frames",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("od").cast("long"))
        .rangeBetween(-30, 30)
      t(s, dir, "orders")
        .withColumn("od", datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")))
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_near"),
          sum(dec2(col("o_totalprice"))).over(w)
            .cast("decimal(38,2)").cast("double").as("near_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      COUNT(*) OVER w AS n_near,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) OVER w AS DOUBLE) AS near_total
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS od
        FROM orders)
      WINDOW w AS (PARTITION BY o_custkey ORDER BY od
        RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""))

  /** Keyset-free pagination: ORDER BY + LIMIT/OFFSET (Spark's offset
    * operator, not a filtered row_number).
    */
  val q53LimitOffset = Q(
    "q53_limit_offset",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(40)
        .limit(20),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40"""))

  /** FILTER-clause aggregates (ANSI): conditional aggregation without
    * CASE scaffolding — Catalyst compiles these to the same partial/
    * final hash aggregate as q1.
    */
  val q54AggFilter = Q(
    "q54_agg_filter",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderstatus,
        COUNT(*) AS n,
        COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2)))
          FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
    Some("""SELECT o_orderstatus,
      COUNT(*) AS n,
      COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2)))
        FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** IGNORE NULLS navigation functions: gap-filling lag and running
    * last-observation-carried-forward over a sparse column — the
    * time-series imputation idiom.
    */
  val q55IgnoreNulls = Q(
    "q55_ignore_nulls",
    (s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      val w = Window.orderBy(col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"),
          when(k % 5 === 0, lit(null)).otherwise(k).as("k"))
        .filter(col("event_id") <= 500)
        .select(col("event_id"), col("k"),
          lag(col("k"), 1, null, ignoreNulls = true).over(w).as("prev_k"),
          last(col("k"), ignoreNulls = true).over(wRun).as("locf_k"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, k,
      lag(k, 1 IGNORE NULLS) OVER (ORDER BY event_id) AS prev_k,
      last_value(k IGNORE NULLS) OVER (ORDER BY event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_k
      FROM (SELECT event_id,
        CASE WHEN k % 5 = 0 THEN NULL ELSE k END AS k
        FROM (SELECT event_id,
          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          FROM events) WHERE event_id <= 500)
      ORDER BY event_id"""))

  /** Schema-evolution union: two relations with overlapping but
    * unequal schemas combined by NAME with null-padding — the
    * heterogeneous-batch append every long-lived dataset eventually
    * needs (Spark: unionByName(allowMissingColumns); DuckDB: UNION ALL
    * BY NAME).
    */
  val q56UnionEvolution = Q(
    "q56_union_evolution",
    (s, dir) => {
      val v1 = t(s, dir, "orders").filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val v2 = t(s, dir, "orders")
        .filter(col("o_orderkey") > 1000 && col("o_orderkey") <= 2000)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus")) // evolved: +status, -custkey
      v1.unionByName(v2, allowMissingColumns = true)
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT * FROM (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderkey <= 1000
      UNION ALL BY NAME
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey > 1000 AND o_orderkey <= 2000)
      ORDER BY o_orderkey"""))

  /** MERGE/upsert composed from a full outer join + per-column
    * coalesce — Spark's DataFrame API has no MERGE statement without a
    * lakehouse format, but the semantics are a plain relational
    * composition: matched rows take the update's values, unmatched
    * updates insert, unmatched targets persist. The updates table is
    * synthesized deterministically from orders on BOTH sides (the
    * xPiiRedact pattern): every 7th key updates (+10.00), every 11th
    * key inserts under key+10M. One shuffle-or-broadcast join; action
    * tagging falls out of the null pattern.
    */
  val q60MergeUpsert = Q(
    "q60_merge_upsert",
    (s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), dec2(col("o_totalprice")).as("price"))
      val updates = t(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 0 || col("o_orderkey") % 11 === 0)
        .select(
          when(col("o_orderkey") % 7 === 0, col("o_orderkey"))
            .otherwise(col("o_orderkey") + 10000000L).as("k"),
          (dec2(col("o_totalprice")) + dec2(lit(10.0))).as("u_price"))
      base.join(updates, Seq("k"), "full_outer")
        .select(col("k"),
          coalesce(col("u_price"), col("price")).cast("double").as("final_price"),
          when(col("price").isNull, "insert")
            .when(col("u_price").isNull, "keep")
            .otherwise("update").as("action"))
        .orderBy(col("k"))
    },
    Some("""WITH base AS (SELECT o_orderkey AS k,
        CAST(o_totalprice AS DECIMAL(10,2)) AS price FROM orders),
      updates AS (SELECT
        CASE WHEN o_orderkey % 7 = 0 THEN o_orderkey
          ELSE o_orderkey + 10000000 END AS k,
        CAST(o_totalprice AS DECIMAL(10,2)) + CAST(10.0 AS DECIMAL(10,2)) AS u_price
        FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0)
      SELECT COALESCE(b.k, u.k) AS k,
        CAST(COALESCE(u.u_price, b.price) AS DOUBLE) AS final_price,
        CASE WHEN b.price IS NULL THEN 'insert'
          WHEN u.u_price IS NULL THEN 'keep' ELSE 'update' END AS action
      FROM base b FULL OUTER JOIN updates u ON u.k = b.k
      ORDER BY k"""))

  /** Blocked fuzzy join: probe names with a deterministic last-char
    * corruption matched back to the customer table under edit distance
    * ≤ 2. The blocking key (the first 6 digits of the customer number)
    * turns the quadratic all-pairs levenshtein into a per-block
    * equi-join — the standard entity-resolution shape; at corpus scale
    * blocks are bounded and hot blocks get a frequency cutoff like any
    * other candidate family. Both engines implement classic
    * Wagner-Fischer, so distances agree exactly.
    */
  val q61FuzzyJoin = Q(
    "q61_fuzzy_join",
    (s, dir) => {
      val names = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          substring(col("c_name"), 10, 6).as("blk"))
      val probes = t(s, dir, "customer")
        .filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("probe_id"),
          concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X"))
            .as("probe_name"),
          substring(col("c_name"), 10, 6).as("blk"))
      probes.join(names, "blk")
        .withColumn("dist", levenshtein(col("probe_name"), col("c_name")))
        .filter(col("dist") <= 2)
        .groupBy(col("probe_id"), col("probe_name"))
        .agg(min(struct(col("dist"), col("c_custkey"))).as("best"))
        .select(col("probe_id"), col("probe_name"),
          col("best.c_custkey").as("matched_custkey"),
          col("best.dist").cast("int").as("dist"))
        .orderBy(col("probe_id"))
    },
    Some("""WITH names AS (SELECT c_custkey, c_name,
        substring(c_name, 10, 6) AS blk FROM customer),
      probes AS (SELECT c_custkey AS probe_id,
        substring(c_name, 1, length(c_name) - 1) || 'X' AS probe_name,
        substring(c_name, 10, 6) AS blk
        FROM customer WHERE c_custkey % 3 = 0),
      cand AS (SELECT p.probe_id, p.probe_name, n.c_custkey,
        levenshtein(p.probe_name, n.c_name) AS dist
        FROM probes p JOIN names n ON n.blk = p.blk
        WHERE levenshtein(p.probe_name, n.c_name) <= 2),
      ranked AS (SELECT probe_id, probe_name, c_custkey, dist,
        row_number() OVER (PARTITION BY probe_id ORDER BY dist, c_custkey) AS rn
        FROM cand)
      SELECT probe_id, probe_name, c_custkey AS matched_custkey,
        CAST(dist AS INTEGER) AS dist
      FROM ranked WHERE rn = 1 ORDER BY probe_id"""))

  /** Grouped top-k via the typed bounded-buffer Aggregator
    * ([[graft.ext.Rank.TopKAgg]]) instead of a window: the aggregation
    * runs partial/final, so each map task ships at most k pairs per
    * group instead of every row — the grouped-top-k shape that survives
    * billion-row groups. The oracle is the window formulation, proving
    * the Aggregator's semantics equal row_number() <= k exactly.
    */
  val q68GroupTopk = Q(
    "q68_group_topk",
    (s, dir) => graft.ext.Rank.groupedTopK(
      t(s, dir, "orders").select(col("o_custkey"),
        dec2(col("o_totalprice")).cast("double").as("total_d"),
        col("o_orderkey")),
      "o_custkey", "o_orderkey", "total_d", k = 3)
      .select(col("grp").as("o_custkey"), col("rank"),
        col("id").as("o_orderkey"), col("value").as("total_d"))
      .orderBy(col("o_custkey"), col("rank")),
    Some("""WITH o AS (SELECT o_custkey, o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(10,2)) AS DOUBLE) AS total_d
        FROM orders)
      SELECT o_custkey, CAST(row_number() OVER (PARTITION BY o_custkey
          ORDER BY total_d DESC, o_orderkey) AS INT) AS rank,
        o_orderkey, total_d
      FROM o QUALIFY rank <= 3 ORDER BY o_custkey, rank"""))

  val queries: Seq[Q] = Seq(
    q33Listagg, q34WindowDist, q35Correlated, q36Unpivot, q37ArrayFuncs,
    q38Regex, q39Intervals, q40ArgMinMax, q41Sample, q42Lateral,
    q43ApproxSketches, q44MapFuncs, q52RangeFrames, q53LimitOffset,
    q54AggFilter, q55IgnoreNulls, q56UnionEvolution, q60MergeUpsert,
    q61FuzzyJoin, q68GroupTopk)
}
