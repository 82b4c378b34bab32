package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Bins, Boiler, BloomJoin, Bpe, Cdc, Dedup, Diff, Drift, Freq, Graph, Layout, Profile, Robust, Sampling, Survivor, Web}
import graft.queries.H.sum38
import graft.queries.H.t

/** Second bank of LLM-data-pipeline extension operators (SURVEY.md
  * §2.8, round 5): boilerplate removal, deterministic weighted
  * sampling, column profiling, bloom-pruned joins, layout ops. Same
  * contract as [[Ext]] — every operator is a driver query with a DuckDB
  * oracle wherever SQL-expressible.
  */
object ExtB {

  /** Within-source boilerplate removal (see [[Boiler.removeBoilerplate]]):
    * 5-token segments, a segment in >= 2 docs of one source is chrome.
    * The oracle replays segmentation, per-source document frequency,
    * flagging, and ordered re-assembly — the cleaned TEXT is
    * adjudicated byte-for-byte.
    */
  val xBoilerplate = Q(
    "x_boilerplate",
    (s, dir) => Boiler.removeBoilerplate(t(s, dir, "documents"),
      "text", "doc_id", "source", segTokens = 5, minDocs = 2)
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents),
      ch AS (SELECT doc_id, source,
          generate_subscripts(range(0, greatest(len(toks), 1), 5), 1) - 1 AS seg_idx,
          unnest(range(0, greatest(len(toks), 1), 5)) AS start,
          toks FROM d),
      cx AS (SELECT doc_id, source, seg_idx,
          array_to_string(toks[start + 1 : start + 5], ' ') AS seg_text
        FROM ch),
      bf AS (SELECT source, seg_text FROM
          (SELECT source, seg_text, count(DISTINCT doc_id) AS df
            FROM cx GROUP BY 1, 2)
          WHERE df >= 2),
      fl AS (SELECT cx.doc_id, cx.source, cx.seg_idx, cx.seg_text,
          (bf.seg_text IS NOT NULL) AS is_boiler
        FROM cx LEFT JOIN bf
          ON cx.source = bf.source AND cx.seg_text = bf.seg_text)
      SELECT doc_id, source,
        CAST(COUNT(*) AS BIGINT) AS n_segments,
        CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        COALESCE(string_agg(CASE WHEN NOT is_boiler THEN seg_text END, ' '
          ORDER BY seg_idx), '') AS clean_text,
        CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS boiler_frac
      FROM fl GROUP BY doc_id, source ORDER BY doc_id"""),
    bench = true)

  /** Deterministic weighted sampling without replacement (see
    * [[Sampling.weightedSample]]): A-ES keys from an LCG uniform on
    * doc_id, weight = n_chars, top-50. The oracle replays the LCG, the
    * rounded ln, and the ranking — the selected set AND its order are
    * adjudicated.
    */
  val xSampleWeighted = Q(
    "x_sample_weighted",
    (s, dir) => Sampling.weightedSample(t(s, dir, "documents"),
      col("doc_id"), col("n_chars"), k = 50),
    Some("""WITH kd AS (SELECT doc_id,
        CAST(n_chars AS DOUBLE) AS weight,
        CAST(CAST(ln((((doc_id % 2147483648) * 1103515245 + 12345)
              % 2147483648 + 1)
            / 2147483649.0) AS DECIMAL(20,12)) AS DOUBLE) AS lnu
        FROM documents),
      k2 AS (SELECT doc_id AS id, weight,
        CAST(CAST(lnu / weight AS DECIMAL(20,12)) AS DOUBLE) AS key
        FROM kd)
      SELECT id, weight,
        CAST(row_number() OVER (ORDER BY key DESC, id) AS BIGINT) AS sel_rank
      FROM k2 ORDER BY key DESC, id LIMIT 50"""))

  /** Incremental exact dedup (see [[Dedup.exactIncremental]]): docs with
    * doc_id < 250 are the historical corpus, >= 250 the new batch;
    * output = the batch's admitted survivors.
    */
  val xDedupIncremental = Q(
    "x_dedup_incremental",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.exactIncremental(
        d.filter(col("doc_id") >= 250), d.filter(col("doc_id") < 250),
        "text", "doc_id").orderBy(col("survivor_id"))
    },
    Some("""WITH h AS (SELECT DISTINCT sha256(text) AS d
        FROM documents WHERE doc_id < 250),
      b AS (SELECT sha256(text) AS content_sha256,
          min(doc_id) AS survivor_id, COUNT(*) AS n_batch_copies
        FROM documents WHERE doc_id >= 250 GROUP BY 1)
      SELECT content_sha256, survivor_id, n_batch_copies FROM b
      WHERE content_sha256 NOT IN (SELECT d FROM h)
      ORDER BY survivor_id"""))

  private def profCol(name: String, kind: String): String = {
    val isNum = kind == "num"; val isStr = kind == "str"; val isTs = kind == "ts"
    val minNum =
      if (isNum) s"CAST(min($name) AS DOUBLE)"
      else if (isTs) s"epoch(min($name))"
      else "CAST(NULL AS DOUBLE)"
    val maxNum =
      if (isNum) s"CAST(max($name) AS DOUBLE)"
      else if (isTs) s"epoch(max($name))"
      else "CAST(NULL AS DOUBLE)"
    val minStr = if (isStr) s"min($name)" else "CAST(NULL AS VARCHAR)"
    val maxStr = if (isStr) s"max($name)" else "CAST(NULL AS VARCHAR)"
    val avgLen = if (isStr) s"avg(length($name))" else "CAST(NULL AS DOUBLE)"
    s"""SELECT '$name' AS column_name,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(count(*) - count($name) AS BIGINT) AS n_null,
      CAST(count(DISTINCT $name) AS BIGINT) AS n_distinct,
      $minNum AS min_num, $maxNum AS max_num,
      $minStr AS min_str, $maxStr AS max_str,
      $avgLen AS avg_len FROM orders"""
  }

  /** Single-pass column profiler (see [[Profile.profile]]) over the six
    * orders columns — the reference's 5-row type-analyzer sample
    * replaced by whole-table statistics in one scan.
    */
  val xProfileColumns = Q(
    "x_profile_columns",
    (s, dir) => Profile.profile(t(s, dir, "orders"), Seq(
      "o_orderkey" -> Profile.Num, "o_custkey" -> Profile.Num,
      "o_orderstatus" -> Profile.Str, "o_totalprice" -> Profile.Num,
      "o_orderdate" -> Profile.Ts, "o_orderpriority" -> Profile.Str))
      .orderBy(col("column_name")),
    Some(Seq(
      profCol("o_orderkey", "num"), profCol("o_custkey", "num"),
      profCol("o_orderstatus", "str"), profCol("o_totalprice", "num"),
      profCol("o_orderdate", "ts"), profCol("o_orderpriority", "str"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")))

  /** Bloom-pruned fact⋈dim join (see [[BloomJoin.prunedEquiJoin]]):
    * orders pruned against a Bloom filter of the selective customer
    * subset before the join. The oracle is the PLAIN join — the Bloom
    * stage must be semantically invisible.
    */
  val xBloomJoin = Q(
    "x_bloom_join",
    (s, dir) => {
      val dim = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING" && col("c_nationkey") < 5)
      BloomJoin.prunedEquiJoin(t(s, dir, "orders"), "o_custkey", dim, "c_custkey")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum38(H.dec2(col("o_totalprice")), 2, "total"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND c_nationkey < 5
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** URL parse/normalize + per-registered-domain aggregation (see
    * [[Web]]): documents get deterministic synthetic URLs (the corpus
    * has no URL column), then host/domain/path/query extraction,
    * normalization, and the per-domain stats web curation rate-limits
    * on. The oracle replays construction AND parsing.
    */
  val xUrlDomain = Q(
    "x_url_domain",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("url", concat(
          lit("https://"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("www.")).otherwise(lit("")),
          col("source"), lit("-site."),
          when(col("lang") === "en", lit("com")).otherwise(lit("org")),
          lit("/docs/"), col("doc_id"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit("?ref="), col("source"))).otherwise(lit(""))))
      Web.withUrlParts(d, "url")
        .groupBy(col("url_domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url_host")).as("n_hosts"),
          countDistinct(col("url_norm")).as("n_urls"),
          sum(col("n_chars")).cast("bigint").as("total_chars"))
        .orderBy(col("url_domain"))
    },
    Some("""WITH u AS (SELECT *,
        'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
          || source || '-site.'
          || (CASE WHEN lang = 'en' THEN 'com' ELSE 'org' END)
          || '/docs/' || doc_id
          || (CASE WHEN doc_id % 2 = 0 THEN '?ref=' || source ELSE '' END)
          AS url FROM documents),
      p AS (SELECT *,
        lower(regexp_extract(url, '^https?://([^/:?#]+)', 1)) AS url_host,
        regexp_extract(lower(regexp_extract(url, '^https?://([^/:?#]+)', 1)),
          '([^.]+\.[^.]+)$', 1) AS url_domain,
        lower(regexp_extract(url, '^(https?)://', 1)) || '://'
          || lower(regexp_extract(url, '^https?://([^/:?#]+)', 1))
          || regexp_replace(regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1),
               '/+$', '') AS url_norm
        FROM u)
      SELECT url_domain, COUNT(*) AS n_docs,
        CAST(COUNT(DISTINCT url_host) AS BIGINT) AS n_hosts,
        CAST(COUNT(DISTINCT url_norm) AS BIGINT) AS n_urls,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM p GROUP BY url_domain ORDER BY url_domain"""))

  /** Z-order layout stats (see [[Layout.zorderStats]]): orders
    * clustered on (totalprice, orderdate), 8 bits per dimension, 64
    * buckets; per-bucket row counts and both-dimension bounding boxes
    * — the min/max stats a z-ordered writer persists per file. The
    * oracle replays quantization and bit interleave exactly (shared
    * formula via [[Layout.zValueSql]]).
    */
  val xZorderLayout = Q(
    "x_zorder_layout", {
      val (xLo, xHi) = (800.0, 600000.0)
      val (yLo, yHi) = (7.889184e8, 9.2e8) // epoch 1995-01-01 .. 1999-02
      (s, dir) => Layout.zorderStats(t(s, dir, "orders"),
        col("o_totalprice"),
        col("o_orderdate").cast("timestamp_ltz").cast("double"),
        xLo, xHi, yLo, yHi, bits = 8, bucketBits = 6)
        .orderBy(col("bucket"))
    },
    Some {
      val qx = Layout.quantizeSql("o_totalprice", 800.0, 600000.0, 8)
      val qy = Layout.quantizeSql("epoch(o_orderdate)", 7.889184e8, 9.2e8, 8)
      s"""WITH q AS (SELECT o_totalprice, epoch(o_orderdate) AS od,
          $qx AS zx, $qy AS zy FROM orders),
        z AS (SELECT o_totalprice, od,
          (${Layout.zValueSql("zx", "zy", 8)}) AS zv FROM q)
        SELECT (zv >> 10) AS bucket, COUNT(*) AS n_rows,
          CAST(min(o_totalprice) AS DOUBLE) AS x_min,
          CAST(max(o_totalprice) AS DOUBLE) AS x_max,
          min(od) AS y_min, max(od) AS y_max
        FROM z GROUP BY bucket ORDER BY bucket"""
    })

  /** Entity-resolution survivorship (see [[Survivor.goldenRecords]]):
    * every 4th customer gets a perturbed clone (suffix on the name,
    * +50 balance, null segment) and a match pair; golden records apply
    * oldest-name / max-balance / first-non-null-segment rules. The
    * oracle replays clone construction, clustering (trivial for this
    * pair set), and every survivorship rule via ranked CTEs.
    */
  val xGoldenRecord = Q(
    "x_golden_record",
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"))
      val clones = cust.filter(col("c_custkey") % 4 === 0)
        .select((col("c_custkey") + 100000).as("c_custkey"),
          concat(col("c_name"), lit(" Jr")).as("c_name"),
          (col("c_acctbal") + 50.0).as("c_acctbal"),
          lit(null).cast("string").as("c_mktsegment"))
      val pairs = cust.filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey").as("doc_a"),
          (col("c_custkey") + 100000).as("doc_b"))
      Survivor.goldenRecords(cust.unionByName(clones), "c_custkey", pairs,
        Seq(Survivor.OldestWins("c_name"), Survivor.MaxWins("c_acctbal"),
          Survivor.FirstNonNull("c_mktsegment")))
        .orderBy(col("cluster_id"))
    },
    Some("""WITH clones AS (SELECT c_custkey + 100000 AS id,
        c_name || ' Jr' AS c_name, c_acctbal + 50.0 AS c_acctbal,
        CAST(NULL AS VARCHAR) AS c_mktsegment
        FROM customer WHERE c_custkey % 4 = 0),
      ents AS (SELECT c_custkey AS id, c_name, c_acctbal, c_mktsegment
        FROM customer
        UNION ALL SELECT * FROM clones),
      lab AS (SELECT *, CASE WHEN id >= 100000 THEN id - 100000 ELSE id END
        AS cluster_id FROM ents),
      name_pick AS (SELECT cluster_id, c_name,
        row_number() OVER (PARTITION BY cluster_id ORDER BY id) AS rn
        FROM lab),
      seg_pick AS (SELECT cluster_id, c_mktsegment,
        row_number() OVER (PARTITION BY cluster_id ORDER BY
          CASE WHEN c_mktsegment IS NULL THEN 9223372036854775807
            ELSE id END) AS rn FROM lab),
      base AS (SELECT cluster_id, CAST(min(id) AS BIGINT) AS canonical_id,
        CAST(count(*) AS BIGINT) AS n_members, max(c_acctbal) AS c_acctbal
        FROM lab GROUP BY cluster_id)
      SELECT b.cluster_id, b.canonical_id, b.n_members, n.c_name,
        b.c_acctbal, sp.c_mktsegment
      FROM base b
      JOIN name_pick n ON n.cluster_id = b.cluster_id AND n.rn = 1
      JOIN seg_pick sp ON sp.cluster_id = b.cluster_id AND sp.rn = 1
      ORDER BY b.cluster_id"""))

  /** Misra–Gries heavy hitters (see [[Freq.heavyHitters]]), adjudicated
    * the recall-oracle way (like x_ann_ivf_recall): the output rows are
    * the EXACT heavy hitters (token frequency > n/(k+1), exact counts)
    * plus `in_sketch` — whether the MG sketch caught the term. The MG
    * guarantee says every row must show true, and the oracle hard-codes
    * exactly that; a sketch bug breaks the hash match.
    */
  val xHeavyHitters = Q(
    "x_heavy_hitters",
    (s, dir) => {
      val k = 40
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      val cnt = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val tot = toks.agg(count(lit(1)).as("n"))
      val mg = Freq.heavyHitters(toks, "term", k)
        .select(col("term"), lit(true).as("in_sketch"))
      cnt.crossJoin(tot)
        .filter(col("cnt") > col("n").cast("double") / (k + 1))
        .join(mg, Seq("term"), "left")
        .select(col("term"), col("cnt"),
          coalesce(col("in_sketch"), lit(false)).as("in_sketch"))
        .orderBy(col("term"))
    },
    Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
        FROM documents),
      cnt AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
      tot AS (SELECT COUNT(*) AS n FROM tok)
      SELECT term, cnt, TRUE AS in_sketch FROM cnt, tot
      WHERE cnt > CAST(n AS DOUBLE) / 41
      ORDER BY term"""))

  /** Weighted PageRank over the source-overlap graph (see
    * [[Graph.pageRank]]): nodes = sources, edge weight = shared
    * 20-token segments (both directions), damping 0.85, 10 iterations.
    * The oracle UNROLLS all ten iterations as generated CTEs from the
    * same constants — an iterative float computation adjudicated
    * bit-for-bit.
    */
  val xPagerankSources = Q(
    "x_pagerank_sources",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val ch = graft.ext.Text.chunk(docs, "text", "doc_id",
          chunkTokens = 20, overlap = 0)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), col("chunk_text")).distinct()
      val und = ch.as("a").join(ch.as("b"),
          col("a.chunk_text") === col("b.chunk_text") &&
            col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).cast("double").as("w"))
      val edges = und.select(col("sa").as("src"), col("sb").as("dst"), col("w"))
        .union(und.select(col("sb"), col("sa"), col("w")))
      Graph.pageRank(edges, "src", "dst", "w", damping = 0.85, iters = 10)
        .orderBy(col("node"))
    },
    Some {
      val head = """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents),
        ch AS (SELECT source,
            unnest(list_transform(range(0, greatest(len(toks), 1), 20),
              x -> array_to_string(toks[x + 1 : x + 20], ' '))) AS chunk_text
          FROM d),
        ds AS (SELECT DISTINCT source, chunk_text FROM ch),
        und AS (SELECT a.source AS sa, b.source AS sb,
            CAST(COUNT(*) AS DOUBLE) AS w
          FROM ds a JOIN ds b
            ON a.chunk_text = b.chunk_text AND a.source < b.source
          GROUP BY sa, sb),
        edges AS (SELECT sa AS src, sb AS dst, w FROM und
          UNION ALL SELECT sb, sa, w FROM und),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
        r0 AS (SELECT node,
          CAST(floor(1e12 / (SELECT n FROM nn)) AS BIGINT) AS pr FROM nodes)"""
      val iterations = (1 to 10).map { i =>
        s"""c$i AS (SELECT e.dst,
            CAST(floor(CAST(r.pr AS DOUBLE) * e.w / o.ow) AS BIGINT) AS c
          FROM edges e JOIN r${i - 1} r ON r.node = e.src
            JOIN outw o ON o.src = e.src),
        s$i AS (SELECT dst, SUM(c) AS sc FROM c$i GROUP BY dst),
        r$i AS (SELECT nodes.node,
          CAST(floor((1.0 - 0.85) * 1e12 / (SELECT n FROM nn)
              + 0.85 * CAST(COALESCE(s.sc, 0) AS DOUBLE)) AS BIGINT) AS pr
          FROM nodes LEFT JOIN s$i s ON s.dst = nodes.node)"""
      }.mkString(",\n")
      s"$head,\n$iterations\n" +
        "SELECT node, CAST(pr AS DOUBLE) / 1e12 AS rank FROM r10 ORDER BY node"
    })

  /** HLL set-algebra audit: distinct customers active in BOTH 1995 and
    * 1996, estimated by inclusion–exclusion over mergeable sketches
    * (|A∩B| = |A|+|B|−|A∪B| with hll_union) — the cross-partition
    * distinct-overlap question exact counting can't answer from
    * pre-aggregated state. Adjudicated the x_sketch_reaggregate way:
    * exact values + a measured-margin tolerance boolean (observed
    * error ~0.2%, asserted ≤ 5%).
    */
  val xSketchIntersect = Q(
    "x_sketch_intersect",
    (s, dir) => {
      val o = t(s, dir, "orders").withColumn("yr", year(col("o_orderdate")))
      val a = o.filter(col("yr") === 1995)
        .agg(hll_sketch_agg(col("o_custkey")).as("ska"),
          countDistinct(col("o_custkey")).as("exact_a"))
      val b = o.filter(col("yr") === 1996)
        .agg(hll_sketch_agg(col("o_custkey")).as("skb"),
          countDistinct(col("o_custkey")).as("exact_b"))
      val u = o.filter(col("yr").isin(1995, 1996))
        .agg(countDistinct(col("o_custkey")).as("exact_union"))
      a.crossJoin(b).crossJoin(u)
        .withColumn("exact_intersect",
          col("exact_a") + col("exact_b") - col("exact_union"))
        .withColumn("est_intersect",
          hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb"))
            - hll_sketch_estimate(hll_union(col("ska"), col("skb"))))
        .select(col("exact_a"), col("exact_b"), col("exact_union"),
          col("exact_intersect"),
          (abs(col("est_intersect").cast("double") - col("exact_intersect"))
            / col("exact_intersect") <= 0.05).as("intersect_within_5pct"))
    },
    Some("""WITH a AS (SELECT COUNT(DISTINCT o_custkey) AS exact_a
        FROM orders WHERE year(o_orderdate) = 1995),
      b AS (SELECT COUNT(DISTINCT o_custkey) AS exact_b
        FROM orders WHERE year(o_orderdate) = 1996),
      u AS (SELECT COUNT(DISTINCT o_custkey) AS exact_union
        FROM orders WHERE year(o_orderdate) IN (1995, 1996))
      SELECT exact_a, exact_b, exact_union,
        exact_a + exact_b - exact_union AS exact_intersect,
        true AS intersect_within_5pct
      FROM a, b, u"""))

  /** Snapshot reconciliation (see [[Diff.snapshotDiff]]): the "new"
    * orders snapshot deterministically drops every 97th key, clones
    * every 89th into a fresh key, and bumps every 101st price; the
    * diff must report exactly those as removed/added/changed.
    */
  val xSnapshotDiff = Q(
    "x_snapshot_diff",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val newSnap = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("o_orderkey") % 89 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000))
      Diff.snapshotDiff(o, newSnap, "o_orderkey",
        Seq("o_orderstatus", "o_totalprice", "o_orderpriority"))
        .orderBy(col("pk"))
    },
    Some("""WITH n AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
            ELSE o_totalprice END AS o_totalprice,
          o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus,
          o_orderpriority
        FROM orders WHERE o_orderkey % 89 = 0)
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS pk,
        CASE WHEN o.o_orderkey IS NULL THEN 'added'
          WHEN n.o_orderkey IS NULL THEN 'removed'
          WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
            OR NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
            OR NOT (o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority)
          THEN 'changed' END AS status
      FROM orders o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
      WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
          WHEN n.o_orderkey IS NULL THEN 'removed'
          WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
            OR NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
            OR NOT (o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority)
          THEN 'changed' END IS NOT NULL
      ORDER BY pk"""))

  /** Best-match record linkage through the native codegen'd
    * [[graft.plans.JaroWinkler]] expression: every 5th customer name
    * gets its last two characters transposed (the classic typo JW was
    * built for), candidates come from the q61-style name block, best
    * match by (jw desc, key). DuckDB's jaro_winkler_similarity shares
    * RapidFuzz semantics with our kernel, so the oracle replays scores
    * exactly (%.6f-serialized like every float surface).
    */
  val xJwMatch = Q(
    "x_jw_match",
    (s, dir) => {
      graft.plans.GraftExtensions.ensure(s)
      val cust = t(s, dir, "customer")
      val names = cust.select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 10, 6).as("blk"))
      val probes = cust.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("probe_id"),
          concat(expr("substring(c_name, 1, length(c_name) - 2)"),
            expr("substring(c_name, length(c_name), 1)"),
            expr("substring(c_name, length(c_name) - 1, 1)")).as("probe_name"),
          substring(col("c_name"), 10, 6).as("blk"))
      probes.join(names, "blk")
        .withColumn("jw",
          call_function("jaro_winkler", col("probe_name"), col("c_name")))
        .filter(col("jw") >= 0.9)
        .groupBy(col("probe_id"))
        .agg(max(struct(col("jw"), (-col("c_custkey")).as("negk"))).as("best"))
        .select(col("probe_id"),
          (-col("best.negk")).cast("bigint").as("matched_custkey"),
          format_string("%.6f", col("best.jw")).as("jw"))
        .orderBy(col("probe_id"))
    },
    Some("""WITH names AS (SELECT c_custkey, c_name,
        substring(c_name, 10, 6) AS blk FROM customer),
      probes AS (SELECT c_custkey AS probe_id,
        substring(c_name, 1, length(c_name) - 2)
          || substring(c_name, length(c_name), 1)
          || substring(c_name, length(c_name) - 1, 1) AS probe_name,
        substring(c_name, 10, 6) AS blk
        FROM customer WHERE c_custkey % 5 = 0),
      cand AS (SELECT probe_id, n.c_custkey,
          jaro_winkler_similarity(probe_name, n.c_name) AS jw
        FROM probes p JOIN names n USING (blk)
        WHERE jaro_winkler_similarity(probe_name, n.c_name) >= 0.9),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY jw DESC, c_custkey) AS rn FROM cand)
      SELECT probe_id, c_custkey AS matched_custkey, printf('%.6f', jw) AS jw
      FROM ranked WHERE rn = 1 ORDER BY probe_id"""))

  /** Mergeable quantile sketch audit: per-group approx_percentile (GK
    * summaries, accuracy 100 ⇒ rank error ≤ 1%) checked against the
    * EXACT neighborhood — the approx p50/p95 must land inside the exact
    * [p49,p51] / [p94,p96] value bands. GK's merge-order wobble stays
    * inside the rank bound, so the booleans are deterministic and the
    * oracle hard-codes them true alongside exact quantiles it
    * recomputes (the x_heavy_hitters adjudication style for the
    * quantile family).
    */
  val xSketchQuantiles = Q(
    "x_sketch_quantiles",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        expr("percentile(l_extendedprice, 0.95)").as("exact_p95"),
        expr("percentile(l_extendedprice, 0.49)").as("lo50"),
        expr("percentile(l_extendedprice, 0.51)").as("hi50"),
        expr("percentile(l_extendedprice, 0.94)").as("lo95"),
        expr("percentile(l_extendedprice, 0.96)").as("hi95"),
        expr("approx_percentile(l_extendedprice, 0.5, 100)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.95, 100)").as("a95"))
      .select(col("l_returnflag"), col("exact_p50"), col("exact_p95"),
        (col("a50") >= col("lo50") && col("a50") <= col("hi50"))
          .as("p50_within_rank_eps"),
        (col("a95") >= col("lo95") && col("a95") <= col("hi95"))
          .as("p95_within_rank_eps"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
        quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS exact_p50,
        quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS exact_p95,
        true AS p50_within_rank_eps, true AS p95_within_rank_eps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Robust outliers (see [[Robust.madOutliers]]): events.value per
    * event_type, modified z-score > 3.5. The oracle replays both
    * medians, the residual MAD, and the %.6f-serialized score.
    */
  val xMadOutliers = Q(
    "x_mad_outliers",
    (s, dir) => Robust.madOutliers(t(s, dir, "events"),
      col("event_type"), col("value"))
      .orderBy(col("grp"), col("v")),
    Some("""WITH base AS (SELECT event_type AS grp,
        CAST(value AS DOUBLE) AS v FROM events),
      med AS (SELECT grp, quantile_cont(v, 0.5) AS med
        FROM base GROUP BY grp),
      wm AS (SELECT base.grp, v, med FROM base JOIN med USING (grp)),
      mad AS (SELECT grp, quantile_cont(abs(v - med), 0.5) AS mad
        FROM wm GROUP BY grp)
      SELECT wm.grp, v, wm.med, mad.mad,
        printf('%.6f', 0.6745 * (v - wm.med) / mad.mad) AS mod_z
      FROM wm JOIN mad USING (grp)
      WHERE mad.mad > 0 AND abs(0.6745 * (v - wm.med) / mad.mad) > 3.5
      ORDER BY wm.grp, v"""))

  /** Corpus drift audit (see [[Drift.tokenDrift]]): docs < 250 vs
    * >= 250 as the two slices; the oracle replays smoothing, the
    * decimal-summed TVD, the 12-decimal-ln KL, and the type churn.
    */
  val xCorpusDrift = Q(
    "x_corpus_drift",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Drift.tokenDrift(d.filter(col("doc_id") < 250),
        d.filter(col("doc_id") >= 250), "text")
    },
    Some("""WITH ot AS (SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 250),
      nt AS (SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id >= 250),
      oc AS (SELECT tok, COUNT(*) AS co FROM ot GROUP BY tok),
      nc AS (SELECT tok, COUNT(*) AS cn FROM nt GROUP BY tok),
      j AS (SELECT COALESCE(oc.tok, nc.tok) AS tok,
          COALESCE(co, 0) AS co, COALESCE(cn, 0) AS cn
        FROM oc FULL OUTER JOIN nc ON oc.tok = nc.tok),
      tot AS (SELECT CAST(SUM(co) AS BIGINT) AS n_old,
          CAST(SUM(cn) AS BIGINT) AS n_new,
          CAST(COUNT(*) AS BIGINT) AS v FROM j),
      terms AS (SELECT co, cn, n_old, n_new, v,
          CAST(abs(CAST(co + 1 AS DOUBLE) / CAST(n_old + v AS DOUBLE)
              - CAST(cn + 1 AS DOUBLE) / CAST(n_new + v AS DOUBLE))
            AS DECIMAL(20,12)) AS tv_term,
          CAST((CAST(co + 1 AS DOUBLE) / CAST(n_old + v AS DOUBLE))
            * CAST(CAST(ln((CAST(co + 1 AS DOUBLE) / CAST(n_old + v AS DOUBLE))
                / (CAST(cn + 1 AS DOUBLE) / CAST(n_new + v AS DOUBLE)))
              AS DECIMAL(20,12)) AS DOUBLE)
            AS DECIMAL(20,12)) AS kl_term
        FROM j, tot)
      SELECT n_old AS n_tokens_old, n_new AS n_tokens_new,
        v AS vocab_union,
        CAST(SUM(CASE WHEN co = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new_types,
        CAST(SUM(CASE WHEN cn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lost_types,
        CAST(SUM(tv_term) AS DOUBLE) * 0.5 AS tvd,
        CAST(SUM(kl_term) AS DOUBLE) AS kl_old_new
      FROM terms GROUP BY n_old, n_new, v"""))

  /** BPE tokenizer training (see [[Bpe.trainMerges]]): the first 8
    * merges learned from the documents corpus; the oracle unrolls
    * every round — pair counting, deterministic best-pair choice, and
    * the triple-replace merge application — from the same constants.
    */
  val xBpeTrain = Q(
    "x_bpe_train",
    (s, dir) => Bpe.trainMerges(t(s, dir, "documents"), "text", merges = 8)
      .orderBy(col("step")),
    Some(Bpe.trainMergesSql(8) + "\nORDER BY step"))

  /** BPE encoding with the learned merges (see [[Bpe.encode]]): the 8
    * trained merges fold into one narrow per-row expression; output is
    * per-doc symbol/token counts and compression. The oracle re-derives
    * the merge table itself (b1..b8 scalar subqueries) and replays the
    * exact triple-pass application.
    */
  val xBpeEncode = Q(
    "x_bpe_encode",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val mergePairs = Bpe.trainMerges(d, "text", merges = 8)
        .orderBy(col("step")).collect().map(_.getString(1)).toSeq
      Bpe.encode(d, "text", "doc_id", mergePairs).orderBy(col("doc_id"))
    },
    Some(Bpe.encodeSql(8) + "\nORDER BY doc_id"))

  /** First/last-touch attribution (see
    * [[graft.ext.Behavior.touchAttribution]]): purchases credit the
    * first and last click of the same user within a 3-day lookback;
    * tie-broken by event id, fully replayed by the oracle.
    */
  val xAttribution = Q(
    "x_attribution",
    (s, dir) => graft.ext.Behavior.touchAttribution(t(s, dir, "events"),
      "user_id", "ts", "event_id", touchType = "click",
      convType = "purchase", lookback = "3 days")
      .orderBy(col("conv_id")),
    Some("""WITH conv AS (SELECT user_id, event_id AS conv_id, ts AS conv_ts,
        value FROM events WHERE event_type = 'purchase'),
      touch AS (SELECT user_id AS t_user, event_id AS touch_id,
        ts AS touch_ts FROM events WHERE event_type = 'click')
      SELECT user_id, conv_id, conv_ts, value,
        (min(struct_pack(touch_ts := touch_ts, touch_id := touch_id))).touch_id
          AS first_touch_id,
        (max(struct_pack(touch_ts := touch_ts, touch_id := touch_id))).touch_id
          AS last_touch_id,
        CAST(COUNT(*) AS BIGINT) AS n_touches
      FROM conv JOIN touch ON user_id = t_user
        AND touch_ts <= conv_ts AND touch_ts >= conv_ts - INTERVAL 3 DAY
      GROUP BY user_id, conv_id, conv_ts, value
      ORDER BY conv_id"""))

  /** Equi-depth quantile binning (see [[Bins.equiDepth]]): deciles of
    * o_totalprice — near-equal bin populations under any skew, cutoffs
    * and stats replayed exactly by the oracle.
    */
  val xBinsEquidepth = Q(
    "x_bins_equidepth",
    (s, dir) => Bins.equiDepth(t(s, dir, "orders"), col("o_totalprice"),
      nBins = 10).orderBy(col("bin")),
    Some("""WITH vals AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders),
      cuts AS (SELECT quantile_cont(v,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs FROM vals),
      b AS (SELECT v, CAST(len(list_filter((SELECT cs FROM cuts),
        c -> v > c)) AS INTEGER) AS bin FROM vals)
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
        min(v) AS lo, max(v) AS hi
      FROM b GROUP BY bin ORDER BY bin"""))

  /** Point-in-time (SCD2 interval) lookup: each purchase event joined
    * to the state interval (q65's SCD2 build) valid AT its timestamp —
    * the lakehouse "dimension as of event time" join. User-keyed
    * equi-join + interval predicate: bounded state, never a cross
    * join; exactly one interval matches per fact row.
    */
  val xScd2Lookup = Q(
    "x_scd2_lookup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ev = t(s, dir, "events")
      val dim = ev
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id").as("d_user"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"))
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .join(dim, col("user_id") === col("d_user") &&
          col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("ts"), col("state"))
        .orderBy(col("event_id"))
    },
    Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev FROM events),
      ch AS (SELECT user_id, event_type, ts, event_id FROM c
        WHERE prev IS NULL OR prev <> event_type),
      dim AS (SELECT user_id AS d_user, event_type AS state,
        ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS valid_to FROM ch)
      SELECT event_id, user_id, ts, state
      FROM (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase') f
      JOIN dim ON user_id = d_user AND valid_from <= ts
        AND (valid_to IS NULL OR ts < valid_to)
      ORDER BY event_id"""))

  /** Canonical text normalization (see [[graft.ext.Text.normalizeText]]):
    * deterministic dirty input (accents, case, punctuation, ragged
    * spaces) normalized for dedup keys; both engines share the same
    * translate table and ASCII-punct regex, so the oracle replays the
    * normalized TEXT byte-for-byte.
    */
  val xTextNormalize = Q(
    "x_text_normalize",
    (s, dir) => {
      val dirty = concat(lit("  Crème-Brûlée #"), col("doc_id"), lit("!  "),
        upper(col("text")), lit("  "))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ext.Text.normalizeText(dirty).as("norm_text"))
        .withColumn("n_norm_tokens",
          size(split(col("norm_text"), " ")).cast("bigint"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH d AS (SELECT doc_id,
        '  Crème-Brûlée #' || doc_id || '!  ' || upper(text) || '  ' AS dirty
        FROM documents)
      SELECT doc_id,
        trim(regexp_replace(regexp_replace(
          lower(translate(dirty, '${graft.ext.Text.accentFrom}',
            '${graft.ext.Text.accentTo}')),
          '[[:punct:]]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
        CAST(len(string_split(trim(regexp_replace(regexp_replace(
          lower(translate(dirty, '${graft.ext.Text.accentFrom}',
            '${graft.ext.Text.accentTo}')),
          '[[:punct:]]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT)
          AS n_norm_tokens
      FROM d ORDER BY doc_id"""))

  /** XML ingestion (Spark 4 native from_xml): order rows serialized to
    * XML, parsed back with an explicit schema, and aggregated from the
    * PARSED struct. The oracle computes the same aggregate from the
    * original columns — the parse round trip must be lossless for the
    * hash to match.
    */
  val xXmlParse = Q(
    "x_xml_parse",
    (s, dir) => {
      val xml = concat(lit("<order><key>"), col("o_orderkey"),
        lit("</key><status>"), col("o_orderstatus"),
        lit("</status><price>"), col("o_totalprice"),
        lit("</price></order>"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "key BIGINT, status STRING, price DOUBLE")
      t(s, dir, "orders")
        .select(from_xml(xml, schema).as("p"))
        .select(col("p.key").as("key"), col("p.status").as("status"),
          col("p.price").as("price"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          min(col("key")).as("min_key"),
          sum38(H.dec2(col("price")), 2, "total_price"))
        .orderBy(col("status"))
    },
    Some("""SELECT o_orderstatus AS status, COUNT(*) AS n,
        min(o_orderkey) AS min_key,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE)
          AS total_price
      FROM orders GROUP BY o_orderstatus ORDER BY status"""))

  /** PMI collocations (see [[graft.ext.Text.pmiCollocations]]): top-30
    * most strongly associated adjacent token pairs with count >= 20;
    * the oracle replays counts, probabilities, the 12-decimal ln, and
    * the (pmi desc, bigram) ranking.
    */
  val xPmiCollocations = Q(
    "x_pmi_collocations",
    (s, dir) => graft.ext.Text.pmiCollocations(t(s, dir, "documents"),
      "text", minCount = 20L, topK = 30),
    Some("""WITH tk AS (SELECT string_split(text, ' ') AS w FROM documents),
      tf AS (SELECT term, COUNT(*) AS cnt FROM (
          SELECT unnest(w) AS term FROM tk) GROUP BY term),
      ntok AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_tokens FROM tf),
      bi AS (SELECT gram, COUNT(*) AS bcnt FROM (
          SELECT unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS gram FROM tk)
        GROUP BY gram),
      nbi AS (SELECT CAST(SUM(bcnt) AS DOUBLE) AS n_bigrams FROM bi),
      sc AS (SELECT gram AS bigram, bcnt,
          CAST(CAST(ln((CAST(bcnt AS DOUBLE) / (SELECT n_bigrams FROM nbi))
            / ((CAST(c1.cnt AS DOUBLE) / (SELECT n_tokens FROM ntok))
              * (CAST(c2.cnt AS DOUBLE) / (SELECT n_tokens FROM ntok))))
            AS DECIMAL(20,12)) AS DOUBLE) AS pmi
        FROM bi
        JOIN tf c1 ON c1.term = string_split(gram, ' ')[1]
        JOIN tf c2 ON c2.term = string_split(gram, ' ')[2]
        WHERE bcnt >= 20)
      SELECT bigram, CAST(bcnt AS BIGINT) AS b_count, pmi
      FROM sc ORDER BY pmi DESC, bigram LIMIT 30"""))

  /** Per-language weighted sampling (see
    * [[Sampling.weightedSampleByGroup]]): 10 docs per lang, weight =
    * n_chars — the weighted quota draw; oracle replays keys and
    * per-group ranks.
    */
  val xSampleWeightedGroup = Q(
    "x_sample_weighted_group",
    (s, dir) => Sampling.weightedSampleByGroup(t(s, dir, "documents"),
      col("lang"), col("doc_id"), col("n_chars"), kPerGroup = 10)
      .orderBy(col("grp"), col("sel_rank")),
    Some("""WITH kd AS (SELECT lang AS grp, doc_id AS id,
        CAST(n_chars AS DOUBLE) AS weight,
        CAST(CAST(ln((((doc_id % 2147483648) * 1103515245 + 12345)
              % 2147483648 + 1)
            / 2147483649.0) AS DECIMAL(20,12)) AS DOUBLE) AS lnu
        FROM documents),
      k2 AS (SELECT grp, id, weight,
        CAST(CAST(lnu / weight AS DECIMAL(20,12)) AS DOUBLE) AS key
        FROM kd),
      rk AS (SELECT grp, id, weight,
        CAST(row_number() OVER (PARTITION BY grp ORDER BY key DESC, id)
          AS BIGINT) AS sel_rank FROM k2)
      SELECT grp, id, weight, sel_rank FROM rk
      WHERE sel_rank <= 10 ORDER BY grp, sel_rank"""))

  /** Count-Min point-frequency audit (see [[Freq.countMin]]): the 30
    * most frequent tokens probed against a 1024x4 CM sketch; output is
    * exact counts + the two-sided deterministic bound booleans
    * (overestimate-only, within (e/w)*N) the oracle hard-codes true.
    */
  val xSketchCountmin = Q(
    "x_sketch_countmin",
    (s, dir) => {
      val (w, d) = (1024, 4)
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      val cnt = toks.groupBy(col("term")).agg(count(lit(1)).as("true_cnt"))
      val top = cnt.orderBy(col("true_cnt").desc, col("term")).limit(30)
      val n = toks.agg(count(lit(1)).as("n"))
      val sketch = Freq.countMin(toks, "term", w, d)
      val est = Freq.cmEstimate(sketch, top, "term", w, d)
      top.join(est, "term").crossJoin(n)
        .select(col("term"), col("true_cnt"),
          (col("cm_est") >= col("true_cnt")).as("never_underestimates"),
          (col("cm_est") <= col("true_cnt")
            + (lit(math.E) / w * col("n")).cast("bigint") + 1)
            .as("within_eps_bound"))
        .orderBy(col("term"))
    },
    Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
        FROM documents),
      cnt AS (SELECT term, COUNT(*) AS true_cnt FROM tok GROUP BY term)
      SELECT term, true_cnt,
        true AS never_underestimates, true AS within_eps_bound
      FROM cnt ORDER BY true_cnt DESC, term LIMIT 30"""))

  /** Nearest-in-time join (see [[graft.ext.AsOf.nearestJoin]]): each
    * view matched to the same user's temporally CLOSEST click, either
    * direction — the sensor-fusion complement of q22's backward as-of.
    * The oracle ranks the full per-user candidate set by (gap, ts,
    * id desc), replaying the tie policy exactly.
    */
  val xNearestJoin = Q(
    "x_nearest_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
      graft.ext.AsOf.nearestJoin(views, clicks, "user_id", "ts", "ts",
        "click_id", "nearest_click")
        .orderBy(col("event_id"))
    },
    Some("""WITH v AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'view'),
      c AS (SELECT user_id, event_id AS click_id, ts AS cts FROM events
        WHERE event_type = 'click'),
      cand AS (SELECT v.event_id, c.click_id,
          abs(epoch_us(v.ts) - epoch_us(c.cts)) AS gap_us,
          row_number() OVER (PARTITION BY v.event_id
            ORDER BY abs(epoch_us(v.ts) - epoch_us(c.cts)), c.cts,
              c.click_id DESC) AS rn
        FROM v JOIN c ON v.user_id = c.user_id)
      SELECT v.event_id, v.user_id, v.ts,
        b.click_id AS nearest_click,
        b.gap_us AS nearest_click_gap_us
      FROM v LEFT JOIN (SELECT * FROM cand WHERE rn = 1) b
        ON b.event_id = v.event_id
      ORDER BY v.event_id"""))

  /** Changelog materialization (see [[Cdc.materialize]]): a synthetic
    * out-of-order CDC feed over orders — base inserts (v1), price
    * updates for every 5th key (v2), deletes for every 7th (v3) — is
    * SHUFFLED (arrival order keyed on a hash) and must still
    * materialize to the same current state the oracle derives
    * declaratively.
    */
  val xCdcMaterialize = Q(
    "x_cdc_materialize",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("pk"), col("o_totalprice").as("price"))
      val ins = o.select(col("pk"), lit(1L).as("version"),
        lit("insert").as("op"), col("price"))
      val upd = o.filter(col("pk") % 5 === 0)
        .select(col("pk"), lit(2L).as("version"), lit("update").as("op"),
          (col("price") + 100.0).as("price"))
      val del = o.filter(col("pk") % 7 === 0)
        .select(col("pk"), lit(3L).as("version"), lit("delete").as("op"),
          lit(null).cast("double").as("price"))
      val feed = ins.unionByName(upd).unionByName(del)
        .orderBy(xxhash64(col("pk"), col("version"))) // scrambled arrival
      Cdc.materialize(feed, "pk", "version", "op").orderBy(col("pk"))
    },
    Some("""WITH base AS (SELECT o_orderkey AS pk, o_totalprice AS price
        FROM orders)
      SELECT pk,
        CAST(CASE WHEN pk % 5 = 0 THEN 2 ELSE 1 END AS BIGINT) AS version,
        CASE WHEN pk % 5 = 0 THEN 'update' ELSE 'insert' END AS op,
        CASE WHEN pk % 5 = 0 THEN price + 100.0 ELSE price END AS price
      FROM base WHERE pk % 7 <> 0
      ORDER BY pk"""))

  /** Winsorized mean (see [[Robust.winsorizedMean]]): events.value per
    * type clipped to [p05, p95] then averaged — the robust aggregate
    * whose outlier handling preserves sample size; bounds, clipping,
    * and the decimal-exact mean replayed by the oracle.
    */
  val xWinsorizedMean = Q(
    "x_winsorized_mean",
    (s, dir) => Robust.winsorizedMean(t(s, dir, "events"),
      col("event_type"), col("value"), 0.05, 0.95)
      .orderBy(col("grp")),
    Some("""WITH base AS (SELECT event_type AS grp,
        CAST(value AS DOUBLE) AS v FROM events),
      bounds AS (SELECT grp, quantile_cont(v, 0.05) AS lo,
        quantile_cont(v, 0.95) AS hi FROM base GROUP BY grp)
      SELECT base.grp, CAST(COUNT(*) AS BIGINT) AS n,
        max(bounds.lo) AS lo, max(bounds.hi) AS hi,
        CAST(CAST(SUM(CAST(least(greatest(v, bounds.lo), bounds.hi)
          AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS winsorized_mean
      FROM base JOIN bounds ON base.grp = bounds.grp
      GROUP BY base.grp ORDER BY base.grp"""))

  val queries: Seq[Q] = Seq(xBoilerplate, xSampleWeighted, xDedupIncremental,
    xProfileColumns, xBloomJoin, xUrlDomain, xZorderLayout, xGoldenRecord,
    xHeavyHitters, xPagerankSources, xSketchIntersect, xSnapshotDiff,
    xJwMatch, xSketchQuantiles, xMadOutliers, xCorpusDrift, xBpeTrain,
    xBpeEncode, xAttribution, xBinsEquidepth, xScd2Lookup, xTextNormalize,
    xXmlParse, xPmiCollocations, xSampleWeightedGroup, xSketchCountmin,
    xNearestJoin, xCdcMaterialize, xWinsorizedMean)
}
