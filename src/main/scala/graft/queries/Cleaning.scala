package graft.queries

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import graft.clean.Cleaner
import graft.core.{Names, Nulls}
import graft.grid.{Grid, TableDetect}
import graft.queries.H.t
import graft.schema.{Align, Infer}

/** Reference-parity cleaning/ingestion operators exposed through the
  * driver contract (SURVEY.md §2.2–2.5). Data-driven ops run over the
  * sf tables with SQL oracles; metadata-output ops (detection, header
  * promotion, inference) are deterministic and carry VALUES oracles —
  * golden expectations the DuckDB side evaluates independently.
  */
object Cleaning {

  private def rowsToDf(s: SparkSession, schema: StructType, rows: Seq[Row]) =
    s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), schema)

  /** Null-token normalization parity (etl.py:689–705): note 'N/A' is in
    * the DETECTION set but NOT the cleaning set — it must survive, and
    * the oracle encodes that asymmetry.
    */
  val qcNullNormalize = Q(
    "qc_null_normalize",
    (s, dir) => {
      val tok = when(col("l_linenumber") === 1, lit(""))
        .when(col("l_linenumber") === 2, lit("  padded  "))
        .when(col("l_linenumber") === 3, lit("None"))
        .when(col("l_linenumber") === 4, lit("NULL"))
        .when(col("l_linenumber") === 5, lit("NaT"))
        .when(col("l_linenumber") === 6, lit("<NA>"))
        .otherwise(lit("N/A"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), tok.as("raw"))
        .withColumn("cleaned", Nulls.cleanNulls(trim(col("raw"))))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, raw,
      CASE WHEN lower(trim(raw)) IN ('', 'none', 'null', 'nan', '<na>', 'nat')
        THEN NULL ELSE trim(raw) END AS cleaned
      FROM (SELECT l_orderkey, l_linenumber,
        CASE l_linenumber WHEN 1 THEN '' WHEN 2 THEN '  padded  '
          WHEN 3 THEN 'None' WHEN 4 THEN 'NULL' WHEN 5 THEN 'NaT'
          WHEN 6 THEN '<NA>' ELSE 'N/A' END AS raw
        FROM lineitem)
      ORDER BY l_orderkey, l_linenumber"""))

  /** Boolean token-map cast parity (etl.py:1081–1087). */
  val qcBoolCast = Q(
    "qc_bool_cast",
    (s, dir) => {
      val tok = element_at(
        array(lit("yes"), lit("No"), lit("TRUE"), lit("0"), lit(" t "), lit("1.0"), lit("junk")),
        (col("l_linenumber") % 7 + 1).cast("int"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), tok.as("raw"))
        .withColumn("b", Nulls.boolCast(col("raw")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, raw,
      CASE WHEN lower(trim(raw)) IN ('true','t','yes','y','1','1.0') THEN true
           WHEN lower(trim(raw)) IN ('false','f','no','n','0','0.0') THEN false
           ELSE CAST(NULL AS BOOLEAN) END AS b
      FROM (SELECT l_orderkey, l_linenumber,
        (['yes','No','TRUE','0',' t ','1.0','junk'])[(l_linenumber % 7) + 1] AS raw
        FROM lineitem)
      ORDER BY l_orderkey, l_linenumber"""))

  /** Identifier sanitization + dedup parity (etl.py:206–222, 662–669),
    * golden VALUES oracle over edge cases from FIXTURES.md B2.
    */
  val qcSanitizeNames = Q(
    "qc_sanitize_names",
    (s, dir) => {
      val raw = Seq(" 9col ", "col-x!", "", "order id", "a", "a", "a", "x" * 310)
      val names = Names.sanitizeAll(raw)
      val schema = StructType(Seq(
        StructField("pos", IntegerType), StructField("sanitized", StringType)))
      rowsToDf(s, schema, names.zipWithIndex.map { case (n, i) => Row(i, n) })
        .orderBy(col("pos"))
    },
    Some("""SELECT CAST(pos AS INTEGER) AS pos, sanitized FROM (VALUES
      (0, '_9col'), (1, 'col_x_'), (2, '_unnamed'), (3, 'order_id'),
      (4, 'a'), (5, 'a_1'), (6, 'a_2'), (7, repeat('x', 300))
      ) v(pos, sanitized) ORDER BY pos"""))

  /** Header-promotion heuristic parity (etl.py:627–653): the promoted,
    * sanitized names of a messy grid, golden VALUES oracle.
    */
  val qcHeaderPromotion = Q(
    "qc_header_promotion",
    (s, dir) => {
      val grid = Grid.fromRows(s, Seq(
        Seq("order id", "customer", "total $", "ship date"),
        Seq("1", "alice", "10.5", "2024-01-01"),
        Seq("2", "bob", "20.0", "2024-01-02"),
        Seq("3", "carol", "30.25", "2024-01-03"),
        Seq("4", "dave", "40.75", "2024-01-04"),
        Seq("5", "erin", "55.0", "2024-01-05")))
      val cleaned = Cleaner.clean(grid)
      val schema = StructType(Seq(
        StructField("pos", IntegerType), StructField("colname", StringType)))
      rowsToDf(s, schema,
        cleaned.names.zipWithIndex.map { case (n, i) => Row(i, n) })
        .withColumn("promoted", lit(cleaned.promotedHeader))
        .withColumn("n_data_rows", lit(cleaned.df.count()).cast("bigint"))
        .orderBy(col("pos"))
    },
    Some("""SELECT CAST(pos AS INTEGER) AS pos, colname, true AS promoted,
      CAST(5 AS BIGINT) AS n_data_rows FROM (VALUES
      (0, 'order_id'), (1, 'customer'), (2, 'total__'), (3, 'ship_date')
      ) v(pos, colname) ORDER BY pos"""))

  /** Connected-component multi-table detection parity (etl.py:329–438)
    * on a FIXTURES.md B1-shaped grid: two dense tables, a 2×1 stray
    * (below 3×2 minimum), and a 0.2-density diagonal block (below the
    * 0.25 floor). Golden bounding boxes; ids ordered by score (the
    * larger table wins table_1).
    */
  val qcTableDetect = Q(
    "qc_table_detect",
    (s, dir) => {
      val e = null: String
      val g = Seq(
        Seq[String](),
        Seq(e, e, e, e, e, e, e, e, e, e, e, e),
        Seq("id", "name", "amount", "date", e, e, e, e, e, e, e, "s1"),
        Seq("1", "alpha", "10", "2024-01-01", e, e, e, e, e, e, e, "s2"),
        Seq("2", "beta", "20", "2024-01-02"),
        Seq("3", "gamma", "30", "2024-01-03"),
        Seq("4", "delta", "40", "2024-01-04"),
        Seq("5", "epsil", "50", "2024-01-05"),
        Seq("6", "zeta", "60", "2024-01-06"),
        Seq(e, e, e, e, e, e, e, e, e, e, e, e),
        Seq[String](),
        Seq[String](),
        Seq(e, e, e, e, e, e, "sku", "qty", "price", "region", "flag"),
        Seq(e, e, e, e, e, e, "a1", "1", "9.5", "east", "y"),
        Seq(e, e, e, e, e, e, "a2", "2", "8.5", "west", "n"),
        Seq("x1", e, e, e, e, e, "a3", "3", "7.5", "east", "y"),
        Seq(e, "x2", e, e, e, e, "a4", "4", "6.5", "west", "n"),
        Seq(e, e, "x3", e, e, e, "a5", "5", "5.5", "east", "y"),
        Seq(e, e, e, "x4", e, e, "a6", "6", "4.5", "west", "n"),
        Seq(e, e, e, e, "x5", e, "a7", "7", "3.5", "east", "y"),
        Seq(e, e, e, e, e, e, "a8", "8", "2.5", "west", "n"))
      // NOTE row indices shift by the leading empty rows: header grid
      // rows are as laid out above (row 0 = first Seq).
      val found = TableDetect.findTables(
        g.map(r => Array.tabulate(12)(i => r.lift(i).flatMap(Option(_)).orNull)).toArray)
      val schema = StructType(Seq(
        StructField("id", StringType), StructField("r1", IntegerType),
        StructField("c1", IntegerType), StructField("r2", IntegerType),
        StructField("c2", IntegerType)))
      rowsToDf(s, schema, found.map(d => Row(d.id, d.r1, d.c1, d.r2, d.c2)))
        .orderBy(col("id"))
    },
    Some("""SELECT id, CAST(r1 AS INTEGER) r1, CAST(c1 AS INTEGER) c1,
      CAST(r2 AS INTEGER) r2, CAST(c2 AS INTEGER) c2 FROM (VALUES
      ('table_1', 12, 6, 20, 10), ('table_2', 2, 0, 8, 3)
      ) v(id, r1, c1, r2, c2) ORDER BY id"""))

  /** One-pass schema inference parity (etl.py:851–924) over a
    * stringified lineitem: integral doubles infer INTEGER exactly like
    * pandas to_numeric→Int64; digit-only guard keeps IDs out of
    * TIMESTAMP. Golden VALUES oracle.
    */
  val qcInferSchema = Q(
    "qc_infer_schema",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val asStr = li.select(li.columns.map(c => col(c).cast("string").as(c)): _*)
      val fields = Infer.inferSchema(asStr, li.columns.toSeq)
      val schema = StructType(Seq(
        StructField("colname", StringType), StructField("bq_type", StringType)))
      rowsToDf(s, schema, fields.map(f => Row(f.name, f.bqType))).orderBy(col("colname"))
    },
    Some("""SELECT colname, bq_type FROM (VALUES
      ('l_orderkey','INTEGER'), ('l_partkey','INTEGER'), ('l_suppkey','INTEGER'),
      ('l_linenumber','INTEGER'), ('l_quantity','INTEGER'),
      ('l_extendedprice','FLOAT'), ('l_discount','FLOAT'), ('l_tax','FLOAT'),
      ('l_returnflag','STRING'), ('l_linestatus','STRING'),
      ('l_shipdate','TIMESTAMP')
      ) v(colname, bq_type) ORDER BY colname"""))

  /** End-to-end stringify → infer → align round-trip over lineitem: the
    * typed output must equal DuckDB applying the same casts directly.
    * Exercises the coercing cast table (etl.py:1057–1147) at data scale.
    */
  val qcInferAlignRoundtrip = Q(
    "qc_infer_align_roundtrip",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val asStr = li.select(li.columns.map(c => col(c).cast("string").as(c)): _*)
      val schema = Infer.inferSchema(asStr, li.columns.toSeq)
      Align.align(asStr, schema).orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT CAST(l_orderkey AS BIGINT) l_orderkey,
      CAST(l_partkey AS BIGINT) l_partkey, CAST(l_suppkey AS BIGINT) l_suppkey,
      CAST(l_linenumber AS BIGINT) l_linenumber, CAST(l_quantity AS BIGINT) l_quantity,
      CAST(l_extendedprice AS DOUBLE) l_extendedprice,
      CAST(l_discount AS DOUBLE) l_discount, CAST(l_tax AS DOUBLE) l_tax,
      CAST(l_returnflag AS VARCHAR) l_returnflag,
      CAST(l_linestatus AS VARCHAR) l_linestatus, l_shipdate
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  val queries: Seq[Q] = Seq(
    qcNullNormalize, qcBoolCast, qcSanitizeNames, qcHeaderPromotion,
    qcTableDetect, qcInferSchema, qcInferAlignRoundtrip)
}
