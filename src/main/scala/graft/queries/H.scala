package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-differential query surface.
  *
  * Determinism rules (driver hash is type- AND value-sensitive):
  *   - Aggregation over floating-point inputs goes through DECIMAL casts:
  *     decimal addition is exact and order-independent, so any Spark
  *     partitioning produces bit-identical sums to DuckDB.
  *   - Spark widens SUM(DECIMAL(p,s)) to p+10 while DuckDB widens to 38;
  *     AND the two engines surface decimals differently downstream
  *     (pandas Decimal('138014.00') vs DuckDB float64 138014.0), which
  *     defeats a representation-sensitive comparator even on identical
  *     values. So every final decimal aggregate is normalized to
  *     DECIMAL(38,s) and then cast to DOUBLE on BOTH sides — one
  *     deterministic, correctly-rounded conversion of the same exact
  *     decimal, hence bit-identical doubles.
  *   - Averages = CAST(exact decimal SUM AS DOUBLE) / COUNT in BOTH
  *     engines: double division of identical operands is IEEE-identical.
  *   - COUNT → BIGINT on both sides; DuckDB SUM(BIGINT) is HUGEINT, so
  *     integer sums are CAST(... AS BIGINT) in the oracle.
  */
object H {
  /** Cast a clean double column to decimal(10,2) BEFORE any arithmetic.
    * On 2-decimal generated data, Spark (shortest-string) and DuckDB
    * (exact-binary) double→decimal rounding agree.
    */
  def dec2(c: Column): Column = c.cast("decimal(10,2)")
  val one2: Column = lit(1).cast("decimal(10,2)")

  /** Exact decimal sum, widened to DuckDB's SUM output type, surfaced
    * as DOUBLE (mirror the oracle with CAST(SUM(...) AS DOUBLE)).
    */
  def sum38(c: Column, scale: Int, name: String): Column =
    sum(c).cast(s"decimal(38,$scale)").cast("double").as(name)

  /** Canonical cross-engine string form of a float/double array. Raw
    * array columns are unhashable in the driver's pandas compare, and
    * raw float-to-string differs between the JVM and DuckDB (scientific
    * notation thresholds, shortest-repr algorithms) — so serialize each
    * element as fixed-point %.6f. A tie at the 6th decimal would need
    * value*10^6 = k+0.5 exactly, impossible for binary floats (the
    * denominator carries a factor 5^6), so Java's HALF_UP and C's
    * round-to-nearest produce identical digits for every input.
    * Oracle mirror:
    *   array_to_string(list_transform(a, x -> printf('%.6f', CAST(x AS DOUBLE))), ',')
    */
  def arrStr(c: Column): Column =
    concat_ws(",", transform(c, x => format_string("%.6f", x.cast("double"))))

  /** Order-independent average: exact decimal sum → double → divide. */
  def avgViaDec(c: Column, name: String): Column =
    (sum(dec2(c)).cast("double") / count(lit(1))).as(name)

  /** TPC-H style revenue term: extendedprice * (1 - discount), exact. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (one2 - dec2(discount))

  /** Table loader. events.ts has shipped as BOTH parquet
    * TIMESTAMP(NANOS) (early driver generations) and TIMESTAMP(MICROS)
    * (current), so the read dispatches on the resolved type: NANOS is
    * rejected outright by Spark 4 ([PARQUET_TYPE_ILLEGAL]), so it is
    * read as a nanos LONG (legacy conf) and rebuilt with integer
    * division — exactly DuckDB's ns→us truncation; MICROS arrives as
    * TIMESTAMP_NTZ (no UTC adjustment in the footer) and is cast to
    * session-TZ TIMESTAMP (UTC here), the type every downstream query
    * and oracle was written against. Either way the values are
    * bit-identical to DuckDB's read of the same file.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // harness-proof: vec_dot resolves even in sessions built without
    // spark.sql.extensions=graft.plans.GraftExtensions
    graft.plans.GraftExtensions.ensure(spark)
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  // one JVM-wide cleanup hook draining a queue of paths — per-call
  // hooks would add a thread per rep (Bench runs each stateful query
  // reps× plus warmup)
  private val tmpDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val tmpHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
      }
      var p = tmpDirs.poll()
      while (p != null) { del(p.toFile); p = tmpDirs.poll() }
    }))

  /** Temp state directory for stateful registered queries, deleted
    * recursively when the JVM exits — every `run()` invocation creates
    * fresh state (the queries adjudicate a from-empty composition), so
    * repeated Verify/Bench reps would otherwise leak parquet state
    * under /tmp for the life of the box (r19 ADVICE).
    */
  def tempStateDir(prefix: String): String = {
    tmpHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs.add(p)
    p.toString
  }
}
