package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ idea, re-expressed
  * as plain Catalyst aggregates): each check compiles to a conditional
  * aggregate column, and a whole check suite over a table runs as ONE
  * single-pass aggregation — at 100 TB the table is scanned once no
  * matter how many checks are attached, and every numerator is a
  * map-side partial count. Metrics are ratios of exact longs surfaced
  * as IEEE doubles, so they adjudicate bit-identically cross-engine.
  *
  * The reference has no validation layer at all (failures surface as
  * BigQuery load errors, etl.py:1329); this is the pre-load gate a
  * production pipeline puts in front of that sink.
  */
object Expect {

  sealed trait Check {
    def column: String
    def minRatio: Double
    /** Human-stable check key, e.g. `completeness(l_shipdate)`. */
    def key: String
  }
  /** Fraction of non-null values. */
  final case class Completeness(column: String, minRatio: Double)
      extends Check { def key = s"completeness($column)" }
  /** Fraction of rows with a distinct key tuple (1.0 = primary key). */
  final case class Uniqueness(columns: Seq[String], minRatio: Double)
      extends Check {
    def column: String = columns.mkString(",")
    def key = s"uniqueness($column)"
  }
  /** Fraction of values inside [lo, hi]; nulls count as violations. */
  final case class InRange(column: String, lo: Double, hi: Double,
      minRatio: Double) extends Check { def key = s"in_range($column)" }
  /** Fraction of values in the allowed set; nulls are violations. */
  final case class InSet(column: String, values: Seq[String],
      minRatio: Double) extends Check { def key = s"in_set($column)" }
  /** Fraction of values matching the regex (RE2-compatible subset so
    * the same pattern means the same thing in any engine).
    */
  final case class MatchesRegex(column: String, pattern: String,
      minRatio: Double) extends Check { def key = s"matches_regex($column)" }

  private def numerator(c: Check): Column = c match {
    case Completeness(col0, _) => count(col(col0))
    case Uniqueness(cols, _) => count_distinct(col(cols.head),
      cols.tail.map(col): _*)
    case InRange(col0, lo, hi, _) =>
      sum(when(col(col0) >= lo && col(col0) <= hi, 1L).otherwise(0L))
    case InSet(col0, vs, _) =>
      sum(when(col(col0).isin(vs: _*), 1L).otherwise(0L))
    case MatchesRegex(col0, re, _) =>
      sum(when(col(col0).rlike(re), 1L).otherwise(0L))
  }

  /** Run a check suite over one table in a single aggregation pass.
    * Returns long-form rows (check_name, metric, passed); `table`
    * prefixes the check names so suites over several tables union
    * cleanly.
    */
  def report(df: DataFrame, table: String, checks: Seq[Check]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      numerator(c).cast("long").as(s"_m$i")
    } :+ count(lit(1)).as("_n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      val metric = col(s"_m$i").cast("double") / col("_n")
      struct(lit(s"$table.${c.key}").as("check_name"),
        metric.as("metric"), (metric >= c.minRatio).as("passed"))
    }
    row.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Referential-integrity check: fraction of child rows whose key
    * exists in the parent (nulls are violations). One anti-join —
    * Catalyst broadcasts the parent when it is dimension-sized,
    * otherwise a shuffled semi/anti on the key.
    */
  def referential(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String, minRatio: Double, childName: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("_n"))
    val orphans = child.join(parent.select(col(parentCol).as("_pk")).distinct(),
        col(childCol) === col("_pk"), "left_anti")
      .agg(count(lit(1)).as("_o"))
    total.crossJoin(orphans).select(
      lit(s"$childName.referential($childCol)").as("check_name"),
      ((col("_n") - col("_o")).cast("double") / col("_n")).as("metric"),
      (((col("_n") - col("_o")).cast("double") / col("_n")) >= minRatio)
        .as("passed"))
  }

  /** Order-independent table fingerprint for cross-system
    * reconciliation: every row is serialized (null-sentineled,
    * unit-separator-joined), SHA-256 hashed, and the first 15 hex
    * digits (60 bits, < 2^63) are SUMMED as an exact decimal — a
    * commutative digest two engines can compute independently and
    * compare without moving a row. Any inserted, deleted, or mutated
    * row changes the sum; collisions require hash-prefix sums to
    * cancel exactly. Returned as (n_rows, fingerprint-as-string) —
    * the decimal stays a string because it exceeds double precision.
    *
    * Scale shape: embarrassingly parallel map + one order-independent
    * decimal sum; nothing shuffles but partial sums.
    */
  def tableFingerprint(df: DataFrame, cols: Seq[Column]): DataFrame = {
    val serialized = concat_ws("\u001f",
      cols.map(c => coalesce(c.cast("string"), lit("\u001e"))): _*)
    val rowHash = conv(substring(sha2(serialized, 256), 1, 15), 16, 10)
      .cast("decimal(19,0)")
    df.select(rowHash.as("_h"))
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        sum(col("_h")).cast("decimal(38,0)").cast("string")
          .as("fingerprint"))
  }

  /** Per-group order-independent fingerprints — the partition-level
    * refinement of [[tableFingerprint]]: when two systems' whole-table
    * digests diverge, per-group digests (per day, per source, per
    * shard) LOCATE the divergence instead of just detecting it, so the
    * re-sync copies one partition, not the table. Same commutative
    * SHA-256-prefix-sum construction — exact decimal sum, so any
    * partitioning and any row order land on identical digits.
    */
  def groupFingerprint(df: DataFrame, groupCol: Column,
      cols: Seq[Column]): DataFrame = {
    val serialized = concat_ws("\u001f",
      cols.map(c => coalesce(c.cast("string"), lit("\u001e"))): _*)
    val rowHash = conv(substring(sha2(serialized, 256), 1, 15), 16, 10)
      .cast("decimal(19,0)")
    df.select(groupCol.as("grp"), rowHash.as("_h"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        sum(col("_h")).cast("decimal(38,0)").cast("string")
          .as("fingerprint"))
  }

  /** Functional-dependency violation profiler: left-hand-side values
    * that map to MORE than one distinct right-hand-side value — the
    * discovery half of schema inference (a candidate `lhs → rhs` rule
    * holds iff this returns nothing). Returns each violating lhs with
    * its distinct-rhs count and row count, worst first.
    *
    * Scale shape: one map-side-combinable (lhs, rhs) distinct
    * aggregate, then an O(#lhs) groupBy — rows never move twice.
    */
  def fdViolations(df: DataFrame, lhs: Seq[Column], rhs: Column): DataFrame = {
    val named = lhs.zipWithIndex.map { case (c, i) => c.as(s"_l$i") }
    val lhsCols = lhs.indices.map(i => col(s"_l$i"))
    val pairs = df.select(named :+ rhs.as("_r"): _*)
    val counts = pairs.groupBy(lhsCols :+ col("_r"): _*)
      .agg(count(lit(1)).as("_n"))
    counts.groupBy(lhsCols: _*)
      .agg(count(lit(1)).cast("bigint").as("n_rhs"),
        sum(col("_n")).cast("bigint").as("n_rows"))
      .filter(col("n_rhs") > 1)
  }
}
