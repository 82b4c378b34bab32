package graft.clean

import graft.SparkSuite
import graft.grid.Grid

/** FIXTURES.md B2 header-promotion variants (etl.py:627–653). */
class CleanerSpec extends SparkSuite {

  test("promote_yes: distinct textual header over generic columns") {
    val g = Grid.fromRows(spark, Seq(
      Seq("order id", "customer", "total $", "ship date"),
      Seq("1", "alice", "10.5", "2024-01-01"),
      Seq("2", "bob", "20.0", "2024-01-02"),
      Seq("3", "carol", "30.25", "2024-01-03"),
      Seq("4", "dave", "40.75", "2024-01-04"),
      Seq("5", "erin", "55.0", "2024-01-05")))
    val c = Cleaner.clean(g)
    assert(c.promotedHeader)
    assert(c.names == Seq("order_id", "customer", "total__", "ship_date"))
    assert(c.df.count() == 5)
  }

  test("promote_no_numeric: >=40% numeric first row is not promoted") {
    val g = Grid.fromRows(spark, Seq(
      Seq("1", "2", "3", "4"),
      Seq("5", "6", "7", "8"),
      Seq("9", "10", "11", "12")))
    // distinct/nonNull = 1.0 and nonNull/cols = 1.0 pass, BUT generic
    // current names (0..3) and first row distinct(4) > names distinct(4)?
    // No: 4 > 4 false, generic true → heuristic keys on generic names.
    // Reference promotes generic-named all-distinct rows! Validate the
    // actual reference arithmetic: is_likely_header is TRUE here (all
    // conditions hold via current_cols_are_generic).
    val c = Cleaner.clean(g)
    assert(c.promotedHeader) // matches etl.py:637–642 arithmetic
    assert(c.names == Seq("_1", "_2", "_3", "_4"))
  }

  test("not promoted when first row has repeats") {
    val g = Grid.fromRows(spark, Seq(
      Seq("a", "a", "a", "a"),
      Seq("1", "2", "3", "4"),
      Seq("5", "6", "7", "8")))
    val c = Cleaner.clean(g)
    assert(!c.promotedHeader) // distinct=1 fails `distinct > 1`
    // names still sanitized even without promotion (etl.py:656): digit
    // names get the leading underscore
    assert(c.names == Seq("_0", "_1", "_2", "_3"))
  }

  test("promote_dup_names: promoted duplicates get suffixes") {
    val g = Grid.fromRows(spark, Seq(
      Seq("a", "a", "b", "a"),
      Seq("1", "2", "3", "4"),
      Seq("5", "6", "7", "8")))
    // distinct=2, nonNull=4: 2/4=0.5 < 0.8 → NOT promoted per reference
    val c = Cleaner.clean(g)
    assert(!c.promotedHeader)
  }

  test("null tokens cleaned, all-null columns dropped, all-null rows dropped") {
    val g = Grid.fromRows(spark, Seq(
      Seq("name", "val", "empty"),
      Seq(" x ", "None", null),
      Seq(null, null, null),
      Seq("y", "ok", null)))
    val c = Cleaner.clean(g)
    assert(c.promotedHeader)
    assert(c.names == Seq("name", "val")) // 'empty' dropped (all null)
    val rows = c.df.orderBy("_row").collect()
    assert(rows.length == 2) // all-null row dropped
    assert(rows(0).getAs[String]("name") == "x") // trimmed
    assert(rows(0).isNullAt(rows(0).fieldIndex("val"))) // 'None' → null
  }
}
