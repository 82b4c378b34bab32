package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md B2 sanitize edge cases (etl.py:206–222, 662–669). */
class NamesSpec extends AnyFunSuite {
  test("sanitize basics") {
    assert(Names.sanitize(" 9col ") == "_9col")
    assert(Names.sanitize("col-x!") == "col_x_")
    assert(Names.sanitize("") == "_unnamed")
    assert(Names.sanitize("   ") == "_unnamed")
    assert(Names.sanitize("order id") == "order_id")
    assert(Names.sanitize("_ok") == "_ok")
    assert(Names.sanitize("total $") == "total__")
  }

  test("sanitize truncates to 300") {
    assert(Names.sanitize("x" * 310) == "x" * 300)
  }

  test("sanitize null-safe") {
    assert(Names.sanitize(null) == "_unnamed")
  }

  test("dedup suffixes repeats, first keeps bare name") {
    assert(Names.dedup(Seq("a", "a", "b", "a")) == Seq("a", "a_1", "b", "a_2"))
  }

  test("sanitizeAll composes") {
    assert(Names.sanitizeAll(Seq("a b", "a-b", "ok")) == Seq("a_b", "a_b_1", "ok"))
  }

  test("sanitize is idempotent") {
    val samples = Seq(" 9col ", "col-x!", "", "order id", "x" * 310, "ünïcode")
    samples.foreach { s =>
      val once = Names.sanitize(s)
      assert(Names.sanitize(once) == once, s"not idempotent for '$s'")
    }
  }
}
