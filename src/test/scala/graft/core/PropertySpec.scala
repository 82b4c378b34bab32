package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.grid.TableDetect

/** Property-based tests (SURVEY.md §5.3) over the pure driver-side
  * operators: sanitize idempotency/shape, dedup uniqueness, and
  * single-block detection exactness on randomly placed dense blocks.
  */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop, min: Int = 200): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(r.passed, s"$label: ${r.status}")
  }

  private val anyString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('-'),
      Gen.const('!'), Gen.const('é'), Gen.const('漢'))).map(_.mkString),
    Gen.const(""), Gen.const("   "),
    Gen.listOfN(350, Gen.alphaChar).map(_.mkString))

  test("sanitize is idempotent") {
    check("idempotent", Prop.forAll(anyString) { s =>
      val once = Names.sanitize(s)
      Names.sanitize(once) == once
    })
  }

  test("sanitize output is always a valid identifier within the cap") {
    check("valid", Prop.forAll(anyString) { s =>
      val n = Names.sanitize(s)
      // \w is unicode-aware to match the reference's Python semantics
      // (etl.py:213) — 'é'/'漢' are word chars and survive
      n.nonEmpty && n.length <= Names.MaxNameLen &&
        n.matches("(?U)^[A-Za-z_]\\w*$")
    })
  }

  test("sanitizeAll yields pairwise-distinct names, one per input") {
    val lists = Gen.listOf(Gen.oneOf(
      Gen.const("a"), Gen.const("a "), Gen.const("A"), Gen.const("b!"),
      Gen.const(""), anyString))
    check("distinct", Prop.forAll(lists) { raw =>
      val out = Names.sanitizeAll(raw)
      out.length == raw.length && out.distinct.length == out.length
    })
  }

  test("dedup: first occurrence bare, repeats suffixed, output globally unique") {
    val tricky = Gen.oneOf("a", "a_1", "a_2", "b", "x" * 300, "x" * 299)
    val lists = Gen.oneOf(Gen.listOf(Gen.identifier), Gen.listOf(tricky))
    check("dedup-laws", Prop.forAll(lists) { names =>
      val out = Names.dedup(names)
      val unique = out.distinct.length == out.length
      // first occurrence keeps the bare name — unless an earlier
      // OUTPUT already took it (e.g. ["a","a","a_1"]: the second "a"
      // became "a_1", so the literal "a_1" must be bumped)
      val firstBare = names.zip(out).zipWithIndex.forall { case ((orig, got), i) =>
        names.take(i).contains(orig) ||
          out.take(i).contains(orig.take(Names.MaxNameLen)) ||
          got == orig.take(Names.MaxNameLen)
      }
      val suffixShape = names.zip(out).forall { case (orig, got) =>
        got == orig.take(Names.MaxNameLen) ||
          (got.matches(".*_\\d+$") && orig.startsWith(got.substring(0, got.lastIndexOf('_'))))
      }
      unique && firstBare && suffixShape && out.forall(_.length <= Names.MaxNameLen)
    })
  }

  private val blockGen: Gen[(Int, Int, Int, Int, Int, Int)] = for {
    gridRows <- Gen.choose(8, 24)
    gridCols <- Gen.choose(6, 16)
    h <- Gen.choose(3, math.min(8, gridRows))
    w <- Gen.choose(2, math.min(6, gridCols))
    r0 <- Gen.choose(0, gridRows - h)
    c0 <- Gen.choose(0, gridCols - w)
  } yield (gridRows, gridCols, h, w, r0, c0)

  test("a single fully-dense block is detected with its exact bounding box") {
    check("single-block", Prop.forAll(blockGen) {
      case (gr, gc, h, w, r0, c0) =>
        val cells = Array.tabulate(gr, gc) { (r, c) =>
          if (r >= r0 && r < r0 + h && c >= c0 && c < c0 + w) {
            if (r == r0) s"hdr_$c" else s"v${r}_$c"
          } else null
        }
        val found = TableDetect.findTables(cells)
        found.length == 1 && {
          val d = found.head
          d.r1 == r0 && d.c1 == c0 && d.r2 == r0 + h - 1 && d.c2 == c0 + w - 1
        }
    }, min = 100)
  }

  test("two disjoint far-apart dense blocks are both detected, larger first") {
    val gen = for {
      h1 <- Gen.choose(4, 7); w1 <- Gen.choose(3, 5)
      h2 <- Gen.choose(3, h1); w2 <- Gen.choose(2, w1)
    } yield (h1, w1, h2, w2)
    check("two-blocks", Prop.forAll(gen) { case (h1, w1, h2, w2) =>
      val gr = h1 + h2 + 6
      val gc = math.max(w1, w2) + 8
      val cells = Array.tabulate(gr, gc) { (r, c) =>
        if (r < h1 && c < w1) { if (r == 0) s"h$c" else s"a${r}_$c" }
        else if (r >= h1 + 3 && r < h1 + 3 + h2 && c >= gc - w2) {
          if (r == h1 + 3) s"k$c" else s"b${r}_$c"
        } else null
      }
      val found = TableDetect.findTables(cells)
      found.length == 2 && {
        val areas = found.map(d => (d.r2 - d.r1 + 1).toLong * (d.c2 - d.c1 + 1))
        found.head.id == "table_1" && areas.head >= areas(1)
      }
    }, min = 100)
  }
}
