package graft.grid

import graft.SparkSuite
import java.nio.file.Files

/** FIXTURES.md B6 delimiter sniffing + stable row ids. */
class GridSpec extends SparkSuite {

  private def writeTmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("gridspec")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("sniffs comma, semicolon, tab, pipe") {
    val table = Seq(
      Seq("a", "b", "c"), Seq("1", "2", "3"),
      Seq("4", "5", "6"), Seq("7", "8", "9"))
    for ((d, label) <- Seq((",", "comma"), (";", "semi"), ("\t", "tab"), ("|", "pipe"))) {
      val path = writeTmp(s"$label.csv", table.map(_.mkString(d)).mkString("\n"))
      assert(Grid.sniffDelimiter(spark, path) == d, s"delimiter $label")
      val g = Grid.readCsv(spark, path)
      assert(g.nCols == 3, s"cols for $label")
      assert(g.df.count() == 4)
    }
  }

  test("pathological single-column file falls back to comma") {
    val path = writeTmp("single.csv", "abc\ndef\nghi")
    assert(Grid.sniffDelimiter(spark, path) == ",")
  }

  test("row ids follow file order") {
    val path = writeTmp("ordered.csv", (0 until 100).map(i => s"r$i,v$i").mkString("\n"))
    val g = Grid.readCsv(spark, path)
    val rows = g.df.orderBy("_row").collect()
    assert(rows.zipWithIndex.forall { case (r, i) => r.getAs[String]("0") == s"r$i" })
  }

  test("fromRows pads ragged rows with nulls") {
    val g = Grid.fromRows(spark, Seq(Seq("a"), Seq("b", "c")))
    assert(g.nCols == 2)
    val rows = g.collectCells()
    assert(rows(0).toSeq == Seq("a", null))
    assert(rows(1).toSeq == Seq("b", "c"))
  }
}
