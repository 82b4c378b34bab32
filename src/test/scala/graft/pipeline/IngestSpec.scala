package graft.pipeline

import graft.SparkSuite
import graft.grid.Grid
import java.nio.file.Files

/** FIXTURES.md B7/B8: table naming rules + CSV → typed parquet e2e. */
class IngestSpec extends SparkSuite {

  test("table naming rules (etl.py:1302–1313)") {
    // single default sheet, single table: bare file name
    assert(Ingest.tableName("sales", "_default_", 1, 1, "table_1") == "sales")
    // single default sheet, multiple tables: sheet AND tableN appended
    assert(Ingest.tableName("sales", "_default_", 1, 2, "table_1") == "sales__default__table_1")
    // named sheet: sheet appended even when alone
    assert(Ingest.tableName("sales", "Q1 Data", 1, 1, "table_1") == "sales_Q1_Data")
    // multiple sheets, multiple tables
    assert(Ingest.tableName("book", "Summary", 3, 2, "table_2") == "book_Summary_table_2")
    // truncation to 1024
    assert(Ingest.tableName("f" * 2000, "_default_", 1, 1, "t").length <= 1024)
  }

  test("invalid dataset id rejected (etl.py:1242)") {
    intercept[IllegalArgumentException] {
      Ingest.processObject(spark, "/nonexistent.csv", "/tmp/out", "bad-id!")
    }
  }

  test("csv multi-table e2e: detect, clean, infer, align, write") {
    val dir = Files.createTempDirectory("ingest")
    val csv =
      """id,name,amount,date
        |1,alpha,10,2024-01-01
        |2,beta,20,2024-01-02
        |3,gamma,30,2024-01-03
        |4,delta,40,2024-01-04
        |""".stripMargin
    val src = dir.resolve("invoices.csv")
    Files.writeString(src, csv)
    val outDir = dir.resolve("ds").toString

    val report = Ingest.processObject(spark, src.toString, outDir, "ds1")
    assert(report.errors.isEmpty)
    assert(report.loaded.map(_.name) == Seq("invoices"))

    val out = spark.read.parquet(s"$outDir/invoices")
    assert(out.columns.toSeq == Seq("id", "name", "amount", "date"))
    import org.apache.spark.sql.types._
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType)
    assert(types("amount") == LongType)
    assert(types("name") == StringType)
    assert(types("date") == TimestampType)
    assert(out.count() == 4)
  }

  test("existing_or_pandas reuses sink schema on append") {
    val dir = Files.createTempDirectory("ingest2")
    val outDir = dir.resolve("ds").toString
    val csv1 = "k,v\n1,a\n2,b\n3,c\n"
    val src1 = dir.resolve("t.csv"); Files.writeString(src1, csv1)
    val r1 = Ingest.processObject(spark, src1.toString, outDir, "ds1")
    assert(r1.loaded.nonEmpty)
    // second file: v column looks numeric, but existing schema says STRING
    val csv2 = "k,v\n4,7\n5,8\n6,9\n"
    Files.writeString(src1, csv2)
    val r2 = Ingest.processObject(spark, src1.toString, outDir, "ds1")
    assert(r2.loaded.nonEmpty)
    val out = spark.read.parquet(s"$outDir/t")
    assert(out.count() == 6)
    assert(out.schema("v").dataType == org.apache.spark.sql.types.StringType)
  }

  test("multi-sheet map produces per-sheet names") {
    val dir = Files.createTempDirectory("ingest3")
    val mk = (vals: Seq[Seq[String]]) => Grid.fromRows(spark, vals)
    val sheet = Seq(
      Seq("x", "y"), Seq("1", "a"), Seq("2", "b"), Seq("3", "c"))
    val report = Ingest.processSheets(
      spark,
      Map("Summary" -> mk(sheet), "Q1 Data" -> mk(sheet)),
      "book", dir.resolve("ds").toString, "ds1")
    assert(report.loaded.map(_.name).toSet == Set("book_Summary", "book_Q1_Data"))
  }

  test("json-lines object (plain and gzipped) ingests with typed round-trip") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("jsonin")
    val plain = dir.resolve("ev.jsonl")
    Files.writeString(plain,
      """{"id": 1, "amount": 10.5, "tag": "a"}
        |{"id": 2, "amount": 20.0, "tag": "b"}
        |{"id": 3, "amount": 30.25, "tag": "c"}
        |{"id": 4, "amount": 40.0, "tag": "d"}
        |""".stripMargin)
    // gzip a copy
    val gz = dir.resolve("ev2.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(Files.readAllBytes(plain)); out.close()

    val ds = dir.resolve("ds").toString
    val r1 = Ingest.processObject(spark, plain.toString, ds, "ds1")
    assert(r1.errors.isEmpty && r1.loaded.map(_.name) == Seq("ev"))
    val t1 = spark.read.parquet(s"$ds/ev")
    assert(t1.count() == 4)
    assert(t1.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(t1.schema("amount").dataType == org.apache.spark.sql.types.DoubleType)
    assert(t1.schema("tag").dataType == org.apache.spark.sql.types.StringType)

    val r2 = Ingest.processObject(spark, gz.toString, ds, "ds1")
    assert(r2.errors.isEmpty && r2.loaded.map(_.name) == Seq("ev2"))
    assert(spark.read.parquet(s"$ds/ev2").count() == 4)
  }

  test("orc object ingests through the typed passthrough") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("orcin")
    val orc = dir.resolve("metrics.orc").toString
    Seq((1L, 1.5, "x"), (2L, 2.5, "y"), (3L, 3.5, "z"))
      .toDF("id", "v", "tag").coalesce(1).write.orc(orc)
    val ds = dir.resolve("ds").toString
    val r = Ingest.processObject(spark, orc, ds, "ds1")
    assert(r.errors.isEmpty && r.loaded.map(_.name) == Seq("metrics"))
    val t = spark.read.parquet(s"$ds/metrics")
    assert(t.count() == 3)
    assert(t.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(t.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
  }
}
