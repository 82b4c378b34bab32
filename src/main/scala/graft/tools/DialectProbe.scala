package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only dialect probe (wave-9 shakeout): which candidate spellings
  * does Spark SQL accept, and how do the DF-side renderings resolve.
  */
object DialectProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq(
      "SELECT k0, la FROM (SELECT CAST(v % 2 AS BIGINT) AS k0, listagg(COALESCE(x, '~'), ',') WITHIN GROUP (ORDER BY COALESCE(x, '~')) AS la FROM VALUES ('b', 1),('a', 2) t(x, v) GROUP BY CAST(v % 2 AS BIGINT)) q ORDER BY k0",
      "SELECT k0, la, CAST(SUM(k0) OVER (ORDER BY k0 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs FROM (SELECT CAST(v % 2 AS BIGINT) AS k0, listagg(COALESCE(x, '~'), ',') WITHIN GROUP (ORDER BY COALESCE(x, '~')) AS la FROM VALUES ('b', 1),('a', 2) t(x, v) GROUP BY CAST(v % 2 AS BIGINT)) q ORDER BY k0",
      "SELECT k0, la, CAST(SUM(k0) OVER (ORDER BY k0 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs FROM (SELECT CAST(v % 2 AS BIGINT) AS k0, listagg(x, ',') WITHIN GROUP (ORDER BY x) AS la FROM VALUES ('b', 1),('a', 2) t(x, v) GROUP BY CAST(v % 2 AS BIGINT)) q ORDER BY k0",
      "SELECT k0, cd, la FROM (SELECT CAST(v % 2 AS BIGINT) AS k0, CAST(COUNT(DISTINCT v) AS BIGINT) AS cd, listagg(COALESCE(x, '~'), ',') WITHIN GROUP (ORDER BY COALESCE(x, '~')) AS la FROM VALUES ('b', 1),('a', 2) t(x, v) GROUP BY CAST(v % 2 AS BIGINT)) q ORDER BY k0",
      "SELECT k0, cd, la FROM (SELECT CAST(v % 2 AS BIGINT) AS k0, CAST(COUNT(DISTINCT v) AS BIGINT) AS cd, listagg(x, ',') WITHIN GROUP (ORDER BY x) AS la FROM VALUES ('b', 1),('a', 2) t(x, v) GROUP BY CAST(v % 2 AS BIGINT)) q ORDER BY k0",
      "SELECT k0, cd, sd, la FROM (SELECT CAST(v % 2 AS BIGINT) AS k0, CAST(COUNT(DISTINCT v) AS BIGINT) AS cd, CAST(SUM(DISTINCT w) AS BIGINT) AS sd, listagg(x, ',') WITHIN GROUP (ORDER BY x) AS la FROM VALUES ('b', 1, 4),('a', 2, 5) t(x, v, w) GROUP BY CAST(v % 2 AS BIGINT)) q ORDER BY k0",
      "SELECT string_agg(x, ',' ORDER BY x) FROM VALUES ('b'),('a') t(x)",
      "SELECT string_agg(x, ',') WITHIN GROUP (ORDER BY x) FROM VALUES ('b'),('a') t(x)",
      "SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) FROM VALUES ('b'),('a') t(x)",
      "SELECT array_join(array_sort(array_agg(x)), ',') FROM VALUES ('b'),(NULL),('a') t(x)",
      "SELECT sum(v) FILTER (WHERE v % 2 = 0) FROM VALUES (1),(2),(4) t(v)",
      "SELECT count(*) FILTER (WHERE v > 1) FROM VALUES (1),(2) t(v)",
      "SELECT GROUPING(k) AS g, k FROM (SELECT 1 AS k) GROUP BY ROLLUP(k) ORDER BY g",
      "SELECT GROUPING_ID(k, j) AS g FROM (SELECT 1 AS k, 2 AS j) GROUP BY ROLLUP(k, j) ORDER BY g",
      "SELECT CAST(GROUPING(CAST(k % 2 AS BIGINT)) AS INTEGER) AS g FROM (SELECT 5 AS k) GROUP BY ROLLUP(CAST(k % 2 AS BIGINT)) ORDER BY g"
    ).foreach { q =>
      try println(s"OK   ${q.take(78)} -> ${spark.sql(q).collect().toSeq}")
      catch { case e: Throwable =>
        println(s"FAIL ${q.take(78)} -> ${e.getMessage.linesIterator.next().take(100)}") }
    }
    // DF side: grouping() over BARE rollup exprs + toDF rename
    import spark.implicits._
    val df = Seq((5, 1), (6, 2), (7, 3)).toDF("k", "v")
    try {
      val e0 = (col("k") % 2).cast("bigint")
      val e1 = (col("v") % 2).cast("bigint")
      val r = df.rollup(e0, e1)
        .agg(count(lit(1)).cast("bigint"),
          grouping(e0).cast("int"),
          grouping_id(e0, e1).cast("int"),
          sum(when(col("v") % 2 === 0, col("v"))).cast("bigint"),
          array_join(array_sort(collect_list(coalesce(col("k").cast("string"), lit("~")))), ","))
        .toDF("k0", "k1", "n", "g0", "gid", "fs", "oagg")
        .orderBy(col("k0").asc_nulls_first, col("k1").asc_nulls_first, col("n"))
        .collect().toSeq
      println(s"OK   DF rollup bare+grouping+gid+fsum+oagg -> $r")
    } catch { case e: Throwable =>
      println(s"FAIL DF rollup bare -> ${e.getMessage.take(200)}") }
    // same query via Spark SQL + the DuckDB bit-order reference
    try {
      df.createOrReplaceTempView("probe_t")
      val r = spark.sql("""SELECT CAST(k % 2 AS BIGINT) AS k0,
        CAST(v % 2 AS BIGINT) AS k1, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(GROUPING(CAST(k % 2 AS BIGINT)) AS INTEGER) AS g0,
        CAST(GROUPING_ID(CAST(k % 2 AS BIGINT), CAST(v % 2 AS BIGINT)) AS INTEGER) AS gid
        FROM probe_t GROUP BY ROLLUP (CAST(k % 2 AS BIGINT), CAST(v % 2 AS BIGINT))
        ORDER BY k0 ASC NULLS FIRST, k1 ASC NULLS FIRST, n""").collect().toSeq
      println(s"OK   SQL rollup grouping/gid -> $r")
    } catch { case e: Throwable =>
      println(s"FAIL SQL rollup grouping -> ${e.getMessage.take(200)}") }
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
