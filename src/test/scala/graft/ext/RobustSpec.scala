package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RobustSpec extends SparkSuite {

  import spark.implicits._

  test("MAD flags the planted outlier, not the skewed-but-normal tail") {
    // group g: values 1..9 plus a wild 1000 — mean/stddev z would be
    // dragged; MAD must flag only the 1000
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "v")
    val out = Robust.madOutliers(df, col("grp"), col("v")).collect()
    assert(out.length == 1 && out.head.getAs[Double]("v") == 1000.0)
  }

  test("constant group (MAD=0) flags nothing; clean group flags nothing") {
    val df = (Seq.fill(10)(("const", 5.0)) ++
      (1 to 10).map(i => ("clean", i.toDouble))).toDF("grp", "v")
    assert(Robust.madOutliers(df, col("grp"), col("v")).isEmpty)
  }

  test("winsorized mean bounds the outlier's pull, plain mean doesn't") {
    val df = ((1 to 99).map(i => ("g", (i % 10 + 1).toDouble)) :+
      ("g", 100000.0)).toDF("grp", "v")
    val r = Robust.winsorizedMean(df, col("grp"), col("v"), 0.05, 0.95)
      .collect().head
    val wm = r.getAs[Double]("winsorized_mean")
    val plain = df.agg(avg(col("v"))).head().getDouble(0)
    assert(plain > 1000, "outlier should dominate the plain mean")
    assert(wm < 20, s"winsorized mean still dragged: $wm")
    assert(r.getAs[Long]("n") == 100L, "winsorizing must not drop rows")
  }
}
