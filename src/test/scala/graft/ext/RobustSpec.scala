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
}
