package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BinsSpec extends SparkSuite {

  import spark.implicits._

  test("equi-depth bins hold near-equal counts even under heavy skew") {
    // pareto-ish skew: 900 small values + 100 huge ones
    val df = ((1 to 900).map(_.toDouble) ++
      (1 to 100).map(i => 1e6 + i * 1e4)).toDF("v")
    val out = Bins.equiDepth(df, col("v"), nBins = 10)
      .orderBy("bin").collect()
    assert(out.length == 10)
    val counts = out.map(_.getAs[Long]("n_rows"))
    assert(counts.forall(c => c >= 90 && c <= 110),
      s"bins not equi-depth: ${counts.mkString(",")}")
    // bins are ordered and non-overlapping
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
    }
    // the skewed tail concentrates in the top bin, not spread thin
    assert(out.last.getAs[Double]("lo") >= 1e6)
  }
}
