package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSuite {

  import spark.implicits._

  test("zValue interleaves bits: x even positions, y odd") {
    val df = Seq((3L, 1L), (0L, 3L), (255L, 0L)).toDF("x", "y")
    val out = df.select(Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=0b11,y=0b01 → 1<<0 | 1<<2 | 1<<1 = 7
    // x=0,y=0b11 → 1<<1 | 1<<3 = 10
    // x=0b11111111,y=0 → sum of even bits 0..14 = 0b0101010101010101
    assert(out == Seq(7L, 10L, 0x5555L))
  }

  test("every z-bucket has a bounded box in BOTH dimensions") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val (xLo, xHi) = (800.0, 600000.0)
    val (yLo, yHi) = (7.889184e8, 9.2e8)
    // 6 bucket bits over 8-bit dims = 3 high bits per dimension: every
    // bucket's rows share the top-3-bit group of each quantized dim
    val stats = Layout.zorderStats(orders, col("o_totalprice"),
      col("o_orderdate").cast("timestamp_ltz").cast("double"),
      xLo, xHi, yLo, yHi, bits = 8, bucketBits = 6).collect()
    def q(v: Double, lo: Double, hi: Double): Long =
      math.min(math.max(math.floor((v - lo) / (hi - lo) * 256).toLong, 0L), 255L)
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (xmin, xmax) = (r.getAs[Double]("x_min"), r.getAs[Double]("x_max"))
      val (ymin, ymax) = (r.getAs[Double]("y_min"), r.getAs[Double]("y_max"))
      assert(q(xmin, xLo, xHi) >> 5 == q(xmax, xLo, xHi) >> 5,
        s"bucket ${r.getAs[Long]("bucket")} x-range spans quant groups")
      assert(q(ymin, yLo, yHi) >> 5 == q(ymax, yLo, yHi) >> 5,
        s"bucket ${r.getAs[Long]("bucket")} y-range spans quant groups")
    }
  }
}
