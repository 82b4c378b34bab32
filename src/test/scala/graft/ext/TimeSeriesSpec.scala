package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: (String, String, Double)*): DataFrame =
    rows.toSeq
      .map { case (g, d, v) => (g, Timestamp.valueOf(s"$d 12:00:00"), v) }
      .toDF("g", "ts", "v")

  test("gapFill densifies the span, forward-fills, flags gaps") {
    val df = ev(
      ("a", "2024-01-01", 1.0),
      ("a", "2024-01-01", 2.0), // same day, summed
      ("a", "2024-01-04", 7.0),
      ("b", "2024-02-10", 5.0))
    val out = TimeSeries.gapFill(df, Seq("g" -> col("g")), col("ts"), col("v"))
      .orderBy("g", "day")
      .select("g", "day", "value_filled", "is_gap")
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      ("a", "2024-01-01", 3.0, false),
      ("a", "2024-01-02", 3.0, true),
      ("a", "2024-01-03", 3.0, true),
      ("a", "2024-01-04", 7.0, false),
      ("b", "2024-02-10", 5.0, false)))
  }

  test("acf matches the naive estimator, zero-filling calendar gaps") {
    // group "a": days 0,1,2,4 observed (day 3 is a zero-filled gap)
    val df = ev(
      ("a", "2024-01-01", 2.0),
      ("a", "2024-01-02", 4.0),
      ("a", "2024-01-03", 6.0),
      ("a", "2024-01-05", 8.0))
    val out = TimeSeries.acf(df, col("g"), col("ts"), col("v"), maxLag = 3)
      .orderBy("lag")
      .select("grp", "lag", "n", "acf")
      .as[(String, Int, Long, Double)].collect().toSeq
    val x = Seq(2.0, 4.0, 6.0, 0.0, 8.0)
    val xb = x.sum / x.length
    val den = x.map(v => (v - xb) * (v - xb)).sum
    for (l <- 1 to 3) {
      val num = (l until x.length)
        .map(t => (x(t) - xb) * (x(t - l) - xb)).sum
      val got = out.find(_._2 == l).get
      assert(got._3 === 5L)
      assert(math.abs(got._4 - num / den) < 1e-9, s"lag $l")
    }
  }

  test("acf excludes zero-variance groups") {
    val df = ev(("c", "2024-01-01", 5.0), ("c", "2024-01-02", 5.0))
    assert(TimeSeries.acf(df, col("g"), col("ts"), col("v"), 1).count() === 0L)
  }

  test("cusum closed form equals the sequential recurrence") {
    // a step series: mean shift after day 5 must push cusum_pos up
    val vals = Seq(10.0, 11.0, 9.0, 10.0, 10.0, 20.0, 21.0, 19.0, 22.0, 20.0)
    val df = ev(vals.zipWithIndex.map { case (v, i) =>
      ("s", f"2024-03-${i + 1}%02d", v)
    }: _*)
    val k = 1.0; val h = 10.0
    val out = TimeSeries.cusum(df, col("g"), col("ts"), col("v"),
        slack = BigDecimal("1.00"), threshold = BigDecimal("10.00"))
      .orderBy("day")
      .select("day", "cusum_pos", "cusum_neg", "alarm")
      .as[(String, Double, Double, Boolean)].collect().toSeq
    val mu = vals.sum / vals.length
    var sp = 0.0; var sn = 0.0
    vals.zip(out).foreach { case (xt, (_, gotP, gotN, gotAlarm)) =>
      sp = math.max(0.0, sp + xt - mu - k)
      sn = math.max(0.0, sn - xt + mu - k)
      assert(math.abs(gotP - sp) < 1e-9)
      assert(math.abs(gotN - sn) < 1e-9)
      assert(gotAlarm === (sp > h || sn > h))
    }
    // the shift is large enough that the alarm actually fires
    assert(out.exists(_._4))
    // and the pre-shift days see negative-side pressure, not positive
    assert(math.abs(out(4)._2) < 1e-9)
  }

  test("trendTest matches hand-computed Mann-Kendall and Theil-Sen") {
    // series 1, 2, 2, 4 (days 1..4):
    // pairs (i<j): (1,2)+ (1,2)+ (1,4)+ (2,2)0 (2,4)+ (2,4)+ → S = 5
    // ties: one group of size 2 → tie_term = 2·1·9 = 18
    // Var = [4·3·13 − 18]/18 = 138/18
    // slopes: 1, 0.5, 1, 0, 2, 1 → sorted [0, .5, 1, 1, 1, 2] →
    // median = (1+1)/2 = 1
    val df = ev(
      ("g", "2024-05-01", 1.0), ("g", "2024-05-02", 2.0),
      ("g", "2024-05-03", 2.0), ("g", "2024-05-04", 4.0))
    val r = TimeSeries.trendTest(df, col("g"), col("ts"), col("v"))
      .select("n", "s_stat", "var_s", "z", "sen_slope")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 === 4L)
    assert(r._2 === 5L)
    assert(math.abs(r._3 - 138.0 / 18.0) < 1e-12)
    assert(math.abs(r._4 - 4.0 / math.sqrt(138.0 / 18.0)) < 1e-12)
    assert(r._5 === 1.0)
  }

  test("trendTest z is negative on a decreasing series and 0 on S=0") {
    val down = ev(("d", "2024-06-01", 9.0), ("d", "2024-06-02", 6.0),
      ("d", "2024-06-03", 3.0))
    val rd = TimeSeries.trendTest(down, col("g"), col("ts"), col("v"))
      .select("s_stat", "z").as[(Long, Double)].head()
    assert(rd._1 === -3L && rd._2 < 0)
    val flat2 = ev(("f", "2024-06-01", 5.0), ("f", "2024-06-02", 5.0))
    val rf = TimeSeries.trendTest(flat2, col("g"), col("ts"), col("v"))
      .select("s_stat", "z").as[(Long, Double)].head()
    assert(rf._1 === 0L && rf._2 === 0.0)
  }

  test("seasonalNaiveBacktest computes MASE from hand-checked errors") {
    // 8 days, season 2: x = 1,3,1,3,1,3,1,9
    // seasonal (lag-2) errors: days 2..7 → |1-1|,|3-3|,... ,|9-3| = 0×5, 6
    // one-step errors: days 1..7 → 2,2,2,2,2,2,8
    val vals = Seq(1.0, 3.0, 1.0, 3.0, 1.0, 3.0, 1.0, 9.0)
    val df = ev(vals.zipWithIndex.map { case (v, i) =>
      ("s", f"2024-07-${i + 1}%02d", v)
    }: _*)
    val r = TimeSeries.seasonalNaiveBacktest(df, col("g"), col("ts"),
        col("v"), season = 2)
      .select("n_eval", "mae_seasonal", "mae_naive", "mase")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 === 6L)
    assert(math.abs(r._2 - 1.0) < 1e-12)           // 6/6
    assert(math.abs(r._3 - 20.0 / 7.0) < 1e-12)    // (2·6+8)/7
    assert(math.abs(r._4 - 1.0 / (20.0 / 7.0)) < 1e-12)
    // a perfectly periodic series scores MASE = 0
    val per = ev((1 to 8).map(i =>
      ("p", f"2024-08-$i%02d", if (i % 2 == 1) 2.0 else 5.0)): _*)
    val rp = TimeSeries.seasonalNaiveBacktest(per, col("g"), col("ts"),
        col("v"), season = 2)
      .select("mase").as[Double].head()
    assert(rp === 0.0)
  }

  test("cusum on a flat series never alarms") {
    val df = ev((1 to 6).map(i => ("f", f"2024-04-$i%02d", 3.0)): _*)
    val out = TimeSeries.cusum(df, col("g"), col("ts"), col("v"),
        slack = BigDecimal("0.50"), threshold = BigDecimal("1.00"))
      .select("cusum_pos", "cusum_neg", "alarm")
      .as[(Double, Double, Boolean)].collect()
    assert(out.forall { case (p, n, a) => p == 0.0 && n == 0.0 && !a })
  }
}
