package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSuite {

  import spark.implicits._

  test("rocAuc: perfect separation gives 1.0, reversed gives 0.0") {
    val df = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("s", "y")
    val r = Stats.rocAuc(df, col("s"), col("y")).collect()(0)
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Double]("auc") == 1.0)
    val rev = Stats.rocAuc(df, -col("s"), col("y")).collect()(0)
    assert(rev.getAs[Double]("auc") == 0.0)
  }

  test("rocAuc: all scores tied gives exactly 0.5 via average ranks") {
    val df = Seq((1.0, true), (1.0, false), (1.0, true), (1.0, false))
      .toDF("s", "y")
    assert(Stats.rocAuc(df, col("s"), col("y"))
      .collect()(0).getAs[Double]("auc") == 0.5)
  }

  test("rocAuc matches the pair-counting definition on tied data") {
    // AUC = (#(pos>neg) + 0.5·#(pos=neg)) / (P·N), brute-forced
    val rows = Seq(3.0 -> true, 2.0 -> true, 2.0 -> false, 1.0 -> false,
      1.0 -> true, 0.5 -> false)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val expected = (for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    val got = Stats.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .collect()(0).getAs[Double]("auc")
    assert(math.abs(got - expected) < 1e-15, s"got $got want $expected")
  }

  test("spearman: monotone transform gives rho 1, reversal -1") {
    val df = Seq((1L, 10L), (2L, 40L), (3L, 90L), (4L, 160L))
      .toDF("a", "b")
    // sqrt(s)·sqrt(s) reconstructs s only to 1 ulp, so rho lands within
    // an ulp of ±1 rather than exactly on it
    val up = Stats.spearman(df, col("a"), col("b")).collect()(0)
    assert(math.abs(up.getAs[Double]("spearman_rho") - 1.0) < 1e-12)
    val dn = Stats.spearman(df, col("a"), -col("b")).collect()(0)
    assert(math.abs(dn.getAs[Double]("spearman_rho") + 1.0) < 1e-12)
  }

  test("spearman handles ties with average ranks") {
    // x = (1,2,2,3) -> avg ranks (1, 2.5, 2.5, 4); y = (1,2,3,4) ->
    // ranks (1,2,3,4). Centered doubled ranks: cx = (-3,0,0,3),
    // cy = (-3,-1,1,3): rho = 18 / (sqrt(18)*sqrt(20)) = 18/sqrt(360)
    val df = Seq((1L, 1L), (2L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val rho = Stats.spearman(df, col("a"), col("b"))
      .collect()(0).getAs[Double]("spearman_rho")
    assert(math.abs(rho - 18.0 / math.sqrt(360.0)) < 1e-12, s"got $rho")
  }

  test("spearman is partition-independent") {
    val df = (1 to 200).map(i => (i.toLong % 17, (i * i).toLong % 23))
      .toDF("a", "b")
    val r1 = Stats.spearman(df, col("a"), col("b")).collect()(0).getDouble(1)
    val r2 = Stats.spearman(df.repartition(13), col("a"), col("b"))
      .collect()(0).getDouble(1)
    assert(r1 == r2)
  }

  test("gini: equal shares give 0, total concentration approaches 1") {
    val eq = Seq((1, 10.0), (2, 10.0), (3, 10.0), (4, 10.0)).toDF("e", "v")
    val g0 = Stats.gini(eq, col("e"), col("v")).collect()(0)
    assert(g0.getAs[Double]("gini") == 0.0)
    assert(g0.getAs[Double]("total") == 40.0)
    // one entity holds everything: G = (n-1)/n = 0.75
    val conc = Seq((1, 0.0), (2, 0.0), (3, 0.0), (4, 100.0)).toDF("e", "v")
    val g1 = Stats.gini(conc, col("e"), col("v")).collect()(0)
    assert(g1.getAs[Double]("gini") == 0.75)
  }

  test("gini is invariant to the order ties are indexed in") {
    val df = Seq((1, 5.0), (2, 5.0), (3, 20.0), (4, 30.0)).toDF("e", "v")
    val a = Stats.gini(df, col("e"), col("v")).collect()(0).getAs[Double]("gini")
    val b = Stats.gini(df.orderBy(desc("e")).repartition(7), col("e"), col("v"))
      .collect()(0).getAs[Double]("gini")
    assert(a == b)
  }

  test("rollingAnomalies flags a spike only after a full window") {
    // 8 quiet days then a 100x spike; day 9 has a full 7-day trailing
    // window of identical counts (variance 0) so any deviation flags
    val rows = (1 to 8).flatMap(d =>
      (1 to 10).map(i => ("a", f"2024-01-$d%02d 12:00:00", i))) ++
      (1 to 1000).map(i => ("a", "2024-01-09 12:00:00", i))
    val df = rows.toDF("g", "ts", "i")
      .select(col("g"), col("ts").cast("timestamp").as("ts"))
    val r = Stats.rollingAnomalies(df, col("g"), col("ts"))
      .orderBy("day").collect()
    assert(r.length == 9)
    // first 7 days: window incomplete, never flagged
    assert(r.take(7).forall(!_.getAs[Boolean]("anomaly")))
    // day 8: full window, count identical to history -> not anomalous
    assert(!r(7).getAs[Boolean]("anomaly"))
    assert(r(8).getAs[Boolean]("anomaly"), "spike day must flag")
    assert(r(8).getAs[Long]("s_win") == 70L)
  }

  test("rollingAnomalies: steady counts with jitter never flag at k=3") {
    val rows = (1 to 20).flatMap(d =>
      (1 to (10 + d % 3)).map(i => ("a", f"2024-02-$d%02d 01:00:00", i)))
    val df = rows.toDF("g", "ts", "i")
      .select(col("g"), col("ts").cast("timestamp").as("ts"))
    val r = Stats.rollingAnomalies(df, col("g"), col("ts")).collect()
    assert(r.forall(!_.getAs[Boolean]("anomaly")))
  }

  test("kAnonymityAudit returns only groups under k") {
    val df = (1 to 9).map(i => (i, if (i <= 6) "big" else "small", i % 2))
      .toDF("id", "grp", "parity")
    // grp=big has 3 per parity, grp=small has 2 and 1
    val r = Stats.kAnonymityAudit(df, Seq(col("grp"), col("parity")), k = 3)
      .collect()
    assert(r.forall(_.getAs[Long]("n") < 3))
    assert(r.map(x => (x.getString(0), x.getInt(1))).toSet ==
      Set(("small", 0), ("small", 1)))
  }

  test("transitionMatrix: per-user adjacent pairs, rows sum to 1") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (1L, "2024-01-01 00:01:00", 2L, "b"),
      (1L, "2024-01-01 00:02:00", 3L, "a"),
      (2L, "2024-01-01 00:00:00", 4L, "a"),
      (2L, "2024-01-01 00:01:00", 5L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val m = Behavior.transitionMatrix(df, "user_id", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("prob"))).toMap
    // transitions: a->b (x2), b->a (x1); no pair crosses users
    assert(m.keySet == Set(("a", "b"), ("b", "a")))
    assert(m(("a", "b")) == (2L, 1.0))
    assert(m(("b", "a")) == (1L, 1.0))
  }

  test("ksTest: identical samples give 0, disjoint samples give 1") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val same = Stats.ksTest(a, a, col("v")).collect()(0)
    assert(same.getAs[Double]("ks_d") == 0.0)
    val b = Seq(10.0, 11.0).toDF("v")
    val disj = Stats.ksTest(a, b, col("v")).collect()(0)
    assert(disj.getAs[Double]("ks_d") == 1.0)
    assert(disj.getAs[Long]("n_a") == 3L && disj.getAs[Long]("n_b") == 2L)
  }

  test("ksTest matches the hand-computed D on overlapping samples") {
    // A = (1,2,3,4), B = (3,4,5,6): max gap at v=2 (2/4 - 0) = 0.5
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    assert(Stats.ksTest(a, b, col("v")).collect()(0)
      .getAs[Double]("ks_d") == 0.5)
  }

  test("calibrationBins: counts, clipping, and exact rates") {
    val df = Seq((5.0, true), (15.0, false), (15.0, true), (999.0, true))
      .toDF("s", "y")
    val bins = Stats.calibrationBins(df, col("s"), col("y"),
      binWidth = 10.0, nBins = 3).orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 2L))
    val b1 = bins(1)
    assert(b1.getAs[Long]("n") == 2 && b1.getAs[Long]("n_pos") == 1)
    assert(b1.getAs[Double]("pos_rate") == 0.5)
    assert(b1.getAs[Double]("mean_score") == 15.0)
    // 999 clips into the last bin
    assert(bins(2).getAs[Long]("n") == 1)
  }

  test("chi2Independence: independent table gives zero terms") {
    // perfectly proportional 2x2: O = E everywhere
    val df = (Seq.fill(20)(("a", "u")) ++ Seq.fill(10)(("a", "v")) ++
      Seq.fill(40)(("b", "u")) ++ Seq.fill(20)(("b", "v"))).toDF("x", "y")
    val r = Stats.chi2Independence(df, col("x"), col("y")).collect()
    assert(r.length == 4)
    assert(r.forall(_.getAs[Double]("chi2_term") == 0.0))
    val cell = r.find(c => c.getAs[String]("x") == "b" &&
      c.getAs[String]("y") == "u").get
    assert(cell.getAs[Long]("n_obs") == 40 &&
      cell.getAs[Double]("expected") == 40.0)
  }

  test("mutualInfo: independent columns 0, determined columns H(X)") {
    val indep = (for { x <- Seq("a", "b"); y <- Seq("u", "v") }
      yield (x, y)).toDF("x", "y")
    assert(indep.count() == 4)
    val mi0 = Stats.mutualInfo(indep, col("x"), col("y"))
      .collect()(0).getAs[Double]("mutual_info")
    assert(mi0 == 0.0)
    // y = f(x), uniform over 2 values: MI = ln 2
    val det = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v"))
      .toDF("x", "y")
    val mi = Stats.mutualInfo(det, col("x"), col("y"))
      .collect()(0).getAs[Double]("mutual_info")
    assert(math.abs(mi - math.log(2)) < 1e-9, s"got $mi")
  }

  test("kaplanMeier: risk sets, censoring, and the wiped-out sentinel") {
    // durations: event@1, event@2, censored@2, event@3
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, true))
      .toDF("dur", "obs")
    val r = Stats.kaplanMeier(df, col("dur"), col("obs"))
      .orderBy("t").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byT = r.map(x => x.getLong(0) ->
      (x.getAs[Long]("n_risk"), x.getAs[Long]("n_events"),
        x.getAs[Long]("n_censored"))).toMap
    assert(byT(1L) == ((4L, 1L, 0L)))
    assert(byT(2L) == ((3L, 1L, 1L)), "censored-at-2 must count at t=2")
    assert(byT(3L) == ((1L, 1L, 0L)))
    val ln34 = BigDecimal(math.log(3.0 / 4.0))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(0).getAs[Double]("log_survival") - ln34) < 1e-11)
    // t=3 wipes the risk set: survival 0 -> NULL log sentinel
    assert(r(2).isNullAt(r(2).fieldIndex("log_survival")))
    // log-survival is monotone nonincreasing over event times
    assert(r(0).getAs[Double]("log_survival") >
      r(1).getAs[Double]("log_survival"))
  }

  test("kaplanMeier with no censoring matches the empirical survival") {
    // 3 events at distinct times: S after first = 2/3, log = ln(2/3)+...
    val df = Seq((5L, true), (6L, true), (7L, true)).toDF("dur", "obs")
    val r = Stats.kaplanMeier(df, col("dur"), col("obs"))
      .orderBy("t").collect()
    def canon(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = canon(math.log(2.0 / 3.0)) + canon(math.log(1.0 / 2.0))
    assert(math.abs(r(1).getAs[Double]("log_survival") - expected) < 1e-11)
  }

  test("ewmaDaily decays by real day gaps and truncates the kernel") {
    val rows = Seq(("a", "2024-01-01", 8), ("a", "2024-01-02", 8),
      ("b", "2024-01-01", 4), ("b", "2024-01-03", 4))
      .flatMap { case (g, d, n) => (1 to n).map(_ => (g, s"$d 09:00:00")) }
    val df = rows.toDF("g", "ts")
      .select(col("g"), col("ts").cast("timestamp").as("ts"))
    val e = Stats.ewmaDaily(df, col("g"), col("ts"), alpha = 0.25,
      kernel = 14).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("ewma"))
      .toMap
    // adjacent days: y = 0.25*(8 + 8*0.75) = 3.5
    assert(e(("a", "2024-01-02")) == 3.5)
    assert(e(("a", "2024-01-01")) == 2.0)
    // a 2-day gap decays by 0.75^2: y = 0.25*(4 + 4*0.5625) = 1.5625
    assert(e(("b", "2024-01-03")) == 1.5625)
  }

  test("rfm scores quintiles with 5 = best on every axis") {
    // 5 customers, strictly ordered on each axis
    val rows = (1 to 5).flatMap { c =>
      (1 to c).map(i => (c.toLong, f"2024-01-${c * 5}%02d 00:00:00",
        c * 100.0))
    }
    val df = rows.toDF("cust", "d", "amt")
      .select(col("cust"), col("d").cast("timestamp").as("d"), col("amt"))
    val r = Stats.rfm(df, col("cust"), col("d"), col("amt"))
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("r_score"), x.getAs[Long]("f_score"),
          x.getAs[Long]("m_score"), x.getAs[Long]("rfm_segment"))).toMap
    // customer 5: most recent, most orders, most revenue -> 555
    assert(r(5L) == ((5L, 5L, 5L, 555L)))
    assert(r(1L) == ((1L, 1L, 1L, 111L)))
    // recency of customer 5 is 0 days (orders on the as-of date)
    val rec5 = Stats.rfm(df, col("cust"), col("d"), col("amt"))
      .filter(col("cust") === 5).collect()(0).getAs[Long]("recency")
    assert(rec5 == 0L)
  }

  test("wilsonInterval brackets the rate and stays inside [0,1]") {
    val df = (Seq.fill(8)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
      Seq.fill(1)(("b", true)) ++ Seq.fill(99)(("b", false)))
      .toDF("g", "y")
    val r = Stats.wilsonInterval(df, col("g"), col("y")).collect()
      .map(x => x.getString(0) -> (x.getAs[Long]("n"),
        x.getAs[Double]("rate"), x.getAs[Double]("ci_lo"),
        x.getAs[Double]("ci_hi"))).toMap
    val (na, ra, loa, hia) = r("a")
    assert(na == 10 && ra == 0.8)
    assert(loa > 0.0 && loa < 0.8 && hia > 0.8 && hia < 1.0)
    // Wilson at p=0.8, n=10, z=1.96: known interval ~(0.490, 0.943)
    assert(math.abs(loa - 0.4901625302) < 1e-3, s"lo $loa")
    assert(math.abs(hia - 0.9433178912) < 1e-3, s"hi $hia")
    // extreme small rate still yields a positive lower bound < rate
    val (_, rb, lob, hib) = r("b")
    assert(rb == 0.01 && lob >= 0.0 && lob < rb && hib > rb && hib < 1.0)
  }

  test("moments: symmetric data has zero skew, known kurtosis") {
    // {1,2,3}: mean 2, m2 = 2/3, m3 = 0, m4 = 2/3 -> kurtosis -1.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    val r = Stats.moments(df, col("g"), col("v")).collect()(0)
    assert(r.getAs[Long]("n") == 3)
    assert(r.getAs[Double]("mean") == 2.0)
    assert(math.abs(r.getAs[Double]("variance") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-12)
    assert(math.abs(r.getAs[Double]("kurtosis") + 1.5) < 1e-12)
    // right-skewed data scores positive skewness
    val sk = Stats.moments(Seq(("b", 1.0), ("b", 1.0), ("b", 1.0),
      ("b", 10.0)).toDF("g", "v"), col("g"), col("v")).collect()(0)
    assert(sk.getAs[Double]("skewness") > 1.0)
  }

  test("seasonalityStrength: weekday-determined volume scores near 1") {
    // two full weeks; count per day = 10*dow (pure weekday signal)
    val rows = for {
      d <- 1 to 14
      dow = (d - 1) % 7
      i <- 1 to (10 + dow * 10)
    } yield ("a", f"2024-01-$d%02d 12:00:00")
    val df = rows.toDF("g", "ts")
      .select(col("g"), col("ts").cast("timestamp").as("ts"))
    val eta = Stats.seasonalityStrength(df, col("g"), col("ts"))
      .collect()(0).getAs[Double]("eta_sq")
    assert(eta == 1.0, s"pure weekday signal must score 1, got $eta")
    // flat volume scores 0
    val flat = (1 to 14).flatMap(d =>
      (1 to 10).map(_ => ("b", f"2024-01-$d%02d 12:00:00")))
      .toDF("g", "ts")
      .select(col("g"), col("ts").cast("timestamp").as("ts"))
    val e0 = Stats.seasonalityStrength(flat, col("g"), col("ts"))
      .collect()(0).getAs[Double]("eta_sq")
    assert(e0 == 0.0, s"flat volume must score 0, got $e0")
  }

  test("tokenEntropy: uniform tokens high, repeated token zero") {
    val df = Seq((1L, "a b c d"), (2L, "x x x x"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val e = Text.tokenEntropy(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Double]("token_entropy"))).toMap
    assert(e(1L)._1 == 4L && math.abs(e(1L)._2 - math.log(4)) < 1e-9)
    assert(e(2L)._2 == 0.0)
    assert(math.abs(e(3L)._2 - math.log(2)) < 1e-9)
  }

  test("hbosOutliers: planted outlier ranks first with the hand-computed score") {
    import spark.implicits._
    // 19 inliers clustered at (1.0, 10.0), one outlier at (9.0, 90.0):
    // with 4 bins over [1,9]/[10,90] the outlier sits alone in the last
    // bin of BOTH features → score = 2·ln(20/1); inliers share bin 0
    // with 19 peers → 2·ln(20/19)
    val rows = (1L to 19L).map(i => (i, 1.0, 10.0)) :+ ((20L, 9.0, 90.0))
    val df = rows.toDF("id", "a", "b")
    val r = Stats.hbosOutliers(df, Seq("id" -> col("id")),
        Seq("a" -> col("a"), "b" -> col("b")), bins = 4, topK = 3)
      .orderBy(col("rank"))
      .select("id", "score", "rank").as[(Long, Double, Long)].collect()
    assert(r.head._1 === 20L)
    assert(math.abs(r.head._2 - 2 * math.log(20.0)) < 1e-9)
    assert(math.abs(r(1)._2 - 2 * math.log(20.0 / 19)) < 1e-9)
    // ranks 2..3 are the smallest inlier ids (deterministic tie-break)
    assert(r(1)._1 === 1L && r(2)._1 === 2L)
  }

  test("quantileNormalize maps rank-equal rows of different scales together") {
    import spark.implicits._
    // group a: 1,2,3,4,5 — group b: 100,200,300,400,500. Both are
    // 5-point uniform ladders, so rank i of a and rank i of b must map
    // to the SAME pooled value; endpoints hit the pooled min/max.
    val rows = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 5.0),
      ("b", 6L, 100.0), ("b", 7L, 200.0), ("b", 8L, 300.0),
      ("b", 9L, 400.0), ("b", 10L, 500.0))
    val df = rows.toDF("g", "id", "v")
    val r = Stats.quantileNormalize(df, col("g"), col("id"), col("v"))
      .select("grp", "r", "norm_value")
      .as[(String, Long, Double)].collect()
    val a = r.filter(_._1 == "a").map(x => x._2 -> x._3).toMap
    val b = r.filter(_._1 == "b").map(x => x._2 -> x._3).toMap
    (1L to 5L).foreach(i => assert(a(i) === b(i), s"rank $i"))
    assert(a(1L) === 1.0)   // pooled min
    assert(a(5L) === 500.0) // pooled max
  }

  test("quantileNormalize is partition-invariant and handles n=1 groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i =>
      (s"g${i % 4}", i, rnd.nextInt(1000) / 10.0)) :+ (("solo", 999L, 42.0))
    val df = rows.toDF("g", "id", "v")
    val r1 = Stats.quantileNormalize(df.repartition(1), col("g"),
      col("id"), col("v")).orderBy("grp", "id").collect().toSeq
    val r8 = Stats.quantileNormalize(df.repartition(8), col("g"),
      col("id"), col("v")).orderBy("grp", "id").collect().toSeq
    assert(r1 === r8)
    // the singleton group landed on the pooled median rank's value
    val solo = r1.filter(_.getString(0) == "solo")
    assert(solo.size === 1 && !solo.head.isNullAt(5))
  }

  test("hbosOutliers excludes constant features from the score") {
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, i.toDouble, 5.0)).toDF("id", "a", "c")
    val withConst = Stats.hbosOutliers(df, Seq("id" -> col("id")),
      Seq("a" -> col("a"), "c" -> col("c")), bins = 5, topK = 10)
    val without = Stats.hbosOutliers(df, Seq("id" -> col("id")),
      Seq("a" -> col("a")), bins = 5, topK = 10)
    assert(withConst.orderBy("rank").collect().toSeq ===
      without.orderBy("rank").collect().toSeq)
  }
}
