package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Round-6 operator specs: int8 quantization, Fellegi–Sunter linkage,
  * Zipf fit.
  */
class ExtCSpec extends SparkSuite {
  import spark.implicits._

  test("int8 quantization: hand-computable codes, errors, and clip count") {
    val emb = Seq(
      (1L, Seq(1.0f, -2.0f)),
      (2L, Seq(0.5f, 2.0f))).toDF("vec_id", "embedding")
    val out = Quant.quantizeInt8(emb, "vec_id", "embedding",
        Quant.calibrate(emb, "embedding"))
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // absmax: dim0 = 1.0 → scale 127; dim1 = 2.0 → scale 63.5
    // codes: [round(1*127), round(-2*63.5)] = [127, -127]
    //        [round(0.5*127)=64 (HALF_UP), round(2*63.5)] = [64, 127]
    assert(out(0) == ((1L, "127,-127", 0L)))
    assert(out(1) == ((2L, "64,127", 0L)))
    // max_err row 2: |0.5 - 64/127| ≈ 0.0039
    val err = Quant.quantizeInt8(emb, "vec_id", "embedding",
        Quant.calibrate(emb, "embedding"))
      .filter(col("vec_id") === 2).collect()(0).getDouble(3)
    assert(math.abs(err - math.abs(0.5 - 64.0 / 127.0)) < 1e-9)
  }

  test("int8 quantization clips codes beyond the calibration range") {
    // calibrate on small vectors, quantize a frame containing a larger
    // one — the out-of-range element must clamp to ±127 and be counted
    val cal = Quant.calibrate(
      Seq((1L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding"), "embedding")
    val out = Quant.quantizeInt8(
        Seq((9L, Seq(2.0f, -3.0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", cal)
      .collect()(0)
    assert(out.getString(1) == "127,-127")
    assert(out.getLong(2) == 2L)
  }

  test("percentile calibration clips the outlier tail that absmax would protect") {
    import spark.implicits._
    // 9 unit values + one 10x outlier in dim 0: absmax calibration keeps
    // the outlier representable; p-0.8 calibration sets the range at the
    // bulk and the outlier clips
    val emb = ((1 to 9).map(i => (i.toLong, Seq(1.0f, 1.0f))) :+
      (10L, Seq(10.0f, 1.0f))).toDF("vec_id", "embedding")
    val byMax = Quant.quantizeInt8(emb, "vec_id", "embedding",
        Quant.calibrate(emb, "embedding"))
      .agg(sum(col("n_clipped"))).collect()(0).getLong(0)
    assert(byMax == 0L, "absmax calibration must never clip")
    val byPct = Quant.quantizeInt8(emb, "vec_id", "embedding",
        Quant.calibratePercentile(emb, "embedding", 0.8))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byPct(10L) == 1L, s"outlier vector must clip in dim 0: $byPct")
    assert((1 to 9).forall(i => byPct(i.toLong) == 0L),
      s"bulk vectors must not clip: $byPct")
  }

  test("Fellegi-Sunter: weights sum per agreement pattern, decisions cut at thresholds") {
    import Linkage.FieldRule
    val recs = Seq(
      (1L, "alpha", 10.0, "B"),
      (2L, "alpha", 10.0, "B"),  // full agree vs 1 → match
      (3L, "omega", 900.0, "B")  // full disagree vs 1 → non_match
    ).toDF("id", "name", "bal", "blk")
    val rName = FieldRule("name", col("a.name") === col("b.name"), 0.9, 0.05)
    val rBal = FieldRule("bal", abs(col("a.bal") - col("b.bal")) <= 1.0, 0.8, 0.1)
    val out = Linkage.scorePairs(recs, "id", Seq("blk"),
        Seq(rName, rBal), upper = 4.0, lower = 0.0)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getBoolean(2), r.getBoolean(3), r.getDouble(4), r.getString(5))))
      .toMap
    val full = rName.agreeWeight + rBal.agreeWeight
    val none = rName.disagreeWeight + rBal.disagreeWeight
    assert(out((1L, 2L))._1 && out((1L, 2L))._2)
    assert(math.abs(out((1L, 2L))._3 - full) < 1e-9)
    assert(out((1L, 2L))._4 == "match")
    assert(!out((1L, 3L))._1 && !out((1L, 3L))._2)
    assert(math.abs(out((1L, 3L))._3 - none) < 1e-9)
    assert(out((1L, 3L))._4 == "non_match")
    // blocking: a record in another block never pairs
    val blocked = Linkage.scorePairs(
      recs.union(Seq((4L, "alpha", 10.0, "C")).toDF("id", "name", "bal", "blk")),
      "id", Seq("blk"), Seq(rName, rBal), 4.0, 0.0)
    assert(blocked.filter(col("id_b") === 4L).isEmpty)
  }

  test("label propagation: two disjoint triangles converge to their min labels") {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sync rounds on a triangle: r1 sends each node its neighbors' min,
    // r2 floods label 1 (resp. 10) everywhere — hand-derived
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), s"got $out")
  }

  test("benford audit: digits from canonical strings, chi2 sums to known value") {
    import spark.implicits._
    // 30 values leading with 1, 10 with 2: n=40 (note 0.25 — the
    // DECIMAL(18,2) canonicalization rounds sub-cent magnitudes, so
    // e.g. 0.029 would become 0.03 and read as digit 3)
    val vals = (Seq.fill(30)(123.45) ++ Seq.fill(10)(0.25)).toDF("v")
    val out = Robust.benfordAudit(vals, col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet == Set("1", "2"))
    assert(out("1")._1 == 30L && out("2")._1 == 10L)
    val e1 = 40 * math.log10(2.0)
    assert(math.abs(out("1")._2 - e1) < 1e-9)
    assert(math.abs(out("1")._3 - (30 - e1) * (30 - e1) / e1) < 1e-9)
    // power-of-ten value must classify as digit 1 (the float-log trap)
    val p10 = Robust.benfordAudit(Seq(100.0).toDF("v"), col("v"))
      .collect()(0).getString(0)
    assert(p10 == "1")
  }

  test("bfs distances: path graph hops, horizon sentinel, multi-seed min") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("seed")
    val out = Graph.bfsDistances(edges, "src", "dst", seeds, "seed", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 5 is 4 hops away — beyond the 3-round horizon → -1 sentinel
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> -1L),
      s"got $out")
    // two seeds: every node takes the min over sources
    val out2 = Graph.bfsDistances(edges, "src", "dst",
        Seq(1L, 5L).toDF("seed"), "seed", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L),
      s"got $out2")
  }

  test("linear attribution splits conversion value equally across in-window touches") {
    val base = java.sql.Timestamp.valueOf("2024-01-10 12:00:00")
    def at(hours: Int) = new java.sql.Timestamp(base.getTime + hours * 3600L * 1000)
    val events = Seq(
      (1L, 100L, at(-10), "click", 0.0),
      (1L, 101L, at(-5), "click", 0.0),
      (1L, 102L, at(0), "purchase", 90.0),
      (1L, 103L, at(-100), "click", 0.0), // outside 3-day lookback
      (2L, 200L, at(0), "purchase", 50.0) // no touches → no rows
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Behavior.linearAttribution(events, "user_id", "ts",
        "event_id", "click", "purchase", "3 days")
      .collect().map(r => r.getLong(2) -> (r.getLong(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set(100L, 101L), s"wrong touches credited: $out")
    assert(out(100L) == ((2L, 45.0)) && out(101L) == ((2L, 45.0)))
  }

  test("zipf fit recovers the -1 slope of an exactly Zipfian corpus") {
    // term_i appears floor(1000/i) times: ln-ln slope ≈ -1
    val words = (1 to 30).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = Text.zipfFit(docs, "text", 30).collect()(0)
    assert(row.getLong(0) == 30L)
    val slope = row.getDouble(1)
    assert(slope > -1.1 && slope < -0.9, s"zipf slope $slope not near -1")
  }
}
