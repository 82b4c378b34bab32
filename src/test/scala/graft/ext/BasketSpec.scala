package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BasketSpec extends SparkSuite {

  import spark.implicits._

  test("associationRules computes support, confidence, and lift exactly") {
    // 4 baskets: {a,b} x2, {a,c}, {b}  ->  pair (a,b) in 2 of 4
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"),
      (3, "c"), (4, "b")).toDF("txn", "item")
    val r = Basket.associationRules(df, col("txn"), col("item"),
      minSupport = 2L).collect()
    assert(r.length == 1, "only (a,b) reaches support 2")
    val x = r(0)
    assert(x.getAs[String]("item_a") == "a" && x.getAs[String]("item_b") == "b")
    assert(x.getAs[Long]("n_ab") == 2 && x.getAs[Long]("n_a") == 3 &&
      x.getAs[Long]("n_b") == 3)
    assert(x.getAs[Double]("support") == 0.5)
    assert(x.getAs[Double]("conf_a_to_b") == 2.0 / 3.0)
    assert(x.getAs[Double]("conf_b_to_a") == 2.0 / 3.0)
    // lift = n_ab*N / (n_a*n_b) = 8/9 < 1: a and b slightly repel
    assert(x.getAs[Double]("lift") == 8.0 / 9.0)
  }

  test("associationRules deduplicates repeated items within a basket") {
    // item repeated in one txn must count once (DISTINCT basket sets)
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"))
      .toDF("txn", "item")
    val r = Basket.associationRules(df, col("txn"), col("item"), 2L)
      .collect()(0)
    assert(r.getAs[Long]("n_ab") == 2 && r.getAs[Long]("n_a") == 2)
    assert(r.getAs[Double]("lift") == 1.0, "perfect co-occurrence, lift 1")
  }

  test("psi is zero for identical samples and grows with shift") {
    val a = Seq.tabulate(100)(i => i.toDouble).toDF("v")
    val same = Drift.psi(a, a, col("v"), binWidth = 10.0, nBins = 10)
      .collect()(0)
    assert(same.getAs[Double]("psi") == 0.0)
    assert(same.getAs[Long]("n_bins") == 10)
    val shifted = Seq.tabulate(100)(i => 50.0 + i / 2.0).toDF("v")
    val drift = Drift.psi(a, shifted, col("v"), 10.0, 10)
      .collect()(0).getAs[Double]("psi")
    assert(drift > 0.25, s"concentrated shift must alarm, got $drift")
  }

  test("itemNeighbors ranks by exact Jaccard with id tie-break") {
    import spark.implicits._
    // item 1 co-occurs with 2 in {t1,t2} and with 3 in {t1}:
    // J(1,2) = 2/(3+2-2) = 2/3;  J(1,3) = 1/(3+2-1) = 1/4
    val df = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (4L, 3L))
      .toDF("t", "i")
    val r = graft.ext.Basket.itemNeighbors(df, col("t"), col("i"),
        minCo = 1L, k = 5)
      .filter(col("item") === 1L)
      .orderBy("rank")
      .select("rank", "nbr", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(r === Seq((1L, 2L, 2.0 / 3.0), (2L, 3L, 1.0 / 4.0)))
    // symmetric view: 2's best neighbor is 1 with the same similarity
    val r2 = graft.ext.Basket.itemNeighbors(df, col("t"), col("i"), 1L, 5)
      .filter(col("item") === 2L && col("rank") === 1L)
      .select("nbr", "jaccard").as[(Long, Double)].head()
    assert(r2 === ((1L, 2.0 / 3.0)))
  }

  test("frequentTriples equals the prune-free enumeration") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = for {
      t <- 1 to 120
      i <- rnd.shuffle((0 until 12).toList).take(2 + rnd.nextInt(4))
    } yield (t.toLong, i.toLong)
    val df = rows.toDF("t", "i")
    val minSup = 4L
    val got = graft.ext.Basket.frequentTriples(df, col("t"), col("i"),
        minSup)
      .select("item_a", "item_b", "item_c", "n_abc")
      .as[(Long, Long, Long, Long)].collect().toSet
    // naive: enumerate all basket triples, keep support >= minSup
    val byTxn = rows.distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val counts = scala.collection.mutable.Map[(Long, Long, Long), Long]()
    for (items <- byTxn; a <- items; b <- items if b > a;
         c <- items if c > b)
      counts((a, b, c)) = counts.getOrElse((a, b, c), 0L) + 1
    val want = counts.filter(_._2 >= minSup)
      .map { case ((a, b, c), n) => (a, b, c, n) }.toSet
    assert(want.nonEmpty, "fixture produced no frequent triples")
    assert(got === want)
  }
}
