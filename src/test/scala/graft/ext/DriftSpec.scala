package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSuite {

  import spark.implicits._

  test("identical slices have ~zero drift and zero churn") {
    val docs = Seq("a b c d", "a b e f").toDF("text")
    val r = Drift.tokenDrift(docs, docs, "text").collect().head
    assert(r.getAs[Long]("n_new_types") == 0L)
    assert(r.getAs[Long]("n_lost_types") == 0L)
    assert(math.abs(r.getAs[Double]("tvd")) < 1e-9)
    assert(math.abs(r.getAs[Double]("kl_old_new")) < 1e-9)
  }

  test("disjoint slices show churn and large drift; partition-stable") {
    val oldD = Seq("a a a b").toDF("text")
    val newD = Seq("x y z z").toDF("text")
    val r = Drift.tokenDrift(oldD, newD, "text").collect().head
    assert(r.getAs[Long]("n_new_types") == 3L)  // x, y, z
    assert(r.getAs[Long]("n_lost_types") == 2L) // a, b
    assert(r.getAs[Double]("tvd") > 0.3)
    assert(r.getAs[Double]("kl_old_new") > 0.0)
    val r2 = Drift.tokenDrift(oldD.repartition(7), newD.repartition(5), "text")
      .collect().head
    assert(r.getAs[Double]("tvd") == r2.getAs[Double]("tvd"))
    assert(r.getAs[Double]("kl_old_new") == r2.getAs[Double]("kl_old_new"))
  }

  test("embeddingDrift: identical snapshots cosine 1, opposite -1") {
    import org.apache.spark.sql.functions.{col, transform}
    val a = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.8f, 0.6f), 0),
      (3L, Seq(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val same = Drift.embeddingDrift(a, a, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("drift_cosine"))
      .toMap
    assert(math.abs(same(0) - 1.0) < 1e-9 && math.abs(same(1) - 1.0) < 1e-9)
    val neg = a.select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"), col("label"))
    val opp = Drift.embeddingDrift(a, neg, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("drift_cosine"))
      .toMap
    assert(math.abs(opp(0) + 1.0) < 1e-9, s"got $opp")
    assert(math.abs(opp(1) + 1.0) < 1e-9)
  }
}
