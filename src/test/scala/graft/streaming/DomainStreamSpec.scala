package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Composition proof for the incremental domain rollup: any batch
  * split folds to the one-shot [[graft.ext.Web.domainQuality]] rollup
  * exactly, and a crash-replayed batch reproduces it (generation-
  * addressed counts).
  */
class DomainStreamSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = (0L until 90L).map { i =>
    val dom = s"d${i % 7}"
    (i, s"https://${if (i % 2 == 0) "www." else ""}$dom-site.com/p/$i",
      (i * 13 % 10) > (i % 7)) // domain-skewed pass rates
  }.toDF("doc_id", "url", "ok")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getBoolean(4))

  test("batch splits fold to the one-shot rollup; replay is exact") {
    val docs = fixture
    val state = java.nio.file.Files.createTempDirectory("domst").toString
    val rollups = (0 to 2).map { b =>
      DomainStream.applyBatch(docs.filter(pmod(col("doc_id"), lit(3)) === b),
        state, "url", "ok", minPassFrac = 0.5, batchId = b.toLong)
    }
    val streamed = rollups.last.orderBy("url_domain").collect().map(key).toSeq
    val oneShot = graft.ext.Web.domainQuality(docs, "url", "ok", 0.5)
      .orderBy("url_domain").collect().map(key).toSeq
    assert(streamed == oneShot,
      "cumulative rollup after all batches must equal the batch operator")

    // crash replay: re-applying the LAST batch (same generation id)
    // re-reads the pre-batch totals and reproduces the rollup
    val replay = DomainStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === 2),
        state, "url", "ok", minPassFrac = 0.5, batchId = 2L)
      .orderBy("url_domain").collect().map(key).toSeq
    assert(replay == streamed, "replayed batch must reproduce the rollup")
  }

  test("a different split yields the identical final rollup (order-free)") {
    val docs = fixture
    def run(splits: Seq[org.apache.spark.sql.DataFrame]) = {
      val state = java.nio.file.Files.createTempDirectory("domst2").toString
      splits.zipWithIndex.map { case (b, i) =>
        DomainStream.applyBatch(b, state, "url", "ok", 0.5, i.toLong)
      }.last.orderBy("url_domain").collect().map(key).toSeq
    }
    val byThree = run((0 to 2).map(b =>
      docs.filter(pmod(col("doc_id"), lit(3)) === b)))
    val byHalf = run(Seq(docs.filter(col("doc_id") < 45),
      docs.filter(col("doc_id") >= 45)))
    assert(byThree == byHalf, "final rollup must not depend on the split")
  }
}
