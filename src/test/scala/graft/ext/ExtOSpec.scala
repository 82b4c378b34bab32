package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Round-17 library faces: the KN bucket cut, the v3 quality-signals
  * wide row (including the compression column the REGISTERED query
  * drops — adjudicated here instead), and bucket-agreement sanity.
  */
class ExtOSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("perplexityBucketsKn: rank cut and bucket arithmetic hold") {
    val docs = graft.queries.H.t(spark, dir, "documents")
    val kn = Text.perplexityBucketsKn(docs, "text", "doc_id", nBuckets = 3)
      .collect()
    val n = kn.length
    assert(n > 0)
    // buckets are the exact integer floor cut of the rank
    kn.foreach { r =>
      val rn = r.getAs[Long]("rn")
      assert(r.getAs[Int]("bucket") == (((rn - 1) * 3) / n).toInt)
    }
    // the rank order is (mean_logprob DESC, doc_id ASC) — total
    val sorted = kn.sortBy(r =>
      (-r.getAs[Double]("mean_logprob"), r.getAs[Long]("doc_id")))
    assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to n).toSeq)
  }

  test("KN and JM buckets agree on most docs but not all (the LMs differ)") {
    val docs = graft.queries.H.t(spark, dir, "documents")
    val jm = Text.perplexityBuckets(docs, "text", "doc_id", nBuckets = 3)
      .select(col("doc_id"), col("bucket").as("b_jm"))
    val kn = Text.perplexityBucketsKn(docs, "text", "doc_id", nBuckets = 3)
      .select(col("doc_id"), col("bucket").as("b_kn"))
    val j = jm.join(kn, "doc_id").collect()
    val agree = j.count(r => r.getInt(1) == r.getInt(2))
    assert(agree > j.length / 2,
      "two fluency LMs over one corpus should mostly agree on buckets")
    assert(agree < j.length,
      "identical buckets everywhere would mean the KN face is vacuous")
  }

  test("qualitySignalsV3: the added signals fire and match their operators") {
    // a looping doc, a garbage doc, a clean doc — plus enough filler
    // for the LM/rank chain to have a corpus to score
    val docs = ((0L until 20L).map(i =>
        (i, s"alpha bravo c$i delta e${i % 7} foxtrot g$i hotel india")) ++
      Seq((20L, "spin spin spin spin spin spin"),
        (21L, "clean text with garbage� inside here"),
        (22L, "perfectly ordinary clean document text")))
      .toDF("doc_id", "text")
    val evalDocs = docs.filter(col("doc_id") < 2)
    val v3 = Text.qualitySignalsV3(docs, evalDocs, "text", "doc_id")
    val byId = v3.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // loop tags match the standalone operator
    val loop = byId(20L)
    assert(loop.getAs[Int]("min_period") == 1)
    assert(loop.getAs[Int]("tail_period") == 1)
    // encoding counts match the standalone operator
    val bad = byId(21L)
    assert(bad.getAs[Long]("n_replacement") == 1L)
    assert(bad.getAs[Long]("n_control") == 1L)
    assert(!bad.getAs[Boolean]("encoding_clean"))
    assert(byId(22L).getAs[Boolean]("encoding_clean"))
    // the compression column the registered face drops is REAL here
    // and equals the standalone operator doc for doc
    val comp = Text.compressionRatio(docs, "text", "doc_id")
      .select(col("doc_id"), col("compression_ratio")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    v3.select(col("doc_id"), col("compression_ratio")).collect().foreach {
      r => assert(r.getDouble(1) == comp(r.getLong(0)))
    }
    // a heavily looping doc compresses better than a normal one
    assert(byId(20L).getAs[Double]("compression_ratio") <
      byId(22L).getAs[Double]("compression_ratio"))
    // one row per input doc, no fan-out from the joins
    assert(v3.count() == docs.count())

    // the optional leak-depth face: a doc splicing >= 4 eval tokens
    // reports the exact shared length; everyone else (and the eval
    // rows) stay NULL
    val leaky = docs.unionByName(
      Seq((23L, "zz alpha bravo c0 delta e0 yy")).toDF("doc_id", "text"))
    val withDepth = Text.qualitySignalsV3(leaky,
        leaky.filter(col("doc_id") < 2), "text", "doc_id",
        evalPred = Some(col("doc_id") < 2))
      .select(col("doc_id"), col("leak_depth")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(withDepth(23L) == Some(5L),
      "the spliced doc must report its exact 5-token leak")
    assert(withDepth(22L).isEmpty && withDepth(0L).isEmpty)
  }
}
