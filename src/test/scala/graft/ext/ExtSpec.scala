package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Cross-checks for the non-oracle extension operators at sf0.001. */
class ExtSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("simhash pairs mostly agree with true near-dup pairs") {
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "text", "doc_id", hammingMax = 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty, "simhash found no pairs")
    // simhash scores bag-of-words similarity, not ordered 3-gram
    // Jaccard — a minority of extra pairs is expected, not a defect
    val precision = sim.intersect(jac).size.toDouble / sim.size
    assert(precision >= 0.7, s"simhash precision $precision vs jaccard truth")
  }

  test("minhash LSH equals exhaustive jaccard pairs on this data") {
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == jac)
  }

  test("IVF recall vs brute force is sane") {
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size == bf.size)
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall $recall too low") // nprobe=4/16 buckets
  }

  test("decode stub is deterministic and total") {
    val out = Multimodal.decode(
      Multimodal.withBinary(docs, "text", "doc_id"), "doc_id")
    assert(out.count() == docs.count())
    val again = Multimodal.decode(
      Multimodal.withBinary(docs, "text", "doc_id"), "doc_id")
    assert(out.exceptAll(again).isEmpty)
  }

  test("langId returns only known codes") {
    val langs = docs.select(Text.langId(col("text"))).distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
  }
}
