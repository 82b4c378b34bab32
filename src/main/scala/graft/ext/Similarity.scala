package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.8): brute-force cosine top-k as the exactness baseline
  * and an IVF (inverted-file) variant as the scale path.
  */
object Similarity {

  /** Promote float vector to double so products are engine-identical. */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Native codegen'd dot product (graft.plans.VecDot, registered by
    * GraftExtensions): elements widened to double before multiply,
    * accumulated in array order — bit-identical to [[dotHof]], without
    * the per-element interpreted lambda or the intermediate array.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Built-in HOF formulation, kept as the reference semantics for
    * equivalence tests (and for sessions without GraftExtensions).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleVec(a), toDoubleVec(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k: queries broadcast against the full
    * collection, grouped top-k via row_number (one shuffle on query id,
    * never a global sort). Rank ties broken by neighbor id.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val base = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nn", norm(col("nv")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = base.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }

  /** IVF top-k: the collection is partitioned into `nlist` buckets by
    * nearest centroid (deterministic centroid choice: the first `nlist`
    * vectors by id — a production system would run k-means; the
    * assignment/probe machinery is identical). Queries probe the
    * `nprobe` nearest centroids and rank only those buckets: the
    * crossJoin shrinks from O(n·q) to O(n·q·nprobe/nlist).
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val base = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nn", norm(col("nv")))
    val centroids = base.orderBy(col("nid")).limit(nlist)
      .select(col("nid").as("cid"), col("nv").as("cv"), col("nn").as("cn"))

    // assign each vector to its nearest centroid (broadcast centroids)
    val wAssign = Window.partitionBy(col("nid")).orderBy(col("csim").desc, col("cid"))
    val assigned = base.crossJoin(broadcast(centroids))
      .withColumn("csim", dot(col("nv"), col("cv")) / (col("nn") * col("cn")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("nid"), col("nv"), col("nn"), col("cid").as("bucket"))

    // queries probe their nprobe nearest centroids
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("psim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("psim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid").as("bucket"))

    val scored = probes.join(assigned, "bucket")
      .filter(col("nid") =!= col("qid"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }
}
