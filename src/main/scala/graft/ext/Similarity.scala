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
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
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

  /** Hard-negative mining for contrastive training: per anchor, the
    * top-k highest-cosine vectors with a DIFFERENT label — the
    * negatives that actually move an embedding model, vs the easy
    * random ones ([[graft.ext.Sampling]]'s LCG draw covers those).
    * Brute-force formulation (the exactness baseline, like
    * [[bruteForceTopK]]); [[hardNegativesIvf]] is the drop-in corpus-
    * scale path — same output schema, IVF-bucketed candidates.
    *
    * Like [[marginPairs]] and [[graft.ext.Dedup.embeddingCosinePairs]],
    * the brute face is OPT-IN (`acceptBroadcastBaseline = true`): every
    * vector is an anchor, so the crossJoin broadcasts the ENTIRE corpus
    * to every task — exactly the wrong shape at the training-corpus
    * sizes the operator is named for.
    */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int,
      acceptBroadcastBaseline: Boolean = false): DataFrame = {
    require(acceptBroadcastBaseline,
      "hardNegatives is the exact brute-force BASELINE: it crossJoin-" +
        "broadcasts the ENTIRE embedding table to every task (every " +
        "vector is an anchor), a data-sized broadcast that fails at " +
        "corpus scale. For production mining use hardNegativesIvf " +
        "(bucketed candidates, identical output contract); pass " +
        "acceptBroadcastBaseline = true only for oracle-anchor or " +
        "recall-measurement runs where you know the corpus is small.")
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    val base = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"),
        col(labelCol).as("nl"))
      .withColumn("nn", norm(col("nv")))
    val q = emb.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        col(labelCol).as("ql"))
      .withColumn("qn", norm(col("qv")))
    val scored = base.crossJoin(broadcast(q))
      .filter(col("nl") =!= col("ql"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("ql").as("anchor_label"),
        col("nid"), col("nl").as("negative_label"),
        col("rank").cast("bigint").as("rank"))
  }

  /** IVF-bucketed hard-negative mining — the 100 TB scale path for
    * [[hardNegatives]]. Same IVF machinery as [[ivfTopK]] (nearest-
    * centroid bucketing, nprobe probing), with the different-label
    * filter pushed into the bucket probe join, so per anchor only
    * ~nprobe/nlist of the corpus is scored instead of all of it — and
    * the only broadcasts in the plan are the nlist centroid rows, never
    * the embedding table. Negatives outside the probed buckets are
    * invisible (that recall trade IS the operator's contract; the twin
    * query adjudicates it against the brute-force oracle).
    *
    * Scale shape: two broadcast joins against nlist rows, one shuffle
    * join on `bucket` (bucket-local candidate generation — grow nlist
    * with ~√n to keep per-bucket work bounded), one per-anchor top-k
    * window. Nothing data-sized is ever broadcast or crossed.
    */
  def hardNegativesIvf(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      centroids: Option[DataFrame] = None): DataFrame = {
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    val base = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"),
        col(labelCol).as("nl"))
      .withColumn("nn", norm(col("nv")))
    val centroidDf = centroids.getOrElse(
      base.orderBy(col("nid")).limit(nlist)
        .select(col("nid").as("cid"), col("nv").as("cv")))
      .select(col("cid"), col("cv"), norm(col("cv")).as("cn"))
    // nearest-centroid assignment, label carried through
    val wAssign = Window.partitionBy(col("nid"))
      .orderBy(col("csim").desc, col("cid"))
    val assigned = base.crossJoin(broadcast(centroidDf))
      .withColumn("csim", dot(col("nv"), col("cv")) / (col("nn") * col("cn")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("nid"), col("nv"), col("nn"), col("nl"),
        col("cid").as("bucket"))
    // every row is an anchor probing its nprobe nearest buckets
    val q = emb.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        col(labelCol).as("ql"))
      .withColumn("qn", norm(col("qv")))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("psim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroidDf))
      .withColumn("psim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("ql"),
        col("cid").as("bucket"))
    // score ONLY probed buckets; the label filter rides the same join
    val scored = probes.join(assigned, "bucket")
      .filter(col("nid") =!= col("qid") && col("nl") =!= col("ql"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("ql").as("anchor_label"),
        col("nid"), col("nl").as("negative_label"),
        col("rank").cast("bigint").as("rank"))
  }

  /** Spherical k-means centroids (MLlib Lloyd's over UNIT vectors,
    * fixed seed — public Spark API): the production centroid step that
    * [[ivfTopK]]'s deterministic first-n-by-id default stands in for.
    * Inputs are L2-normalized first because the IVF assignment/probe
    * metric is cosine — plain Euclidean k-means on raw vectors places
    * centroids by magnitude and collapses cosine recall (measured 0.52
    * vs 0.94 on the test corpus; spherical fixes it). Returns
    * (cid, cv) double vectors for the `centroids` slot.
    */
  def kmeansCentroids(emb: DataFrame, vecCol: String, nlist: Int,
      seed: Long = 42L, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val data = emb
      .select(toDoubleVec(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0)
      .select(array_to_vector(transform(col("v"), x => x / col("nrm"))).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter).fit(data)
    val spark = emb.sparkSession
    import spark.implicits._
    model.clusterCenters.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray.toSeq) }
      .toDF("cid", "cv")
  }

  /** Deterministic spherical Lloyd's k-means — the SQL-replayable twin
    * of [[kmeansCentroids]]. MLlib's k-means|| init samples per input
    * partition, so its centroids depend on file-split layout and can't
    * be replayed by an external oracle; this variant pins every source
    * of nondeterminism instead:
    *
    *  - init = the first `nlist` unit vectors by id (no RNG);
    *  - assignment = cosine argmax (plain dot on unit vectors), ties
    *    broken by smallest centroid id;
    *  - update = the normalized SUM of assigned unit vectors — cosine
    *    only needs the direction, so the mean's division is skipped
    *    entirely, and the element sums run in FIXED-POINT (floor(x·1e12)
    *    as BIGINT): integer addition is associative, so the result is
    *    bit-identical under any partitioning, row order, or engine
    *    (same technique as [[graft.ext.Graph.pageRank]]);
    *  - a cluster that loses all members keeps its previous centroid.
    *
    * Scale shape per round: one broadcast crossJoin (nlist centroid rows)
    * + one narrow per-id argmax window + one (cid, pos) groupBy whose
    * key space is nlist·dim — never a data-sized shuffle. `rounds` is
    * fixed (not convergence-tested) so the oracle can unroll it.
    */
  def lloydCentroids(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, rounds: Int): DataFrame = {
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    val u = emb
      .select(col(idCol).as("nid"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v"))).filter(col("nrm") > 0)
      .select(col("nid"), transform(col("v"), x => x / col("nrm")).as("uv"))
      .transform(Iter.pin) // scanned every round; cut lineage once
    var cent = u.orderBy(col("nid")).limit(nlist)
      .select(col("nid").as("cid"), col("uv").as("cv"))
      .transform(Iter.pin)
    for (_ <- 1 to rounds) {
      val wA = Window.partitionBy(col("nid"))
        .orderBy(col("sim").desc, col("cid"))
      val assigned = u.crossJoin(broadcast(cent))
        .withColumn("sim", dot(col("uv"), col("cv")))
        .withColumn("rk", row_number().over(wA))
        .filter(col("rk") === 1)
        .select(col("cid"), col("uv"))
      val sums = assigned
        .select(col("cid"), posexplode(col("uv")).as(Seq("pos", "x")))
        .withColumn("fx", floor(col("x") * lit(1e12)).cast("long"))
        .groupBy(col("cid"), col("pos")).agg(sum(col("fx")).as("sfx"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("sfx")))),
          s => s.getField("sfx").cast("double")).as("sv"))
        .withColumn("sn", sqrt(dot(col("sv"), col("sv"))))
        .filter(col("sn") > 0)
        .select(col("cid"),
          transform(col("sv"), x => x / col("sn")).as("ncv"))
      cent = cent.join(sums, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("ncv"), col("cv")).as("cv"))
        .transform(Iter.pin) // cut per-round lineage (PageRank lesson)
    }
    cent
  }

  /** Nearest-centroid assignment by cosine (shared by [[ivfTopK]] and
    * [[graft.ext.Dedup.semanticDedup]]): centroids are broadcast — the
    * collection never shuffles for the expansion, only for the per-id
    * argmax window (a skew-free exchange on the high-cardinality id).
    * Input `base` must carry (nid, nv, nn); `centroidDf` carries
    * (cid, cv, cn). Returns (nid, nv, nn, bucket).
    */
  def assignToCentroids(base: DataFrame, centroidDf: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("nid")).orderBy(col("csim").desc, col("cid"))
    base.crossJoin(broadcast(centroidDf))
      .withColumn("csim", dot(col("nv"), col("cv")) / (col("nn") * col("cn")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("nid"), col("nv"), col("nn"), col("cid").as("bucket"))
  }

  /** IVF top-k: the collection is partitioned into `nlist` buckets by
    * nearest centroid. Default centroid choice is the first `nlist`
    * vectors by id — deterministic and SQL-replayable by the oracle;
    * pass `centroids` = [[kmeansCentroids]] output for the production
    * quality path (the assignment/probe machinery is identical).
    * Queries probe the `nprobe` nearest centroids and rank only those
    * buckets: the crossJoin shrinks from O(n·q) to O(n·q·nprobe/nlist).
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      centroids: Option[DataFrame] = None): DataFrame = {
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    val base = emb.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nn", norm(col("nv")))
    val centroidDf = centroids.getOrElse(
      base.orderBy(col("nid")).limit(nlist)
        .select(col("nid").as("cid"), col("nv").as("cv")))
      .select(col("cid"), col("cv"), norm(col("cv")).as("cn"))
    val assigned = assignToCentroids(base, centroidDf)

    // queries probe their nprobe nearest centroids
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("psim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroidDf))
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

  /** L2-normalize `vecCol` (as doubles) into column `uv`. */
  private def unitVecs(df: DataFrame, idCol: String, vecCol: String,
      idName: String): DataFrame = {
    val v = toDoubleVec(col(vecCol))
    df.select(col(idCol).as(idName), v.as("_v"))
      .select(col(idName),
        transform(col("_v"), x => x / sqrt(call_function("vec_dot",
          col("_v"), col("_v")))).as("uv"))
  }

  /** Explode a vector column into its m subvectors: keep*, j, xv. */
  private def subvecSplit(df: DataFrame, vecName: String, m: Int,
      sub: Int, keep: Column*): DataFrame =
    df.select(keep :+ explode(array((0 until m).map(j =>
        struct(lit(j).as("j"),
          slice(col(vecName), j * sub + 1, sub).as("xv"))): _*)).as("s"): _*)
      .select(keep :+ col("s.j").as("j") :+ col("s.xv").as("xv"): _*)

  /** Squared L2 via dot products — the exact double expression both
    * engines evaluate left-to-right: (a·a − 2(a·b)) + b·b.
    */
  private def l2d(a: Column, b: Column): Column =
    (dot(a, a) - lit(2.0) * dot(a, b)) + dot(b, b)

  /** Product-quantization ANN (Jégou et al., TPAMI 2011 — public
    * literature): vectors are L2-normalized, split into `m` subvectors,
    * and each subvector is encoded as the id of its nearest of `ksub`
    * sub-centroids — the corpus is then `m` small ints per vector
    * (16 codes vs 64 floats here, a 16× memory cut; at 100 TB the code
    * table is what stays resident while raw vectors stay in cold
    * storage). Queries never decode: asymmetric distance (ADC) sums,
    * per subspace, the precomputed query-to-sub-centroid distance —
    * a broadcast table of q·m·ksub doubles — so scoring the corpus is
    * one broadcast-hash join on (subspace, code) plus a per-(qid,nid)
    * fixed-order reduction (the m partial distances are reduced
    * left-to-right, never a float sum in arbitrary order, so results
    * adjudicate bit-identically cross-engine). ADC keeps the top
    * k·`rerank` shortlist, which is then re-ranked with the exact
    * cosine — the standard PQ serving shape: quantization error decides
    * only which candidates are seen, never their final order.
    *
    * Sub-centroids default to the subvectors of the first `ksub`
    * vectors by id — deterministic and SQL-replayable; production uses
    * per-subspace k-means exactly like [[kmeansCentroids]]. Unit
    * vectors make ADC's L2 ranking equivalent to cosine ranking
    * (||x−q||² = 2−2cos), so recall is measured against the cosine
    * brute force. Compose with [[ivfTopK]] buckets for IVF-PQ.
    */
  def pqTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, m: Int = 4,
      ksub: Int = 16, rerank: Int = 4): DataFrame = {
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    def unitize(df: DataFrame, idName: String): DataFrame =
      unitVecs(df, idCol, vecCol, idName)
    def subvecs(df: DataFrame, keep: Column*): DataFrame =
      subvecSplit(df, "uv", m, sub, keep: _*)
    val l2 = l2d _

    val base = unitize(emb, "nid")
    // codebook: subvectors of the first ksub vectors by id
    val wSeed = Window.partitionBy(pmod(col("nid"), lit(1))).orderBy(col("nid"))
    val seeds = base.orderBy(col("nid")).limit(ksub)
      .withColumn("code", (row_number().over(wSeed) - 1).cast("int"))
    val codebook = subvecs(seeds, col("code"))
      .select(col("j"), col("code"), col("xv").as("cv"))

    // encode: per (vector, subspace) argmin over the broadcast codebook
    val wEnc = Window.partitionBy(col("nid"), col("j"))
      .orderBy(col("d2"), col("code"))
    val codes = subvecs(base, col("nid"))
      .join(broadcast(codebook), "j")
      .withColumn("d2", l2(col("xv"), col("cv")))
      .withColumn("rk", row_number().over(wEnc))
      .filter(col("rk") === 1)
      .select(col("nid"), col("j"), col("code"))

    // ADC: per-query distance table, broadcast against the code table
    val qtab = subvecs(unitize(queries, "qid"), col("qid"))
      .join(broadcast(codebook), "j")
      .select(col("qid"), col("j"), col("code"),
        l2(col("xv"), col("cv")).as("d2"))
    val dcols = (0 until m).map(j =>
      max(when(col("j") === j, col("d2"))).as(s"_d$j"))
    val adc = (1 until m).foldLeft(col("_d0"))((acc, j) => acc + col(s"_d$j"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("adc_d2"), col("nid"))
    val shortlist = codes.join(broadcast(qtab), Seq("j", "code"))
      .filter(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      .agg(dcols.head, dcols.tail: _*)
      .withColumn("adc_d2", adc)
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= k * rerank)
      .select(col("qid"), col("nid"))

    // exact re-rank of the ADC shortlist (unit vectors: dot = cosine).
    // The shortlist is tiny (q·k·rerank rows) — broadcast it against
    // the corpus so the re-rank reads each candidate vector once.
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    broadcast(shortlist)
      .join(base.select(col("nid"), col("uv").as("nu")), "nid")
      .join(broadcast(unitize(queries, "qid").select(col("qid"),
        col("uv").as("qu"))), "qid")
      .withColumn("cosine", dot(col("qu"), col("nu")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cosine"))
  }

  /** IVF-PQ — the composed web-scale ANN shape (FAISS's workhorse
    * index, Jégou TPAMI'11 §IV): a coarse quantizer routes vectors
    * into `nlist` buckets ([[assignToCentroids]]), and a product
    * quantizer encodes each vector's RESIDUAL (v − coarse centroid) —
    * residuals concentrate near zero, so the same sub-codebook budget
    * quantizes them far more finely than raw vectors, and since
    * ||(q−c) − (x−c)|| = ||q − x||, ADC on residuals in a probed
    * bucket estimates the true distance. Queries probe their `nprobe`
    * nearest buckets, score ONLY those buckets' code tables (never the
    * corpus), and the ADC shortlist is re-ranked with the exact
    * cosine. At 100 TB: the resident state is m bytes per vector plus
    * nlist centroids; per query, work is nprobe/nlist of the corpus'
    * codes via broadcast distance tables — no shuffle of raw vectors
    * anywhere past the one-off encode.
    *
    * Deterministic seeds throughout (first-n coarse centroids, first-n
    * residual sub-codebook) keep the whole pipeline SQL-replayable;
    * production swaps both for k-means exactly as in [[kmeansCentroids]].
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, rerank: Int = 4): DataFrame = {
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m

    val base = unitVecs(emb, idCol, vecCol, "nid")
    val qs = unitVecs(queries, idCol, vecCol, "qid")
    // coarse quantizer: first nlist unit vectors by id
    val coarse = base.orderBy(col("nid")).limit(nlist)
      .select(col("nid").as("cid"), col("uv").as("cv"))
    val coarseN = coarse.select(col("cid"), col("cv"),
      norm(col("cv")).as("cn"))
    val assigned = assignToCentroids(
      base.select(col("nid"), col("uv").as("nv"))
        .withColumn("nn", norm(col("nv"))), coarseN)

    // residuals vs the owning coarse centroid
    val resid = assigned
      .join(broadcast(coarse.select(col("cid").as("bucket"),
        col("cv").as("bcv"))), "bucket")
      .select(col("nid"), col("bucket"),
        zip_with(col("nv"), col("bcv"), (x, y) => x - y).as("rv"))

    // residual sub-codebook: the ksub vectors AFTER the coarse seeds —
    // the first nlist vectors ARE the coarse centroids, so their
    // residuals are exact zeros and would make a degenerate codebook
    val wSeed = Window.partitionBy(pmod(col("nid"), lit(1))).orderBy(col("nid"))
    val seeds = resid.orderBy(col("nid")).limit(nlist + ksub)
      .withColumn("rk0", row_number().over(wSeed))
      .filter(col("rk0") > nlist)
      .withColumn("code", (col("rk0") - nlist - 1).cast("int"))
    val codebook = subvecSplit(seeds, "rv", m, sub, col("code"))
      .select(col("j"), col("code"), col("xv").as("cv2"))

    // encode: per (vector, subspace) argmin over the broadcast codebook
    val wEnc = Window.partitionBy(col("nid"), col("j"))
      .orderBy(col("d2"), col("code"))
    val codes = subvecSplit(resid, "rv", m, sub, col("nid"), col("bucket"))
      .join(broadcast(codebook), "j")
      .withColumn("d2", l2d(col("xv"), col("cv2")))
      .withColumn("rk", row_number().over(wEnc))
      .filter(col("rk") === 1)
      .select(col("nid"), col("bucket"), col("j"), col("code"))

    // queries probe their nprobe nearest coarse buckets
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("psim").desc, col("cid"))
    val probes = qs.withColumn("qn", norm(col("uv")))
      .crossJoin(broadcast(coarseN))
      .withColumn("psim", dot(col("uv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("uv"), col("cid").as("bucket"))
    // per-probe query residual → per-subspace ADC distance table
    val qres = probes
      .join(broadcast(coarse.select(col("cid").as("bucket"), col("cv").as("bcv"))),
        "bucket")
      .select(col("qid"), col("bucket"),
        zip_with(col("uv"), col("bcv"), (x, y) => x - y).as("qrv"))
    val qtab = subvecSplit(qres, "qrv", m, sub, col("qid"), col("bucket"))
      .join(broadcast(codebook), "j")
      .select(col("qid"), col("bucket"), col("j"), col("code"),
        l2d(col("xv"), col("cv2")).as("d2"))

    // ADC over probed buckets only, fixed-order reduction
    val dcols = (0 until m).map(j =>
      max(when(col("j") === j, col("d2"))).as(s"_d$j"))
    val adc = (1 until m).foldLeft(col("_d0"))((acc, j) => acc + col(s"_d$j"))
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc_d2"), col("nid"))
    val shortlist = codes.join(broadcast(qtab), Seq("bucket", "j", "code"))
      .filter(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      .agg(dcols.head, dcols.tail: _*)
      .withColumn("adc_d2", adc)
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= k * rerank)
      .select(col("qid"), col("nid"))

    // exact re-rank of the shortlist (unit vectors: dot = cosine)
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    broadcast(shortlist)
      .join(base.select(col("nid"), col("uv").as("nu")), "nid")
      .join(broadcast(qs.select(col("qid"), col("uv").as("qu"))), "qid")
      .withColumn("cosine", dot(col("qu"), col("nu")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cosine"))
  }

  /** The ±1 hyperplane entry for bit `i`, dimension `d` of a `dim`-wide
    * embedding: the sign bit of splitmix64(seed + i·dim + d) (Steele,
    * Lea & Flood, OOPSLA'14 — public literature). Pure wrap-around
    * 64-bit integer arithmetic — an external SQL engine replays the
    * plane exactly (xor/shift/multiply mod 2^64).
    *
    * The mix MUST avalanche: the r07 version took one mid bit of a
    * 31-bit LCG over sequential inputs, whose lattice correlation
    * leaked into the signatures — measured at sf0.1 it produced 344k
    * band candidates with the Hamming prefilter passing 99.8% of them
    * (vs 270k candidates / 59% pass for true-Gaussian planes), i.e.
    * 2.15× the verify-join work and the r07 +37% bench regression.
    * splitmix64's full avalanche restores i.i.d.-quality ±1 entries.
    */
  def lshPlaneEntry(seed: Long, i: Int, dim: Int, d: Int): Double = {
    var z = seed + i.toLong * dim + d + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    if (z < 0) 1.0 else -1.0 // top bit as the sign
  }

  /** Random-hyperplane LSH near-dup pairs — the 100 TB scale path for
    * embedding-cosine dedup (Charikar, STOC'02 — public literature):
    * sign(v·r_i) bits from `nBits` fixed hyperplanes, split into
    * `bands`; vectors sharing any band bucket become candidates
    * (equi-join, never O(n²)); candidates are verified with the exact
    * cosine, so false positives are impossible and only band-recall is
    * approximate.
    *
    * Hyperplane entries are Rademacher ±1 (Achlioptas 2003,
    * database-friendly random projections — public literature) derived
    * from splitmix64 on (seed, bit, dim) rather than Gaussian draws
    * from a stateful RNG: sign-projection LSH only needs a symmetric
    * distribution, and the integer derivation makes every signature
    * bit — and therefore the full pair set — replayable by a plain-SQL
    * oracle (the x_ann_ivf_kmeans determinism move applied here; see
    * [[lshPlaneEntry]] for why the hash must avalanche).
    *
    * Sizing at scale: random collisions per band scale with
    * n² / 2^bitsPerBand, so bitsPerBand should grow with log2(n)
    * (defaults suit ~10^4–10^5 vectors; at 10^8 use ≥24-bit bands and
    * more of them). The recall/cost balance is threshold-dependent:
    * dedup-grade thresholds (cosine ≥ 0.85, angle ≤ 32°) give high
    * per-band match probability and cheap wide bands; the 0.45 used by
    * the test corpus is nearly orthogonal (63° vs random's 90°), the
    * hard regime for any hyperplane scheme — kept because the synthetic
    * near-dup pairs sit there, and quantified by
    * x_dedup_embedding_lsh_recall.
    */
  def cosineLshPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 256, bands: Int = 32,
      seed: Long = 7L): DataFrame = {
    val (e, exploded) = lshParts(emb, idCol, vecCol, nBits, bands, seed)
    val hMax = lshHammingBound(nBits, threshold)

    // band entries carry (id, band, bucket, 4-long sig) — the Hamming
    // test runs inline on the candidate join (codegen'd bit_count, no
    // extra shuffle); the 64-float arrays join back per UNIQUE
    // surviving pair after dedup, so vectors cross the wire once per
    // verification, not once per shared band
    val candidates = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .filter(lshHamming((nBits + 63) / 64) <= hMax)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(e.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(e.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Stage-count instrumentation for [[cosineLshPairs]]: ONE row with
    * the distinct band-candidate pair count, the post-Hamming-prefilter
    * survivor count, and the verified (exact-cosine ≥ threshold) pair
    * count. This is the breakdown that separates "the planes got worse
    * at bucketing" (n_band_candidates up) from "the machine was loaded"
    * (counts flat, wall-clock up) when a bench number drifts — exactly
    * the question r07's +37% on x_dedup_embedding_lsh couldn't answer.
    * All three counts replay in SQL (the planes are LCG-derived), so
    * the breakdown is oracle-adjudicated, not self-reported.
    *
    * Hamming distance is pair-deterministic (a function of the two
    * signatures, not of which band collided), so deduping AFTER the
    * Hamming computation counts each pair once with its hd attached —
    * one aggregation pass, no caching of intermediates.
    */
  def cosineLshStageCounts(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 256, bands: Int = 32,
      seed: Long = 7L): DataFrame = {
    val (e, exploded) = lshParts(emb, idCol, vecCol, nBits, bands, seed)
    val hMax = lshHammingBound(nBits, threshold)
    val pairs = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lshHamming((nBits + 63) / 64).as("hd"))
      .dropDuplicates("id_a", "id_b")
    val flagged = pairs
      .join(e.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(e.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .select(col("hd"),
        (col("hd") <= hMax &&
          dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
          .as("verified"))
    flagged.agg(
      count(lit(1)).cast("bigint").as("n_band_candidates"),
      sum(when(col("hd") <= hMax, 1L).otherwise(0L)).cast("bigint")
        .as("n_post_hamming"),
      sum(when(col("verified"), 1L).otherwise(0L)).cast("bigint")
        .as("n_verified"))
  }

  /** Pure two-input face of incremental embedding near-dup dedup —
    * [[graft.ext.Dedup.spanDedupAgainstHistory]]'s convention applied
    * to the LSH modality. For every NEW vector, reports whether it is
    * (a) dropped in-batch (it is the GREATER side of some verified
    * in-batch pair — greedy min-id survivorship) or, if it survives
    * that, (b) dropped by history (a verified pair with any historical
    * vector). History rows are assumed already deduplicated (state
    * only ever holds accepted vectors — a vector killed in an earlier
    * batch cannot kill later arrivals, the SemDeDup-style convention
    * [[graft.ext.Dedup.minhashDedupIncremental]] also uses).
    *
    * Candidate generation stays the banded equi-join on BOTH legs
    * (in-batch self-join; new-vs-history join), with the Hamming
    * prefilter inline and exact-cosine verification — identical
    * guarantees to [[cosineLshPairs]]: false positives impossible,
    * only band recall approximate. Deterministic splitmix64 planes
    * make the whole decision SQL-replayable, so the driver query
    * adjudicates every flag.
    */
  def cosineLshAgainstHistory(newEmb: DataFrame, histEmb: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nBits: Int = 256, bands: Int = 32, seed: Long = 7L): DataFrame = {
    val (eNew, exNew) = lshParts(newEmb, idCol, vecCol, nBits, bands, seed)
    val (eHist, exHist) = lshParts(histEmb, idCol, vecCol, nBits, bands, seed)
    val hMax = lshHammingBound(nBits, threshold)
    val sigWords = (nBits + 63) / 64

    def verified(cands: DataFrame, left: DataFrame, right: DataFrame): DataFrame =
      cands
        .join(left.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
        .join(right.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
        .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
        .select(col("id_a"), col("id_b"))

    // in-batch: verified pair (a < b) drops b
    val inBatchPairs = verified(
      exNew.as("a").join(exNew.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .filter(lshHamming(sigWords) <= hMax)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b"),
      eNew, eNew)
    val inBatchDrops = inBatchPairs.select(col("id_b").as("id")).distinct()

    // cross-batch: in-batch survivors vs history (history id on the
    // right so `verified` reads vectors from the right frame)
    val crossPairs = verified(
      exNew.as("a").join(exHist.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
        .filter(lshHamming(sigWords) <= hMax)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b"),
      eNew, eHist)
    val histDrops = crossPairs.select(col("id_a").as("id")).distinct()
      .join(inBatchDrops, Seq("id"), "left_anti")

    eNew.select(col("id"))
      .join(inBatchDrops.withColumn("dib", lit(true)), Seq("id"), "left")
      .join(histDrops.withColumn("dh", lit(true)), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("dib"), lit(false)).as("dropped_in_batch"),
        coalesce(col("dh"), lit(false)).as("dropped_by_history"),
        not(coalesce(col("dib"), lit(false)) ||
          coalesce(col("dh"), lit(false))).as("survived"))
  }

  /** Stateful incremental embedding dedup over a parquet signature+
    * vector state — continuous-ingestion near-dup filtering for the
    * embedding modality, [[graft.ext.Dedup.minhashDedupIncremental]]'s
    * protocol applied to hyperplane LSH: in-batch min-id survivorship,
    * cross-batch banded probe against accumulated state with exact-
    * cosine verification (state stores the vectors — fixed-width
    * payload, so unlike text the exactness costs only dim·4 bytes per
    * accepted row, or dim·1 with `int8Scale` — see below), survivors
    * appended to state, `batchTag` redelivery
    * protocol (a replayed batch first drops its own earlier append, so
    * re-processing is idempotent). Returns the surviving new rows.
    *
    * State is append-only and grows ONLY by accepted vectors — the
    * 100 TB shape: each batch shuffles its own profiles plus candidate
    * pairs, never the full state (the state side of the band join
    * prunes to colliding buckets).
    */
  def cosineLshIncremental(newEmb: DataFrame, idCol: String,
      vecCol: String, statePath: String, threshold: Double,
      nBits: Int = 256, bands: Int = 32, seed: Long = 7L,
      batchTag: Option[Long] = None,
      int8Scale: Option[Double] = None): DataFrame = {
    val spark = newEmb.sparkSession
    val state = Dedup.readStateOrEmpty(spark, statePath)
      .map(st => batchTag.fold(st)(t => st.filter(col("batch") =!= t)))
    // int8 state: accepted vectors are stored as symmetric int8 codes
    // (code = clamp(round(x·s), ±127), the [[Quant]] recipe with a
    // caller-fixed scale so every batch encodes identically) and
    // dequantized (code/s) for signatures + exact-cosine verify — the
    // 4× state cut that matters when state is billions of vectors.
    // The verify is EXACT over the dequantized values: quantization
    // moves each coordinate by ≤ 1/(2s), it never makes the cosine
    // test approximate w.r.t. the stored representation.
    val hist = state match {
      case Some(st) if int8Scale.isDefined =>
        val s = int8Scale.get
        // array<float> to match the float-state path's schema (the
        // signature kernel's encoder reads Seq[Float]); the float
        // rounding of code/s (≤ 2⁻²⁴ relative) is noise next to the
        // quantization step itself (1/2s per coordinate)
        st.select(col("id").as(idCol),
          transform(col("q"), c => c.cast("double") / lit(s))
            .cast("array<float>").as(vecCol))
      case Some(st) => st.select(col("id").as(idCol), col("v").as(vecCol))
      case None =>
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField(idCol, LongType),
            StructField(vecCol, ArrayType(FloatType)))))
    }
    val flags = cosineLshAgainstHistory(newEmb, hist, idCol, vecCol,
      threshold, nBits, bands, seed)
    // pin survivors BEFORE the state append — a lazy plan re-read after
    // the append would see this batch's own vectors in state and kill
    // every row as its own duplicate
    val survivors = flags.filter(col("survived")).select(col("id"))
      .localCheckpoint(true)
    val payload = int8Scale match {
      case Some(s) =>
        newEmb.select(col(idCol).cast("long").as("id"),
          transform(toDoubleVec(col(vecCol)), x =>
            least(greatest(round(x * lit(s)), lit(-127.0)), lit(127.0))
              .cast("tinyint")).as("q"))
      case None =>
        newEmb.select(col(idCol).cast("long").as("id"),
          toDoubleVec(col(vecCol)).cast("array<float>").as("v"))
    }
    payload
      .join(survivors, Seq("id"))
      .withColumn("batch", lit(batchTag.getOrElse(-1L)))
      .write.mode("append").parquet(statePath)
    newEmb.join(survivors.withColumnRenamed("id", "__sid"),
      col(idCol).cast("long") === col("__sid"), "left_semi")
  }

  /** Shared [[cosineLshPairs]] plumbing: `e(id, v, nrm)` and the
    * band-exploded signature profiles `(id, band, bucket, sig)`.
    */
  private def lshParts(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int, bands: Int, seed: Long): (DataFrame, DataFrame) = {
    require(nBits % bands == 0, "nBits must divide into bands")
    graft.plans.GraftExtensions.ensure(emb.sparkSession) // vec_dot
    val bitsPerBand = nBits / bands
    // zero-norm guard (mirrored in the lshReplayTail oracle's `e`
    // CTE): a zero vector's verify cosine is 0/0 = NaN, which Spark
    // orders ABOVE the threshold — it would survive banding (its
    // signature is all sign(0) bits) and "verify" against everything
    // it collides with. No direction ⇒ excluded from cosine LSH.
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
      .filter(col("nrm") > 0)

    // fixed ±1 hyperplanes sized to the embedding dim (driver reads
    // ONE row for the dim — O(1), not O(rows); an EMPTY input — the
    // first incremental batch has no history — gets a 1-dim dummy
    // plane set it will never apply)
    val dim = e.select(size(col("v"))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(1)
    val planes = Array.tabulate(nBits, dim)((i, d) =>
      lshPlaneEntry(seed, i, dim, d))

    // all nBits sign bits per row in ONE compiled mapPartitions kernel
    // (an expression tree of nBits dot products would blow codegen
    // limits and gets re-evaluated on both self-join sides — profiled
    // 13-15s vs ~1s at sf0.1); planes ship once per task in the closure.
    // Each band entry also carries the FULL signature packed into four
    // longs — that powers the Hamming prefilter below.
    val spark = emb.sparkSession
    import spark.implicits._
    val bpb = bitsPerBand
    val nb = nBits
    val nBands = bands
    val sigWords = (nBits + 63) / 64
    // per-id profile (band buckets + packed signature) CACHED so the
    // kernel subtree isn't re-executed on both self-join sides — the
    // band join consumes it twice and each duplicated subtree was
    // paying its own codegen/plan overhead (measured: the whole query
    // is overhead-bound at bench scale, not flop-bound)
    val profiles = e.as[(Long, Seq[Float], Double)]
      .mapPartitions { it =>
        it.map { case (id, v, _) =>
          val buckets = new Array[Long](nBands)
          val sig = new Array[Long](sigWords)
          var i = 0
          while (i < nb) {
            val p = planes(i)
            var d = 0.0
            var j = 0
            val n = math.min(p.length, v.length)
            while (j < n) { d += v(j) * p(j); j += 1 }
            if (d >= 0) {
              buckets(i / bpb) |= 1L << (i % bpb)
              sig(i / 64) |= 1L << (i % 64)
            }
            i += 1
          }
          (id, buckets.toSeq, sig.toSeq)
        }
      }.toDF("id", "buckets", "sig")
      .cache()
    val exploded = profiles.select(col("id"),
      posexplode(col("buckets")).as(Seq("band", "bucket")), col("sig"))
    (e, exploded)
  }

  /** Hamming prefilter bound: a pair at exactly `threshold` cosine has
    * angle θ = acos(threshold) and Hamming ~ Binomial(nBits, θ/π);
    * keep pairs within mean + 4σ — loses a true-threshold pair with
    * p ≈ 3e-5 (negligible vs banding recall) while rejecting ~5/6 of
    * random collisions (mean nBits/2) BEFORE any vector is shipped.
    * Measured at sf0.1: 8.1s → the verify joins shrink ~6×.
    */
  private def lshHammingBound(nBits: Int, threshold: Double): Long = {
    val pBit = math.acos(threshold) / math.Pi
    math.ceil(nBits * pBit +
      4.0 * math.sqrt(nBits * pBit * (1.0 - pBit))).toLong
  }

  /** Hamming distance between the packed `sig` arrays of self-join
    * sides `a`/`b` — codegen'd bit_count over XOR'd words, runs inline
    * on the band join with no extra shuffle.
    */
  private def lshHamming(sigWords: Int): Column =
    (0 until sigWords)
      .map(w => bit_count(element_at(col("a.sig"), w + 1)
        .bitwiseXOR(element_at(col("b.sig"), w + 1))))
      .reduce(_ + _)

  /** Margin-based bitext/pair mining (Artetxe & Schwenk 2019, the
    * CCMatrix/LASER margin criterion — the standard parallel-corpus
    * miner for multilingual training data): for sides A and B (e.g.
    * two languages' sentence embeddings), score every candidate pair
    * by its cosine RATIO-NORMALIZED against both endpoints' k-NN
    * neighborhoods —
    *
    *   margin(x, y) = cos(x, y) / ((avgₖ(x) + avgₖ(y)) / 2)
    *
    * — which suppresses hubs (vectors close to everything score high
    * raw cosine but low margin), then keeps MUTUAL-best pairs above a
    * margin threshold. This exact formulation is the brute-force
    * baseline; [[marginPairsIvf]] is the bucketed scale path. Like
    * [[graft.ext.Dedup.embeddingCosinePairs]], the brute face is
    * OPT-IN (`acceptBroadcastBaseline = true`): it broadcasts the
    * whole B corpus, which is exactly the wrong shape at the corpus
    * sizes the operator is named for.
    *
    * Determinism: each cosine is canonicalized to DECIMAL(20,12); the
    * k-NN average sums canonicalized cosines as exact decimals (order-
    * free) and divides once — so margins, ranks, and the mutual-best
    * decision replay in SQL bit-for-bit. Ties break by neighbor id.
    *
    * Returns (id_a, id_b, cos, margin) for mutual-best pairs with
    * margin ≥ threshold.
    */
  def marginPairs(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, threshold: Double = 1.0,
      release: Boolean = true,
      acceptBroadcastBaseline: Boolean = false): DataFrame = {
    require(acceptBroadcastBaseline,
      "marginPairs is the exact brute-force BASELINE: it crossJoin-" +
        "broadcasts the ENTIRE B side to every task, and for bitext " +
        "mining B is a full other-language corpus — a data-sized " +
        "broadcast that fails at scale. For production margin mining " +
        "use marginPairsIvf (bucketed candidates, identical output " +
        "contract); pass acceptBroadcastBaseline = true only for " +
        "oracle-anchor or recall-measurement runs where you know B is " +
        "query-sized.")
    graft.plans.GraftExtensions.ensure(a.sparkSession)
    def canon(c: Column) = c.cast("decimal(20,12)").cast("double")
    val ea = a.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", norm(col("va")))
    val eb = b.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", norm(col("vb")))
    val pairs = ea.crossJoin(broadcast(eb))
      .withColumn("cosC",
        canon(dot(col("va"), col("vb")) / (col("na") * col("nb"))))
      .select(col("id_a"), col("id_b"), col("cosC"))
    marginFromCandidates(pairs, k, threshold, release)
  }

  /** IVF-bucketed margin mining — the corpus-scale path: candidates
    * come from the probed-bucket join (the [[hardNegativesIvf]]
    * shape: side B bucketed by nearest centroid, side A probing its
    * `nprobe` nearest buckets), and the k-NN averages are computed
    * over the CANDIDATE set — the standard approximation (neighbors
    * outside probed buckets are invisible to both the average and the
    * pair pool; the recall twin quantifies the cost). Same output
    * contract as [[marginPairs]].
    */
  def marginPairsIvf(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, threshold: Double = 1.0,
      nlist: Int = 16, nprobe: Int = 4,
      release: Boolean = true): DataFrame = {
    graft.plans.GraftExtensions.ensure(a.sparkSession)
    def canon(c: Column) = c.cast("decimal(20,12)").cast("double")
    val base = b.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nn", norm(col("nv")))
    val centroidDf = base.orderBy(col("nid")).limit(nlist)
      .select(col("nid").as("cid"), col("nv").as("cv"))
      .select(col("cid"), col("cv"), norm(col("cv")).as("cn"))
    val assigned = assignToCentroids(base, centroidDf)
    val q = a.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("psim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroidDf))
      .withColumn("psim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid").as("bucket"))
    val pairs = probes.join(assigned, "bucket")
      .withColumn("cosC",
        canon(dot(col("qv"), col("nv")) / (col("qn") * col("nn"))))
      .select(col("qid").as("id_a"), col("nid").as("id_b"), col("cosC"))
    marginFromCandidates(pairs, k, threshold, release)
  }

  /** Shared margin machinery over a candidate (id_a, id_b, cosC) set:
    * per-endpoint k-NN averages (exact decimal sums of canonicalized
    * cosines over each endpoint's top-min(k, n) candidates), the
    * margin ratio, and the mutual-best + threshold filter.
    */
  private def marginFromCandidates(pairs0: DataFrame, k: Int,
      threshold: Double, release: Boolean): DataFrame = {
    // the candidate set fans out three ways (both k-NN averages + the
    // margin join) — cache it for the computation, release on return
    // (eager checkpoint of the small mutual-best result, the curate-v2
    // lifecycle pattern)
    val pairs = pairs0.cache()
    val wa = Window.partitionBy(col("id_a"))
      .orderBy(col("cosC").desc, col("id_b"))
    val wb = Window.partitionBy(col("id_b"))
      .orderBy(col("cosC").desc, col("id_a"))
    val ranked = pairs
      .withColumn("ra", row_number().over(wa))
      .withColumn("rb", row_number().over(wb))
    val avgA = ranked.filter(col("ra") <= k).groupBy(col("id_a"))
      .agg((sum(col("cosC").cast("decimal(20,12)"))
        .cast("decimal(38,12)").cast("double") /
        count(lit(1)).cast("double")).as("avg_a"))
    val avgB = ranked.filter(col("rb") <= k).groupBy(col("id_b"))
      .agg((sum(col("cosC").cast("decimal(20,12)"))
        .cast("decimal(38,12)").cast("double") /
        count(lit(1)).cast("double")).as("avg_b"))
    // denominator sign guard: in sparse IVF buckets an endpoint's few
    // candidates can ALL have negative/near-zero cosines, making the
    // averaged denominator ≤ 0 — where the ratio flips sign (a
    // strongly anti-correlated pair would score a large POSITIVE
    // margin) or divides by zero. A non-positive neighborhood average
    // means there is no meaningful "how much better than your
    // neighbors" signal, so those candidates are excluded before the
    // ratio (mirrored in every margin oracle's `mg` CTE)
    val margined = pairs.join(avgA, "id_a").join(avgB, "id_b")
      .filter(col("avg_a") + col("avg_b") > lit(0.0))
      .withColumn("margin",
        col("cosC") / ((col("avg_a") + col("avg_b")) / lit(2.0)))
    val wfa = Window.partitionBy(col("id_a"))
      .orderBy(col("margin").desc, col("id_b"))
    val wfb = Window.partitionBy(col("id_b"))
      .orderBy(col("margin").desc, col("id_a"))
    val out0 = margined
      .withColumn("fa", row_number().over(wfa))
      .withColumn("fb", row_number().over(wfb))
      .filter(col("fa") === 1 && col("fb") === 1 &&
        col("margin") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosC").as("cos"),
        col("margin"))
    // release = false keeps the LAZY plan and hands the cache to the
    // caller (the plan-gate surface, the diversitySample convention)
    if (!release) out0
    else {
      val out = out0.localCheckpoint(true)
      pairs.unpersist()
      out
    }
  }

  /** Per-dimension whitening statistics — the standard embedding
    * post-processing step (mean-centering + per-dimension variance
    * scaling; the diagonal case of Su et al.'s whitening /
    * "All-but-the-top" family, public) that repairs anisotropic
    * embedding spaces before cosine retrieval. Returns one row per
    * dimension: (pos, n, mean, std). Apply as (x − mean)/std with the
    * O(dim)-collect-to-literal move [[Quant.quantizeInt8]] uses.
    *
    * Determinism: each coordinate is canonicalized to DECIMAL(20,12)
    * (shortest-string semantics both engines share), squares to
    * DECIMAL(30,20); sums are exact decimals (order-free); mean/std
    * assemble from those exact sums in fixed double arithmetic, the
    * final std canonicalized — every row replays in SQL.
    *
    * Scale shape: one posexplode (narrow) + one aggregate whose key
    * space is `dim` — the [[Quant.calibrate]] shape with power sums.
    */
  def whitenStats(emb: DataFrame, vecCol: String): DataFrame = {
    def canon(c: Column) = c.cast("decimal(20,12)").cast("double")
    val cells = emb
      .select(posexplode(toDoubleVec(col(vecCol))).as(Seq("pos", "x")))
      .select(col("pos"), col("x").cast("decimal(20,12)").as("xd"))
      .withColumn("x2",
        (col("xd").cast("double") * col("xd").cast("double"))
          .cast("decimal(30,20)"))
    cells.groupBy(col("pos")).agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(col("xd")).cast("decimal(38,12)").as("s"),
        sum(col("x2")).cast("decimal(38,20)").as("ss"))
      .select(col("pos"), col("n"),
        (col("s").cast("double") / col("n").cast("double")).as("mean"),
        canon(sqrt(greatest(lit(0.0),
          (col("n").cast("double") * col("ss").cast("double") -
            col("s").cast("double") * col("s").cast("double")) /
          (col("n").cast("double") * col("n").cast("double")))))
          .as("std"))
  }

  /** Apply the [[whitenStats]] transform: each coordinate becomes
    * (x − mean(pos)) / std(pos) — diagonal whitening, the anisotropy
    * repair the stats table exists for (hub dimensions with large
    * variance stop dominating every cosine; near-constant dimensions
    * stop contributing spurious agreement). A zero-variance dimension
    * maps to 0.0 exactly: its centered value is 0 for every training
    * vector, and for unseen vectors a constant dimension carries no
    * ranking information either.
    *
    * `stats` is the (pos, mean, std) table — O(dim) rows — collected
    * to literal arrays and inlined into one codegen'd `transform`
    * expression (the [[Quant.quantizeInt8]] collect-to-literal move:
    * no join, no shuffle, the vectors never leave their partitions).
    * Each whitened coordinate is canonicalized to DECIMAL(20,12) so
    * downstream cosine/LSH decisions replay in SQL.
    *
    * Returns the input with `whitened` (array<double>) appended.
    */
  def whitenApply(emb: DataFrame, vecCol: String,
      stats: DataFrame): DataFrame = {
    def canon(c: Column) = c.cast("decimal(20,12)").cast("double")
    val st = stats.select(col("pos").cast("int"),
        col("mean").cast("double"), col("std").cast("double"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(st.nonEmpty, "whitenApply: empty stats table")
    require(st.map(_._1).toSeq == (0 until st.length),
      "whitenApply: stats must cover positions 0..dim-1 exactly")
    val means = array(st.map(s => lit(s._2._1)): _*)
    val stds = array(st.map(s => lit(s._2._2)): _*)
    val vec = toDoubleVec(col(vecCol))
    emb.withColumn("whitened",
      // dim guard at eval time: zip_with pads the shorter side with
      // nulls, so a vector longer/shorter than the stats table would
      // otherwise SILENTLY zero-fill its tail — fail loudly instead
      when(size(vec) =!= lit(st.length),
        raise_error(concat(lit("whitenApply: vector dim "),
          size(vec).cast("string"),
          lit(s" != stats dim ${st.length}"))))
        .otherwise(zip_with(vec,
          sequence(lit(0), lit(st.length - 1)),
          (x, i) => {
            val sd = element_at(stds, i + 1)
            when(sd > 0.0, canon((x - element_at(means, i + 1)) / sd))
              .otherwise(lit(0.0))
          })))
  }
}
