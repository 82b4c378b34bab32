package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.queries.H.t

/** Round-6 extension bank: the deterministic Lloyd's k-means IVF family
  * (closing the one rows-only query without an adjudicated twin) and
  * adversarial trap queries for the newest operators.
  */
object ExtC {

  /** Generated CTE prefix replaying [[Similarity.lloydCentroids]] for
    * the embeddings table: unit-normalize, first-`nlist` init, `rounds`
    * unrolled Lloyd rounds with fixed-point (1e12 BIGINT) element sums
    * and renormalized sum-direction updates — the same unrolled-oracle
    * technique as the PageRank CTEs (`x_pagerank_sources`). Exposes
    * `e` (vec_id, v, nrm) and `cent$rounds` (cid, cv).
    */
  def lloydCtes(nlist: Int, rounds: Int, dim: Int): String = {
    val head = s"""WITH nn0 AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM nn0),
      un AS (SELECT vec_id AS nid, list_transform(v, x -> x / nrm) AS uv
        FROM e WHERE nrm > 0),
      cent0 AS (SELECT nid AS cid, uv AS cv FROM un ORDER BY nid LIMIT $nlist),
      pp AS (SELECT unnest(range(1, ${dim + 1})) AS p)"""
    val iterations = (1 to rounds).map { i =>
      s"""a$i AS (SELECT nid, uv, cid FROM (
          SELECT un.nid, un.uv, c.cid,
            row_number() OVER (PARTITION BY un.nid
              ORDER BY list_dot_product(un.uv, c.cv) DESC, c.cid) AS rk
          FROM un CROSS JOIN cent${i - 1} c) WHERE rk = 1),
        s$i AS (SELECT cid, p,
            SUM(CAST(floor(uv[p] * 1e12) AS BIGINT)) AS sfx
          FROM a$i CROSS JOIN pp GROUP BY cid, p),
        v$i AS (SELECT cid, list(CAST(sfx AS DOUBLE) ORDER BY p) AS sv
          FROM s$i GROUP BY cid),
        w$i AS (SELECT cid,
            list_transform(sv, x -> x / sqrt(list_dot_product(sv, sv))) AS ncv
          FROM v$i WHERE sqrt(list_dot_product(sv, sv)) > 0),
        cent$i AS (SELECT c.cid, COALESCE(w.ncv, c.cv) AS cv
          FROM cent${i - 1} c LEFT JOIN w$i w ON w.cid = c.cid)"""
    }.mkString(",\n")
    s"$head,\n$iterations"
  }

  /** IVF machinery suffix shared by the kmeans queries: centroid norms,
    * nearest-centroid assignment of the RAW vectors, nprobe probing for
    * the `vec_id < 10` query set, candidate ranking — mirrors
    * [[Similarity.ivfTopK]] exactly (same structure as the green
    * `x_ann_ivf_recall` oracle, with `cent$rounds` as the codebook).
    */
  def ivfCtes(rounds: Int, nprobe: Int, k: Int): String =
    s"""cent AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn
        FROM cent$rounds),
      assigned AS (SELECT nid, nv, nn2, bucket FROM (
          SELECT b.vec_id AS nid, b.v AS nv, b.nrm AS nn2, c.cid AS bucket,
            row_number() OVER (PARTITION BY b.vec_id
              ORDER BY list_dot_product(b.v, c.cv)/(b.nrm*c.cn) DESC, c.cid) AS rk
          FROM e b CROSS JOIN cent c) WHERE rk = 1),
      q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      probes AS (SELECT qid, qv, qn, bucket FROM (
          SELECT q.qid, q.qv, q.qn, c.cid AS bucket,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY list_dot_product(q.qv, c.cv)/(q.qn*c.cn) DESC, c.cid) AS rk
          FROM q CROSS JOIN cent c) WHERE rk <= $nprobe),
      ivf AS (SELECT qid, nid, rank FROM (
          SELECT p.qid, a.nid,
            CAST(row_number() OVER (PARTITION BY p.qid
              ORDER BY list_dot_product(p.qv, a.nv)/(p.qn*a.nn2) DESC, a.nid)
              AS INTEGER) AS rank
          FROM probes p JOIN assigned a
            ON p.bucket = a.bucket AND a.nid != p.qid)
        WHERE rank <= $k)"""

  /** Recall@5 of the Lloyd-k-means IVF path against brute force,
    * computed inside Spark as one deterministic row; the oracle replays
    * centroid training AND both retrieval paths end-to-end — no
    * hard-coded constants, so the check holds at any SF.
    */
  val xAnnIvfKmeansRecall = Q(
    "x_ann_ivf_kmeans_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val cents = Similarity.lloydCentroids(emb, "vec_id", "embedding",
        nlist = 16, rounds = 5)
      val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select(col("qid"), col("nid"))
      val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
          centroids = Some(cents))
        .select(col("qid"), col("nid"))
      val nQ = q.agg(countDistinct(col("vec_id")).as("n_queries"))
      val nBf = bf.agg(count(lit(1)).as("n_bf"))
      val nHits = ivf.join(bf, Seq("qid", "nid")).agg(count(lit(1)).as("n_hits"))
      nQ.crossJoin(nBf).crossJoin(nHits)
        .select(
          col("n_queries").cast("bigint").as("n_queries"),
          col("n_hits").cast("bigint").as("n_hits"),
          (col("n_hits").cast("double") / col("n_bf").cast("double"))
            .as("recall_at_5"))
    },
    Some(s"""${lloydCtes(nlist = 16, rounds = 5, dim = 64)},
      ${ivfCtes(rounds = 5, nprobe = 4, k = 5)},
      bf AS (SELECT qid, nid FROM (
          SELECT q.qid, b.vec_id AS nid,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY list_dot_product(q.qv, b.v)/(q.qn*b.nrm) DESC, b.vec_id) AS rank
          FROM q CROSS JOIN e b WHERE b.vec_id != q.qid)
        WHERE rank <= 5)
      SELECT CAST((SELECT count(*) FROM q) AS BIGINT) AS n_queries,
        CAST((SELECT count(*) FROM ivf JOIN bf USING (qid, nid)) AS BIGINT) AS n_hits,
        CAST((SELECT count(*) FROM ivf JOIN bf USING (qid, nid)) AS DOUBLE)
          / (SELECT count(*) FROM bf) AS recall_at_5"""))

  val queries: Seq[Q] = Seq(xAnnIvfKmeansRecall)
}
