package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement main for the r07→r08 LSH bench question: are the
  * Rademacher ±1 planes (commit 1af8c3a) producing more band candidates
  * than the Gaussian planes they replaced — i.e. was the r07 +37% on
  * x_dedup_embedding_lsh a real candidate-volume regression, or machine
  * load? Prints candidate/survivor/verified counts under BOTH plane
  * sets at the given sfDir, plus wall-clock for the shipped pair query.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nBits = 256; val bands = 32; val bpb = nBits / bands
    val sigWords = (nBits + 63) / 64
    val threshold = 0.45

    val e = emb.select(col("vec_id").as("id"),
      graft.ext.Similarity.toDoubleVec(col("embedding")).as("v"))
    val dim = e.select(size(col("v"))).head().getInt(0)

    def counts(planes: Array[Array[Double]]): (Long, Long, Long) = {
      val profiles = e.as[(Long, Seq[Double])].mapPartitions { it =>
        it.map { case (id, v) =>
          val buckets = new Array[Long](bands)
          val sig = new Array[Long](sigWords)
          var i = 0
          while (i < nBits) {
            val p = planes(i); var d = 0.0; var j = 0
            val n = math.min(p.length, v.length)
            while (j < n) { d += v(j) * p(j); j += 1 }
            if (d >= 0) { buckets(i / bpb) |= 1L << (i % bpb); sig(i / 64) |= 1L << (i % 64) }
            i += 1
          }
          (id, buckets.toSeq, sig.toSeq)
        }
      }.toDF("id", "buckets", "sig").cache()
      val exploded = profiles.select(col("id"),
        posexplode(col("buckets")).as(Seq("band", "bucket")), col("sig"))
      val pBit = math.acos(threshold) / math.Pi
      val hMax = math.ceil(nBits * pBit +
        4.0 * math.sqrt(nBits * pBit * (1.0 - pBit))).toLong
      val hamming = (0 until sigWords)
        .map(w => bit_count(element_at(col("a.sig"), w + 1)
          .bitwiseXOR(element_at(col("b.sig"), w + 1)))).reduce(_ + _)
      val pairs = exploded.as("a").join(exploded.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), hamming.as("hd"))
        .dropDuplicates("id_a", "id_b")
      val r = pairs.agg(count(lit(1)), sum(when(col("hd") <= hMax, 1L).otherwise(0L))).head()
      profiles.unpersist()
      (r.getLong(0), r.getLong(1), hMax)
    }

    val rademacher = Array.tabulate(nBits, dim)((i, d) =>
      graft.ext.Similarity.lshPlaneEntry(7L, i, dim, d))
    val rnd = new scala.util.Random(7L)
    val gaussian = Array.fill(nBits, dim)(rnd.nextGaussian())

    val (rc, rh, _) = counts(rademacher)
    val (gc, gh, _) = counts(gaussian)
    println(s"[probe] rademacher: band_candidates=$rc post_hamming=$rh")
    println(s"[probe] gaussian:   band_candidates=$gc post_hamming=$gh")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val times = (1 to 3).map { _ =>
      val t = time(graft.ext.Similarity.cosineLshPairs(emb, "vec_id", "embedding", 0.45)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache(); t
    }
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    println(s"[probe] shipped pair query reps=${times.map(t => f"$t%.2f").mkString(",")} loadavg=$load")
    spark.stop()
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
