package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev profiling harness: step timings for the heavy dedup pipeline.
  * Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // unforked sbt run: Hadoop's shutdown hook fires after sbt unloads
    // the classloader and logs a spurious core-default.xml parse ERROR;
    // results are long since written by then — silence that logger
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.hadoop.conf.Configuration", org.apache.logging.log4j.Level.OFF)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    val idx = time("shingleIndex materialize") {
      val i = Dedup.shingleIndex(docs, "text", "doc_id", 3).cache()
      i.count(); i
    }
    val dfRank = time("dfRank") {
      val d = idx.groupBy("s").agg(count(lit(1)).as("df")).cache(); d.count(); d
    }
    val prefix = time("position+prefix (flatMapGroups)") {
      import spark.implicits._
      val p = idx.join(dfRank, "s")
        .select(col("id").cast("long"), col("s"), col("df").cast("long"))
        .as[(Long, String, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (id: Long, it: Iterator[(Long, String, Long)]) =>
          val arr = it.toArray.sortBy(x => (x._3, x._2))
          val n = arr.length
          val keep = n - math.ceil(0.5 * n).toInt + 1
          arr.iterator.take(keep).map(x => (id, x._2, n))
        }.toDF("id", "s", "n").cache()
      p.count(); p
    }
    val cand = time("candidate join") {
      val c = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("b.n") >= lit(0.5) * col("a.n") && col("a.n") >= lit(0.5) * col("b.n"))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b")).distinct().cache()
      c.count(); c
    }
    time("verify via sets") {
      val sets = idx.groupBy("id").agg(collect_set(col("s")).as("ss"), count(lit(1)).as("n"))
      cand
        .join(sets.select(col("id").as("doc_a"), col("ss").as("sa"), col("n").as("na")), "doc_a")
        .join(sets.select(col("id").as("doc_b"), col("ss").as("sb"), col("n").as("nb")), "doc_b")
        .withColumn("ix", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("ix").cast("double") / (col("na") + col("nb") - col("ix")))
        .filter(col("jaccard") >= 0.5).count()
    }
    time("minhash sigs (128 mins + set)") {
      val p = 2147483647L
      val rnd = new scala.util.Random(42)
      val ab = Array.fill(128)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong -> rnd.nextInt(Int.MaxValue).toLong)
      val ix = idx.withColumn("x", pmod(xxhash64(col("s")), lit(p)))
      val minCols = ab.zipWithIndex.map { case ((a, b), i) =>
        min(pmod(col("x") * lit(a) + lit(b), lit(p))).as(s"mh$i")
      } :+ collect_set(col("s")).as("ss")
      ix.groupBy(col("id")).agg(minCols.head, minCols.tail: _*).count()
    }
    time("minhash full") {
      Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 0.5).count()
    }
    time("verify via index-count join") {
      val inter = idx.as("a")
        .join(idx.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        .agg(count(lit(1)).as("ix"))
      val counts = idx.groupBy("id").agg(count(lit(1)).as("n"))
      inter.join(cand, Seq("doc_a", "doc_b"))
        .join(counts.withColumnRenamed("id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(counts.withColumnRenamed("id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .filter(col("ix").cast("double") / (col("na") + col("nb") - col("ix")) >= 0.5).count()
    }
    spark.stop()
    // all outputs are flushed/written; drop Hadoop's shutdown hooks so
    // they don't race sbt's (unforked) classloader/temp-jar cleanup
    org.apache.hadoop.util.ShutdownHookManager.get().clearShutdownHooks()
  }
}
