package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Salting must never change results — only the shuffle layout. */
class SkewSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("salted aggregation equals plain aggregation") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plain = li.groupBy(col("l_returnflag").as("_key"))
      .agg(sum(col("l_quantity").cast("decimal(10,2)")).cast("decimal(38,2)").as("s"),
        count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(
      li,
      key = col("l_returnflag"),
      saltSource = Seq(col("l_orderkey"), col("l_linenumber")),
      buckets = 16,
      partials = Seq(
        sum(col("l_quantity").cast("decimal(10,2)")).as("ps"),
        count(lit(1)).as("pn")),
      combine = Seq(
        sum(col("ps")).cast("decimal(38,2)").as("s"),
        sum(col("pn")).cast("bigint").as("n")))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join equals plain join") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
      saltSource = Seq(col("l_linenumber")), buckets = 8)
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // one hot key carrying ~100x the rows of every other key
    val fact = spark.range(0, 300000)
      .select(when(col("id") < 200000, 0L).otherwise(col("id") % 1000)
        .as("k"), col("id").as("payload"))
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = fact.join(dim, "k")
      // materialize THIS DataFrame's execution (count() would spawn a
      // separate one and leave this AdaptiveSparkPlan un-finalized)
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt is deterministic and bounded") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val s1 = li.select(Skew.salt(16, col("l_orderkey")).as("s"))
    assert(s1.agg(min("s"), max("s")).head().toSeq.asInstanceOf[Seq[Int]]
      .forall(v => v >= 0 && v < 16))
    val s2 = li.select(Skew.salt(16, col("l_orderkey")).as("s"))
    assert(s1.exceptAll(s2).isEmpty)
  }

  test("topKeyReport ranks hot keys with exact shares") {
    import spark.implicits._
    val df = (Seq.fill(60)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(10)(3L))
      .toDF("k")
    val r = Skew.topKeyReport(df, col("k"), topK = 2).orderBy("rank")
      .collect()
    assert(r.length == 2, "topK must cap the report")
    assert(r(0).getAs[Long]("key") == 1L && r(0).getAs[Long]("n") == 60)
    assert(r(0).getAs[Double]("share") == 0.6)
    assert(r(0).getAs[Long]("n_keys") == 3)
    assert(math.abs(r(1).getAs[Double]("cum_share") - 0.9) < 1e-12)
    assert(r(1).getAs[Long]("key") == 2L)
  }
}
