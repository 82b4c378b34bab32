package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs: UTC, coerce casts, small shuffle. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .appName("graft-test")
    .getOrCreate()

  override def afterAll(): Unit = {
    // session is shared across suites in one JVM; don't stop it — but DO
    // drop any caches this suite's operators left behind (LSH profiles,
    // diversity-sample assignment, curate fan-outs): the CacheManager
    // substitutes cached subtrees into LATER suites' plans, which both
    // leaks memory across the run and flips plan-shape assertions (a
    // cached crossJoin subtree prints once per cache reference —
    // ExtSpec→PlanSpec ordering pushed x_sample_diversity from 4 to 7
    // BroadcastNestedLoopJoin lines with identical semantics)
    spark.catalog.clearCache()
    super.afterAll()
  }
}
