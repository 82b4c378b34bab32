package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query exposed through the driver contract.
  *
  * @param name   stable key, used for SparkEntry.queries + BENCH ids
  * @param run    (session, sfDir) => result DataFrame. Column names MUST
  *               match the oracle's output names exactly (driver compares
  *               by sorted column name).
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None for non-SQL-expressible operators (driver
  *               then records a rows-only check).
  * @param bench  include in the headline Bench set (the CORE group —
  *               frozen at 41 queries since r16 for cross-round
  *               comparability; do not add to it).
  * @param bench2 include in the FLAGSHIP bench group (r19): the
  *               engine's heaviest end-to-end compositions, reported
  *               as a separate total beside the frozen core so the
  *               core series stays comparable while the flagships are
  *               still wall-clock-gated every round.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    bench2: Boolean = false)

/** Central registry: every operator SURVEY.md §2 declares done has an
  * entry here (and, when SQL-expressible, an oracle).
  */
object Registry {
  lazy val all: Seq[Q] =
    Relational.queries ++ Analytic.queries ++ Functions.queries ++
      Extra.queries ++ Traps.queries ++ TpcH.queries ++ Events.queries ++
      BehaviorQ.queries ++ Cleaning.queries ++ Ext.queries ++ ExtB.queries ++
      ExtC.queries ++ ExtD.queries ++ ExtE.queries ++ ExtF.queries ++
      ExtG.queries ++ ExtH.queries ++ ExtI.queries ++ ExtJ.queries ++
      ExtK.queries ++ ExtL.queries ++ ExtM.queries ++ ExtN.queries ++
      ExtO.queries ++ ExtP.queries ++ ExtQ.queries ++ Curate.queries

  lazy val byName: Map[String, Q] = {
    // a duplicate name would silently shadow a query in SparkEntry's
    // Map — fail loudly instead
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all.map(q => q.name -> q).toMap
  }
}

/** Parquet table loader for the driver test data (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    H.t(spark, dir, name)
}
