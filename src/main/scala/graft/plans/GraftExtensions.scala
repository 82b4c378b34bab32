package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the
  * custom native expressions so they resolve by name in both the
  * Column API (call_function) and SQL. Install via
  * `.config("spark.sql.extensions", classOf[GraftExtensions].getName)`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.entries.foreach(ext.injectFunction)
}

object GraftExtensions {
  private[plans] val entries = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1)): Expression),
    (new FunctionIdentifier("arr_jaccard"),
      new ExpressionInfo(classOf[ArrJaccard].getName, "arr_jaccard"),
      (children: Seq[Expression]) => ArrJaccard(children(0), children(1)): Expression),
    (new FunctionIdentifier("gram_stats"),
      new ExpressionInfo(classOf[GramStats].getName, "gram_stats"),
      (children: Seq[Expression]) => GramStats(children(0), children(1)): Expression),
    (new FunctionIdentifier("gram_overlap"),
      new ExpressionInfo(classOf[GramOverlap].getName, "gram_overlap"),
      (children: Seq[Expression]) =>
        GramOverlap(children(0), children(1), children(2)): Expression),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) =>
        JaroWinkler(children(0), children(1)): Expression),
    (new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (children: Seq[Expression]) => DeflateLen(children(0)): Expression))

  /** Idempotent per-session registration fallback: lets the functions
    * resolve even in a session built WITHOUT spark.sql.extensions (e.g.
    * a harness calling SparkEntry.queries with its own SparkSession).
    */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    entries.foreach { e =>
      if (!reg.functionExists(e._1)) reg.registerFunction(e._1, e._2, e._3)
    }
  }
}
