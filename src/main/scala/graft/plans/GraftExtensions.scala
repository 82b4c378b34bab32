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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotEntry)
  }
}

object GraftExtensions {
  private[plans] val vecDotEntry = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => VecDot(children(0), children(1)))

  /** Idempotent per-session registration fallback: lets vec_dot resolve
    * even in a session built WITHOUT spark.sql.extensions (e.g. a
    * harness calling SparkEntry.queries with its own SparkSession).
    */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(vecDotEntry._1)) {
      reg.registerFunction(vecDotEntry._1, vecDotEntry._2, vecDotEntry._3)
    }
  }
}
