package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row word n-gram statistics for repetition scoring:
  * `gram_stats(tokens, n)` → struct(n_grams, distinct_grams, top_count).
  *
  * Why a custom Expression (SURVEY.md §7.3 revisit clause): repetition
  * signals are a pure function of ONE document, but the relational
  * formulation (explode n-grams → groupBy (doc, gram) → per-doc rollup)
  * shuffles every n-gram occurrence of the whole corpus — at 100 TB
  * that is the single largest avoidable exchange in the curation
  * pipeline. This expression computes the same three counts in one pass
  * over the token array with a per-row hash map (O(doc length) work,
  * O(doc vocabulary) transient memory), so the operator becomes a
  * narrow, shuffle-free projection. The relational formulation is kept
  * as [[graft.ext.Text.repetitionSignalsShuffled]] and a parity spec
  * asserts identical output.
  *
  * Codegen emits a call to the static [[GramStatsKernel]] — same
  * technique as Spark's own collection expressions: stays inside
  * whole-stage codegen without inlining the loop body.
  */
case class GramStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val tokensOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!tokensOk)
      TypeCheckResult.TypeCheckFailure(
        s"gram_stats expects array<string> tokens, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("gram_stats expects a literal int n")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = GramStats.outType

  override def nullSafeEval(tokens: Any, n: Any): Any =
    GramStatsKernel.compute(tokens.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.GramStatsKernel.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramStats =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "gram_stats"
}

object GramStats {
  val outType: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("distinct_grams", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
}

object GramStatsKernel {
  /** One pass, one hash map keyed by the space-joined gram (tokens come
    * from a whitespace split, so the join is collision-free). Null
    * elements count as empty strings.
    */
  def compute(tokens: ArrayData, n: Int): InternalRow = {
    val num = tokens.numElements()
    val total = num - n + 1
    if (n <= 0 || total <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Array[Long]](total * 2)
    var top = 0L
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (!tokens.isNullAt(i + j)) sb.append(tokens.getUTF8String(i + j))
        j += 1
      }
      var c = counts.get(sb.toString)
      if (c == null) { c = Array(0L); counts.put(sb.toString, c) }
      c(0) += 1L
      if (c(0) > top) top = c(0)
      i += 1
    }
    new GenericInternalRow(Array[Any](total.toLong, counts.size.toLong, top))
  }
}
