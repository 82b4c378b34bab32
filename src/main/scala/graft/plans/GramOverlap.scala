package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Short-circuiting n-gram membership probe for decontamination:
  * `gram_overlap(tokens, n, evalGrams)` → true iff any word n-gram of
  * `tokens` appears in the literal `evalGrams` array.
  *
  * Why a custom Expression: the composable formulation —
  * `arrays_overlap(ngramArray(tokens, n), lit(evalGrams))` — first
  * materializes every gram of the row (interpreted HOF lambdas), then
  * scans the eval array pairwise: O(docGrams × evalGrams) string
  * comparisons per row, measured 1.7s of the curation pipeline's sf0.1
  * budget with a ~1k-gram eval set. This expression builds ONE hash set
  * from the (foldable) eval array per task and probes each gram as it
  * is assembled, returning on the first hit: O(docGrams) expected work,
  * no intermediate gram array. Same static-kernel codegen technique as
  * [[GramStats]], so it stays inside whole-stage codegen.
  */
case class GramOverlap(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val tokensOk = first.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val gramsOk = third.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!tokensOk)
      TypeCheckResult.TypeCheckFailure(
        s"gram_overlap expects array<string> tokens, got ${first.dataType.simpleString}")
    else if (second.dataType != IntegerType || !second.foldable)
      TypeCheckResult.TypeCheckFailure("gram_overlap expects a literal int n")
    else if (!gramsOk || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "gram_overlap expects a literal array<string> gram set")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val gramSet: java.util.HashSet[String] = {
    val arr = third.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).toString)
      i += 1
    }
    s
  }

  override def nullSafeEval(tokens: Any, n: Any, grams: Any): Any =
    GramOverlapKernel.overlaps(
      tokens.asInstanceOf[ArrayData], n.asInstanceOf[Int], gramSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("gramSet", gramSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (a, b, _) =>
      s"${ev.value} = graft.plans.GramOverlapKernel.overlaps($a, $b, $setRef);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): GramOverlap =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "gram_overlap"
}

object GramOverlapKernel {
  /** Gram assembly identical to [[GramStatsKernel.compute]] (space-
    * joined, null tokens as empty strings); probe-as-you-build with
    * early exit on the first set hit.
    */
  def overlaps(tokens: ArrayData, n: Int,
      set: java.util.HashSet[String]): Boolean = {
    val num = tokens.numElements()
    val total = num - n + 1
    if (n <= 0 || total <= 0 || set.isEmpty) return false
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (!tokens.isNullAt(i + j)) sb.append(tokens.getUTF8String(i + j))
        j += 1
      }
      if (set.contains(sb.toString)) return true
      i += 1
    }
    false
  }
}
