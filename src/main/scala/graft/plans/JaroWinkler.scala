package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity (the record-linkage field matcher
  * Spark lacks; `levenshtein` is built in, JW is not). Standard
  * definition: Jaro from windowed matches + half-transpositions, then
  * the Winkler prefix boost (≤ 4 chars, weight 0.1) applied only when
  * jaro > 0.7 — verified against DuckDB's `jaro_winkler_similarity`
  * (RapidFuzz semantics) on transposition / window / empty / boost-
  * threshold edge cases, so oracles can replay it exactly.
  *
  * Why a custom Expression (SURVEY.md §7.3 revisit clause): a Scala UDF
  * would serialize both UTF8Strings into java Strings through the UDF
  * boundary per row and fall out of whole-stage codegen; this stays
  * inside the generated plan as one static call on the raw operands.
  * The O(l1·l2)-bounded scratch arrays live in [[JaroWinkler.compute]]
  * rather than inline codegen — the call is still codegen'd, only the
  * kernel is shared between interpreted and generated paths (same
  * single-source trick as the compiled dedup kernels).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {

  /** Shared kernel for interpreted eval and generated code. Compares
    * Unicode CODEPOINTS, not UTF-16 code units — DuckDB's
    * `jaro_winkler_similarity` is codepoint-based, and comparing code
    * units would let surrogate halves of supplementary-plane characters
    * match independently (and skew lengths/windows).
    */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString.codePoints().toArray
    val s2 = b.toString.codePoints().toArray
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0

    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    var t = 0 // full transposition count; halved in the formula
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro =
      (m.toDouble / l1 + m.toDouble / l2 + (m - t / 2.0) / m) / 3.0

    var p = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (p < pMax && s1(p) == s2(p)) p += 1
    if (jaro > 0.7) jaro + 0.1 * p * (1.0 - jaro) else jaro
  }
}
