package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Jaccard similarity over two LEXICOGRAPHICALLY SORTED string
  * arrays (the near-dup verification kernel): one merge walk counts the
  * intersection, then |A∩B| / (|A| + |B| − |A∩B|).
  *
  * Why a custom Expression (SURVEY.md §7.3 revisit clause): the
  * alternative is a Scala UDF (opaque to codegen, boxes every element
  * into a Seq) or array_intersect (builds a hash set per row). The
  * merge walk is allocation-free and codegen'd inline.
  *
  * PRECONDITION: both arrays sorted ascending in UTF-8 BYTE order
  * (UTF8String.compareTo — Dedup sorts with the matching
  * [[graft.ext.Dedup.utf8Order]]; Java's String order differs for
  * supplementary-plane characters). Unsorted input yields an
  * undercount, never an error. Null elements never match but count
  * toward the union size.
  */
case class ArrJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arr_jaccard expects array<string> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var ix = 0
    while (i < nx && j < ny) {
      val xv = x.getUTF8String(i)
      val yv = y.getUTF8String(j)
      if (xv == null) i += 1
      else if (yv == null) j += 1
      else {
        val c = xv.compareTo(yv)
        if (c == 0) { ix += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    val union = nx + ny - ix
    if (union == 0) 0.0 else ix.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ix = ctx.freshName("ix")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $ix = 0;
         |while ($i < $nx && $j < $ny) {
         |  UTF8String $xv = $a.getUTF8String($i);
         |  UTF8String $yv = $b.getUTF8String($j);
         |  if ($xv == null) { $i++; }
         |  else if ($yv == null) { $j++; }
         |  else {
         |    int $c = $xv.compareTo($yv);
         |    if ($c == 0) { $ix++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |}
         |int $union = $nx + $ny - $ix;
         |${ev.value} = $union == 0 ? 0.0 : ((double) $ix) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "arr_jaccard"
}
