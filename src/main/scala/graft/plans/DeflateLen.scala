package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(text)`: size in bytes of the raw-DEFLATE compression of
  * the text's UTF-8 bytes — the kernel behind the Gopher/RefinedWeb-
  * standard compression-ratio repetition filter (Rae et al. 2021 §A1.1;
  * public literature): boilerplate and template spam compress far below
  * natural prose, complementing the exact n-gram signals of
  * `gram_stats` (which see only SHORT-range repetition; deflate's 32 KiB
  * window catches long-range copies an n-gram pass misses).
  *
  * Determinism: fixed level 6, default strategy, `nowrap = true` (raw
  * stream — no zlib header/checksum), no preset dictionary. Output is a
  * pure function of the input bytes for a given zlib build; the JDK
  * bundles its own zlib, so values are stable across runs and across
  * executors of one deployment. They are NOT a cross-engine contract
  * (another zlib build may emit a different but equally valid stream),
  * which is why the operator is spec-adjudicated (golden fixtures +
  * invariants) rather than DuckDB-oracled — the SIGNAL (ratio ordering
  * repetitive ≪ natural ≪ incompressible) is what downstream filters
  * consume, and that is build-independent.
  *
  * Why a custom Expression (SURVEY.md §7.3 revisit clause): a Scala UDF
  * would copy the UTF8String into a java String per row and fall out of
  * whole-stage codegen; this stays inside the generated plan as one
  * static call. The Deflater is thread-local (reset per call, never
  * re-allocated): Deflater construction takes a native zlib allocation
  * that would otherwise dominate the per-row cost.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    DeflateLen.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.DeflateLen.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)

  override def prettyName: String = "deflate_len"
}

object DeflateLen {

  /** One Deflater + scratch buffer per executor thread. The scratch is
    * only a drain target (we keep the running LENGTH, never the bytes),
    * so 8 KiB bounds memory regardless of document size.
    */
  private val local = new ThreadLocal[(Deflater, Array[Byte])] {
    override def initialValue(): (Deflater, Array[Byte]) =
      (new Deflater(6, /* nowrap = */ true), new Array[Byte](8192))
  }

  def compute(u: UTF8String): Int = {
    val bytes = u.getBytes
    val (d, buf) = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    // deflate of a  2 GiB-bounded UTF8String can't overflow int (worst
    // case ≈ input + 5 bytes/16 KiB block), but keep the sum wide and
    // clamp defensively
    math.min(total, Int.MaxValue).toInt
  }
}
