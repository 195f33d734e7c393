package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash over a string's character stream —
  * semantically identical to the HOF fold
  * {{{
  *   aggregate(split(text, ''), 0L,
  *     (h, c) -> pmod(h * 31L + ascii(c), 2147483647L))
  * }}}
  * i.e. h = (h*31 + codepoint) mod (2^31 - 1), folded left over each
  * character (Spark's `split(text, '')` yields one code point per element
  * and `ascii` returns the code point of the first character).
  *
  * Why (same escalation as [[SimHash64]]): HOFs are `CodegenFallback` — the
  * per-character fold runs interpreted (a Lambda call + pmod + ascii
  * per character), ~125M evals for the sf0.1 corpus. This expression is a
  * primitive loop inside whole-stage codegen.
  *
  * Empty string hashes to 0, matching the HOF form: `split('', '')` is
  * `['']` and `ascii('')` is 0, so the fold yields pmod(0*31+0, m) = 0.
  */
case class RollingHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash31 expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash31"

  override protected def nullSafeEval(s: Any): Any =
    RollingHash31.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash31.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash31 =
    copy(child = newChild)
}

object RollingHash31 {
  private final val Mod = 2147483647L // 2^31 - 1

  /** Left fold h = (h*31 + codepoint) mod (2^31-1); called from both eval
    * and generated code. Iterates Unicode code points of the string. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingHash31].getName, "rolling_hash31")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "rolling_hash31 expects exactly 1 argument")
    RollingHash31(args.head)
  }
}
