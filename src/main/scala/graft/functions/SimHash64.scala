package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array — semantically identical to the
  * HOF formulation
  * {{{
  *   bitSums[i] = aggregate(tokens, 0L, (acc, t) ->
  *     acc + IF(((xxhash64(t) >> i) & 1) = 1, 1, -1));  // i in 0..63
  *   simhash    = OR over i of IF(bitSums[i] > 0, 1L << i, 0)
  * }}}
  * but one pass instead of 64: each token is hashed ONCE with Spark's
  * `xxhash64` (XxHash64Function, seed 42 — bit-identical results to the
  * SQL function) and all 64 sign-counters update in a tight loop.
  *
  * Why (same escalation ladder as [[CosineSimilarity]]): Spark's
  * higher-order functions are `CodegenFallback` — interpreted per element,
  * per lambda call — and the `transform(sequence(0,63), i -> aggregate(...))`
  * shape re-hashes every token 64 times. Measured at sf0.1 (50k docs) the
  * HOF fingerprint was a >10-minute single-thread stage; this expression is
  * a sub-second scan.
  *
  * Null array → null (UnaryExpression default); null ELEMENT hashes to the
  * seed (42), matching Spark's `xxhash64(NULL)` = seed behavior inside the
  * HOF aggregate.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(tokens: Any): Any =
    SimHash64.hash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private final val Seed = 42L // Spark's xxhash64 default seed

  /** One-pass sign-sum SimHash; called from both eval and generated code. */
  def hash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val h =
        if (tokens.isNullAt(t)) Seed
        else XxHash64Function.hash(
          tokens.getUTF8String(t), org.apache.spark.sql.types.StringType, Seed)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, "simhash64")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "simhash64 expects exactly 1 argument")
    SimHash64(args.head)
  }
}
