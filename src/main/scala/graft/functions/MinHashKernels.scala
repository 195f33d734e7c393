package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass MinHash signature over a shingle array — semantically
  * BIT-IDENTICAL to the HOF formulation used through round 5 session 3:
  * {{{
  *   sig[i] = array_min(transform(sh, x -> xxhash64(x, i)))   // i in 0..k-1
  * }}}
  * Spark's `xxhash64(x, i)` folds its arguments: seed 42 → hash the string
  * → hash the int lane index. This expression computes the string hash
  * ONCE per element and updates all k lane minimums in a tight loop —
  * k array allocations and k interpreted lambda walks collapse into one
  * pass (the [[SimHash64]] escalation-ladder precedent: HOFs are
  * CodegenFallback, per-element per-lambda interpreted; the 1000× corpus
  * measured the 32-lane HOF chain at ~674 s for 5.5 M docs).
  *
  * Null ELEMENT: multi-arg `xxhash64(NULL, i)` leaves the seed untouched
  * by the null argument, so the element's base is the seed 42 — mirrored
  * here. Empty array: the HOF produces an all-NULL signature array
  * (array_min of empty = NULL) — mirrored exactly, though the pipeline's
  * ≥3-token filter makes it unreachable.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "minhash_sig expects (array<string>, foldable int)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(arr: Any, k: Any): Any =
    MinHashSig.compute(arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.MinHashSig.compute($a, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MinHashSig = copy(left = newLeft, right = newRight)
}

object MinHashSig {
  private final val Seed = 42L // Spark's xxhash64 default seed

  /** One-pass k-lane minhash; called from both eval and generated code. */
  def compute(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val base =
        if (sh.isNullAt(t)) Seed
        else XxHash64Function.hash(sh.getUTF8String(t), StringType, Seed)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSig].getName, "minhash_sig")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "minhash_sig expects exactly 2 arguments")
    MinHashSig(args(0), args(1))
  }
}

/** Elementwise `xxhash64` over a string array — bit-identical to
  * `transform(sh, x -> xxhash64(x))` (seed 42; NULL element → 42, the
  * seed, matching single-arg xxhash64(NULL)) without the interpreted
  * lambda walk. Feeds the stored hashed-shingle verify payloads. */
case class XxHash64Map(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"xxhash64_map expects array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xxhash64_map"

  override protected def nullSafeEval(arr: Any): Any =
    XxHash64Map.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.XxHash64Map.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): XxHash64Map =
    copy(child = newChild)
}

object XxHash64Map {
  private final val Seed = 42L

  def compute(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val out = new Array[Long](n)
    var t = 0
    while (t < n) {
      out(t) =
        if (sh.isNullAt(t)) Seed
        else XxHash64Function.hash(sh.getUTF8String(t), StringType, Seed)
      t += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[XxHash64Map].getName, "xxhash64_map")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "xxhash64_map expects exactly 1 argument")
    XxHash64Map(args.head)
  }
}
