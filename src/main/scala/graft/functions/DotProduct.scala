package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two numeric-array columns (float or
  * double elements; double accumulation either way).
  *
  * Companion to [[CosineSimilarity]]: when vectors are pre-normalized once
  * per row (O(n) work), pairwise similarity drops from 3 accumulators to
  * this single fused loop — the O(n²) hot path of the brute-force
  * similarity baselines does a third of the flops.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  /** File sources force containsNull=true (schema.asNullable), so null
    * elements are handled, not rejected: a null element propagates a NULL
    * result instead of silently reading an undefined value. The check is
    * emitted only when the static type admits nulls. */
  private def anyContainsNull: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  override def nullable: Boolean =
    left.nullable || right.nullable || anyContainsNull

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (anyContainsNull && (va.isNullAt(i) || vb.isNullAt(i))) return null
      val x = if (lf) va.getFloat(i).toDouble else va.getDouble(i)
      val y = if (rf) vb.getFloat(i).toDouble else vb.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val nullCheck =
        if (anyContainsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $dot += ($getA) * ($getB);
         |}
         |if (!${if (anyContainsNull) ev.isNull else "false"}) { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotProduct].getName, "dot_product")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "dot_product expects exactly 2 arguments")
    DotProduct(args.head, args(1))
  }
}
