package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen cosine similarity over two float-vector columns.
  *
  * Why a custom Catalyst Expression (SURVEY §4.3 escalation path): the
  * composable form — `aggregate(zip_with(a,b,…))` — is a CodegenFallback
  * chain that allocates intermediate arrays and boxes every element; on the
  * sf0.1 brute-force pair join (2M pairs × 64 dims) it measured ~42 s.
  * This expression generates a single fused primitive loop (no
  * allocations), stays inside whole-stage codegen, and computes the same
  * sequential double fold the DuckDB oracle uses (bit-compatible within the
  * declared round-6 tolerance).
  *
  * Registered as SQL function `cosine_sim` via GraftExtensions; use
  * `functions.call_function("cosine_sim", a, b)` from the DataFrame API.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  /** File sources force containsNull=true (schema.asNullable), so null
    * elements must be handled, not rejected: a null element propagates a
    * NULL result instead of silently reading an undefined value. The check
    * is emitted only when the static type admits nulls, and on clean data
    * the branch always predicts false — measured-free in the hot loop. */
  private def anyContainsNull: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  override def nullable: Boolean =
    left.nullable || right.nullable || anyContainsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (anyContainsNull && (va.isNullAt(i) || vb.isNullAt(i))) return null
      val x = va.getFloat(i).toDouble
      val y = vb.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // Zero-norm guard: 0/0 would be NaN, which Spark sorts ABOVE all doubles
    // — a zero vector would silently float to the top of every similarity
    // ranking. A zero vector has no direction; similarity 0.0 keeps the
    // expression non-nullable and sorts it to the bottom.
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      // Emitted only when the static type admits null elements (see
      // anyContainsNull scaladoc); ev.isNull exists because nullable=true.
      val nullCheck =
        if (anyContainsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if (!${if (anyContainsNull) ev.isNull else "false"}) {
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |    : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "cosine_sim")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "cosine_sim expects exactly 2 arguments")
    CosineSimilarity(args.head, args(1))
  }
}
