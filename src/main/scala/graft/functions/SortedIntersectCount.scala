package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native merge-scan intersection COUNT over two SORTED, DISTINCT string
  * arrays — `size(array_intersect(a, b))` for pre-sorted inputs.
  *
  * Why (same escalation as [[CosineSimilarity]]): `array_intersect` builds
  * a hash set PER ROW; inside the O(n²) near-dup pair joins that is a
  * per-pair allocation + hashing of ~1000 shingles — measured as the
  * dominant cost of the sf0.1 verify (hundreds of CPU-seconds per pass,
  * interpreted eval inside the BroadcastNestedLoopJoin condition). Sorting
  * each document's shingle array ONCE upstream (O(n log n) per doc) turns
  * every pairwise intersection into an allocation-free O(n+m) merge scan.
  *
  * PRECONDITION: both inputs sorted ascending (UTF8String binary order —
  * what Spark's `array_sort` produces for strings) and duplicate-free
  * (what `array_distinct` produces). The Jaccard pipelines guarantee both.
  *
  * Null elements: sorted arrays place nulls per array_sort (nulls LAST for
  * Spark's array_sort); a null element never matches (SQL equality), so
  * the merge stops early when either side reaches its null tail.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case ArrayType(LongType, _) => true
      case _ => false
    }) && left.dataType.simpleString == right.dataType.simpleString
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two array<string> or two array<long> " +
        s"arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      SortedIntersectCount.countLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "countLong" else "count"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.$fn($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Merge-scan count of common elements of two sorted distinct string
    * arrays; called from both eval and generated code. */
  def count(va: ArrayData, vb: ArrayData): Int = {
    val n = va.numElements()
    val m = vb.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (va.isNullAt(i) || vb.isNullAt(j)) return c // null tail: no matches
      val x = va.getUTF8String(i)
      val y = vb.getUTF8String(j)
      // binaryCompare, NEVER compareTo: Spark 4's compareTo re-reads the
      // SPARK_TESTING env var on EVERY call (System.getenv — a
      // synchronized map + ASCII encode) and throws under test
      // environments. On the sfx100 dedup-verify cartesian this single
      // call turned a minutes-pass into a 32-thread getenv contention
      // stall (jstack round-11); identical ordering semantics —
      // compareTo itself just delegates to binaryCompare.
      val cmp = x.binaryCompare(y)
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Long variant (round 5): the minhash VERIFY path re-joins shingle
    * payloads per candidate pair, and at clone-clique density that shuffle
    * is pairs × payload bytes — hashing each shingle to 8 bytes upstream
    * cut the 100× verify-join shuffle ~2.5× and replaces per-element
    * UTF8String compares with long compares. containsNull=false upstream,
    * so no null tail. */
  def countLong(va: ArrayData, vb: ArrayData): Int = {
    val n = va.numElements()
    val m = vb.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = va.getLong(i)
      val y = vb.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedIntersectCount].getName, "sorted_intersect_count")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "sorted_intersect_count expects exactly 2 arguments")
    SortedIntersectCount(args.head, args(1))
  }
}
