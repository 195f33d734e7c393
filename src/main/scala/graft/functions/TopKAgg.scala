package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Bounded top-k buffer: a k-capped MIN-heap over doubles (root = smallest
  * kept value, evicted first). State is ≤ k doubles regardless of group
  * size — the whole point. */
final class TopKBuf(val k: Int) {
  val heap = new java.util.PriorityQueue[java.lang.Double](math.max(k, 1))
  def add(v: Double): Unit =
    if (heap.size < k) heap.add(v)
    else if (heap.peek() < v) { heap.poll(); heap.add(v) }
  def sortedDesc: Array[Double] = {
    val a = new Array[Double](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { a(i) = it.next(); i += 1 }
    java.util.Arrays.sort(a)
    val out = new Array[Double](a.length)
    var j = 0
    while (j < a.length) { out(j) = a(a.length - 1 - j); j += 1 }
    out
  }
}

/** Native per-group top-k aggregate: `topk_agg(value, k)` → the k largest
  * values, sorted descending, as array<double>.
  *
  * This is the SCALE primitive behind "top-k per group": a
  * TypedImperativeAggregate with a k-bounded heap buffer gives map-side
  * PARTIAL top-k — each partition ships at most k doubles per group into
  * the shuffle — where the window spelling
  * (`row_number over (partition by g order by v desc) <= k`) must shuffle
  * EVERY row to its group's partition before discarding all but k. Same
  * plan shape Spark uses internally for TakeOrderedAndProject, exposed as
  * a grouping aggregate.
  *
  * Deterministic: the result is a sorted value multiset — heap insertion
  * order and partition merge order cannot change it (ties are equal
  * doubles). Nulls are ignored (standard aggregate-input semantics); a
  * group of all-null inputs yields an empty array.
  */
case class TopKAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  // Any foldable int expression works (`2+3` folds after resolution);
  // non-foldable or NULL k is rejected by checkInputDataTypes, not an
  // exception.
  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case _ => 0 // checkInputDataTypes rejects before any buffer is built
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg expects a double value column, got ${child.dataType.simpleString}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "topk_agg: k must be a foldable int expression")
    else if (kExpr.eval() == null || k <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg: k must be a positive non-null int, got ${kExpr.eval()}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    val it = other.heap.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: TopKBuf): Any = new GenericArrayData(buf.sortedDesc)

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val vals = buf.sortedDesc
    val bb = ByteBuffer.allocate(8 + 8 * vals.length)
    bb.putInt(buf.k).putInt(vals.length)
    vals.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TopKAgg].getName, "topk_agg")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "topk_agg expects exactly 2 arguments")
    TopKAgg(args.head, args(1))
  }
}
