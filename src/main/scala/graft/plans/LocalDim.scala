package org.apache.spark.sql.execution.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** Plan-time-materialized dimension arm (graft.Dims.localizeSmall).
  *
  * Why not LocalRelation: `BroadcastExchangeExec` builds its hash relation
  * via `child.executeCollectIterator()`, which `LocalTableScanExec` does
  * NOT override — so broadcasting driver-held rows still launches a
  * parallelize job (32 tasks at local[32]) purely to collect back what the
  * driver already holds. At bench scale that job is the dominant cost of
  * the whole query (~50–70 ms of scheduling for ~0 work); at cluster scale
  * it is a pointless round-trip. [[LocalDimScanExec]] overrides the
  * collect-shaped paths to serve the driver-held rows directly — a
  * broadcast build over it runs ZERO jobs — while `doExecute` still
  * parallelizes (1 slice) for any non-collect consumer.
  *
  * Lives under org.apache.spark because `executeCollectIterator` is
  * private[spark]; contains only graft code (SqlBridge precedent).
  */
case class LocalDimRelation(output: Seq[Attribute], rows: Array[UnsafeRow])
    extends LeafNode with MultiInstanceRelation {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes =
      math.max(1L, rows.iterator.map(_.getSizeInBytes.toLong).sum))
  override def newInstance(): LocalDimRelation =
    copy(output = output.map(_.newInstance()))
  override def stringArgs: Iterator[Any] =
    Iterator(output, s"[${rows.length} rows]")
}

case class LocalDimScanExec(output: Seq[Attribute], rows: Array[UnsafeRow])
    extends LeafExecNode {
  // Every collect-shaped path returns COPIES: the backing array is
  // memoized for the JVM lifetime (graft.Dims), so a consumer that
  // mutates or retains-and-rewrites a returned row would corrupt every
  // later plan built from the same memoized arm (advice round-12).
  // UnsafeRow.copy is a bounded byte-array clone and the arm is under the
  // broadcast byte gate by construction, so the per-action cost is at
  // most a few MB of driver memcpy — still zero jobs.
  override def executeCollect(): Array[InternalRow] =
    rows.map(_.copy(): InternalRow)
  override def executeCollectIterator(): (Long, Iterator[InternalRow]) =
    (rows.length.toLong, rows.iterator.map(_.copy(): InternalRow))
  override def executeTake(n: Int): Array[InternalRow] =
    rows.take(n).map(_.copy(): InternalRow)
  override def executeTail(n: Int): Array[InternalRow] =
    rows.takeRight(n).map(_.copy(): InternalRow)
  protected override def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rows.toIndexedSeq, numSlices = 1)
      .map(_.asInstanceOf[InternalRow])
  override def stringArgs: Iterator[Any] =
    Iterator(output, s"[${rows.length} rows]")
}

/** Planner strategy for [[LocalDimRelation]] (GraftExtensions). */
object LocalDimStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalDimRelation(out, rows) => LocalDimScanExec(out, rows) :: Nil
    case _ => Nil
  }
}

/** private[spark]-access helpers for graft.Dims (executeTake and
  * Dataset.ofRows are package-private). */
object LocalDimBridge {
  import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
  import org.apache.spark.sql.catalyst.expressions.UnsafeProjection

  /** Collect up to `maxRows` rows of `df` as UnsafeRows (driver-side,
    * bounded); None when the frame exceeds the cap. */
  def take(df: DataFrame, maxRows: Long): Option[(Array[UnsafeRow], Seq[Attribute])] = {
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
    val cap = math.min(maxRows + 1, Int.MaxValue - 1L).toInt
    val taken = qe.executedPlan.executeTake(cap)
    if (taken.length > maxRows) None
    else {
      val toUnsafe =
        UnsafeProjection.create(qe.analyzed.output.map(_.dataType).toArray)
      val rows = taken.map {
        case u: UnsafeRow => u
        case r => toUnsafe(r).copy()
      }
      Some((rows, qe.analyzed.output))
    }
  }

  /** Wrap driver-held rows as a [[LocalDimRelation]] DataFrame (fresh
    * expression ids per call, so one memoized arm can appear in many
    * plans). */
  def ofRows(session: SparkSession, attrs: Seq[Attribute],
      rows: Array[UnsafeRow]): DataFrame =
    GraftSqlBridge.ofRows(session,
      LocalDimRelation(attrs.map(_.newInstance()), rows))
}
