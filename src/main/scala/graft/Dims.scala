package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeRow}
import org.apache.spark.sql.execution.graft.LocalDimBridge
import org.apache.spark.sql.internal.SQLConf

/** Construction-time materialization of PROVEN-small dimension arms.
  *
  * The declared join queries broadcast their dimension sides; physically a
  * `broadcast(dimDf)` costs one Spark JOB per action (the broadcast-build
  * scan+collect), which at bench scale is pure scheduling constant — the
  * NOTES_r10 floor table attributes ~50–70 ms per build job against
  * 10–20 ms of actual execution. A prepared-plan engine evaluates the dim
  * arm ONCE at plan time and ships the rows with the plan; this helper is
  * that step, with the exact same safety gate the broadcast decision
  * itself uses:
  *
  *  1. If Catalyst plan stats prove the arm under
  *     `spark.sql.autoBroadcastJoinThreshold`, collect it (zero extra
  *     jobs beyond the one bounded collect — same memory contract as the
  *     broadcast-join build it replaces, which would have collected the
  *     identical rows to the driver anyway).
  *  2. Otherwise run ONE measured count (stats on filtered/derived frames
  *     are selectivity-blind); under the byte gate → collect, over it →
  *     `None` and the caller keeps its shuffle arm. At 100 TB the gate
  *     says no and the per-action distributed plan stands unchanged.
  *
  * Both outcomes are MEMOIZED per (sfDir, tag): the second construction of
  * the same query in a session runs zero jobs (VERDICT r10 item 2 — at
  * sf100 the q3 gate count alone was 4.6 s per construction). The memo
  * holds collected Rows, not DataFrames, so it is session-agnostic; a
  * testdata regeneration mid-JVM is the same non-event it is for the
  * primed columnar cache (nothing re-reads sources mid-session).
  */
object Dims {

  private case class Small(rows: Array[UnsafeRow], attrs: Seq[Attribute])
  private case object TooBig

  /** Lazy memo cell: computeIfAbsent only ALLOCATES the holder (cheap, no
    * Spark work under the map's bin lock — a multi-second gate count
    * inside computeIfAbsent would block unrelated tags hashing to the
    * same bin and throw 'Recursive update' on re-entrant construction);
    * the action evaluates under the holder's own monitor, so concurrent
    * requests for the SAME arm still compute once (code review
    * round-11). */
  private final class Cell(f: () => AnyRef) { lazy val value: AnyRef = f() }
  private val memo = new ConcurrentHashMap[String, Cell]()
  private val counts = new ConcurrentHashMap[String, Cell]()

  /** Test hook: forget all memoized arms (used by specs that need to
    * observe first-construction behavior deterministically). */
  def clear(): Unit = { memo.clear(); counts.clear() }

  /** Materialize `df` as a driver-local relation when gated small.
    *
    * @param tag      memo key — MUST identify the (sfDir, arm) pair
    * @param rowBytes per-row byte width of the projected columns (the same
    *                 sizeInBytes convention the optimizer's gate uses)
    * @return Some(localized twin) under the gate; None over it (caller
    *         keeps its distributed arm)
    */
  def localizeSmall(df: DataFrame, tag: String, rowBytes: Int): Option[DataFrame] = {
    val spark = df.sparkSession
    // The threshold participates in the MEMO KEY: a session that lowers
    // (or disables) autoBroadcastJoinThreshold mid-run re-decides under
    // the new gate instead of serving a decision baked in at first
    // construction (code review round-11).
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    memo.computeIfAbsent(s"$tag@$threshold", _ => new Cell(() => {
      if (threshold <= 0) TooBig
      else {
        val statBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        val maxRows = math.min(threshold / rowBytes, Int.MaxValue - 2L)
        if (statBytes <= BigInt(threshold)) {
          // Stats said small; the cap keeps a lying estimate from
          // materializing an unbounded arm (executeTake early-exits).
          LocalDimBridge.take(df, maxRows)
            .map { case (rows, attrs) => Small(rows, attrs) }
            .getOrElse(TooBig)
        } else if (df.count() <= maxRows) {
          LocalDimBridge.take(df, maxRows)
            .map { case (rows, attrs) => Small(rows, attrs) }
            .getOrElse(TooBig)
        } else TooBig
      }
    })).value match {
      case Small(rows, attrs) => Some(LocalDimBridge.ofRows(spark, attrs, rows))
      case _ => None
    }
  }

  /** Memoized scalar count of a frame — the "CROSS JOIN (SELECT COUNT(*))"
    * pattern evaluated once per (sfDir, tag) at plan time instead of one
    * broadcast-build job per action. At 100 TB this is one footer-stats
    * count per session, amortized over every query that folds it. */
  def memoCount(df: DataFrame, tag: String): Long =
    counts.computeIfAbsent(tag, _ => new Cell(() =>
      java.lang.Long.valueOf(df.count()))).value
      .asInstanceOf[java.lang.Long].longValue()
}
