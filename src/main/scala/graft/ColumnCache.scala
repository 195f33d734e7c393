package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

import graft.plans.PlanStats

/** Bounded columnar projection cache (round 14, VERDICT r13 item 5).
  *
  * The sf100 A/B's three remaining `weak` keys (rollup_agg 2.83×,
  * exact_dedup 2.76×, approx_distinct 2.18× vs DuckDB) are all
  * single-scan aggregations whose gap is the SCAN, not the plan: DuckDB
  * re-reads page-cache-warm fixed-width columns while Spark re-decodes
  * parquet every execution. The production analog is a columnar cache
  * tier over hot narrow projections (what warehouse engines call an IO /
  * buffer cache) — NOT all-or-nothing table pinning, which at 100 TB can
  * never hold a fact table but can easily hold the 3–4 hot columns a
  * dashboard agg family touches.
  *
  * Semantics:
  *  - `serve(spark, dir, table, cols)` returns the named projection,
  *    row-identical to `Tables.load(...).select(cols)` (spec-pinned).
  *  - Disabled (the default: budget 0) it IS that plain projection —
  *    declared-query behavior is unchanged unless a budget is set via
  *    the `graft.colcache.mb` system property or `SPARK_GRAFT_COLCACHE_MB`.
  *  - Enabled, one entry per (session, dir, table) holds the UNION of all
  *    projections requested so far, persisted MEMORY_AND_DISK in Spark's
  *    compressed in-memory columnar format; admission is gated on the
  *    parquet-footer uncompressed byte total of exactly those columns
  *    ([[PlanStats.parquetColumnBytes]] — an upper bound on the cached
  *    footprint, since the columnar cache re-applies dictionary/RLE).
  *    Over-budget requests fall through to the plain scan, never evict:
  *    the hot set is small and stable by construction; an LRU would let
  *    one wide scan churn the working set.
  *  - Widening an entry (a new query needs one more column) re-admits the
  *    union under the same gate and drops the narrower copy.
  *
  * At 100 TB the budget maps to the executor-memory slice a deployment
  * reserves for its IO cache; entries are per-table column slices, so the
  * knob degrades gracefully — whatever fits stays hot, the rest scans.
  */
object ColumnCache {

  private final case class Entry(spark: SparkSession, cols: Seq[String],
      df: DataFrame, bytes: BigInt)

  /** (dir, table) → cached union projection. An entry is only served to
    * the SparkSession that admitted it (reference equality — a cached DF
    * is bound to its session); another session's request replaces it. */
  private val entries = new ConcurrentHashMap[(String, String), Entry]()
  private var usedBytes: BigInt = BigInt(0)
  private val lock = new Object

  /** Budget in bytes; 0 disables. Precedence: the byte-granular
    * `graft.colcache.bytes` system property (spec control — the shipped
    * sf fixtures are KB-sized, below MB granularity), then the
    * `graft.colcache.mb` property, then `SPARK_GRAFT_COLCACHE_MB`. */
  def budgetBytes: Long =
    sys.props.get("graft.colcache.bytes")
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .getOrElse(
        sys.props.get("graft.colcache.mb")
          .orElse(sys.env.get("SPARK_GRAFT_COLCACHE_MB"))
          .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
          .map(_ << 20).getOrElse(0L))

  /** The `cols` projection of `dir`/`table`, served from the bounded
    * columnar cache when enabled and admitted; the plain pruned parquet
    * scan otherwise. Row-identical either way. */
  def serve(spark: SparkSession, dir: String, table: String,
      cols: Seq[String]): DataFrame = {
    def plain(c: Seq[String]) =
      Tables.load(spark, dir, table).select(c.map(col): _*)
    val budget = budgetBytes
    if (budget <= 0L) return plain(cols)
    val key = (dir, table)
    lock.synchronized {
      val existing = Option(entries.get(key)).filter(_.spark eq spark)
      existing match {
        case Some(e) if cols.forall(e.cols.contains) =>
          e.df.select(cols.map(col): _*)
        case other =>
          // A same-key entry owned by a DIFFERENT (e.g. stopped) session
          // is replaced, and its bytes released, as part of re-admission.
          val stale = Option(entries.get(key)).filterNot(_.spark eq spark)
          val unionCols =
            other.map(_.cols).getOrElse(Seq.empty) ++
              cols.filterNot(other.map(_.cols).getOrElse(Seq.empty).contains)
          val est = PlanStats.parquetColumnBytes(plain(unionCols), unionCols)
            .getOrElse(PlanStats.estRawBytes(plain(unionCols)))
          val released = (other.toSeq ++ stale.toSeq).map(_.bytes).sum
          if (usedBytes - released + est > BigInt(budget)) plain(cols)
          else {
            (other.toSeq ++ stale.toSeq).foreach(e =>
              try e.df.unpersist(blocking = false)
              catch { case scala.util.control.NonFatal(_) => () })
            val cached = plain(unionCols).persist(StorageLevel.MEMORY_AND_DISK)
            entries.put(key, Entry(spark, unionCols, cached, est))
            usedBytes = usedBytes - released + est
            cached.select(cols.map(col): _*)
          }
      }
    }
  }

  /** Unpersist and forget everything (tests; a corpus regeneration). */
  def clear(): Unit = lock.synchronized {
    entries.values.forEach(e =>
      try e.df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () })
    entries.clear()
    usedBytes = BigInt(0)
  }

  /** Admitted bytes (probe/spec introspection). */
  def admittedBytes(spark: SparkSession): BigInt = lock.synchronized {
    usedBytes
  }
}
