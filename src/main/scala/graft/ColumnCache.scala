package graft

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

  /** (dir, table) → the SERVING union projection, plus superseded
    * entries retained until clear(). All state is guarded by `lock` —
    * plain maps, no lock-free path (the invariant is that `entries`,
    * `retired` and `usedBytes` mutate together).
    *
    * Superseded-but-live entries are RETAINED, not unpersisted (code
    * review round-14): a DataFrame handed out by an earlier serve()
    * embeds its InMemoryRelation, and Spark re-persists an unpersisted
    * cached plan on its next execution — an untracked copy the budget
    * would never see. Retiring keeps the copy alive AND accounted; the
    * overlap is bounded by the budget like everything else. An entry is
    * only served to the SparkSession that admitted it (reference
    * equality — a cached DF is bound to its session); entries of
    * STOPPED sessions are purged (their cache died with the session). */
  private val entries =
    scala.collection.mutable.Map.empty[(String, String), Entry]
  private val retired = scala.collection.mutable.ArrayBuffer.empty[Entry]
  private var usedBytes: BigInt = BigInt(0)
  private val lock = new Object

  /** Drop entries whose owning session has stopped — their cached blocks
    * are gone, so their bytes must not keep debiting the budget (code
    * review round-14: a dead session's entry under another key
    * permanently starved later admissions). Call under `lock`. */
  private def purgeStopped(): Unit = {
    def dead(e: Entry) =
      try e.spark.sparkContext.isStopped
      catch { case scala.util.control.NonFatal(_) => true }
    entries.toSeq.foreach { case (k, e) =>
      if (dead(e)) { entries.remove(k); usedBytes -= e.bytes }
    }
    val deadRetired = retired.filter(dead)
    retired --= deadRetired
    deadRetired.foreach(e => usedBytes -= e.bytes)
  }

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
    // Fast path: the serving entry already covers the projection.
    lock.synchronized {
      purgeStopped()
      entries.get(key).filter(_.spark eq spark) match {
        case Some(e) if cols.forall(e.cols.contains) =>
          return e.df.select(cols.map(col): _*)
        case _ => ()
      }
    }
    // Admission estimate OUTSIDE the lock (code review round-14: footer
    // metadata I/O for up to 512 files must not serialize unrelated
    // tables' serves), on a single DataFrame. The union is computed
    // against a snapshot of the serving entry; re-validated under the
    // lock before committing.
    val snapshot = lock.synchronized {
      entries.get(key).filter(_.spark eq spark).map(_.cols)
    }.getOrElse(Seq.empty)
    val unionCols = snapshot ++ cols.filterNot(snapshot.contains)
    val unionPlain = plain(unionCols)
    val est = PlanStats.parquetColumnBytes(unionPlain, unionCols)
      .getOrElse(PlanStats.estRawBytes(unionPlain))
    lock.synchronized {
      purgeStopped()
      val current = entries.get(key).filter(_.spark eq spark)
      current match {
        case Some(e) if cols.forall(e.cols.contains) =>
          // Raced another widening that already covers us.
          e.df.select(cols.map(col): _*)
        case other if other.map(_.cols) == (
            if (snapshot.isEmpty) None else Some(snapshot)) =>
          if (usedBytes + est > BigInt(budget)) plain(cols)
          else {
            // Supersede, never unpersist: DFs already handed out keep
            // their live, accounted cache (see `retired`). Retire
            // whatever actually occupies the key — including another
            // LIVE session's entry (ADVICE round-14 medium: a plain
            // put would orphan it outside `entries`/`retired`, its
            // bytes debiting the budget forever and its persisted plan
            // escaping clear()'s unpersist).
            entries.remove(key).foreach(retired += _)
            val cached = unionPlain.persist(StorageLevel.MEMORY_AND_DISK)
            entries.put(key, Entry(spark, unionCols, cached, est))
            usedBytes += est
            cached.select(cols.map(col): _*)
          }
        case _ =>
          // The entry changed while estimating (another thread widened
          // to a different union) — serve plain rather than admit a
          // stale-union copy; the next call re-tries against the new
          // serving entry.
          plain(cols)
      }
    }
  }

  /** Unpersist and forget everything (tests; a corpus regeneration).
    * Also drops PlanStats' footer caches: the documented clear()
    * scenario is an in-place corpus regeneration, after which stale
    * per-file byte totals would corrupt admission estimates for any
    * reused path (ADVICE round-14 low). */
  def clear(): Unit = lock.synchronized {
    (entries.values ++ retired).foreach(e =>
      try e.df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () })
    entries.clear()
    retired.clear()
    usedBytes = BigInt(0)
    PlanStats.clearFooterCaches()
  }

  /** Bytes charged against the budget for THIS session's serving +
    * retired copies (probe/spec introspection; stopped sessions purge
    * on the next serve). Per-session to match serve()'s per-session
    * semantics — the global budget is internal. */
  def admittedBytes(spark: SparkSession): BigInt = lock.synchronized {
    (entries.values ++ retired).filter(_.spark eq spark)
      .map(_.bytes).sum
  }
}
