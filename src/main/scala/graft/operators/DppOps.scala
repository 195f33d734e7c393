package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Parity, Q, Tables}

/** Dynamic partition pruning — wave 33.
  *
  * At 100 TB the fact table is partitioned (by day, by source, by type)
  * and the single most valuable scan optimization is not reading the
  * partitions a dim-side filter already excludes — when the filter value
  * arrives only at RUNTIME through a join, that is Spark's
  * `DynamicPartitionPruning`: the dim side's build is reused as an IN
  * subquery on the fact's PARTITION COLUMN, and whole directories are
  * skipped before any row is read.
  *
  * The corpus ships unpartitioned single files, so the declared query
  * reads the fingerprint-guarded (event_date, event_type) hive-partitioned
  * Tables layout copy ([[graft.Tables.ensurePartitionedEvents]] — the same
  * warehouse layout `scan_date_pruned` reads; round-11 replaced the old
  * per-query /tmp fixture), then runs the canonical DPP shape: fact ⋈ dim
  * on the partition column with the selective filter on the DIM ONLY.
  * DppSpec asserts the fact scan carries `dynamicpruning` and that only
  * the joined partitions' files are read; the oracle replays the
  * semantics from the original table.
  */
object DppOps {
  private val laidOut =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Events served from the Tables layout rung — the fingerprint-guarded
    * (event_date, event_type) hive-partitioned copy (round-11: this used
    * to be a per-query /tmp fixture partitioned by type only; the loader
    * copy is the real warehouse layout shared with scan_date_pruned).
    * event_date is dropped here so the DPP join's output schema is
    * unchanged — the scan still prunes on event_type, which remains a
    * partition column at the second directory level. */
  private[graft] def partitionedEvents(s: SparkSession, dir: String)
      : DataFrame =
    Tables.ensurePartitionedEvents(s, dir).drop("event_date")

  /** The dim: event_type → category, engagement = the 2-of-5 selective
    * arm. Fixture-known domain (FIXTURES.md). Written to parquet and read
    * back rather than kept as a literal: the optimizer constant-folds a
    * filter INTO a LocalRelation, and PartitionPruning requires a live
    * selective Filter over a scan on the dim side to justify the pruning
    * subquery — the same reason a production dim is a table, not VALUES. */
  private def typeDim(s: SparkSession): DataFrame = {
    import s.implicits._
    val base = "/tmp/graft_dpp_typedim"
    if (laidOut.add(base)) {
      Seq(("view", "engagement"), ("click", "engagement"),
        ("purchase", "conversion"), ("signup", "conversion"),
        ("error", "ops"))
        .toDF("event_type", "category")
        .coalesce(1).write.mode("overwrite").parquet(base)
    }
    s.read.parquet(base)
  }

  private[graft] def dppJoin(s: SparkSession, dir: String): DataFrame =
    partitionedEvents(s, dir)
      .join(broadcast(typeDim(s).filter(col("category") === "engagement")),
        Seq("event_type"))

  val joinPartitionPruned = Q(
    "join_partition_pruned",
    s"""SELECT event_type,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
       |    AS sum_value
       |FROM events WHERE event_type IN ('view', 'click')
       |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    dppJoin(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Parity.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** STATIC partition pruning over the same layout copy: a foldable date
    * range on the partition column reaches the scan as PartitionFilters,
    * so whole day directories outside [2024-01-10, 2024-01-16] are never
    * listed into the scan (FIXTURES: ts spans 2024-01-01..30 at every
    * sf). At 100 TB this is the default shape of every dashboard query —
    * the 7-day window reads 7/30ths of the partitions at any corpus
    * size. PlanSpec pins the PartitionFilters; the oracle replays the
    * semantics from the raw table. */
  val scanDatePruned = Q(
    "scan_date_pruned",
    s"""SELECT CAST(ts AS DATE) AS event_date,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
       |    AS sum_value
       |FROM events
       |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-16'
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.ensurePartitionedEvents(s, dir)
      .filter(col("event_date").between(
        lit("2024-01-10").cast("date"), lit("2024-01-16").cast("date")))
      .groupBy("event_date")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Parity.dsum(col("value")).as("sum_value"))
      .orderBy("event_date")
  }

  val all: Seq[Q] = Seq(joinPartitionPruned, scanDatePruned)
}
