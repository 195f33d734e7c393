package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-3 table-maintenance + profiling operators: the mutation-shaped
  * workloads (MERGE upsert, SCD2 history build, time-series gap fill) and
  * the data-profiling summary every warehouse ships.
  *
  * Scale notes: merge/scd2/resample all shuffle once on their natural key
  * (o_orderkey / user_id / event_type) and window within the partition —
  * no keyless window anywhere. The profile is per-column aggregation over
  * a columnar scan: each branch prunes to a single column, and the
  * documented 100 TB variant collapses the union into ONE pass with
  * approx_count_distinct sketches.
  */
object TableOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** MERGE/upsert, SCD-type-1 latest-wins: an updates batch (every 7th
    * order, price bumped by a flat 100.00) merged into the base table; on
    * key collision the update wins. The row_number-over-key pattern is
    * exactly what Delta/Iceberg MERGE compiles to on engines without a
    * native merge: one shuffle on the merge key, no driver round-trips.
    * Declared output = per-status audit of the merged table (counts, exact
    * decimal totals, rows-updated), so the oracle verifies both survivor
    * choice and updated values. */
  val mergeUpsert = Q(
    "merge_upsert",
    """WITH upd AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2))
      |         + CAST(100.00 AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
      |    1 AS _src
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS _src FROM orders),
      |merged AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |    ORDER BY _src DESC) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
      |SELECT o_orderstatus, COUNT(*) AS n_rows,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price,
      |  CAST(SUM(_src) AS BIGINT) AS n_updated
      |FROM merged WHERE rn = 1
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val updates = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice",
        (Parity.dec2(col("o_totalprice")) + Parity.dec2(lit(100.00)))
          .cast("double"))
      .withColumn("_src", lit(1))
    val merged = orders.withColumn("_src", lit(0)).unionByName(updates)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderkey")).orderBy(col("_src").desc)))
      .filter(col("rn") === 1)
    merged.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        Parity.dsum(col("o_totalprice")).as("total_price"),
        sum(col("_src")).cast("long").as("n_updated"))
      .orderBy("o_orderstatus")
  }

  /** SCD-type-2 interval build: collapse each user's event_type runs into
    * validity intervals [valid_from, valid_to) with an is_current flag —
    * the standard dimension-history construction. Two windows over the
    * same (user_id, ts) partitioning: run-boundary detection via lag,
    * interval close via lead — ONE shuffle, the second window reuses the
    * first's sort order. */
  val scd2Intervals = Q(
    "scd2_intervals",
    """WITH chg AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |runs AS (
      |  SELECT user_id, event_type, ts AS valid_from, event_id
      |  FROM chg WHERE prev_type IS NULL OR event_type <> prev_type)
      |SELECT user_id, event_type, valid_from,
      |  LEAD(valid_from) OVER (PARTITION BY user_id
      |    ORDER BY valid_from, event_id) AS valid_to,
      |  (LEAD(valid_from) OVER (PARTITION BY user_id
      |    ORDER BY valid_from, event_id) IS NULL) AS is_current
      |FROM runs ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, dir) =>
    // ts alone is not unique per user: two different-type events at the
    // same instant both open runs, and a tie in the LEAD ordering would
    // make valid_to/is_current engine-arbitrary. event_id rides along as
    // the tiebreak in BOTH windows and the final order (the parity rule:
    // unique frame ordering everywhere).
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byFrom = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTs))
      .filter(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
      .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
        col("event_id"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("user_id", "valid_from", "event_id")
      .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
  }

  /** Time-series resample + gap fill: hourly buckets per event type over
    * each type's own [min, max] hour span — missing hours materialized
    * from a generated spine, then forward-filled (LOCF) from the last
    * observed hour. The spine is sequence()-generated per type (never a
    * driver loop) and the fill is a running window within (event_type) —
    * partition-local at any scale. */
  val timeResampleLocf = Q(
    "time_resample_locf",
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS hour_value
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type, UNNEST(generate_series(MIN(hour_start),
      |    MAX(hour_start), INTERVAL 1 HOUR)) AS hour_start
      |  FROM hourly GROUP BY event_type)
      |SELECT s.event_type, s.hour_start,
      |  COALESCE(h.n, 0) AS n,
      |  (h.hour_start IS NULL) AS is_gap,
      |  LAST_VALUE(h.hour_value IGNORE NULLS) OVER (
      |    PARTITION BY s.event_type ORDER BY s.hour_start
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
      |FROM spine s LEFT JOIN hourly h
      |  ON s.event_type = h.event_type AND s.hour_start = h.hour_start
      |ORDER BY s.event_type, s.hour_start""".stripMargin) { (s, dir) =>
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("hour_value"))
    val spine = hourly.groupBy("event_type")
      .agg(min(col("hour_start")).as("lo"), max(col("hour_start")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
          .as("hour_start"))
    val fillW = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // spine DERIVES from hourly, so the two sides share exprIds; rename
    // BOTH right-side join columns to fresh names and join on plain
    // column references — never `hourly("event_type")`, whose exprId is
    // also reachable from the left (ambiguous-self-join trap).
    val obs = hourly
      .withColumnRenamed("hour_start", "h_start")
      .withColumnRenamed("event_type", "h_type")
    spine.join(obs,
        col("event_type") === col("h_type") &&
          col("hour_start") === col("h_start"), "left_outer")
      .select(col("event_type"), col("hour_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("h_start").isNull.as("is_gap"),
        col("hour_value"))
      .withColumn("locf_value", last(col("hour_value"), ignoreNulls = true)
        .over(fillW))
      .drop("hour_value")
      .orderBy("event_type", "hour_start")
  }

  /** Data profile: per-column null counts, exact distinct counts, and
    * min/max rendered through the cross-engine-stable representations
    * (DECIMAL(18,4) → VARCHAR for doubles, DATE for timestamps). Each
    * UNION branch prunes the columnar scan to a single column; the 100 TB
    * form replaces the exact COUNT(DISTINCT) branches with one pass of
    * approx_count_distinct over all columns at once. */
  val dataProfile = Q(
    "data_profile",
    """SELECT * FROM (
      |  SELECT 'l_orderkey' AS column_name, COUNT(*) AS n_rows,
      |    COUNT(*) - COUNT(l_orderkey) AS n_nulls,
      |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
      |    CAST(MIN(l_orderkey) AS VARCHAR) AS min_repr,
      |    CAST(MAX(l_orderkey) AS VARCHAR) AS max_repr
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
      |    CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
      |    CAST(CAST(MIN(l_quantity) AS DECIMAL(18,4)) AS VARCHAR),
      |    CAST(CAST(MAX(l_quantity) AS DECIMAL(18,4)) AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
      |    CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
      |    CAST(CAST(MIN(l_extendedprice) AS DECIMAL(18,4)) AS VARCHAR),
      |    CAST(CAST(MAX(l_extendedprice) AS DECIMAL(18,4)) AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
      |    CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
      |    MIN(l_returnflag), MAX(l_returnflag)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
      |    CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
      |    CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR),
      |    CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR)
      |  FROM lineitem)
      |ORDER BY column_name""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    def prof(name: String, minR: org.apache.spark.sql.Column,
        maxR: org.apache.spark.sql.Column): DataFrame =
      li.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(name))).as("n_nulls"),
        countDistinct(col(name)).as("n_distinct"),
        minR.as("min_repr"), maxR.as("max_repr"))
        .select(lit(name).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_repr"), col("max_repr"))
    def dec(c: org.apache.spark.sql.Column) =
      c.cast(DecimalType(18, 4)).cast("string")
    prof("l_orderkey", min(col("l_orderkey")).cast("string"),
        max(col("l_orderkey")).cast("string"))
      .unionByName(prof("l_quantity", dec(min(col("l_quantity"))),
        dec(max(col("l_quantity")))))
      .unionByName(prof("l_extendedprice", dec(min(col("l_extendedprice"))),
        dec(max(col("l_extendedprice")))))
      .unionByName(prof("l_returnflag", min(col("l_returnflag")),
        max(col("l_returnflag"))))
      .unionByName(prof("l_shipdate",
        min(col("l_shipdate")).cast("date").cast("string"),
        max(col("l_shipdate")).cast("date").cast("string")))
      .orderBy("column_name")
  }

  /** Mode + median per group, both made deterministic: mode via explicit
    * (count DESC, value ASC) ranking over a pre-aggregated value-count
    * table (engine-native mode() tie-breaks arbitrarily — unusable for
    * parity), median via the interpolated 0.5-percentile both engines
    * share, rounded to 4 decimals. Two shuffles on small reduced sides. */
  val aggModeMedian = Q(
    "agg_mode_median",
    """WITH c AS (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT l_returnflag, l_quantity AS mode_quantity, n AS mode_count,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY n DESC, l_quantity) AS rn
      |  FROM c),
      |med AS (
      |  SELECT l_returnflag, ROUND(MEDIAN(l_quantity), 4) AS median_quantity
      |  FROM lineitem GROUP BY 1)
      |SELECT m.l_returnflag, m.mode_quantity, m.mode_count,
      |  med.median_quantity
      |FROM m JOIN med ON m.l_returnflag = med.l_returnflag
      |WHERE m.rn = 1 ORDER BY m.l_returnflag""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val counts = li.groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("n"))
    val mode = counts
      .withColumn("rn", row_number().over(Window.partitionBy(col("l_returnflag"))
        .orderBy(col("n").desc, col("l_quantity"))))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_quantity"),
        col("n").as("mode_count"))
    val med = li.groupBy("l_returnflag")
      .agg(round(median(col("l_quantity")), 4).as("median_quantity"))
    mode.join(med, "l_returnflag")
      .select(col("l_returnflag"), col("mode_quantity"), col("mode_count"),
        col("median_quantity"))
      .orderBy("l_returnflag")
  }

  /** Snapshot-diff change-data-capture: given two table snapshots, emit
    * the I/U/D changelog that replays A into B — the feed a downstream
    * incremental consumer (or a CDC sink) ingests. Snapshot B is derived
    * deterministically from A: every 11th key's price bumped 50.00 (U),
    * every 13th key dropped (D), every 17th key cloned beyond the key
    * range (I).
    *
    * Scale: one full-outer sort-merge join on the snapshot key — the
    * canonical diff; with both snapshots bucketed by key the shuffle
    * disappears entirely. The changed-row filter is post-join map-side;
    * unchanged rows (the overwhelming majority at 100 TB) never leave the
    * join stage. */
  val tableDiffCdc = Q(
    "table_diff_cdc",
    """WITH a AS (SELECT o_orderkey, o_totalprice FROM orders),
      |b AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 11 = 0 THEN
      |      CAST(CAST(o_totalprice AS DECIMAL(12,2))
      |           + CAST(50.00 AS DECIMAL(12,2)) AS DOUBLE)
      |    ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 13 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_totalprice
      |  FROM orders WHERE o_orderkey % 17 = 0)
      |SELECT
      |  CASE WHEN a.o_orderkey IS NULL THEN 'I'
      |       WHEN b.o_orderkey IS NULL THEN 'D'
      |       ELSE 'U' END AS op,
      |  COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  a.o_totalprice AS old_price, b.o_totalprice AS new_price
      |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
      |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
      |   OR a.o_totalprice <> b.o_totalprice
      |ORDER BY op, o_orderkey""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
    val bUpd = a.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 11 === 0,
          (Parity.dec2(col("o_totalprice")) + Parity.dec2(lit(50.00)))
            .cast("double"))
          .otherwise(col("o_totalprice")))
    val bIns = a.filter(col("o_orderkey") % 17 === 0)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        col("o_totalprice"))
    val aa = a.select(col("o_orderkey").as("a_key"),
      col("o_totalprice").as("old_price"))
    val bb = bUpd.unionByName(bIns)
      .select(col("o_orderkey").as("b_key"),
        col("o_totalprice").as("new_price"))
    aa.join(bb, col("a_key") === col("b_key"), "full_outer")
      .filter(col("a_key").isNull || col("b_key").isNull ||
        col("old_price") =!= col("new_price"))
      .select(
        when(col("a_key").isNull, "I")
          .when(col("b_key").isNull, "D")
          .otherwise("U").as("op"),
        coalesce(col("a_key"), col("b_key")).as("o_orderkey"),
        col("old_price"), col("new_price"))
      .orderBy("op", "o_orderkey")
  }

  val all: Seq[Q] = Seq(mergeUpsert, scd2Intervals, timeResampleLocf,
    dataProfile, aggModeMedian, tableDiffCdc)
}
