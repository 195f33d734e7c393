package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Event-stream product analytics: ordered funnels and cohort retention —
  * the query family a clickstream/session warehouse runs daily.
  *
  * Scale notes: both operators reduce to per-user aggregates (shuffle key
  * = user_id, the natural high-cardinality partitioner) followed by small
  * joins/aggregations on the reduced sides. The funnel's stage-N-after-
  * stage-N-1 condition joins per-user FIRST timestamps (one row per user)
  * back to the event scan — the big side streams, the per-user side is
  * orders of magnitude smaller post-aggregation. No window over a global
  * ordering anywhere.
  */
object EventsOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Ordered conversion funnel view → click → purchase: a later stage
    * counts only if it happens at-or-after the user's first earlier-stage
    * event. One summary row. */
  val eventsFunnel = Q(
    "events_funnel",
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      |  GROUP BY e.user_id)
      |SELECT
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click_after_view,
      |  (SELECT COUNT(*) FROM p) AS n_purchase_after_click""".stripMargin) {
    (s, dir) =>
      val ev = t(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") >= col("v_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") >= col("c_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  /** Cohort retention: users grouped by first-activity day; for each
    * cohort day × day-offset (0..7), how many distinct cohort members
    * were active that day. */
  val eventsRetention = Q(
    "events_retention",
    """WITH cohort AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      |  FROM events GROUP BY user_id),
      |active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT cohort_day,
      |  date_diff('day', cohort_day, day) AS day_offset,
      |  COUNT(*) AS n_users
      |FROM active JOIN cohort USING (user_id)
      |WHERE date_diff('day', cohort_day, day) BETWEEN 0 AND 7
      |GROUP BY cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val cohort = ev.groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("cohort_day"))
    val active = ev.select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    active.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset").between(0, 7))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Attribution interval join — the BATCH TWIN of the stream-stream join
    * (streaming.Streams.attributionJoin): every purchase joined to each
    * same-user view it followed within 30 minutes. The oracle verifies the
    * interval edges ([closed, open)) and the per-user rollup; StreamingSpec
    * re-proves the identical join incrementally with watermarked state.
    * Scale: equi-key on user_id carries the shuffle; the range predicate is
    * a post-join filter within each key group, never a cartesian. */
  val eventsAttribution = Q(
    "events_attribution",
    """WITH v AS (
      |  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id, ts AS p_ts, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT v.user_id, COUNT(*) AS n_attributed,
      |  CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_value
      |FROM v JOIN p ON v.user_id = p.user_id
      |  AND p.p_ts >= v.v_ts AND p.p_ts < v.v_ts + INTERVAL 30 MINUTE
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"), col("value"))
    v.join(p, col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_attributed"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("attributed_value"))
      .orderBy("user_id")
  }

  /** Robust outlier detection per event type: median absolute deviation
    * (MAD) flags values beyond 3 scaled-MAD of the median — the quality
    * filter a pipeline runs before trusting a metric column (mean/stddev
    * would be dragged by the very outliers being hunted).
    *
    * Parity: exact interpolated medians (`percentile` ↔ `quantile_cont`,
    * the agg_percentile-proven pair), deviations and the 3·1.4826 = 4.4478
    * threshold are identical IEEE arithmetic on both engines.
    *
    * Scale: two keyed aggregations over event_type + broadcast joins of
    * the per-type medians back onto the scan. Exact medians need the
    * per-group value multiset (Spark's percentile = ObjectHashAggregate);
    * above memory bounds the approx_percentile twin (t-digest partials)
    * takes over — the declared agg_approx_percentile covers that path. */
  val eventsAnomalyMad = Q(
    "events_anomaly_mad",
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type),
      |dev AS (
      |  SELECT e.event_type, ABS(e.value - m.med) AS dev, m.med
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
      |  FROM dev GROUP BY event_type)
      |SELECT d.event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN d.dev > CAST(4.4478 AS DOUBLE) * m.mad
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      |  ROUND(MAX(d.med), 6) AS med,
      |  ROUND(m.mad, 6) AS mad
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type, m.mad
      |ORDER BY d.event_type""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events").select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("dev"),
        col("med"))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("mad"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("dev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
          .as("n_anomalies"),
        round(max(col("med")), 6).as("med"))
      .select(col("event_type"), col("n_events"), col("n_anomalies"),
        col("med"), round(col("mad"), 6).as("mad"))
      .orderBy("event_type")
  }

  /** Robust time-series smoothing: sliding-window median of the metric per
    * event type (4-row trailing frame) — the denoiser that precedes
    * thresholding when spikes would wreck a moving average. Exact
    * interpolated percentile as a WINDOW aggregate; frame contents are
    * pinned by the unique (ts, event_id) ordering so both engines see the
    * same 4 rows. Window is keyed by event_type — at scale the partition
    * is one metric stream, the standard time-series layout. */
  val eventsRollingMedian = Q(
    "events_rolling_median",
    """SELECT event_id, event_type, value,
      |  ROUND(quantile_cont(value, 0.5) OVER (
      |    PARTITION BY event_type ORDER BY ts, event_id
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS rolling_med
      |FROM events ORDER BY event_id LIMIT 5000""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      .rowsBetween(-3, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"),
        round(expr("percentile(value, 0.5)").over(w), 6).as("rolling_med"))
      .orderBy("event_id").limit(5000)
  }

  val all: Seq[Q] = Seq(eventsFunnel, eventsRetention, eventsAttribution,
    eventsAnomalyMad, eventsRollingMedian)
}
