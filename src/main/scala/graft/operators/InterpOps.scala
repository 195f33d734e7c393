package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Interpolation and nearest-match alignment, wave 25 (round 6) — the two
  * gap-healing shapes time_resample_locf and join_asof leave open: linear
  * interpolation across gaps, and as-of matching in BOTH directions
  * (nearest event, not last-before).
  *
  * Exactness: the lerp fraction is a ratio of exact integer second
  * offsets (hour-aligned spine), observed rows bypass the formula
  * entirely, and both engines evaluate the identical IEEE expression
  * tree; the nearest-join tie-breaks are total (gap, then earlier click,
  * then id), so the match is unique and the DuckDB LATERAL oracle
  * reproduces it exactly.
  *
  * Scale: both are keyed-window / union-frame plans partitioned by
  * event_type or user_id — the joinAsof single-shuffle family, never a
  * range-join explosion; the lerp spine is sequence()-generated per key.
  */
object InterpOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Hourly spine per type with gaps LINEARLY interpolated between the
    * surrounding observed hours (observed rows carry their own value;
    * spine spans each type's [min, max] so gaps are always interior). */
  val timeResampleLerp = Q(
    "time_resample_lerp",
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS hour_value
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type, UNNEST(generate_series(MIN(hour_start),
      |    MAX(hour_start), INTERVAL 1 HOUR)) AS hour_start
      |  FROM hourly GROUP BY event_type),
      |j AS (
      |  SELECT s.event_type, s.hour_start,
      |    COALESCE(h.n, 0) AS n, (h.hour_start IS NULL) AS is_gap,
      |    h.hour_value
      |  FROM spine s LEFT JOIN hourly h
      |    ON s.event_type = h.event_type AND s.hour_start = h.hour_start),
      |f AS (
      |  SELECT *,
      |    LAST_VALUE(hour_value IGNORE NULLS) OVER (
      |      PARTITION BY event_type ORDER BY hour_start
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
      |    LAST_VALUE(CASE WHEN hour_value IS NOT NULL THEN hour_start END
      |      IGNORE NULLS) OVER (
      |      PARTITION BY event_type ORDER BY hour_start
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
      |    FIRST_VALUE(hour_value IGNORE NULLS) OVER (
      |      PARTITION BY event_type ORDER BY hour_start
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
      |    FIRST_VALUE(CASE WHEN hour_value IS NOT NULL THEN hour_start END
      |      IGNORE NULLS) OVER (
      |      PARTITION BY event_type ORDER BY hour_start
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
      |  FROM j)
      |SELECT event_type, hour_start, n, is_gap,
      |  ROUND(CASE WHEN is_gap THEN prev_v + (next_v - prev_v) *
      |    ((epoch(hour_start) - epoch(prev_t)) /
      |     (epoch(next_t) - epoch(prev_t)))
      |  ELSE hour_value END, 6) AS lerp_value
      |FROM f ORDER BY event_type, hour_start""".stripMargin) { (s, dir) =>
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double")
          .as("hour_value"))
    val spine = hourly.groupBy("event_type")
      .agg(min("hour_start").as("lo"), max("hour_start").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
          .as("hour_start"))
    val obs = hourly
      .withColumnRenamed("hour_start", "h_start")
      .withColumnRenamed("event_type", "h_type")
    val j = spine.join(obs,
        col("event_type") === col("h_type") &&
          col("hour_start") === col("h_start"), "left_outer")
      .select(col("event_type"), col("hour_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("h_start").isNull.as("is_gap"), col("hour_value"))
    val back = Window.partitionBy("event_type").orderBy("hour_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("event_type").orderBy("hour_start")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsT = when(col("hour_value").isNotNull, col("hour_start"))
    val f = j
      .withColumn("prev_v", last(col("hour_value"), ignoreNulls = true).over(back))
      .withColumn("prev_t", last(obsT, ignoreNulls = true).over(back))
      .withColumn("next_v", first(col("hour_value"), ignoreNulls = true).over(fwd))
      .withColumn("next_t", first(obsT, ignoreNulls = true).over(fwd))
    val frac = (unix_timestamp(col("hour_start")) - unix_timestamp(col("prev_t")))
      .cast("double") /
      (unix_timestamp(col("next_t")) - unix_timestamp(col("prev_t")))
        .cast("double")
    f.select(col("event_type"), col("hour_start"), col("n"), col("is_gap"),
        round(when(col("is_gap"),
          col("prev_v") + (col("next_v") - col("prev_v")) * frac)
          .otherwise(col("hour_value")), 6).as("lerp_value"))
      .orderBy("event_type", "hour_start")
  }

  /** As-of NEAREST join: each purchase matched to its temporally closest
    * click (either direction) per user — gap ties prefer the earlier
    * click. One user_id shuffle, two keyed window passes (backward last /
    * forward first over the unioned frame); the LATERAL oracle re-proves
    * the windowed form against the direct argmin definition. */
  val joinAsofNearest = Q(
    "join_asof_nearest",
    """SELECT p.event_id, p.user_id, p.ts, c.click_id, c.gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN LATERAL (
      |  SELECT c.event_id AS click_id,
      |    ABS(epoch_us(p.ts) - epoch_us(c.ts)) AS gap_us
      |  FROM events c
      |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
      |  ORDER BY ABS(epoch_us(p.ts) - epoch_us(c.ts)), c.ts, c.event_id
      |  LIMIT 1) c ON true
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), lit(null).cast("long").as("p_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast("long").as("click_id"), col("event_id").as("p_id"))
    // Purchases sort BEFORE same-ts clicks (flag 0 < 1), so a same-ts
    // click is reachable only through the FORWARD frame (gap 0).
    // Within a frame, the best click is selected by LEXICOGRAPHIC
    // struct min/max — order-independent, so equal-sort-key rows can't
    // make the pick nondeterministic: backward wants the latest ts then
    // the smallest id (max over (cts, -cid)), forward the earliest ts
    // then the smallest id (min over (cts, cid)) — exactly the oracle's
    // (abs gap, c.ts, c.event_id) order.
    val isClick = when(col("click_id").isNotNull, 1).otherwise(0)
    val ord = Seq(col("ts"), isClick, col("click_id"))
    val back = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cRecB = when(col("click_id").isNotNull,
      struct(col("ts").as("cts"), (-col("click_id")).as("negcid")))
    val cRecF = when(col("click_id").isNotNull,
      struct(col("ts").as("cts"), col("click_id").as("cid")))
    val sec = (c: org.apache.spark.sql.Column) => unix_micros(c)
    val u = clicks.unionByName(purchases)
      .withColumn("b", max(cRecB).over(back))
      .withColumn("f", min(cRecF).over(fwd))
      .filter(col("p_id").isNotNull)
    val gapB = sec(col("ts")) - sec(col("b.cts"))
    val gapF = sec(col("f.cts")) - sec(col("ts"))
    val pickB = col("f").isNull || (col("b").isNotNull && gapB <= gapF)
    u.select(col("p_id").as("event_id"), col("user_id"), col("ts"),
        when(pickB, -col("b.negcid")).otherwise(col("f.cid")).as("click_id"),
        when(pickB, gapB).otherwise(gapF).as("gap_us"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(timeResampleLerp, joinAsofNearest)
}
