package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series diagnostics, wave 16 (round 6): autocorrelation, CUSUM
  * changepoint detection, and seasonal-naive forecast evaluation over the
  * daily event series — the monitoring layer of an event-analytics
  * deployment (seasonality check, regime-shift alarm, forecast baseline).
  *
  * Exactness: every metric reduces the corpus to (event_type, day) integer
  * counts first, and all statistics stay in exact integer arithmetic until
  * one final division (Pearson r's sqrt runs on a product of two
  * exactly-representable int64s cast to double — IEEE-754 sqrt is
  * correctly rounded, so both engines produce the identical double; WAPE
  * replaces MAPE so the error ratio is a single Σ|e|/Σx integer ratio, not
  * an order-dependent sum of per-row doubles).
  *
  * Scale design: one (type, day) hash aggregate over the event stream
  * (two-phase, map-side combined) collapses everything downstream to
  * types × days rows. All windows partition by event_type (ordered by
  * day) — parallelism grows with the type count and the tiny ordered
  * frames never serialize the corpus (the win_count_distinct day-bucket
  * lesson). Lag alignment is an equi-join on (type, day+k), never a
  * window over an unkeyed global order.
  *
  * Int64/double-exactness envelope: with n ≤ 366 days per series and
  * per-day counts ≤ 5·10⁶ (100 TB-year territory), n·Σx² ≤ 9·10¹⁵ stays
  * inside both int64 and the 2⁵³ double-exact window; the covariance
  * PRODUCT is cast to double BEFORE multiplying (a bigint×bigint would
  * overflow int64 long before the double loses the sqrt's exactness).
  */
object TsOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Daily event counts per type — the shared reduced frame. */
  private val DailySql: String =
    """daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2)""".stripMargin

  private def daily(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** Pearson autocorrelation of the daily series at lags 1–3, per type:
    * r = (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² − (Σy)²)) over the
    * (day, day+k) aligned pairs. */
  val tsAutocorr = Q(
    "ts_autocorr",
    s"""WITH $DailySql,
       |lags AS (SELECT CAST(unnest([1, 2, 3]) AS INTEGER) AS lag_k),
       |pairs AS (
       |  SELECT a.event_type, l.lag_k, a.cnt AS x, b.cnt AS y
       |  FROM daily a CROSS JOIN lags l
       |  JOIN daily b ON b.event_type = a.event_type
       |    AND b.day = a.day + CAST(l.lag_k AS INTEGER)),
       |m AS (
       |  SELECT event_type, lag_k, COUNT(*) AS n,
       |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
       |    SUM(x * x) AS sx2, SUM(y * y) AS sy2
       |  FROM pairs GROUP BY event_type, lag_k)
       |SELECT event_type, lag_k, CAST(n AS BIGINT) AS n_pairs,
       |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
       |    NULLIF(SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
       |      * CAST(n * sy2 - sy * sy AS DOUBLE)), 0.0), 6) AS r
       |FROM m ORDER BY event_type, lag_k""".stripMargin) { (s, dir) =>
    val d = daily(t(s, dir, "events"))
    val lags = { import s.implicits._; Seq(1, 2, 3).toDF("lag_k") }
    val a = d.select(col("event_type"), col("day"), col("cnt").as("x"))
    val b = d.select(col("event_type").as("b_type"), col("day").as("b_day"),
      col("cnt").as("y"))
    val pairs = a.crossJoin(broadcast(lags))
      .join(b, col("b_type") === col("event_type") &&
        col("b_day") === date_add(col("day"), col("lag_k")))
    val m = pairs.groupBy("event_type", "lag_k").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sx2"),
      sum(col("y") * col("y")).as("sy2"))
    m.select(col("event_type"), col("lag_k"), col("n").as("n_pairs"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        nullif(sqrt((col("n") * col("sx2") - col("sx") * col("sx"))
            .cast("double") *
          (col("n") * col("sy2") - col("sy") * col("sy")).cast("double")),
          lit(0.0)), 6).as("r"))
      .orderBy("event_type", "lag_k")
  }

  /** CUSUM changepoint per type: the day t maximizing |n·S_t − t·S_n|
    * (the mean-deviation cumulative sum scaled by n to stay integer),
    * with the earliest such day on ties. Output also carries the
    * normalized statistic max|S_t − (t/n)·S_n| / S_n. */
  val tsCusumChangepoint = Q(
    "ts_cusum_changepoint",
    s"""WITH $DailySql,
       |c AS (
       |  SELECT event_type, day, cnt,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS tt,
       |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prefix
       |  FROM daily),
       |tot AS (
       |  SELECT event_type, COUNT(*) AS n, SUM(cnt) AS total
       |  FROM daily GROUP BY event_type),
       |scored AS (
       |  SELECT c.event_type, c.day,
       |    ABS(t.n * c.prefix - c.tt * t.total) AS stat_scaled, t.n, t.total
       |  FROM c JOIN tot t USING (event_type)),
       |ranked AS (
       |  SELECT event_type, day, stat_scaled, n, total,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY stat_scaled DESC, day) AS rk
       |  FROM scored)
       |SELECT event_type, day AS change_day,
       |  CAST(stat_scaled AS BIGINT) AS stat_scaled,
       |  ROUND(CAST(stat_scaled AS DOUBLE) / (CAST(n AS DOUBLE) * total), 6)
       |    AS stat_norm
       |FROM ranked WHERE rk = 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = daily(t(s, dir, "events"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val c = d
      .withColumn("tt", row_number().over(wOrd))
      .withColumn("prefix", sum("cnt").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = d.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cnt").as("total"))
    val scored = c.join(tot, "event_type")
      .withColumn("stat_scaled",
        abs(col("n") * col("prefix") - col("tt") * col("total")))
    val rk = Window.partitionBy("event_type")
      .orderBy(col("stat_scaled").desc, col("day"))
    scored.withColumn("rk", row_number().over(rk))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("stat_scaled").cast("long").as("stat_scaled"),
        round(col("stat_scaled").cast("double") /
          (col("n").cast("double") * col("total")), 6).as("stat_norm"))
      .orderBy("event_type")
  }

  /** Seasonal-naive forecast evaluation: predict each day's count by the
    * count 7 days earlier (same type), score the overlap with MAE, WAPE
    * (Σ|e|/Σx — the exact-integer form of MAPE), and the worst absolute
    * error. The no-model baseline every real forecaster must beat. */
  val tsSeasonalNaiveEval = Q(
    "ts_seasonal_naive_eval",
    s"""WITH $DailySql,
       |j AS (
       |  SELECT a.event_type, a.cnt AS actual, b.cnt AS forecast
       |  FROM daily a JOIN daily b ON b.event_type = a.event_type
       |    AND b.day = a.day - 7)
       |SELECT event_type, COUNT(*) AS n_days,
       |  ROUND(CAST(SUM(ABS(actual - forecast)) AS DOUBLE) / COUNT(*), 6)
       |    AS mae,
       |  ROUND(CAST(SUM(ABS(actual - forecast)) AS DOUBLE) / SUM(actual), 6)
       |    AS wape,
       |  CAST(MAX(ABS(actual - forecast)) AS BIGINT) AS max_abs_err
       |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val d = daily(t(s, dir, "events"))
    val b = d.select(col("event_type").as("b_type"), col("day").as("b_day"),
      col("cnt").as("forecast"))
    d.join(b, col("b_type") === col("event_type") &&
        col("b_day") === date_sub(col("day"), 7))
      .select(col("event_type"), col("cnt").as("actual"), col("forecast"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(sum(abs(col("actual") - col("forecast"))).cast("double")
          / count(lit(1)), 6).as("mae"),
        round(sum(abs(col("actual") - col("forecast"))).cast("double")
          / sum("actual"), 6).as("wape"),
        max(abs(col("actual") - col("forecast"))).cast("long")
          .as("max_abs_err"))
      .orderBy("event_type")
  }

  /** OHLC candle downsampling — wave 32: the canonical time-series
    * compaction (metrics pipelines, market-style rollups). Exactness:
    * open/high/low/close are all SELECTED raw doubles (never summed), so
    * no rounding laundering is needed; ties break on the unique event_id.
    *
    * Scale shape: ONE two-phase hash aggregate on the day bucket —
    * `min_by`/`max_by` over a (ts, event_id) struct carry the open/close
    * selection into the partial aggregates (each partition keeps one
    * candidate per bucket), so the corpus never shuffles more than
    * buckets × 4 values. The oracle states the same thing positionally
    * (two window row_numbers) — equivalent, but the window form would
    * shuffle every row at scale; the agg form is the one the engine runs. */
  val tsOhlcDownsample = Q(
    "ts_ohlc_downsample",
    """WITH b AS (
      |  SELECT CAST(ts AS DATE) AS day, ts, event_id, value FROM events),
      |rn AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY day
      |      ORDER BY ts, event_id) AS rka,
      |    ROW_NUMBER() OVER (PARTITION BY day
      |      ORDER BY ts DESC, event_id DESC) AS rkd
      |  FROM b)
      |SELECT day,
      |  MAX(CASE WHEN rka = 1 THEN value END) AS open,
      |  MAX(value) AS high,
      |  MIN(value) AS low,
      |  MAX(CASE WHEN rkd = 1 THEN value END) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM rn GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("ts"), col("event_id"),
        col("value"))
      .groupBy("day")
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy("day")
  }

  val all: Seq[Q] =
    Seq(tsAutocorr, tsCusumChangepoint, tsSeasonalNaiveEval, tsOhlcDownsample)
}
