package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY §2-I: streaming operators in their batch-equivalent declared form.
  *
  * `window()`, `session_window()` and `dropDuplicates` evaluate identically
  * over batch DataFrames and incremental streams, so the DuckDB oracle
  * checks the semantics here; graft.streaming.StreamRunner runs the very
  * same plans incrementally (file source → foreachBatch) and StreamingSpec
  * asserts convergence to these batch answers plus watermark/state
  * behaviors the batch form can't express (I4/I6/I7).
  */
object StreamingBatch {
  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** I1 — tumbling 1-hour windows per event type. */
  val tumbling = Q(
    "stream_tumbling",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin) {
    (s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
        .select(col("window.start").as("hour_start"), col("event_type"),
          col("n"), col("sum_value"))
        // Time-domain-bounded result (hours × event types — grows with
        // calendar span, not corpus rows): final-merge sort, Parity.
        .transform(graft.Parity.sortedSmall(_, col("hour_start"),
          col("event_type")))
  }

  /** I2 — sliding windows: 1 hour wide, every 15 minutes (each event lands
    * in exactly 4 windows; oracle enumerates them via time_bucket). */
  val sliding = Q(
    "stream_sliding",
    """SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS win_start,
      |  COUNT(*) AS n
      |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) s(k)
      |GROUP BY 1 ORDER BY win_start""".stripMargin) { (s, dir) =>
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))
      .orderBy("win_start")
  }

  /** I3 — session windows: 30-minute inactivity gap per user. Spark's
    * session end = last event + gap; the oracle reproduces that with the
    * standard lag + cumulative-sum sessionization. */
  val session = Q(
    "stream_session",
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |              OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    ev(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"),
        col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  /** I5 — dedup (batch form of dropDuplicatesWithinWatermark). */
  val dedup = Q(
    "stream_dedup",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    ev(s, dir)
      .select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
      .orderBy("user_id", "event_type")
  }

  /** I9 — batch twin of streaming/Streams.staticEnrich: events LEFT-joined
    * to the static customer dimension, rolled up per market segment (NULL
    * segment = dimension miss). Same logical plan the stream runs per
    * micro-batch; StreamingSpec proves incremental == this. */
  val staticEnrich = Q(
    "stream_static_enrich",
    """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events LEFT OUTER JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin) { (s, dir) =>
    val dim = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.streaming.Streams.staticEnrich(ev(s, dir), dim)
      .orderBy(col("c_mktsegment").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(tumbling, sliding, session, dedup, staticEnrich)
}
