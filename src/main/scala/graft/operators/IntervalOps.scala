package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval-overlap join, wave 29 (round 6): user sessions (the
  * gaps-and-islands intervals PipelineOps.withSessionIds produces) joined
  * to campaign/promo windows on the classic overlap predicate
  * `s_start < p_end AND p_start < s_end` — the "which sessions ran during
  * the promo" report, with exact µs overlap durations.
  *
  * Scale: sessionization is one user_id shuffle (the events_session_gaps
  * plan); the promo dim is tiny and broadcasts, so the overlap join adds
  * NO shuffle. With a large interval table on both sides the same query
  * decomposes by day-bucket equi-join (the geo_radius_grid pattern on the
  * time axis) — the predicate and rollup are unchanged, which is why the
  * overlap condition is kept factored in one place.
  *
  * Exactness: interval bounds are µs timestamps; overlap duration =
  * min(ends) − max(starts) in exact integer µs; counts are integers.
  */
object IntervalOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val Promos: Seq[(String, String, String)] = Seq(
    ("P1", "2024-01-03 00:00:00", "2024-01-05 00:00:00"),
    ("P2", "2024-01-08 12:00:00", "2024-01-09 12:00:00"),
    ("P3", "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
    ("P4", "2024-01-25 06:00:00", "2024-01-25 18:00:00"),
    ("P5", "2024-01-28 00:00:00", "2024-02-04 00:00:00"))

  private val PromosSql: String = Promos.map { case (id, a, b) =>
    s"('$id', TIMESTAMP '$a', TIMESTAMP '$b')" }.mkString(", ")

  /** Per-promo overlap rollup: sessions overlapping each window, distinct
    * users reached, and total overlapped µs. */
  val joinIntervalOverlap = Q(
    "join_interval_overlap",
    s"""WITH o AS (
       |  SELECT user_id, ts, event_id,
       |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
       |  FROM events),
       |f AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN pts IS NULL
       |      OR date_diff('microsecond', pts, ts) > 1800000000
       |      THEN 1 ELSE 0 END AS new_s
       |  FROM o),
       |s AS (
       |  SELECT user_id,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS session_id, ts
       |  FROM f),
       |iv AS (
       |  SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
       |  FROM s GROUP BY user_id, session_id),
       |promos AS (
       |  SELECT * FROM (VALUES $PromosSql) AS p(promo_id, p_start, p_end))
       |SELECT promo_id, COUNT(*) AS n_sessions,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  CAST(SUM(date_diff('microsecond',
       |    GREATEST(s_start, p_start), LEAST(s_end, p_end))) AS BIGINT)
       |    AS overlap_us
       |FROM promos JOIN iv
       |  ON s_start < p_end AND p_start < s_end
       |GROUP BY promo_id ORDER BY promo_id""".stripMargin) { (s, dir) =>
    val iv = PipelineOps.withSessionIds(t(s, dir, "events"))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s_start"), max("ts").as("s_end"))
    val promos = { import s.implicits._
      Promos.toDF("promo_id", "p_start_s", "p_end_s")
        .select(col("promo_id"),
          to_timestamp(col("p_start_s")).as("p_start"),
          to_timestamp(col("p_end_s")).as("p_end")) }
    iv.join(broadcast(promos),
        col("s_start") < col("p_end") && col("p_start") < col("s_end"))
      .groupBy("promo_id")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct("user_id").as("n_users"),
        sum(unix_micros(least(col("s_end"), col("p_end"))) -
          unix_micros(greatest(col("s_start"), col("p_start"))))
          .as("overlap_us"))
      .orderBy("promo_id")
  }

  val all: Seq[Q] = Seq(joinIntervalOverlap)
}
