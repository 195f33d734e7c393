package graft.operators

import graft.{Q, Tables}
import graft.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engagement analytics, wave 24 (round 6): RFM segmentation and the
  * DAU/WAU stickiness curve — the user-value reporting layer over the
  * event stream.
  *
  * Exactness: recency/frequency are integers; monetary runs through the
  * dsum decimal laundering; band thresholds are literals; stickiness is
  * an integer ratio per day. Scale: rfm is one user-level aggregate
  * (two-phase) + a 1-row max-date broadcast; stickiness reduces to the
  * distinct (user, day) frame, then a 7-day range self-join on the DAY
  * key — expansion is ≤ 7× the day-frame, never the event stream.
  */
object RfmOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** RFM segments: per user recency (days since last purchase, from the
    * corpus max date), frequency (purchase count), monetary (dsum of
    * value); banded 1–3 by fixed thresholds; reported per segment. */
  val eventsRfmSegments = Q(
    "events_rfm_segments",
    s"""WITH p AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, value
       |  FROM events WHERE event_type = 'purchase'),
       |mx AS (SELECT MAX(day) AS max_day FROM p),
       |u AS (
       |  SELECT user_id,
       |    date_diff('day', MAX(day), (SELECT max_day FROM mx)) AS recency,
       |    COUNT(*) AS frequency,
       |    ${sqlDsum("value")} AS monetary
       |  FROM p GROUP BY user_id),
       |b AS (
       |  SELECT
       |    CASE WHEN recency <= 3 THEN 3 WHEN recency <= 10 THEN 2
       |         ELSE 1 END AS r_band,
       |    CASE WHEN frequency >= 5 THEN 3 WHEN frequency >= 2 THEN 2
       |         ELSE 1 END AS f_band,
       |    CASE WHEN monetary >= 500.0 THEN 3 WHEN monetary >= 100.0 THEN 2
       |         ELSE 1 END AS m_band,
       |    recency, frequency, monetary
       |  FROM u)
       |SELECT r_band, f_band, m_band, COUNT(*) AS n_users,
       |  ${sqlRavg("recency")} AS avg_recency,
       |  ${sqlRavg("frequency")} AS avg_frequency,
       |  ${sqlDsum("monetary")} AS sum_monetary
       |FROM b GROUP BY 1, 2, 3 ORDER BY r_band, f_band, m_band""".stripMargin) {
    (s, dir) =>
      val p = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").cast("date").as("day"), col("value"))
      val mx = p.agg(max("day").as("max_day"))
      val u = p.groupBy("user_id")
        .agg(max("day").as("last_day"), count(lit(1)).as("frequency"),
          dsum(col("value")).as("monetary"))
        .crossJoin(broadcast(mx))
        .withColumn("recency", datediff(col("max_day"), col("last_day")))
      val b = u.select(
        when(col("recency") <= 3, 3).when(col("recency") <= 10, 2)
          .otherwise(1).as("r_band"),
        when(col("frequency") >= 5, 3).when(col("frequency") >= 2, 2)
          .otherwise(1).as("f_band"),
        when(col("monetary") >= 500.0, 3).when(col("monetary") >= 100.0, 2)
          .otherwise(1).as("m_band"),
        col("recency"), col("frequency"), col("monetary"))
      b.groupBy("r_band", "f_band", "m_band")
        .agg(count(lit(1)).as("n_users"),
          ravg(col("recency")).as("avg_recency"),
          ravg(col("frequency")).as("avg_frequency"),
          dsum(col("monetary")).as("sum_monetary"))
        .orderBy("r_band", "f_band", "m_band")
  }

  /** Stickiness curve: per day, DAU and trailing-7-day WAU (distinct
    * users over the window via a day-key range self-join on the reduced
    * (user, day) frame), and the DAU/WAU ratio. */
  val eventsStickinessWau = Q(
    "events_stickiness_wau",
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
      |wau AS (
      |  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
      |  FROM days d JOIN ud u
      |    ON u.day <= d.day AND u.day >= d.day - 6
      |  GROUP BY d.day)
      |SELECT d.day, dau.dau AS dau, wau.wau AS wau,
      |  ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
      |FROM days d JOIN dau ON dau.day = d.day JOIN wau ON wau.day = d.day
      |ORDER BY d.day""".stripMargin) { (s, dir) =>
    val ud = t(s, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val days = ud.select("day").distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = days.select(col("day").as("d"))
      .join(ud, col("day") <= col("d") && col("day") >= date_sub(col("d"), 6))
      .groupBy("d").agg(countDistinct("user_id").as("wau"))
      .select(col("d").as("day"), col("wau"))
    days.join(dau, "day").join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(eventsRfmSegments, eventsStickinessWau)
}
