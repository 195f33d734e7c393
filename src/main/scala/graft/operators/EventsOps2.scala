package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics pack, wave 8 (round 6): the behavioral-modeling trio a
  * product-analytics engine serves over the event stream — the event-type
  * Markov transition matrix, top session paths (path analysis over the
  * gaps-and-islands sessions), and trailing-window EWMA smoothing of a
  * per-user metric.
  *
  * Scale notes: every op here shuffles ONCE by user_id and runs its
  * windows inside that partitioning; outputs are model-sized (transition
  * matrix ≤ |types|², top paths = 10 rows), not corpus-sized, except the
  * EWMA which is row-linear by design (a smoothing transform).
  */
object EventsOps2 {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** First-order Markov transition matrix over event types: P(next = to |
    * current = from), estimated per user-ordered stream (transitions never
    * cross users). Counts are exact integers; each probability is ONE
    * int/int IEEE division — bit-portable. The 5×5 output is the model a
    * next-event predictor or anomaly scorer consumes. */
  val eventsMarkovTransitions = Q(
    "events_markov_transitions",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM o WHERE next_type IS NOT NULL
      |  GROUP BY from_type, to_type),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
      |  FROM pairs GROUP BY from_type)
      |SELECT p.from_type, p.to_type, n, n_from,
      |  ROUND(CAST(n AS DOUBLE) / n_from, 6) AS prob
      |FROM pairs p JOIN tot USING (from_type)
      |ORDER BY p.from_type, p.to_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = pairs.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    pairs.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        round(col("n").cast("double") / col("n_from"), 6).as("prob"))
      .orderBy("from_type", "to_type")
  }

  /** Path analysis: the top-10 session-opening paths — the first 3 event
    * types of each gaps-and-islands session, joined with '>' — ranked by
    * session count. The aggregation input is ≤ 3 rows per session
    * (rank-filtered BEFORE the path shuffle), so the path key space, not
    * the event volume, bounds the final aggregate. */
  val sessionPathsTopn = Q(
    "session_paths_topn",
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    SUM(CASE WHEN pts IS NULL
      |      OR date_diff('microsecond', pts, ts) > 1800000000
      |      THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      |  FROM o),
      |r AS (
      |  SELECT user_id, session_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM s),
      |paths AS (
      |  SELECT user_id, session_id,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 3 GROUP BY user_id, session_id)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin) { (s, dir) =>
    val sess = PipelineOps.withSessionIds(t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))
    val rw = Window.partitionBy("user_id", "session_id")
      .orderBy("ts", "event_id")
    sess
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") <= 3)
      .groupBy("user_id", "session_id")
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  /** Trailing-window EWMA weights: α·(1−α)^d for α = 1/4 — dyadic
    * rationals, so every weight is an EXACT double and an exact finite
    * decimal literal; both engines evaluate the identical expression tree
    * left-to-right. */
  private val Alpha = BigDecimal("0.25")
  private val Weights: IndexedSeq[BigDecimal] =
    (0 to 7).map(d => Alpha * BigDecimal("0.75").pow(d))

  /** Trailing-8 EWMA smoothing of per-user purchase values: for each
    * purchase, ewma = Σ_d w_d·x_{i−d} / Σ_d w_d over the up-to-8 trailing
    * purchases present (w_d = α(1−α)^d, α = 0.25) — the truncated form a
    * production smoother uses so state stays bounded. One window
    * partitioning serves all 8 lags. */
  val eventsEwmaTrailing = Q(
    "events_ewma_trailing", {
      val num = (0 to 7).map { d =>
        val w = Weights(d).toString
        val x = if (d == 0) "value" else s"LAG(value, $d) OVER w"
        s"(CASE WHEN $x IS NOT NULL THEN CAST($w AS DOUBLE) * $x ELSE 0.0 END)"
      }.mkString(" + ")
      val den = (0 to 7).map { d =>
        val w = Weights(d).toString
        val x = if (d == 0) "value" else s"LAG(value, $d) OVER w"
        s"(CASE WHEN $x IS NOT NULL THEN CAST($w AS DOUBLE) ELSE 0.0 END)"
      }.mkString(" + ")
      s"""SELECT user_id, event_id, ts, value,
         |  ROUND(($num) / ($den), 6) AS ewma
         |FROM events WHERE event_type = 'purchase'
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    }) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    def x(d: Int): Column =
      if (d == 0) col("value") else lag(col("value"), d).over(w)
    val num = (0 to 7).map { d =>
      when(x(d).isNotNull, lit(Weights(d).toDouble) * x(d)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    val den = (0 to 7).map { d =>
      when(x(d).isNotNull, lit(Weights(d).toDouble)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        round(num / den, 6).as("ewma"))
      .orderBy("user_id", "event_id")
  }

  val all: Seq[Q] = Seq(eventsMarkovTransitions, sessionPathsTopn,
    eventsEwmaTrailing)
}
