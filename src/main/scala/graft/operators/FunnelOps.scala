package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Windowed funnel, wave 28 (round 6): the conversion-window variant of
  * events_funnel (ClickHouse's windowFunnel semantics, min-ts chain
  * form) — each stage must fire within 24 hours of the previous stage's
  * anchor, so the readout measures PROMPT conversion, not ever-converted.
  * Counts are exact integers; the window arithmetic is µs-exact interval
  * addition on both engines.
  *
  * Scale: three (user, type)-filtered min-aggregates chained by
  * broadcast-able user-frame joins — the events scan dominates; no
  * window function, no self-join explosion (the events_funnel plan
  * family, plus one timestamp bound per stage).
  */
object FunnelOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val eventsFunnelWindowed = Q(
    "events_funnel_windowed",
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
      |    AND e.ts <= v.v_ts + INTERVAL 24 HOUR
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      |    AND e.ts <= c.c_ts + INTERVAL 24 HOUR
      |  GROUP BY e.user_id)
      |SELECT
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click_24h,
      |  (SELECT COUNT(*) FROM p) AS n_purchase_24h""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") >= col("v_ts") &&
        col("ts") <= col("v_ts") + expr("INTERVAL 24 HOUR"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") >= col("c_ts") &&
        col("ts") <= col("c_ts") + expr("INTERVAL 24 HOUR"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_24h")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_24h")))
  }

  val all: Seq[Q] = Seq(eventsFunnelWindowed)
}
