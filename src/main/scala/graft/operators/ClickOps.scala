package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Search click analytics, wave 17 (round 6): the relevance-engineering
  * feedback loop — item CTR with confidence-aware ranking, the position
  * bias curve, and empirical-Bayes CTR shrinkage. Items are the `$.k`
  * json prop of the event stream (the fn_json convention); impressions
  * are `view` events, clicks are `click` events.
  *
  * Exactness: counts are integers; CTRs are single integer-ratio double
  * divisions; the Wilson lower bound is pure IEEE arithmetic over those
  * exact inputs plus one correctly-rounded sqrt — bit-identical across
  * engines (the z=1.96 constant is the identical literal on both sides).
  * No off-grid decimal casts anywhere (double→decimal rounding is the one
  * cross-engine hazard the Parity conventions cannot launder).
  *
  * Scale design: one (item, type) or (position, type) hash aggregate over
  * the event scan collapses everything; the ranking is top-k
  * (TakeOrderedAndProject), and the only broadcast is a 1-row global-CTR
  * frame. At 100 TB this is the canonical two-phase count pattern — the
  * json extraction sits in the scan projection and the event_type filter
  * is pushed to parquet.
  */
object ClickOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Per-item view/click counts — the shared reduced frame. */
  private val ItemCountsSql: String =
    """ic AS (
      |  SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
      |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks
      |  FROM events WHERE event_type IN ('view', 'click')
      |    AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
      |  GROUP BY 1)""".stripMargin

  private def itemCounts(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("view", "click"))
      // INTEGRAL-pattern guard on BOTH sides (r6 + r8 ADVICE): a malformed
      // or missing $.k errors DuckDB's plain CAST while Spark's yields
      // NULL — and for a non-integral numeric string ("12.5") both engines
      // KEEP the row but disagree on the value (Spark's string→bigint
      // truncates to 12, DuckDB's TRY_CAST rounds to 13). Requiring
      // ^-?[0-9]+$ before the cast makes parity independent of the
      // fixture's $.k shape in both the NULL and the fractional case.
      .filter(get_json_object(col("props"), "$.k").rlike("^-?[0-9]+$"))
      .groupBy(get_json_object(col("props"), "$.k").cast("bigint").as("item"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"))

  /** Wilson 95% lower confidence bound on CTR, the sort key that keeps a
    * 1-click/1-view item from outranking 80/100: with p̂ = c/n, z = 1.96,
    * LCB = (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n). */
  private def wilson(clicks: Column, views: Column): Column = {
    val z = lit(1.96)
    val n = views.cast("double")
    // Clamp p̂ to [0, 1]: the fixture's view/click streams are independent,
    // so an item can log more clicks than views — p̂ > 1 would put a
    // negative value under the sqrt (DuckDB errors, Spark yields NaN).
    // Production impressions always dominate and the clamp is a no-op.
    val p = least(clicks, views).cast("double") / n
    (p + z * z / (lit(2.0) * n) -
      z * sqrt(p * (lit(1.0) - p) / n + z * z / (lit(4.0) * n * n))) /
      (lit(1.0) + z * z / n)
  }

  private val WilsonSql: String = {
    val p = "(CAST(LEAST(clicks, views) AS DOUBLE) / CAST(views AS DOUBLE))"
    val n = "CAST(views AS DOUBLE)"
    s"(($p + 1.96 * 1.96 / (2.0 * $n) - 1.96 * SQRT($p * (1.0 - $p) / $n" +
      s" + 1.96 * 1.96 / (4.0 * $n * $n))) / (1.0 + 1.96 * 1.96 / $n))"
  }

  /** Confidence-ranked item CTR: top 50 items by Wilson LCB (views > 0),
    * the production "best items" list. */
  val ctrWilsonTopk = Q(
    "ctr_wilson_topk",
    s"""WITH $ItemCountsSql
       |SELECT item, CAST(views AS BIGINT) AS views,
       |  CAST(clicks AS BIGINT) AS clicks,
       |  ROUND(CAST(clicks AS DOUBLE) / views, 6) AS ctr,
       |  ROUND($WilsonSql, 6) AS wilson_lcb
       |FROM ic WHERE views > 0
       |ORDER BY $WilsonSql DESC, item LIMIT 50""".stripMargin) { (s, dir) =>
    val ic = itemCounts(t(s, dir, "events")).filter(col("views") > 0)
    val w = wilson(col("clicks"), col("views"))
    ic.select(col("item"), col("views"), col("clicks"),
        round(col("clicks").cast("double") / col("views"), 6).as("ctr"),
        w.as("w_raw"))
      .orderBy(col("w_raw").desc, col("item"))
      .limit(50)
      .select(col("item"), col("views"), col("clicks"), col("ctr"),
        round(col("w_raw"), 6).as("wilson_lcb"))
  }

  /** Position-bias curve: CTR per display position (item mod 10 — the
    * derived rank slot), with lift vs the overall CTR from a 1-row
    * broadcast. The curve that calibrates any click model. */
  val clickPositionCurve = Q(
    "click_position_curve",
    """WITH pc AS (
      |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
      |      AS position,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
      |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks
      |  FROM events WHERE event_type IN ('view', 'click')
      |  GROUP BY 1),
      |g AS (SELECT SUM(views) AS gv, SUM(clicks) AS gc FROM pc)
      |SELECT position, CAST(views AS BIGINT) AS views,
      |  CAST(clicks AS BIGINT) AS clicks,
      |  ROUND(CAST(clicks AS DOUBLE) / views, 6) AS ctr,
      |  ROUND((CAST(clicks AS DOUBLE) / views) /
      |    (CAST(gc AS DOUBLE) / CAST(gv AS DOUBLE)), 6) AS lift
      |FROM pc CROSS JOIN g ORDER BY position""".stripMargin) { (s, dir) =>
    val pc = t(s, dir, "events")
      .filter(col("event_type").isin("view", "click"))
      .groupBy((get_json_object(col("props"), "$.k").cast("bigint") % 10)
        .as("position"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"))
    val g = pc.agg(sum("views").as("gv"), sum("clicks").as("gc"))
    pc.crossJoin(broadcast(g))
      .select(col("position"), col("views"), col("clicks"),
        round(col("clicks").cast("double") / col("views"), 6).as("ctr"),
        round((col("clicks").cast("double") / col("views")) /
          (col("gc").cast("double") / col("gv").cast("double")), 6).as("lift"))
      .orderBy("position")
  }

  /** Empirical-Bayes shrunk CTR (Beta(2, 50) prior): the raw-vs-shrunk
    * ranking — shrinkage demotes low-evidence items exactly like Wilson
    * but with a closed-form posterior mean (clicks+α)/(views+α+β); both
    * are exact integer-ratio doubles. */
  val itemCtrShrinkage = Q(
    "item_ctr_shrinkage",
    s"""WITH $ItemCountsSql
       |SELECT item, CAST(views AS BIGINT) AS views,
       |  CAST(clicks AS BIGINT) AS clicks,
       |  ROUND(CAST(clicks AS DOUBLE) / views, 6) AS raw_ctr,
       |  ROUND(CAST(clicks + 2 AS DOUBLE) / (views + 52), 6) AS shrunk_ctr
       |FROM ic WHERE views > 0
       |ORDER BY CAST(clicks + 2 AS DOUBLE) / (views + 52) DESC, item
       |LIMIT 50""".stripMargin) { (s, dir) =>
    val ic = itemCounts(t(s, dir, "events")).filter(col("views") > 0)
    val shrunk = (col("clicks") + lit(2L)).cast("double") /
      (col("views") + lit(52L))
    ic.select(col("item"), col("views"), col("clicks"),
        round(col("clicks").cast("double") / col("views"), 6).as("raw_ctr"),
        shrunk.as("s_raw"))
      .orderBy(col("s_raw").desc, col("item"))
      .limit(50)
      .select(col("item"), col("views"), col("clicks"), col("raw_ctr"),
        round(col("s_raw"), 6).as("shrunk_ctr"))
  }

  val all: Seq[Q] = Seq(ctrWilsonTopk, clickPositionCurve, itemCtrShrinkage)
}
