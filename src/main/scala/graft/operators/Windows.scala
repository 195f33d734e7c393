package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Parity._

/** SURVEY §2-E: window functions.
  *
  * Every window partitions by a real key (customer / user), so at scale each
  * WindowExec is one shuffle on the partition key + per-partition sort — no
  * single-partition global windows anywhere (those would serialize 100 TB
  * through one task).
  */
object Windows {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** E1 — per-partition top-N with ranking family. */
  val rankTopN = Q(
    "win_rank_topn",
    """SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT c_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM customer JOIN orders ON c_custkey = o_custkey) x
      |WHERE rn <= 3 ORDER BY c_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("c_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("c_custkey", "rn")
  }

  /** E2 — running (cumulative) sum per user over event time.
    * Decimal accumulation keeps the running values bit-identical to the
    * oracle regardless of evaluation strategy. */
  val runningSum = Q(
    "win_running",
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(12,2)")).over(w)
          .cast("double").as("running_total"),
        count(lit(1)).over(w).as("n_so_far"))
      .orderBy("event_id")
  }

  /** E3 — lag/lead: inter-arrival gaps per user. */
  val lagLead = Q(
    "win_lag_lead",
    """SELECT event_id, user_id,
      |  epoch_ms(ts) - epoch_ms(LAG(ts, 1) OVER w) AS gap_ms,
      |  LAG(value, 1) OVER w AS prev_value,
      |  LEAD(event_id, 1) OVER w AS next_event
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts")
    t(s, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        (unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))).as("gap_ms"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("event_id"), 1).over(w).as("next_event"))
      .orderBy("event_id")
  }

  /** E4 — bounded sliding frame: 4-row moving average per user. */
  val slidingFrame = Q(
    "win_sliding_frame",
    """SELECT event_id, user_id,
      |  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg,
      |  MAX(value) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_max
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-3, 0)
    t(s, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        round(avg(col("value")).over(w), 4).as("moving_avg"),
        max(col("value")).over(w).as("moving_max"))
      .orderBy("event_id")
  }

  /** E5 — distribution ranks: ntile / percent_rank / cume_dist, within a
    * real partition key. A keyless total-order window would serialize the
    * whole table through ONE task at 100 TB; ranking within o_orderstatus
    * shuffles on the key and sorts per partition like every other window
    * here. Tiebreak on o_orderkey makes every rank deterministic. */
  val ntilePct = Q(
    "win_ntile_pct",
    """SELECT o_orderkey, o_orderstatus,
      |  NTILE(10) OVER w AS decile,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |  ROUND(CUME_DIST() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey LIMIT 2000""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_orderstatus"),
        ntile(10).over(w).as("decile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderkey").limit(2000)
  }

  /** E4 — value-range frame (RANGE BETWEEN n PRECEDING): all orders within
    * a price band below the current row, per status. Decimal accumulation
    * for cross-engine sum parity. */
  val rangeFrame = Q(
    "win_range_frame",
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  COUNT(*) OVER w AS n_in_band,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS band_sum
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
      |             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey LIMIT 2000""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
      .rangeBetween(-10000, Window.currentRow)
    t(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_in_band"),
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("double").as("band_sum"))
      .orderBy("o_orderkey").limit(2000)
  }

  /** E3-adjacent — first_value/last_value/nth_value: each event annotated
    * with its user's session entry, exit and third touch. The full
    * partition frame is EXPLICIT on both engines (last_value's default
    * frame stops at CURRENT ROW — the classic silent-wrong-answer);
    * ordering is pinned unique by (ts, event_id). */
  val firstLast = Q(
    "win_first_last",
    """SELECT event_id, user_id,
      |  FIRST_VALUE(event_type) OVER w AS first_type,
      |  LAST_VALUE(event_type) OVER w AS last_type,
      |  NTH_VALUE(event_type, 3) OVER w AS third_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 3).over(w).as("third_type"))
      .orderBy("event_id")
  }

  /** E1-adjacent — RANK vs DENSE_RANK under heavy ties (l_quantity repeats
    * constantly): rank leaves gaps after tie groups, dense_rank doesn't —
    * the pair a reporting layer actually distinguishes. Rows sharing
    * (flag, quantity) share both ranks, so the full-row ORDER BY leaves
    * only interchangeable duplicates (the hash-safe tie convention). */
  val denseRank = Q(
    "win_dense_rank",
    """SELECT l_returnflag, l_quantity,
      |  CAST(RANK() OVER w AS BIGINT) AS rnk,
      |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
      |ORDER BY l_returnflag, l_quantity DESC, rnk, drnk""".stripMargin) {
    (s, dir) =>
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity").desc)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy(col("l_returnflag"), col("l_quantity").desc, col("rnk"),
          col("drnk"))
  }

  val all: Seq[Q] = Seq(rankTopN, runningSum, lagLead, slidingFrame, ntilePct,
    rangeFrame, firstLast, denseRank)
}
