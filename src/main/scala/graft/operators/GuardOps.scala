package graft.operators

import graft.{Q, Tables}
import graft.Parity._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline guardrails, wave 18 (round 6): the checks a production data
  * pipeline runs BETWEEN stages — declarative data-quality expectations
  * and the partial-aggregate merge identity that incremental rollups and
  * retries depend on.
  *
  * Scale design:
  *  - data_expectations_check: each expectation is one aggregate over its
  *    table (map-side combined; the referential check is a broadcast-able
  *    left anti join collapsed to a count), unioned into a fixed-size
  *    report. At 100 TB the checks share table scans per Catalyst's CTE
  *    dedup and the output stays rule-count-sized.
  *  - agg_partial_merge: the mergeable-state pattern — per-(month, day)
  *    partial states (count / sum-as-decimal / min / max), then a second
  *    aggregate MERGES states into months. The oracle computes months
  *    DIRECTLY from rows, so every run re-proves merge(partials) ≡
  *    direct — the identity that makes incremental view maintenance,
  *    retry-safe backfills, and map-side combine itself correct. Decimal
  *    sum states make the merge order-independent (the dsum convention).
  */
object GuardOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Five production expectations over the order pipeline: range, null,
    * uniqueness, referential integrity, and domain membership. Output is
    * one row per rule: checked/violations/pass. */
  val dataExpectationsCheck = Q(
    "data_expectations_check",
    """SELECT * FROM (
      |  SELECT 1 AS rule_id, 'l_quantity_in_1_50' AS rule,
      |    (SELECT COUNT(*) FROM lineitem) AS n_checked,
      |    (SELECT COUNT(*) FROM lineitem
      |     WHERE l_quantity < 1 OR l_quantity > 50) AS n_violations
      |  UNION ALL
      |  SELECT 2, 'o_totalprice_positive',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders
      |     WHERE o_totalprice IS NULL OR o_totalprice <= 0)
      |  UNION ALL
      |  SELECT 3, 'o_orderkey_unique',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
      |     FROM orders)
      |  UNION ALL
      |  SELECT 4, 'l_orderkey_refs_orders',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 5, 'o_orderstatus_domain',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders
      |     WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
      |) ORDER BY rule_id""".stripMargin) { (s, dir) =>
    expectations(t(s, dir, "lineitem"), t(s, dir, "orders"))
  }

  /** The expectation engine, separable for spec corpora with planted
    * violations. */
  private[graft] def expectations(li: DataFrame, ord: DataFrame): DataFrame = {
    def report(id: Int, rule: String, checked: DataFrame, violations: Column)
        : DataFrame =
      checked.agg(count(lit(1)).as("n_checked"),
          sum(when(violations, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(id).as("rule_id"), lit(rule).as("rule"),
          col("n_checked"), col("n_violations"))
    val r1 = report(1, "l_quantity_in_1_50", li,
      col("l_quantity") < 1 || col("l_quantity") > 50)
    val r2 = report(2, "o_totalprice_positive", ord,
      col("o_totalprice").isNull || col("o_totalprice") <= 0)
    val r3 = ord.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
      .select(lit(3).as("rule_id"), lit("o_orderkey_unique").as("rule"),
        col("n_checked"), col("n_violations"))
    val orphan = li.join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val r4 = li.agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphan)
      .select(lit(4).as("rule_id"), lit("l_orderkey_refs_orders").as("rule"),
        col("n_checked"), col("n_violations"))
    val r5 = report(5, "o_orderstatus_domain", ord,
      !col("o_orderstatus").isin("O", "F", "P"))
    r1.union(r2).union(r3).union(r4).union(r5).orderBy("rule_id")
  }

  /** Partial-aggregate merge: daily (count, decimal-sum, min, max) states
    * over orders, merged into months — proven ≡ the direct monthly
    * aggregate by the oracle, which computes months straight from rows. */
  val aggPartialMerge = Q(
    "agg_partial_merge",
    s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       |  COUNT(*) AS n_orders,
       |  ${sqlDsum("o_totalprice")} AS sum_price,
       |  MIN(o_totalprice) AS min_price,
       |  MAX(o_totalprice) AS max_price
       |FROM orders GROUP BY 1 ORDER BY month""".stripMargin) { (s, dir) =>
    val daily = t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("p_count"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("p_sum"),
        min("o_totalprice").as("p_min"), max("o_totalprice").as("p_max"))
    daily.groupBy("month")
      .agg(sum("p_count").as("n_orders"),
        round(sum("p_sum"), 2).cast("double").as("sum_price"),
        min("p_min").as("min_price"), max("p_max").as("max_price"))
      .orderBy("month")
  }

  val all: Seq[Q] = Seq(dataExpectationsCheck, aggPartialMerge)
}
