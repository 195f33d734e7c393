package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Parity._

/** Relational core: TPC-H-shaped headline queries (SURVEY §2 A/B/D/F).
  *
  * All queries are declarative DataFrame compositions — Catalyst handles
  * predicate pushdown into the parquet scan, column pruning, and two-phase
  * (partial + final) hash aggregation; at cluster scale each groupBy is one
  * shuffle on the grouping keys with map-side combine, which is the optimal
  * shape for these aggregates.
  */
object Relational {

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")

  /** D1/B2/F1 — TPC-H q1 pricing summary (adapted to the reduced columns). */
  val q1 = Q(
    "q1_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(${sqlDec2("l_extendedprice")} * ${sqlDec2("1 - l_discount")}) AS DOUBLE) AS sum_disc_price,
       |  CAST(ROUND(SUM(${sqlDec2("l_extendedprice")} * ${sqlDec2("1 - l_discount")} * ${sqlDec2("1 + l_tax")}), 2) AS DOUBLE) AS sum_charge,
       |  ${sqlRavg("l_quantity")} AS avg_qty,
       |  ${sqlRavg("l_extendedprice")} AS avg_price,
       |  ${sqlRavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    li(s, dir)
      .filter(to_date(col("l_shipdate")) <= lit("2001-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        // The scale-6 triple-product sum crosses 2^53 (scaled) near sf≈1,
        // where DuckDB's decimal→double cast double-rounds (int128→double
        // →divide) while Spark's BigDecimal converts correctly rounded —
        // a 1-ulp divergence found by the round-4 10× run. ROUND to scale
        // 2 first (half-away-from-zero in BOTH engines — a downscale CAST
        // would truncate in DuckDB): the scaled integer stays exact in
        // double through ~9e13, so both engines convert identically.
        round(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")) *
            dec2(lit(1) + col("l_tax"))), 2)
          .cast("double").as("sum_charge"),
        ravg(col("l_quantity")).as("avg_qty"),
        ravg(col("l_extendedprice")).as("avg_price"),
        ravg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .transform(sortedSmall(_, col("l_returnflag"), col("l_linestatus")))
  }

  /** B2/D2 — TPC-H q6 forecast revenue: tight scan-filter-global-agg. */
  val q6 = Q(
    "q6_forecast_revenue",
    s"""SELECT CAST(SUM(${sqlDec2("l_extendedprice")} * ${sqlDec2("l_discount")}) AS DOUBLE) AS revenue
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
       |  AND l_discount BETWEEN 0.03 AND 0.07
       |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    li(s, dir)
      .filter(
        to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1998-01-01") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("revenue"))
  }

  val all: Seq[Q] = Seq(q1, q6)
}
