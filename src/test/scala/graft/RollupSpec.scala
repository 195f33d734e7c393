package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Semantic-equivalence law for the round-14 re-aggregation rollup
  * (Aggs.rollupFromBase): aggregating to the finest grouping first and
  * expanding only the base must equal Spark's direct rollup/cube —
  * INCLUDING on data-null group keys, which the shipped corpus never
  * exercises (a data-null detail row and a subtotal row share the same
  * NULL rendering in BOTH formulations, so the row multisets must
  * match exactly).
  */
class RollupSpec extends SparkSpec {

  private def fixture: DataFrame = {
    import spark.implicits._
    Seq(
      (Some("O"), Some("1-URGENT"), 10.1234),
      (Some("O"), Some("1-URGENT"), 0.005),
      (Some("O"), None, 3.33),
      (None, Some("2-HIGH"), 7.77),
      (None, None, 1.0),
      (Some("F"), Some("2-HIGH"), 2.5)
    ).toDF("st", "pr", "price")
      .select(col("st"), col("pr"),
        col("price").cast(DoubleType).as("price"))
  }

  private def direct(f: DataFrame, cube: Boolean): Seq[(Option[String],
      Option[String], Long, Double)] = {
    val g = if (cube) f.cube("st", "pr") else f.rollup("st", "pr")
    g.agg(count(lit(1)).as("n"),
        round(sum(col("price").cast(DecimalType(18, 4))), 2)
          .cast(DoubleType).as("sp"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2, x._3, x._4)).toSeq
  }

  private def reagg(f: DataFrame, cube: Boolean): Seq[(Option[String],
      Option[String], Long, Double)] = {
    val base = f.groupBy("st", "pr")
      .agg(count(lit(1)).as("bn"),
        sum(col("price").cast(DecimalType(18, 4))).as("bs"))
    val g = if (cube) base.cube("st", "pr") else base.rollup("st", "pr")
    g.agg(sum(col("bn")).as("n"),
        round(sum(col("bs")), 2).cast(DoubleType).as("sp"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2, x._3, x._4)).toSeq
  }

  test("re-aggregated rollup == direct rollup on null-bearing keys") {
    assert(reagg(fixture, cube = false) == direct(fixture, cube = false))
  }

  test("re-aggregated cube == direct cube on null-bearing keys") {
    assert(reagg(fixture, cube = true) == direct(fixture, cube = true))
  }

  test("declared rollup_agg and cube keys remain Expand-over-base plans") {
    // The Expand must sit ABOVE the first aggregate (over the tiny base),
    // not between the scan and the partial aggregate.
    Seq(graft.operators.Aggs.aggRollup, graft.operators.Aggs.aggCube)
      .foreach { q =>
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        val iExpand = plan.indexOf("Expand")
        val iScan = plan.indexOf("Scan parquet")
        assert(iExpand >= 0 && iScan >= 0, s"${q.name}: plan shape")
        // toString prints top-down: the scan is the LAST line, Expand
        // above it with at least one HashAggregate in between.
        val between = plan.substring(iExpand, iScan)
        assert(between.contains("HashAggregate"),
          s"${q.name}: Expand must apply to the aggregated base, " +
            s"not the raw scan")
      }
  }
}
