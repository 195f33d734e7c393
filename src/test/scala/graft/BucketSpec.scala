package graft

import graft.operators.LayoutOps

/** Plan law for the wave-21 bucketed join: with both sides bucketed AND
  * sorted on the join key, the sort-merge join must read bucket pairs
  * directly — no ShuffleExchange (and no re-Sort) on either side. */
class BucketSpec extends SparkSpec {

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val df = LayoutOps.layoutBucketJoin.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // The only exchange allowed is the single-partition one for the final
    // ORDER BY; the join inputs themselves must be exchange-free.
    val joinSection = plan.split("SortMergeJoin").last
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"join inputs must not re-shuffle:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("bucketing changes the plan, never the answer") {
    import org.apache.spark.sql.functions._
    val bucketed = LayoutOps.layoutBucketJoin.fn(spark, sfDir).collect()
    val plain = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        Parity.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority").collect()
    assert(bucketed.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }
}
