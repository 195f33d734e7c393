package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

/** CostBasedJoinReorder evidence (VERDICT r6 item 3): with catalog stats
  * from the ANALYZE pipeline and CBO on, a deliberately mis-ordered
  * hint-free join chain must be reordered by the optimizer — and the
  * reordering must not change results. */
class CboSpec extends SparkSpec {

  /** Leaf relation names in tree order — join order reads left-to-right
    * off this sequence (column pruning etc. never permute leaves; only
    * join reorder does). */
  private def leafOrder(plan: LogicalPlan): Seq[String] =
    plan.collectLeaves().map { l =>
      val s = l.toString
      Seq("lineitem", "orders", "customer", "nation")
        .find(t => s.contains(s"graft_cbo_${t}_")).getOrElse("?")
    }

  test("CostBasedJoinReorder reorders the deliberately mis-ordered join") {
    val df = operators.CboOps.misorderedJoin(spark, sfDir)
    assert(spark.conf.get("spark.sql.cbo.enabled") == "true",
      "stats pipeline must enable CBO")
    val declared = leafOrder(df.queryExecution.analyzed)
    val optimized = leafOrder(df.queryExecution.optimizedPlan)
    assert(declared == Seq("lineitem", "orders", "customer", "nation"),
      s"fixture drifted: declared order was $declared")
    assert(optimized != declared,
      s"CBO did not reorder the join: optimized order still $optimized")
    // The selective BUILDING-filtered customer arm must join before the
    // lineitem fact — the order a human (and q3) writes by hand.
    assert(optimized.indexOf("customer") < optimized.indexOf("lineitem"),
      s"expected the selective customer arm before the lineitem fact, " +
        s"got $optimized")
  }

  test("CBO-derived plan matches the hand-ordered formulation's results") {
    val cbo = operators.CboOps.cboJoinReorder.fn(spark, sfDir)
    val hand = {
      val cust = Tables.load(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val nat = Tables.load(spark, sfDir, "nation")
      val ord = Tables.load(spark, sfDir, "orders")
      val li = Tables.load(spark, sfDir, "lineitem")
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(ord, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(Parity.dec2(col("l_extendedprice")) *
              Parity.dec2(lit(1) - col("l_discount")))
            .cast("double").as("revenue"))
        .orderBy("n_name")
    }
    assert(cbo.collect().toSeq == hand.collect().toSeq,
      "CBO reorder changed results")
  }
}
