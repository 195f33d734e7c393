package graft

import graft.scale.Scale
import org.apache.spark.sql.functions._

/** Skew + co-location utilities: result equality and plan shape. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of the fact rows share one key — the pathological producer.
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val dim = (1 to 2000).map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val plain = fact.join(dim, $"k" === $"dk")
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("bucketed co-located join has no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(
        Tables.load(spark, sfDir, "lineitem"), "b_lineitem", "l_orderkey", 8)
      Scale.writeBucketed(
        Tables.load(spark, sfDir, "orders"), "b_orders", "o_orderkey", 8)
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderstatus").count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      val exchangesBeforeAgg = "ShuffleExchange".r
        .findAllIn(plan.substring(plan.indexOf("SortMergeJoin"))).size
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(exchangesBeforeAgg == 0,
        s"bucketed join must not shuffle its inputs:\n${plan.take(1500)}")
      // sanity: same answer as the unbucketed join
      val expect = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderstatus").count()
        .collect().map(_.toSeq).toSet
      assert(j.collect().map(_.toSeq).toSet == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
