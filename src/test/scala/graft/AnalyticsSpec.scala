package graft

import org.apache.spark.sql.functions._

/** Approx-percentile tolerance vs exact (the no-oracle D4-style check). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile within 2% relative of exact percentile") {
    val orders = Tables.load(spark, sfDir, "orders")
    val exact = orders.agg(expr("percentile(o_totalprice, 0.5)")).head.getDouble(0)
    val approx = orders
      .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)")).head.getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("pivot with explicit values is total and zero-filled") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("k", "v")
    val out = df.groupBy("k").pivot("v", Seq("x", "y", "z")).agg(count(lit(1)))
      .na.fill(0L).orderBy("k").collect()
    assert(out.map(_.toSeq).toSeq == Seq(Seq("a", 2L, 0L, 0L), Seq("b", 0L, 1L, 0L)))
  }
}
