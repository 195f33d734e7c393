package graft

import org.apache.spark.sql.functions._

/** Sketch operators: bitmap-bucket exact distinct must equal
  * COUNT(DISTINCT); HLL sketches must obey the partial-merge law (union of
  * per-split sketches == one-shot sketch) and sit within the lgK=14 error
  * bound of the exact count. */
class SketchSpec extends SparkSpec {

  test("bitmap-bucket distinct equals COUNT(DISTINCT) per group") {
    val got = operators.SketchOps.aggBitmapDistinct.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("hll estimate within 2% of exact at lgK=14") {
    val rows = operators.SketchOps.aggHllSketch.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val relErr = r.getDouble(r.fieldIndex("rel_err"))
      assert(relErr < 0.02, s"rel_err=$relErr for ${r.get(0)}")
    }
  }

  test("hll partial sketches union to the one-shot estimate (merge law)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    // Partial per linestatus split, then union — the storable-partial path.
    val merged = li
      .groupBy("l_linestatus")
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head.getLong(0)
    val oneShot = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))"))
      .head.getLong(0)
    assert(merged == oneShot, s"merged=$merged oneShot=$oneShot")
  }
}
