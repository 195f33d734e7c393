package graft

import graft.operators.RecursiveOps

/** Behavior laws for the wave-27 recursive-CTE pack: the key hierarchy is
  * a perfect binary tree, so every level count and subtree total is
  * computable in closed form / by driver-side recursion. */
class RecursiveSpec extends SparkSpec {

  test("hierarchy: perfect-binary-tree level profile, full coverage") {
    val maxKey = Tables.load(spark, sfDir, "customer")
      .agg(org.apache.spark.sql.functions.max("c_custkey")).head.getLong(0)
    val out = RecursiveOps.sqlRecursiveHierarchy.fn(spark, sfDir).collect()
    // Level d holds keys [2^(d-1), 2^d - 1] clipped to the key range.
    out.foreach { r =>
      val d = r.getInt(0)
      val lo = 1L << (d - 1); val hi = (1L << d) - 1
      assert(r.getLong(2) == lo, s"level $d min")
      assert(r.getLong(3) == math.min(hi, maxKey), s"level $d max")
      assert(r.getLong(1) == math.min(hi, maxKey) - lo + 1, s"level $d count")
    }
    // Every customer key ≥ 1 appears exactly once across levels (key 0
    // is its own parent — 0 DIV 2 = 0 — so it is outside root 1's tree
    // by construction).
    import org.apache.spark.sql.functions.col
    assert(out.map(_.getLong(1)).sum ==
      Tables.load(spark, sfDir, "customer")
        .filter(col("c_custkey") >= 1).count())
  }

  test("rollup: subtree totals match a driver-side recursion") {
    import spark.implicits._
    val bal = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_acctbal").as[(Long, Double)].collect().toMap
    def subtree(k: Long): Seq[Long] =
      if (!bal.contains(k)) Nil
      else k +: (subtree(2 * k) ++ subtree(2 * k + 1))
    val out = RecursiveOps.sqlRecursiveRollup.fn(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L, 5L))
    out.foreach { r =>
      val keys = subtree(r.getLong(0))
      assert(r.getLong(1) == keys.length, s"root ${r.getLong(0)} size")
      val exact = keys.map(k => BigDecimal(bal(k)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - exact) < 1e-9,
        s"root ${r.getLong(0)} balance")
    }
  }
}
