package graft

import graft.operators.PrivacyOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-20 privacy audits. */
class PrivacySpec extends SparkSpec {

  test("k-anonymity: summary min matches, violations are exactly the <k groups") {
    val groups = Tables.load(spark, sfDir, "customer")
      .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    val out = PrivacyOps.privacyKAnonymity.fn(spark, sfDir).collect()
    val summary = out.filter(_.getInt(0) == -1)
    assert(summary.length == 1 && summary.head.getLong(2) == groups.values.min)
    val viol = out.filter(_.getInt(0) != -1)
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    assert(viol == groups.filter(_._2 < 10), "violating groups")
  }

  test("l-diversity: bands bounded by 3, flag consistent, groups complete") {
    val nGroups = Tables.load(spark, sfDir, "customer")
      .select("c_nationkey", "c_mktsegment").distinct().count()
    val out = PrivacyOps.privacyLDiversity.fn(spark, sfDir).collect()
    assert(out.length == nGroups, "every QI group reported")
    out.foreach { r =>
      val (sz, bands, flag) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bands >= 1 && bands <= 3)
      assert(bands <= sz)
      assert(flag == (if (bands < 3) 1L else 0L))
    }
  }
}
