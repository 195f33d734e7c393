package graft

import org.apache.spark.sql.functions._

/** InjectRuntimeFilter evidence (wave 31): with the application-side
  * scan-size threshold lowered to test scale, the fact ⋈ selective-dim
  * merge join must carry a bloom `might_contain` prefilter on the fact
  * side — and the filter must not change results. Production keeps the
  * 10 GB threshold: the filter injects exactly when the scan is big
  * enough for semi-join reduction to pay. */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom runtime filter injects into the fact side and preserves " +
      "results") {
    val conf = spark.conf
    val key =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val enabledKey = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = Seq(key, enabledKey, bcastKey)
      .map(k => k -> util.Try(Option(conf.get(k))).toOption.flatten).toMap
    try {
      conf.set(enabledKey, "true")
      conf.set(key, "1024")
      // InjectRuntimeFilter declines when EITHER side is broadcastable by
      // size (a broadcast join already prunes at the probe). At test
      // scale the filtered orders side is a few KB, so emulate at-scale
      // sizes; at 100 TB the dim side clears 10 MB on its own.
      conf.set(bcastKey, "-1")
      val df = operators.RuntimeFilterOps.factJoin(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom runtime filter in optimized plan:\n$plan")
      val withFilter = operators.RuntimeFilterOps.joinBloomPrefilter
        .fn(spark, sfDir).collect().toSeq
      conf.set(key, (10L << 40).toString) // effectively off at test scale
      val without = operators.RuntimeFilterOps.joinBloomPrefilter
        .fn(spark, sfDir).collect().toSeq
      assert(withFilter == without,
        "bloom prefilter changed join results")
      assert(withFilter.nonEmpty, "fixture produced no high-value orders")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
