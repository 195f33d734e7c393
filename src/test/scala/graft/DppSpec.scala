package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dynamic-partition-pruning evidence (wave 33): the fact scan of the
  * partitioned events layout must carry a `dynamicpruning` subquery on
  * the partition column, and after execution the scan must have read
  * ONLY the 2 joined partitions of 5. */
class DppSpec extends SparkSpec {

  private def factScans(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collect { case f: FileSourceScanExec => f }
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("events_bydate")))
  }

  test("fact scan carries dynamicpruning and reads only joined partitions") {
    // AQE wraps completed stages in QueryStageExec nodes that hide the
    // scan from collect(); the pruning mechanism is identical either way,
    // so assert on the non-adaptive tree.
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = operators.DppOps.dppJoin(spark, sfDir)
      df.collect() // execute so scan metrics fill
      val scans = factScans(df.queryExecution.executedPlan)
      assert(scans.nonEmpty, "no partitioned fact scan found")
      val scan = scans.head
      assert(scan.partitionFilters.mkString.contains("dynamicpruning"),
        s"fact scan lacks a dynamicpruning filter: ${scan.partitionFilters}")
      // Metrics: 2 of 5 event_type leaves survive the runtime filter in
      // EVERY date directory — the layout copy is (event_date,
      // event_type) two-level, so expected = nDates × 2 of nDates × 5.
      val nDates = operators.DppOps.partitionedEvents(spark, sfDir)
        .select(org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts"))).distinct().count()
      val read = scan.metrics.get("numPartitions").map(_.value)
      assert(read.contains(2L * nDates),
        s"expected ${2 * nDates} leaf partitions read (view, click × " +
          s"$nDates days), metrics said " +
          s"${scan.metrics.view.mapValues(_.value).toMap}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("pruned join matches the static-filter formulation") {
    val pruned = operators.DppOps.joinPartitionPruned.fn(spark, sfDir)
      .collect().toSeq
    val static = {
      import org.apache.spark.sql.functions._
      Tables.load(spark, sfDir, "events")
        .filter(col("event_type").isin("view", "click"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Parity.dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
        .collect().toSeq
    }
    assert(pruned == static, "DPP join diverged from the static filter")
  }
}
