package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.GraftTestBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Dims.localizeSmall / memoCount — the plan-time dimension-arm
  * materialization (round-11, VERDICT r10 items 1+2). */
class DimsSpec extends SparkSpec {

  private def withJobCounter[A](f: AtomicInteger => A): A = {
    val jobs = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try f(jobs) finally spark.sparkContext.removeSparkListener(l)
  }

  test("localizeSmall returns a row-identical local twin under the gate") {
    Dims.clear()
    val src = Tables.load(spark, sfDir, "nation").select("n_nationkey", "n_name")
    val local = Dims.localizeSmall(src, "dimspec-nation", 32)
    assert(local.isDefined, "25-row nation must pass the byte gate")
    val p = local.get.queryExecution.optimizedPlan.toString
    assert(p.contains("LocalDimRelation"), p)
    assert(local.get.collect().toSet == src.collect().toSet)
    assert(local.get.schema == src.schema)
  }

  test("second localization of the same arm runs zero jobs (memoized)") {
    Dims.clear()
    val src = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    Dims.localizeSmall(src, "dimspec-memo", 8) // first: pays the collect
    withJobCounter { jobs =>
      GraftTestBridge.drainListenerBus(spark.sparkContext)
      jobs.set(0)
      val again = Dims.localizeSmall(src, "dimspec-memo", 8)
      GraftTestBridge.drainListenerBus(spark.sparkContext)
      assert(again.isDefined)
      assert(jobs.get() == 0, s"memoized localization ran ${jobs.get()} job(s)")
    }
  }

  test("an arm over the byte gate is refused (caller keeps distributed plan)") {
    Dims.clear()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // 64-byte threshold: even 25-row nation busts it at 32 B/row.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val src = Tables.load(spark, sfDir, "nation").select("n_nationkey")
      assert(Dims.localizeSmall(src, "dimspec-toobig", 32).isEmpty)
      // The refusal is memoized too: re-asking runs zero jobs.
      withJobCounter { jobs =>
        GraftTestBridge.drainListenerBus(spark.sparkContext)
        jobs.set(0)
        assert(Dims.localizeSmall(src, "dimspec-toobig", 32).isEmpty)
        GraftTestBridge.drainListenerBus(spark.sparkContext)
        assert(jobs.get() == 0, s"memoized refusal ran ${jobs.get()} job(s)")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("memoCount folds one count per tag") {
    Dims.clear()
    val docs = Tables.load(spark, sfDir, "documents")
    val n = Dims.memoCount(docs, "dimspec-count")
    assert(n == docs.count())
    withJobCounter { jobs =>
      GraftTestBridge.drainListenerBus(spark.sparkContext)
      jobs.set(0)
      assert(Dims.memoCount(docs, "dimspec-count") == n)
      GraftTestBridge.drainListenerBus(spark.sparkContext)
      assert(jobs.get() == 0, s"memoized count ran ${jobs.get()} job(s)")
    }
  }

  test("a localized arm feeds non-broadcast consumers correctly " +
      "(doExecute path: aggregates, shuffles)") {
    Dims.clear()
    val src = Tables.load(spark, sfDir, "nation")
      .select("n_nationkey", "n_regionkey")
    val local = Dims.localizeSmall(src, "dimspec-exec", 16).get
    // Aggregate over the local relation — runs through doExecute
    // (parallelize), not the overridden collect paths.
    val got = local.groupBy("n_regionkey")
      .agg(count(lit(1)).as("n")).orderBy("n_regionkey")
      .collect().map(r => (r.get(0), r.getLong(1))).toSeq
    val want = src.groupBy("n_regionkey")
      .agg(count(lit(1)).as("n")).orderBy("n_regionkey")
      .collect().map(r => (r.get(0), r.getLong(1))).toSeq
    assert(got == want)
    // And through a repartition (shuffle write/read of the local rows).
    assert(local.repartition(4).count() == src.count())
  }

  test("second construction of q3/q5 runs zero jobs (VERDICT r10 item 2)") {
    SparkEntry.queries("q3_shipping_priority")(spark, sfDir)
    SparkEntry.queries("q5_local_supplier")(spark, sfDir)
    withJobCounter { jobs =>
      GraftTestBridge.drainListenerBus(spark.sparkContext)
      jobs.set(0)
      SparkEntry.queries("q3_shipping_priority")(spark, sfDir)
      SparkEntry.queries("q5_local_supplier")(spark, sfDir)
      GraftTestBridge.drainListenerBus(spark.sparkContext)
      assert(jobs.get() == 0,
        s"re-construction of q3/q5 ran ${jobs.get()} job(s)")
    }
  }
}
