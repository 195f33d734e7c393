package graft

import graft.operators.Aggs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Laws for the bounded projection cache (round 14, VERDICT r13 item 5).
  * The budget is controlled through the `graft.colcache.mb` system
  * property; every test restores the default (disabled) state.
  */
class ColumnCacheSpec extends SparkSpec {

  private def withBudget[A](mb: Long)(body: => A): A =
    try {
      sys.props("graft.colcache.mb") = mb.toString
      ColumnCache.clear()
      body
    } finally {
      sys.props -= "graft.colcache.mb"
      ColumnCache.clear()
    }

  private def cachedRelations(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: InMemoryRelation => r
    }.size

  test("disabled by default: serve is the plain pruned scan") {
    ColumnCache.clear()
    val df = ColumnCache.serve(spark, sfDir, "orders",
      Seq("o_orderstatus", "o_custkey"))
    assert(cachedRelations(df) == 0)
    assert(ColumnCache.admittedBytes(spark) == 0)
    val plain = Tables.load(spark, sfDir, "orders")
      .select("o_orderstatus", "o_custkey")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }

  test("enabled: cached, row-identical, and shared across the family") {
    withBudget(256) {
      val cached = ColumnCache.serve(spark, sfDir, "orders",
        Seq("o_orderstatus", "o_custkey"))
      assert(cachedRelations(cached) == 1, "projection served from cache")
      val admitted = ColumnCache.admittedBytes(spark)
      assert(admitted > 0)
      val plain = Tables.load(spark, sfDir, "orders")
        .select("o_orderstatus", "o_custkey")
      assert(cached.collect().toSeq == plain.collect().toSeq)

      // A subset projection reuses the SAME entry: no new admission.
      val subset = ColumnCache.serve(spark, sfDir, "orders",
        Seq("o_custkey"))
      assert(cachedRelations(subset) == 1)
      assert(ColumnCache.admittedBytes(spark) == admitted)

      // Widening admits the union as the new serving entry; the
      // superseded narrow copy is RETAINED and stays accounted (an
      // already-handed-out DF would silently re-persist an unpersisted
      // plan — code review round-14), so admitted bytes grow.
      val widened = ColumnCache.serve(spark, sfDir, "orders",
        Seq("o_orderstatus", "o_orderpriority", "o_totalprice"))
      assert(cachedRelations(widened) == 1)
      val widenedBytes = ColumnCache.admittedBytes(spark)
      assert(widenedBytes > admitted)
      val again = ColumnCache.serve(spark, sfDir, "orders",
        Seq("o_custkey", "o_totalprice"))
      assert(cachedRelations(again) == 1)
      assert(ColumnCache.admittedBytes(spark) == widenedBytes)
    }
  }

  test("over-budget: falls through to the plain scan, never evicts") {
    try {
      ColumnCache.clear()
      // Budget sized to admit the orders slice but NOT the documents
      // text slice on top of it (byte-granular property — the shipped
      // fixtures are KB-sized).
      val ordersEst = plans.PlanStats.parquetColumnBytes(
        Tables.load(spark, sfDir, "orders")
          .select("o_orderstatus", "o_custkey"),
        Seq("o_orderstatus", "o_custkey")).get
      val docsEst = plans.PlanStats.parquetColumnBytes(
        Tables.load(spark, sfDir, "documents").select("doc_id", "text"),
        Seq("doc_id", "text")).get
      sys.props("graft.colcache.bytes") = (ordersEst + docsEst - 1).toString

      val first = ColumnCache.serve(spark, sfDir, "orders",
        Seq("o_orderstatus", "o_custkey"))
      assert(cachedRelations(first) == 1)
      val admitted = ColumnCache.admittedBytes(spark)
      assert(admitted == ordersEst)

      val over = ColumnCache.serve(spark, sfDir, "documents",
        Seq("doc_id", "text"))
      assert(cachedRelations(over) == 0, "over budget serves the plain scan")
      val plain = Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text")
      assert(over.collect().toSeq == plain.collect().toSeq)

      // The earlier entry survived the refusal.
      val reuse = ColumnCache.serve(spark, sfDir, "orders",
        Seq("o_custkey"))
      assert(cachedRelations(reuse) == 1)
      assert(ColumnCache.admittedBytes(spark) == admitted)
    } finally {
      sys.props -= "graft.colcache.bytes"
      ColumnCache.clear()
    }
  }

  test("second live session admitting an occupied key retires, not " +
      "orphans, the first session's entry") {
    withBudget(256) {
      val a = ColumnCache.serve(spark, sfDir, "orders",
        Seq("o_orderstatus", "o_custkey"))
      assert(cachedRelations(a) == 1)
      val aBytes = ColumnCache.admittedBytes(spark)
      assert(aBytes > 0)

      // A second LIVE session (same SparkContext, distinct session
      // object) claims the same (dir, table) key. Pre-fix (ADVICE
      // round-14 medium) the put orphaned session 1's entry outside
      // entries/retired: bytes stuck in the budget forever, persisted
      // plan unreachable by clear().
      val spark2 = spark.newSession()
      val b = ColumnCache.serve(spark2, sfDir, "orders",
        Seq("o_custkey", "o_totalprice"))
      assert(cachedRelations(b) == 1)
      assert(ColumnCache.admittedBytes(spark2) > 0)
      // Session 1's copy was RETIRED: still accounted to its session,
      // still live for its handed-out DataFrame.
      assert(ColumnCache.admittedBytes(spark) == aBytes)
      assert(a.collect().nonEmpty)

      // clear() reaches the retired copy — both sessions back to zero.
      ColumnCache.clear()
      assert(ColumnCache.admittedBytes(spark) == 0)
      assert(ColumnCache.admittedBytes(spark2) == 0)
    }
  }

  test("declared weak keys: identical output with the cache on and off") {
    val keys = Seq(Aggs.aggRollup, Aggs.aggApproxDistinct,
      graft.operators.TextOps.dedupExact)
    val off = keys.map(q => q.fn(spark, sfDir).collect().toSeq)
    val on = withBudget(512) {
      keys.map { q =>
        val df = q.fn(spark, sfDir)
        assert(cachedRelations(df) >= 1, s"${q.name} routed through cache")
        df.collect().toSeq
      }
    }
    keys.indices.foreach(i =>
      assert(on(i) == off(i), s"${keys(i).name} cache-invariant"))
  }
}
