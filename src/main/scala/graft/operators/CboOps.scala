package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Parity, Q, Tables}

/** Cost-based-optimizer statistics pipeline (VERDICT r6 item 3).
  *
  * Everywhere else in the engine, join order is hand-tuned (explicit
  * `broadcast()` hints, dims-first star composition) + AQE. That holds for
  * a curated query library, but at 100 TB a user composing AD-HOC joins
  * over the same tables needs `CostBasedJoinReorder` to fire — and it
  * only fires when (a) `spark.sql.cbo.enabled` + `joinReorder.enabled`
  * are on and (b) every joined relation carries CATALOG statistics
  * (row counts + per-column NDV/min/max from `ANALYZE TABLE … COMPUTE
  * STATISTICS FOR ALL COLUMNS`). Path-based `spark.read.parquet` frames
  * can never satisfy (b) — stats live in the metastore — so this module
  * registers the corpus tables as EXTERNAL catalog tables (location =
  * the same parquet files; no data copied) and analyzes them once per
  * (dir, table) per JVM.
  *
  * The declared query [[cboJoinReorder]] is written in a deliberately
  * WRONG order — fact ⋈ fact first, the selective dimension last — with
  * no broadcast hints: its plan is whatever CBO derives. CboSpec asserts
  * the optimizer actually moves the selective customer arm before the
  * lineitem fact, and that enabling CBO does not change results.
  *
  * Scale shape: ANALYZE is one full-scan aggregate per table, amortized
  * over every later query (the classic warehouse stats job); at 100 TB
  * it runs incrementally per partition on ingest. The CBO confs live in
  * the SESSION SETUP (GraftSession.builder / Verify / Bench / the shared
  * test session), NOT here (round-8 ADVICE fix: a registration-time
  * conf.set made later queries' plan behavior depend on execution order)
  * — harmless for the rest of the suite because CBO costing only
  * activates on relations WITH catalog stats, and only the `graft_cbo_*`
  * tables have them.
  */
object CboOps {

  /** Tables that participate in the CBO demonstration (events excluded:
    * its loader normalizes `ts`, which a raw external-table registration
    * would bypass). */
  private val CboTables = Seq("customer", "orders", "lineitem", "nation")

  private val analyzed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Stable suffix so the same table name can be registered for different
    * sf dirs in one metastore. First 12 hex of md5(abs path) — a full-width
    * digest prefix (round-8 ADVICE fix: the former 32-bit String.hashCode
    * could alias two dirs to one table name, silently reading the wrong
    * dir's data; 48 bits puts a birthday collision beyond any plausible
    * number of registered dirs). */
  private def dirTag(dir: String): String = {
    val abs = java.nio.file.Paths.get(dir).toAbsolutePath.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  /** Catalog-backed, ANALYZEd view of `<dir>/<name>.parquet`. Registration
    * + ANALYZE run once per (dir, name) per JVM; later calls are a pure
    * catalog lookup. */
  def analyzedTable(s: SparkSession, dir: String, name: String): DataFrame = {
    val tbl = s"graft_cbo_${name}_${dirTag(dir)}"
    if (analyzed.add(s"${s.sparkContext.applicationId}/$tbl")) {
      val cols = Tables.schemas(name)
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl ($cols) USING parquet " +
        s"LOCATION '$dir/$name.parquet'")
      s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    s.table(tbl)
  }

  /** The deliberately mis-ordered join, hint-free: (lineitem ⋈ orders) ⋈
    * customer[BUILDING] ⋈ nation as WRITTEN — the worst legal order, two
    * facts first. With catalog stats + CBO, `CostBasedJoinReorder`
    * re-derives the selective-dim-first order a human would write (and
    * the star-join queries elsewhere in this repo DO write by hand). */
  private[graft] def misorderedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = analyzedTable(s, dir, "lineitem")
    val ord = analyzedTable(s, dir, "orders")
    val cust = analyzedTable(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val nat = analyzedTable(s, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
  }

  val cboJoinReorder = Q(
    "cbo_join_reorder",
    s"""SELECT n_name,
       |  CAST(COUNT(*) AS BIGINT) AS n_items,
       |  CAST(SUM(${Parity.sqlDec2("l_extendedprice")} *
       |           ${Parity.sqlDec2("1 - l_discount")}) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    misorderedJoin(s, dir)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(Parity.dec2(col("l_extendedprice")) *
            Parity.dec2(lit(1) - col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("n_name")
  }

  val all: Seq[Q] = Seq(cboJoinReorder)
}
