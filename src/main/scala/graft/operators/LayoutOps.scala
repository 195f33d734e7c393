package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: keys you SORT/partition by at write time so that
  * later scans prune.
  *
  * Z-order (Morton) interleaves the bits of two dimension keys, so a range
  * predicate on EITHER dimension maps to a bounded number of contiguous
  * zkey ranges — files sorted by zkey carry min/max footer stats that
  * prune for both `WHERE custkey BETWEEN …` and `WHERE orderkey BETWEEN …`
  * queries, where a single-column sort only prunes one. At 100 TB this is
  * the difference between a full scan and reading a few percent of files
  * for the non-leading dimension.
  *
  * Spark-first note: the interleave is composed from built-in bitwise ops
  * (`shiftright`/`&`/`shiftleft`/`|`) — fully whole-stage-codegen'd, no
  * custom Expression needed (escalation ladder rung (a): compose existing
  * operators). The identical expression text doubles as the DuckDB oracle.
  */
object LayoutOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Bits per dimension (two 16-bit dims → 32-bit zkey). */
  val Bits = 16

  /** Morton-interleave two [0, 2^16) int columns into a zkey long:
    * bit i of x → bit 2i, bit i of y → bit 2i+1. */
  def zkey(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** SQL twin of [[zkey]] — same op tree, DuckDB syntax. */
  def zkeySql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  /** Layout key computation over orders: zkey of (custkey, orderkey) mod
    * 2^16. The declared query returns the keys sorted by zkey — exactly
    * the write-time sort a z-ordered table layout performs. */
  val layoutZorder = Q(
    "layout_zorder",
    s"""SELECT o_orderkey, o_custkey,
       |  ${zkeySql("(o_custkey % 65536)", "(o_orderkey % 65536)")} AS zkey
       |FROM orders
       |ORDER BY zkey, o_orderkey LIMIT 2000""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    o.select(
      col("o_orderkey"), col("o_custkey"),
      zkey(col("o_custkey") % 65536, col("o_orderkey") % 65536).as("zkey"))
      .orderBy("zkey", "o_orderkey")
      .limit(2000)
  }

  /** Bucketed co-located join (wave 21): both fact tables are written
    * bucketed (8 buckets) AND sorted on the join key, then joined —
    * Spark's bucketing metadata makes the sort-merge join read each
    * bucket pair directly with NO shuffle exchange on either side (the
    * plan law BucketSpec pins). This is THE 100 TB join strategy for
    * repeatedly-joined fact tables: the shuffle is paid once at write
    * time and amortized over every subsequent join. The declared result
    * is the joined priority rollup, oracled against the plain-parquet
    * join — bucketing must change the PLAN, never the answer. */
  val layoutBucketJoin = Q(
    "layout_bucket_join",
    s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
       |  ${graft.Parity.sqlDsum("l_extendedprice")} AS sum_price
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    bucketedTables(s, dir)
    // hint("merge") pins the SMJ the 100 TB shape uses (at test scale the
    // small side would broadcast and hide the bucket co-location law).
    s.table("g_orders_b").hint("merge").join(s.table("g_lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        graft.Parity.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Write orders/lineitem as 8-bucket tables sorted on the join key
    * (idempotent overwrite; external path under /tmp so repeated Verify
    * runs and test sessions never collide on state). */
  private[graft] def bucketedTables(s: SparkSession, dir: String): Unit = {
    val base = s"/tmp/graft_buckets_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    t(s, dir, "orders").write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/orders_b").saveAsTable("g_orders_b")
    t(s, dir, "lineitem").write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/lineitem_b").saveAsTable("g_lineitem_b")
  }

  val all: Seq[Q] = Seq(layoutZorder, layoutBucketJoin)
}
