package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Parity, Q, Tables}

/** Runtime-filter (bloom) semi-join reduction — wave 31.
  *
  * At 100 TB the cheapest shuffle byte is the one never written: when a
  * fact ⋈ selective-dim join shuffles both sides, Catalyst's
  * `InjectRuntimeFilter` builds a bloom filter over the dim's join keys
  * and pushes `bloom_filter_might_contain` into the fact SCAN, dropping
  * non-joining rows before the exchange. This is Spark's declarative
  * twin of the hand-built `lshCrossContaminatedIds` candidate pruning.
  *
  * The declared query is deliberately config-neutral: under production
  * defaults the filter injects only when the application-side scan
  * exceeds `spark.sql.optimizer.runtime.bloomFilter.applicationSideScan
  * SizeThreshold` (10 GB) — i.e. exactly at the scale where it pays.
  * RuntimeFilterSpec lowers the thresholds to prove the MECHANISM at
  * test scale: bloom expression present in the optimized plan, results
  * identical with the machinery on and off.
  */
object RuntimeFilterOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** The join, separable for the spec: lineitem ⋈ high-value orders,
    * merge-hinted so both sides shuffle (the shape runtime filters
    * exist for — a broadcast join already prunes at the probe). */
  private[graft] def factJoin(s: SparkSession, dir: String) = {
    val hot = t(s, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(hot.hint("merge"), col("l_orderkey") === col("o_orderkey"))
  }

  val joinBloomPrefilter = Q(
    "join_bloom_prefilter",
    s"""SELECT o_orderpriority,
       |  CAST(COUNT(*) AS BIGINT) AS n_items,
       |  CAST(SUM(${Parity.sqlDec2("l_extendedprice")} *
       |           ${Parity.sqlDec2("1 - l_discount")}) AS DOUBLE) AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_totalprice > 400000.0
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, dir) =>
      factJoin(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(Parity.dec2(col("l_extendedprice")) *
              Parity.dec2(lit(1) - col("l_discount")))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(joinBloomPrefilter)
}
