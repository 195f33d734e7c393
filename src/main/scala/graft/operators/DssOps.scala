package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Parity._

/** Decision-support pack: the remaining famous TPC-H query shapes, adapted
  * to the reduced synthetic schema (no commit/receipt dates, no ship mode —
  * predicates are re-expressed over the columns that exist).
  *
  * Scale notes: every query keeps the lineitem/orders fact side streaming
  * through broadcast dim joins (customer at sf is small; at 100 TB the
  * customer join becomes a shuffle on the natural key — both shapes are the
  * optimal ones Catalyst already picks via AQE size estimates). Aggregations
  * are two-phase hash aggs on low-cardinality keys; top-k outputs end in
  * TakeOrderedAndProject, never a global sort of the fact table.
  */
object DssOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** TPC-H q4 (adapted): order-priority ledger — orders placed in 1996 H1
    * that have at least one line shipped more than 60 days after the order
    * date (the "late line" EXISTS — semi join, never an explosion). */
  val q4OrderPriority = Q(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, dir) =>
      val o = t(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
          to_date(col("o_orderdate")) < lit("1996-07-01"))
      val late = t(s, dir, "lineitem")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      o.join(late,
          o("o_orderkey") === late("l_orderkey") &&
            late("ship_d") > date_add(to_date(o("o_orderdate")), 60),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
  }

  /** TPC-H q7 (adapted): volume shipping between two nations — revenue by
    * (supplier nation, customer nation, ship year) for the NATION_1 ⇄
    * NATION_2 pairs, 1996–1997. Fact side joins two broadcast dim chains. */
  val q7VolumeShipping = Q(
    "q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |    l_extendedprice, l_discount
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
        to_date(col("l_shipdate")) < lit("1998-01-01"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H q10 (adapted): top-20 customers by lost revenue from returned
    * items in 1996 Q1. TakeOrderedAndProject top-k, not a global sort. */
  val q10ReturnedItems = Q(
    "q10_returned_items",
    """SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name, CAST(c_acctbal AS DECIMAL(12,2))
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val ord = t(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
        to_date(col("o_orderdate")) < lit("1996-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        dec2(col("c_acctbal")).as("acctbal"))
      .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"),
        col("acctbal").cast("double").as("acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H q14 (adapted): promo revenue share in March 1996 — two exact
    * decimal sums over one broadcast part join, one output row. */
  val q14PromoRevenue = Q(
    "q14_promo_revenue",
    """SELECT ROUND(100.0 *
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
      |         CAST(1 - l_discount AS DECIMAL(12,2))
      |    ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE) /
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE),
      |  4) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'""".stripMargin) {
    (s, dir) =>
      val part = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
      val disc = dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-03-01") &&
          to_date(col("l_shipdate")) < lit("1996-04-01"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", disc)
            .otherwise(lit(0).cast("decimal(24,4)"))).cast("double") /
          sum(disc).cast("double"), 4).as("promo_pct"))
  }

  /** TPC-H q18 (adapted): large-volume orders — orders whose total quantity
    * exceeds 220, with customer. The HAVING filter reduces the fact table
    * to ~500 keys BEFORE the customer join. */
  val q18LargeOrders = Q(
    "q18_large_orders",
    """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_d,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(l_quantity) > 220)
      |GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE),
      |  CAST(o_totalprice AS DECIMAL(12,2))
      |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin) {
    (s, dir) =>
      val liTab = t(s, dir, "lineitem")
      val big = liTab.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("q"))
        .filter(col("q") > 220)
        .select(col("l_orderkey").as("big_okey"))
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      liTab
        .join(big, col("l_orderkey") === col("big_okey"), "left_semi")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_d"),
          dec2(col("o_totalprice")).as("totalprice"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
        // DECIMAL(12,2) values are exact in double (scaled int < 2^53), so
        // ordering on the double cast is identical to decimal ordering.
        .withColumn("totalprice", col("totalprice").cast("double"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("order_d"), col("totalprice"), col("sum_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(100)
  }

  /** TPC-H q8 (adapted): national market share — NATION_1's share of
    * ECONOMY-part revenue sold into AMERICA customers, by order year. Two
    * role-playing nation dims (supplier's and customer's) join the same
    * broadcast table under different aliases; the share divides two exact
    * decimal sums, so the double ratio is engine-identical. */
  val q8MarketShare = Q(
    "q8_market_share",
    """SELECT o_year,
      |  ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
      |                 ELSE CAST(0.00 AS DECIMAL(24,4)) END) AS DOUBLE) /
      |        CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
      |FROM (
      |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |         CAST(1 - l_discount AS DECIMAL(12,2)) AS DECIMAL(24,4)) AS volume,
      |    n1.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part     ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region   ON n2.n_regionkey = r_regionkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY') all_sales
      |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
    val part = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val reg = t(s, dir, "region").filter(col("r_name") === "AMERICA")
      .select("r_regionkey")
    val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(to_date(col("o_orderdate"))).as("o_year"))
    val volume = (dec2(col("l_extendedprice")) *
      dec2(lit(1) - col("l_discount"))).cast("decimal(24,4)")
    t(s, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .join(broadcast(reg), col("c_rk") === col("r_regionkey"))
      .select(col("o_year"), volume.as("volume"), col("supp_nation"))
      .groupBy("o_year")
      .agg(round(
        sum(when(col("supp_nation") === "NATION_1", col("volume"))
          .otherwise(lit(0.00).cast("decimal(24,4)"))).cast("double") /
          sum(col("volume")).cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H q13 (adapted): customer order-count distribution — LEFT join so
    * zero-order customers land in the c_count = 0 bucket; non-urgent
    * orders only (the comment-filter analog). Double aggregation: per
    * customer, then per count. */
  val q13CustDistribution = Q(
    "q13_cust_distribution",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    t(s, dir, "customer").select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H q15 (adapted): top supplier(s) by 1996-Q1 shipped revenue — the
    * scalar-max subquery selects every supplier tying the maximum. Exact
    * decimal revenue makes the equality comparison engine-safe. */
  val q15TopSupplier = Q(
    "q15_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val rev = t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
        to_date(col("l_shipdate")) < lit("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
        .cast("double").as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** TPC-H q16 (adapted): supplier breadth per part profile — the
    * part-supplier relation is derived from lineitem (no partsupp table in
    * the reduced schema), distinct'd BEFORE the part join so the count
    * distinct sees fixed-width key pairs. */
  val q16PartSupplier = Q(
    "q16_part_supplier",
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) {
    (s, dir) =>
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val part = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#13" &&
          !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      ps.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
  }

  /** TPC-H q19 (adapted): discounted revenue under an OR-of-ANDs
    * brand/size/quantity predicate — the disjunctive-pushdown shape (the
    * part filter is the union of the three brand branches; the residual
    * per-branch quantity conjunction applies post-join). */
  val q19DiscountedRevenue = Q(
    "q19_discounted_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, dir) =>
    val part = t(s, dir, "part")
      .select("p_partkey", "p_brand", "p_size")
    def branch(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    t(s, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#5", 15, 1, 11) ||
        branch("Brand#13", 25, 10, 20) ||
        branch("Brand#19", 35, 20, 30))
      .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
  }

  /** TPC-H q22 (adapted): global sales opportunity — rich-but-inactive
    * customers per market segment: above-positive-average account balance
    * (scalar subquery, broadcast as a 1-row side) and no RECENT orders —
    * none since 1998-01-01 (anti join; the reduced schema's analog of
    * q22's seven-year inactivity window). The average divides an exact decimal sum by an exact
    * count, so the threshold double is engine-identical. */
  val q22SalesOpportunity = Q(
    "q22_sales_opportunity",
    """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
      |           / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |      AND CAST(o_orderdate AS DATE) >= DATE '1998-01-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val ord = t(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1998-01-01"))
      .select("o_custkey")
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  val all: Seq[Q] = Seq(q4OrderPriority, q7VolumeShipping, q10ReturnedItems,
    q14PromoRevenue, q18LargeOrders, q8MarketShare, q13CustDistribution,
    q15TopSupplier, q16PartSupplier, q19DiscountedRevenue,
    q22SalesOpportunity)
}
