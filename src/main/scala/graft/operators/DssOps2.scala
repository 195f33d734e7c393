package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Parity._

/** Decision-support completion pack: the seven TPC-H shapes DssOps did not
  * cover (q2, q9, q11, q12, q17, q20, q21), adapted to the reduced synthetic
  * schema. With these, all 22 classic TPC-H query shapes are declared.
  *
  * The reduced schema has no `partsupp` table, no commit/receipt dates and
  * no ship mode, so (following the DssOps q16 precedent) the part–supplier
  * relation is DERIVED from lineitem, "supply cost" is the minimum observed
  * unit price, and "late" means shipped more than 90 days after the order
  * date. Every adaptation keeps the original query's join/subquery SHAPE —
  * correlated scalar subqueries, nested semi joins, double aggregation —
  * because the shape is what exercises the optimizer.
  *
  * Scale notes: part/supplier/nation/region dims broadcast; the lineitem
  * fact side is never pre-shuffled except by its own group-bys, which are
  * two-phase hash aggs on bounded keys ((part), (part, supp), (order)).
  * Correlated thresholds become either a broadcast 1-row scalar or a
  * map-side equality against a per-key aggregate joined back — both forms
  * survive a 1000-executor cluster without a driver round-trip.
  */
object DssOps2 {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** TPC-H q2 (adapted): minimum-cost supplier — for STANDARD parts of
    * size 15, the EUROPE supplier(s) whose derived unit cost (min observed
    * l_extendedprice / l_quantity over lineitem) equals the per-part minimum
    * among EUROPE suppliers. The correlated `= (SELECT MIN …)` becomes a
    * per-part min aggregate equality-joined back (q15 precedent); unit-price
    * division is a single IEEE op on identical inputs, so the doubles are
    * engine-identical and the equality join is exact. */
  val q2MinCostSupplier = Q(
    "q2_min_cost_supplier",
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |         MIN(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |                JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal, s_name, n_name,
      |       p_partkey, p_type, unit_cost
      |FROM part
      |JOIN ps ON p_partkey = l_partkey
      |JOIN eu ON l_suppkey = s_suppkey
      |WHERE p_size = 15 AND p_type = 'STANDARD'
      |  AND unit_cost = (
      |    SELECT MIN(ps2.unit_cost) FROM ps ps2
      |    JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
      |    WHERE ps2.l_partkey = p_partkey)
      |ORDER BY acctbal DESC, n_name, s_name, p_partkey, unit_cost
      |LIMIT 100""".stripMargin) { (s, dir) =>
    val ps = t(s, dir, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val eu = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val part = t(s, dir, "part")
      .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_type")
    val euPs = ps.join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
    val minPerPart = euPs.groupBy(col("l_partkey").as("min_pk"))
      .agg(min(col("unit_cost")).as("min_cost"))
    euPs
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(minPerPart,
        col("l_partkey") === col("min_pk") &&
          col("unit_cost") === col("min_cost"))
      .select(dec2(col("s_acctbal")).cast("double").as("acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_type"), col("unit_cost"))
      .orderBy(col("acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("unit_cost"))
      .limit(100)
  }

  /** TPC-H q9 (adapted): product-type profit by supplier nation × order
    * year for 'blue …' parts. Supply cost is modeled as 10% of the part's
    * retail price per unit (no partsupp in the reduced schema); all factors
    * are cast to exact decimal BEFORE multiplying, so the per-nation sums
    * are order-independent and engine-identical. */
  val q9ProductTypeProfit = Q(
    "q9_product_type_profit",
    """SELECT n_name AS nation,
      |  CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             CAST(1 - l_discount AS DECIMAL(12,2)) -
      |           CAST(p_retailprice AS DECIMAL(12,2)) *
      |             CAST(0.1 AS DECIMAL(3,1)) *
      |             CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |WHERE p_name LIKE 'blue%'
      |GROUP BY n_name, CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER)
      |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
    val part = t(s, dir, "part").filter(col("p_name").startsWith("blue"))
      .select("p_partkey", "p_retailprice")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), year(to_date(col("o_orderdate"))).as("o_year"))
    val profit = dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")) -
      dec2(col("p_retailprice")) * lit(0.1).cast("decimal(3,1)") *
        dec2(col("l_quantity"))
    t(s, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(profit).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H q11 (adapted): important inventory — parts whose NATION_7-
    * supplied line value exceeds 0.1% of the total (global scalar-subquery
    * threshold, broadcast as a 1-row side; the fact side is reduced by the
    * broadcast supplier semi-filter before its group-by). */
  val q11ImportantStock = Q(
    "q11_important_stock",
    """WITH nval AS (
      |  SELECT l_partkey,
      |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS value
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_7'
      |  GROUP BY l_partkey)
      |SELECT l_partkey, value FROM nval
      |WHERE value > (SELECT SUM(value) FROM nval) * 0.001
      |ORDER BY value DESC, l_partkey""".stripMargin) { (s, dir) =>
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val nval = t(s, dir, "lineitem")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(dsum(col("l_extendedprice")).as("value"))
    val thr = nval.agg((sum(col("value")) * lit(0.001)).as("thr"))
    nval.join(broadcast(thr), col("value") > col("thr"))
      .select("l_partkey", "value")
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H q12 (adapted): late-shipment priority ledger — 1996-shipped
    * lines split into LATE (>90 days after order) vs ONTIME classes, with
    * urgent/non-urgent line counts per class (the ship-mode analog in a
    * schema without l_shipmode). One broadcast-free fact pass: the orders
    * side carries only (key, priority, date). */
  val q12LateShipments = Q(
    "q12_late_shipments",
    """SELECT late_class,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM (
      |  SELECT o_orderpriority,
      |    CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90
      |         THEN 'LATE' ELSE 'ONTIME' END AS late_class
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01') c
      |GROUP BY late_class ORDER BY late_class""".stripMargin) { (s, dir) =>
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("order_d"))
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-01-01"))
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(col("ship_d") > date_add(col("order_d"), 90), "LATE")
          .otherwise("ONTIME").as("late_class"),
        isHigh.as("high"))
      .groupBy("late_class")
      .agg(
        sum(when(col("high"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("high"), 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("late_class")
  }

  /** TPC-H q17 (adapted): small-quantity revenue — average yearly revenue
    * lost if Brand#5/SMALL parts ordered below 20% of their historical mean
    * quantity were not stocked. The correlated per-part AVG becomes a
    * per-part aggregate joined back; the threshold is an exact decimal sum
    * divided by an exact count, so the double compare is engine-identical. */
  val q17SmallQtyRevenue = Q(
    "q17_small_qty_revenue",
    """SELECT ROUND(
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0,
      |  2) AS avg_yearly
      |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
      |WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'
      |  AND l1.l_quantity < (
      |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4)))
      |                       AS DOUBLE) / COUNT(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin) {
    (s, dir) =>
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#5" && col("p_type") === "SMALL")
        .select("p_partkey")
      val perPart = li.groupBy(col("l_partkey").as("avg_pk"))
        .agg((lit(0.2) * (sum(col("l_quantity").cast("decimal(18,4)"))
          .cast("double") / count(lit(1)))).as("qty_thr"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("avg_pk"))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg(round(sum(dec2(col("l_extendedprice"))).cast("double") / lit(7.0), 2)
          .as("avg_yearly"))
  }

  /** TPC-H q20 (adapted): dominant part suppliers — EUROPE suppliers that
    * shipped more than half of some 'red …' part's total 1996 volume (the
    * partsupp-availability EXISTS chain re-expressed over derived shipped
    * quantities: per-(part,supp) sum vs per-part total, then a semi join
    * into the supplier dim). */
  val q20DominantSupplier = Q(
    "q20_dominant_supplier",
    """WITH shipped AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  GROUP BY l_partkey, l_suppkey),
      |tot AS (
      |  SELECT l_partkey AS tot_pk, SUM(qty) AS tot_qty
      |  FROM shipped GROUP BY l_partkey)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND EXISTS (
      |    SELECT 1 FROM shipped JOIN tot ON l_partkey = tot_pk
      |    WHERE l_suppkey = s_suppkey AND qty > 0.5 * tot_qty)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val part = t(s, dir, "part").filter(col("p_name").startsWith("red"))
      .select("p_partkey")
    val shipped = t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-01-01"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))
    val tot = shipped.groupBy(col("l_partkey").as("tot_pk"))
      .agg(sum(col("qty")).as("tot_qty"))
    val dominant = shipped
      .join(tot, col("l_partkey") === col("tot_pk"))
      .filter(col("qty") > lit(0.5) * col("tot_qty"))
      .select(col("l_suppkey").as("dom_sk")).distinct()
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(dominant, col("s_suppkey") === col("dom_sk"), "left_semi")
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  /** TPC-H q21 (adapted): suppliers who kept orders waiting — for finished
    * ('F') multi-supplier orders where EXACTLY ONE supplier shipped late
    * (>90 days after order), charge that supplier. The exists/not-exists
    * pair over other suppliers' lines collapses into one per-order
    * aggregate: distinct suppliers, distinct late suppliers, and (when
    * unique) the late supplier itself — one shuffle on l_orderkey. */
  val q21WaitingSupplier = Q(
    "q21_waiting_supplier",
    """WITH ll AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90
      |         THEN l_suppkey END AS late_supp
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |per_order AS (
      |  SELECT l_orderkey,
      |    COUNT(DISTINCT l_suppkey) AS nsupp,
      |    COUNT(DISTINCT late_supp) AS nlate,
      |    MAX(late_supp) AS the_supp
      |  FROM ll GROUP BY l_orderkey)
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM per_order JOIN supplier ON the_supp = s_suppkey
      |WHERE nsupp > 1 AND nlate = 1
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) {
    (s, dir) =>
      val ord = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_d"))
      val ll = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          to_date(col("l_shipdate")).as("ship_d"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          when(col("ship_d") > date_add(col("order_d"), 90), col("l_suppkey"))
            .as("late_supp"))
      val perOrder = ll.groupBy("l_orderkey")
        .agg(
          countDistinct(col("l_suppkey")).as("nsupp"),
          countDistinct(col("late_supp")).as("nlate"),
          max(col("late_supp")).as("the_supp"))
        .filter(col("nsupp") > 1 && col("nlate") === 1)
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_name")
      perOrder.join(broadcast(sup), col("the_supp") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
  }

  val all: Seq[Q] = Seq(q2MinCostSupplier, q9ProductTypeProfit,
    q11ImportantStock, q12LateShipments, q17SmallQtyRevenue,
    q20DominantSupplier, q21WaitingSupplier)
}
