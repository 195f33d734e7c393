package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Parity._

/** SURVEY §2-B (projection/filter/expressions), §2-F (sort/limit/topk),
  * §2-G (set operations). */
object Projections {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** B1 — narrow projection; Catalyst prunes the scan to 3 of 11 columns
    * (visible as ReadSchema in the formatted plan). */
  val projectPrune = Q(
    "project_prune",
    """SELECT l_orderkey, l_linenumber, l_extendedprice AS price
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, price LIMIT 1000""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price"))
        .orderBy("l_orderkey", "l_linenumber", "price").limit(1000)
  }

  /** B2 — compound predicates: IN / BETWEEN / LIKE / AND / OR / NOT. */
  val filterPred = Q(
    "filter_pred",
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |  AND c_acctbal BETWEEN 1000 AND 5000
      |  AND c_name LIKE 'Customer#%'
      |  AND NOT (c_nationkey = 3 OR c_nationkey = 7)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .filter(
        col("c_mktsegment").isin("BUILDING", "MACHINERY") &&
        col("c_acctbal").between(1000, 5000) &&
        col("c_name").like("Customer#%") &&
        !(col("c_nationkey") === 3 || col("c_nationkey") === 7))
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** B3 — computed columns: arithmetic, CASE WHEN, coalesce, casts. */
  val computedCols = Q(
    "computed_cols",
    s"""SELECT l_orderkey, l_linenumber,
       |  CAST(${sqlDec2("l_extendedprice")} * ${sqlDec2("1 - l_discount")} AS DOUBLE) AS net_price,
       |  CASE WHEN l_returnflag = 'R' THEN 'returned'
       |       WHEN l_linestatus = 'O' THEN 'open' ELSE 'closed' END AS status,
       |  CAST(l_quantity AS BIGINT) AS qty_int,
       |  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber, net_price, status, qty_int, flag_or_none
       |LIMIT 2000""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
            .cast("double").as("net_price"),
          when(col("l_returnflag") === "R", "returned")
            .when(col("l_linestatus") === "O", "open")
            .otherwise("closed").as("status"),
          col("l_quantity").cast("bigint").as("qty_int"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
            .as("flag_or_none"))
        .orderBy("l_orderkey", "l_linenumber", "net_price", "status", "qty_int",
          "flag_or_none")
        .limit(2000)
  }

  /** F1 — global total order (range-partitioned sort at scale). */
  val sortGlobal = Q(
    "sort_global",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
  }

  /** F2 — limit after sort. */
  val limitQ = Q(
    "limit",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100") {
    (s, dir) =>
      t(s, dir, "orders").select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").limit(100)
  }

  /** F3 — top-k: Spark fuses orderBy+limit into TakeOrderedAndProject
    * (per-partition heap + driver merge — no global sort even at 100 TB). */
  val topK = Q(
    "topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(50)
  }

  /** G1 — positional union (ALL semantics). */
  val unionAll = Q(
    "union_all",
    """SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
      |UNION ALL
      |SELECT event_id, user_id, event_type FROM events WHERE event_type = 'view'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events").select("event_id", "user_id", "event_type")
    ev.filter(col("event_type") === "click")
      .union(ev.filter(col("event_type") === "view"))
      .orderBy("event_id")
  }

  /** G1 — union with distinct (UNION semantics), schema-safe by name. */
  val unionDistinct = Q(
    "union_distinct",
    """SELECT user_id FROM events WHERE event_type = 'click'
      |UNION
      |SELECT user_id FROM events WHERE event_type = 'signup'
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    ev.filter(col("event_type") === "click").select("user_id")
      .unionByName(ev.filter(col("event_type") === "signup").select("user_id"))
      .distinct()
      .orderBy("user_id")
  }

  /** G2 — intersect (plans as left-semi). */
  val intersectQ = Q(
    "intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** G2 at scale — identical INTERSECT semantics to [[intersectQ]], spelled
    * as ONE scan + ONE shuffle: filter to the two branches, partial-agg
    * per-key presence flags map-side, keep keys seen in both. The operator
    * form shuffles each branch separately before the semi join (two fact
    * shuffles); this form shuffles (key, flag) pairs once — at 100 TB it
    * halves the shuffled volume and is the shape a same-table INTERSECT
    * should compile to. Same oracle as G2; serves the `set_ops` bench key. */
  val intersectFused = Q(
    "intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy("o_custkey")
      .agg(
        max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("in_f"),
        max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("in_o"))
      .filter(col("in_f") === 1 && col("in_o") === 1)
      .select("o_custkey")
      .orderBy("o_custkey")
  }

  /** G3 — except (plans as left-anti). */
  val exceptQ = Q(
    "except",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
      .orderBy("o_custkey")
  }

  val all: Seq[Q] = Seq(projectPrune, filterPred, computedCols, sortGlobal,
    limitQ, topK, unionAll, unionDistinct, intersectQ, exceptQ)
}
