package graft.operators

import graft.{Q, Views}

/** SURVEY §3.2 — the SQL-text entry point: all ten tables registered as
  * temp views, the query expressed as `spark.sql` text (parsed by Spark's
  * ANTLR parser into the same analyzed/optimized pipeline as the DataFrame
  * API). The oracle is near-verbatim the same SQL — which is exactly the
  * point of this entry path. */
object SqlEntry {

  val sqlPath = Q(
    "sql_entry",
    """SELECT n_name, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY n_name, o_orderpriority
      |ORDER BY n_name, o_orderpriority""".stripMargin) { (s, dir) =>
    Views.register(s, dir)
    s.sql(
      """SELECT n_name, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY n_name, o_orderpriority
        |ORDER BY n_name, o_orderpriority""".stripMargin)
  }

  /** Correlated scalar subquery (TPC-H q17 shape): rows below half their
    * part's average quantity. Catalyst DECORRELATES this into a left outer
    * join against the per-part aggregate (RewriteCorrelatedScalarSubquery)
    * — the plan a user would hand-write, derived automatically; DuckDB
    * runs the same text natively, making the oracle near-verbatim.
    *
    * Parity: the threshold is built from an exact decimal SUM divided by
    * an exact COUNT (both engines produce bit-identical doubles), never
    * from AVG(double) whose accumulation order is engine-dependent — a
    * boundary-row flip there would silently change the aggregate. */
  val sqlCorrelated = Q(
    "sql_correlated_subquery",
    """SELECT l_returnflag, COUNT(*) AS n_small,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_revenue
      |FROM lineitem l
      |WHERE l_quantity * 2.0 < (
      |  SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |         / COUNT(*)
      |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Views.register(s, dir)
    s.sql(
      """SELECT l_returnflag, COUNT(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_revenue
        |FROM lineitem l
        |WHERE l_quantity * 2.0 < (
        |  SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |         / COUNT(*)
        |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** SQL path — LATERAL correlated join: each customer's two biggest
    * orders via a per-row dependent subquery (ORDER BY + LIMIT inside the
    * lateral). Catalyst decorrelates this to a ranked window join — the
    * declarative spelling of win_rank_topn, proving the planner handles
    * the dependent-join surface. */
  val sqlLateral = Q(
    "sql_lateral_topk",
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) top2
      |ORDER BY c_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    Views.register(s, dir)
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) top2
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }

  val all: Seq[Q] = Seq(sqlPath, sqlCorrelated, sqlLateral)
}
