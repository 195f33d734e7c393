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

  val all: Seq[Q] = Seq(sqlPath)
}
