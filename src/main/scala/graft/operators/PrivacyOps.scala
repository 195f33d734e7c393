package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy / governance checks, wave 20 (round 6): the re-identification
  * audits a dataset passes before it may leave the curation pipeline —
  * k-anonymity over the quasi-identifier grouping and l-diversity of the
  * sensitive attribute within those groups (text_pii_mask covers the
  * value-level scrub; these cover the structural risk).
  *
  * Quasi-identifiers here: (c_nationkey, c_mktsegment) on customer;
  * sensitive attribute: the account-balance sign band. In production the
  * QI list is the release policy's; the plans are identical.
  *
  * Scale design: both audits are one two-phase hash aggregate on the QI
  * key (map-side combined) — the report is group-count-sized, never
  * row-sized. At 100 TB this is exactly the cardinality-profile shape
  * (data_profile), reusing its scan.
  */
object PrivacyOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** k-anonymity audit (k = 10): every QI group smaller than k is a
    * re-identification risk — report the violating groups plus a summary
    * row (group_sz = −1) carrying total groups / violating groups /
    * min group size. */
  val privacyKAnonymity = Q(
    "privacy_k_anonymity",
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_sz
      |  FROM customer GROUP BY 1, 2)
      |SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey, c_mktsegment,
      |  CAST(group_sz AS BIGINT) AS group_sz
      |FROM g WHERE group_sz < 10
      |UNION ALL
      |SELECT -1, 'SUMMARY',
      |  CAST((SELECT MIN(group_sz) FROM g) AS BIGINT)
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, dir) =>
    val g = t(s, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("group_sz"))
    val viol = g.filter(col("group_sz") < 10)
      .select(col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_mktsegment"), col("group_sz"))
    val summary = g.agg(min("group_sz").as("group_sz"))
      .select(lit(-1).as("c_nationkey"), lit("SUMMARY").as("c_mktsegment"),
        col("group_sz"))
    viol.union(summary).orderBy("c_nationkey", "c_mktsegment")
  }

  /** l-diversity audit (l = 3) of the balance band (negative / low /
    * high) within each QI group: a group where the sensitive attribute
    * takes fewer than l distinct values leaks it by membership alone.
    * Reports per-group distinct-band counts with the violation flag. */
  val privacyLDiversity = Q(
    "privacy_l_diversity",
    """WITH b AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CASE WHEN c_acctbal < 0 THEN 'neg'
      |         WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band
      |  FROM customer),
      |g AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    COUNT(*) AS group_sz, COUNT(DISTINCT band) AS n_bands
      |  FROM b GROUP BY 1, 2)
      |SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey, c_mktsegment,
      |  CAST(group_sz AS BIGINT) AS group_sz,
      |  CAST(n_bands AS BIGINT) AS n_bands,
      |  CAST(CASE WHEN n_bands < 3 THEN 1 ELSE 0 END AS BIGINT) AS violates
      |FROM g ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, dir) =>
    val band = when(col("c_acctbal") < 0, "neg")
      .when(col("c_acctbal") < 5000, "low").otherwise("high")
    t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("group_sz"),
        countDistinct(col("band")).as("n_bands"))
      .select(col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_mktsegment"), col("group_sz"), col("n_bands"),
        when(col("n_bands") < 3, 1L).otherwise(0L).as("violates"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  val all: Seq[Q] = Seq(privacyKAnonymity, privacyLDiversity)
}
