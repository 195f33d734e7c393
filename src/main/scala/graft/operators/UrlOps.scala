package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** URL parsing for crawl-style pipelines — wave 31.
  *
  * A crawl corpus keys almost everything on URL components (host-level
  * dedup caps, per-domain mixture weights, tracking-param stripping).
  * The corpus ships no URL column, so the query synthesizes a
  * deterministic URL per document from its own fields (the multimodal
  * media-less-corpus convention) and then exercises Spark's native
  * `parse_url` — PROTOCOL/HOST/PATH and per-parameter QUERY extraction —
  * plus the canonicalization a dedup pipeline applies (drop the
  * tracking param, keep the stable one).
  *
  * Oracle: the URL is CONSTRUCTED from known parts, so the expected
  * components are re-derivable in plain SQL without a URL parser —
  * the compare proves Spark's parser inverts the construction exactly
  * (ports stay out of HOST, query params parse positionally-free).
  */
object UrlOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val fnUrl = Q(
    "fn_url",
    """SELECT doc_id,
      |  'https' AS proto,
      |  source || '.example.org' AS host,
      |  '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
      |  lang AS ref_param,
      |  'https://' || source || '.example.org/docs/' || lang || '/'
      |    || CAST(doc_id AS VARCHAR) || '?ref=' || lang AS canonical_url
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val url = concat(
      lit("https://"), col("source"), lit(".example.org:8443/docs/"),
      col("lang"), lit("/"), col("doc_id").cast("string"),
      lit("?utm_source=feed&ref="), col("lang"),
      lit("&utm_campaign=x"))
    t(s, dir, "documents")
      .select(col("doc_id"), url.as("url"), col("source"), col("lang"))
      .select(
        col("doc_id"),
        parse_url(col("url"), lit("PROTOCOL")).as("proto"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"),
        // Canonical form: default-scheme URL, port and utm_* tracking
        // params stripped, the stable param kept — the crawl-dedup key.
        concat(parse_url(col("url"), lit("PROTOCOL")), lit("://"),
          parse_url(col("url"), lit("HOST")),
          parse_url(col("url"), lit("PATH")), lit("?ref="),
          parse_url(col("url"), lit("QUERY"), lit("ref")))
          .as("canonical_url"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(fnUrl)
}
