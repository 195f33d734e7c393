package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2-A: scans and format ingest.
  *
  * Scale: explicit schemas skip driver-side footer sampling; column pruning
  * + predicate pushdown reach the parquet scan (verified via
  * `.explain("formatted")` — `ReadSchema` lists only selected columns).
  */
object Scans {

  /** A1 — parquet scan with explicit schema. (l_orderkey, l_linenumber) is
    * NOT unique in the corpus, so the deterministic order is over ALL
    * columns — remaining ties are identical rows. */
  val scanParquet = Q(
    "scan_parquet",
    """SELECT * FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      |  l_shipdate
      |LIMIT 500""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    li.orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate").limit(500)
  }

  /** A3 — CSV + JSON ingest with explicit schemas (ETL edge of the
    * pipeline). The corpus is parquet-only, so the query round-trips
    * nation→CSV and region→JSON through `/tmp` first, then reads both back
    * and joins them; the oracle reads the original parquet — a value
    * mismatch would expose a lossy format conversion. */
  val scanCsvJson = Q(
    "scan_csv_json",
    """SELECT n_nationkey, n_name, r_name FROM nation JOIN region
      |ON n_regionkey = r_regionkey ORDER BY n_nationkey""".stripMargin) {
    (s, dir) =>
      val tmp = s"/tmp/graft_io/${new java.io.File(dir).getName}"
      Tables.load(s, dir, "nation").coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
      Tables.load(s, dir, "region").coalesce(1)
        .write.mode("overwrite").json(s"$tmp/region_json")
      val nation = s.read.schema(Tables.nation)
        .option("header", "true").csv(s"$tmp/nation_csv")
      val region = s.read.schema(Tables.region).json(s"$tmp/region_json")
      nation.join(region, col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
  }

  /** A3-adjacent — ORC ingest (the other columnar format Spark ships
    * natively; no spark-avro data-source jar is present in this image, so
    * Avro is documented-absent alongside the Cassandra/Solr connectors).
    * Round-trips supplier→ORC through /tmp with predicate + pruning applied
    * on the ORC read; the oracle reads the original parquet — a mismatch
    * would expose a lossy conversion or a pushdown bug on the ORC path. */
  val scanOrc = Q(
    "scan_orc",
    """SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |WHERE s_acctbal > 0 ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val tmp = s"/tmp/graft_io/${new java.io.File(dir).getName}"
    Tables.load(s, dir, "supplier").coalesce(1)
      .write.mode("overwrite").orc(s"$tmp/supplier_orc")
    s.read.schema(Tables.supplier).orc(s"$tmp/supplier_orc")
      .filter(col("s_acctbal") > 0)
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** A3-adjacent — MALFORMED-row handling on the CSV ingest path: the
    * ingestion reality a 100 TB crawl lands with (a fraction of lines is
    * always garbage). The fixture derives a CSV from documents where
    * every doc_id ≡ 3 (mod 10) line carries a non-numeric n_chars; the
    * declared output is the accounting of Spark's three parser modes —
    * PERMISSIVE parses the good columns and captures the raw line in
    * _corrupt_record (the quarantine-column pattern), DROPMALFORMED
    * silently keeps only clean rows (counted against the quarantine
    * count so a silent-drop regression is caught), and the clean-row sum
    * proves no VALUE was damaged in transit. Oracle: the same accounting
    * derived from the source table alone. */
  val scanCsvMalformed = Q(
    "scan_csv_malformed",
    """WITH src AS (
      |  SELECT doc_id, n_chars, doc_id % 10 = 3 AS bad FROM documents)
      |SELECT 'clean_rows' AS metric,
      |  CAST(COUNT(*) FILTER (WHERE NOT bad) AS BIGINT) AS n,
      |  CAST(SUM(n_chars) FILTER (WHERE NOT bad) AS BIGINT) AS sum_chars
      |FROM src
      |UNION ALL
      |SELECT 'corrupt_rows',
      |  CAST(COUNT(*) FILTER (WHERE bad) AS BIGINT),
      |  CAST(NULL AS BIGINT)
      |FROM src
      |UNION ALL
      |SELECT 'dropmalformed_rows',
      |  CAST(COUNT(*) FILTER (WHERE NOT bad) AS BIGINT),
      |  CAST(NULL AS BIGINT)
      |FROM src
      |ORDER BY metric""".stripMargin) { (s, dir) =>
    val tmp = s"/tmp/graft_io/${new java.io.File(dir).getName}"
    // Fixture: one CSV line per doc; bad lines put a word where the
    // numeric n_chars belongs.
    Tables.load(s, dir, "documents")
      .select(when(col("doc_id") % 10 === 3,
          concat(col("doc_id"), lit(",not_a_number")))
        .otherwise(concat(col("doc_id"), lit(","), col("n_chars")))
        .as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(s"$tmp/docs_malformed_csv")
    val schema = "doc_id LONG, n_chars LONG, _corrupt_record STRING"
    val permissive = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(s"$tmp/docs_malformed_csv")
      // Materialize before splitting on _corrupt_record: the CSV parser
      // only populates the quarantine column for rows it actually failed,
      // and caching pins one consistent parse for both branches.
      .cache()
    val clean = permissive.filter(col("_corrupt_record").isNull)
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
      .select(lit("clean_rows").as("metric"), col("n"), col("sum_chars"))
    val corrupt = permissive.filter(col("_corrupt_record").isNotNull)
      .agg(count(lit(1)).as("n"))
      .select(lit("corrupt_rows").as("metric"), col("n"),
        lit(null).cast("long").as("sum_chars"))
    val dropped = s.read.schema("doc_id LONG, n_chars LONG")
      .option("mode", "DROPMALFORMED")
      .csv(s"$tmp/docs_malformed_csv")
      // count(n_chars) — NOT count(*): a bare count (or any count of a
      // non-nullable expression, which Catalyst rewrites to count(1))
      // hands the CSV parser an EMPTY required schema, no field ever
      // fails to parse, and DROPMALFORMED counts every raw record
      // (measured: 500 vs 450; the SPARK-21610 semantics family —
      // malformed-ness is judged against the REQUIRED schema only). The
      // nullable-column count survives optimization and forces the
      // parse; this pitfall is precisely what the operator pins.
      .agg(count(col("n_chars")).as("n"))
      .select(lit("dropmalformed_rows").as("metric"), col("n"),
        lit(null).cast("long").as("sum_chars"))
    clean.unionByName(corrupt).unionByName(dropped).orderBy("metric")
  }

  /** A6 — events read with the exact schema the streaming source uses
    * (`spark.readStream.schema(Tables.events)` — see graft.streaming). */
  val streamSource = Q(
    "stream_source",
    """SELECT event_id, ts, user_id, event_type, value FROM events
      |ORDER BY event_id LIMIT 1000""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(1000)
  }

  val all: Seq[Q] = Seq(scanParquet, scanCsvJson, scanOrc, scanCsvMalformed,
    streamSource)
}
