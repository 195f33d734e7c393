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

  val all: Seq[Q] = Seq(scanParquet, scanCsvJson, scanOrc, streamSource)
}
