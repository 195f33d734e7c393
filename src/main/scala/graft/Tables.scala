package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit schemas + loaders for the ten test-corpus tables.
  *
  * Policy (SURVEY §1.3): every source gets an explicit `StructType`; schema
  * inference is never used inside declared queries — the DuckDB-oracle
  * hash-compare punishes any drift. Schemas match FIXTURES.md (introspected
  * from the driver-generated parquet).
  *
  * Scale note: at 100 TB these reads become multi-thousand-file scans; the
  * explicit schema also skips the footer-sampling pass Spark otherwise runs
  * on the driver, which matters when a table has 100k+ files.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType, nullable = false),
    StructField("r_name", StringType, nullable = false)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType, nullable = false),
    StructField("n_name", StringType, nullable = false),
    StructField("n_regionkey", IntegerType, nullable = false)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType, nullable = false),
    StructField("c_name", StringType, nullable = false),
    StructField("c_nationkey", IntegerType, nullable = false),
    StructField("c_acctbal", DoubleType, nullable = false),
    StructField("c_mktsegment", StringType, nullable = false)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType, nullable = false),
    StructField("s_name", StringType, nullable = false),
    StructField("s_nationkey", IntegerType, nullable = false),
    StructField("s_acctbal", DoubleType, nullable = false)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType, nullable = false),
    StructField("p_name", StringType, nullable = false),
    StructField("p_brand", StringType, nullable = false),
    StructField("p_type", StringType, nullable = false),
    StructField("p_size", IntegerType, nullable = false),
    StructField("p_retailprice", DoubleType, nullable = false)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType, nullable = false),
    StructField("o_custkey", LongType, nullable = false),
    StructField("o_orderstatus", StringType, nullable = false),
    StructField("o_totalprice", DoubleType, nullable = false),
    StructField("o_orderdate", TimestampType, nullable = false),
    StructField("o_orderpriority", StringType, nullable = false)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType, nullable = false),
    StructField("l_partkey", LongType, nullable = false),
    StructField("l_suppkey", LongType, nullable = false),
    StructField("l_linenumber", IntegerType, nullable = false),
    StructField("l_quantity", DoubleType, nullable = false),
    StructField("l_extendedprice", DoubleType, nullable = false),
    StructField("l_discount", DoubleType, nullable = false),
    StructField("l_tax", DoubleType, nullable = false),
    StructField("l_returnflag", StringType, nullable = false),
    StructField("l_linestatus", StringType, nullable = false),
    StructField("l_shipdate", TimestampType, nullable = false)))

  /** Physical schema of events.parquet: `ts` is INT64 timestamp[ns], which
    * Spark's parquet reader does not map to TimestampType — it is read as
    * Long and converted (floor ns→µs) in [[load]]. */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("label", IntegerType, nullable = false)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Load one table with its explicit schema from `dir/<name>.parquet`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      // ns → µs floor division matches DuckDB's ns-parquet truncation, so
      // raw ts values hash-compare equal across engines.
      spark.read.schema(eventsRaw).parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else {
      spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")
    }
}
