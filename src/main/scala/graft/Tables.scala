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

  /** Legacy physical schema of events.parquet: `ts` as INT64 nanoseconds
    * (either plain int64 or timestamp[ns], which Spark's parquet reader
    * does not map to TimestampType) — read as Long and converted (floor
    * ns→µs) in [[loadEvents]]. The driver regenerated the corpus on
    * 2026-08-13 with `timestamp[us]`, which Spark maps natively; the
    * loader sniffs the footer and picks the right path. */
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

  /** Physical-layout sniff for an events parquet path: the ts type Spark
    * INFERS from the footer. The driver layout since 2026-08-13 is
    * timestamp[us] without timezone → TimestampNTZType (pandas writes
    * isAdjustedToUTC=false); a tz-adjusted µs layout → TimestampType; the
    * two legacy nanosecond layouts — plain INT64, and TIMESTAMP(NANOS),
    * which Spark's footer converter rejects (hence the catch) — → LongType.
    * One driver-side footer read per distinct path, cached: at 100 TB this
    * is one footer, not a scan, and it guards against the unit-confusion
    * class of bug (a silent testdata regeneration flips the sniff, not the
    * answers). */
  private val tsLayout =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()

  def eventsTsType(spark: SparkSession, path: String): DataType =
    tsLayout.computeIfAbsent(path, _ =>
      try spark.read.parquet(path).schema
        .find(_.name == "ts").map(_.dataType).getOrElse(LongType)
      catch { case _: Exception => LongType })

  def eventsTsIsTimestamp(spark: SparkSession, path: String): Boolean =
    eventsTsType(spark, path) match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }

  /** The events schema with `ts` swapped to the sniffed physical type. */
  def eventsReadSchema(ts: DataType): StructType =
    StructType(events.map {
      case f if f.name == "ts" => f.copy(dataType = ts)
      case f => f
    })

  /** Load events from a parquet file or directory, normalizing `ts` to
    * TimestampType (µs) regardless of the physical layout. NTZ→LTZ cast
    * is the identity on the stored micros because every Graft session
    * pins spark.sql.session.timeZone=UTC — the same naive-UTC reading
    * DuckDB's oracle applies. The legacy ns → µs floor division matches
    * DuckDB's ns-parquet truncation, so raw ts values hash-compare equal
    * across engines on any layout. */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    eventsTsType(spark, path) match {
      case t @ (TimestampType | TimestampNTZType) =>
        spark.read.schema(eventsReadSchema(t)).parquet(path)
          .withColumn("ts", col("ts").cast(TimestampType))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case _ =>
        spark.read.schema(eventsRaw).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
    }
  }

  /** Load one table with its explicit schema from `dir/<name>.parquet`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$dir/events.parquet")
    else spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")
}
