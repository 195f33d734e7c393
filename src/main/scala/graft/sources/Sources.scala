package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** SURVEY §1.4: the external-system seam.
  *
  * trireme's defining endpoints are Cassandra (source) and Solr (sink); no
  * connector jars exist in this offline image, so those two are documented
  * stubs behind the same trait the exercisable parquet/CSV/JSON
  * implementations use. Everything downstream of `load` / upstream of
  * `save` is connector-agnostic.
  */
trait TableSource {
  /** Load a table as a DataFrame. `conf` keys are implementation-specific. */
  def load(spark: SparkSession, conf: Map[String, String]): DataFrame
}

trait DocumentSink {
  /** Persist a DataFrame. Must be idempotent per (batch, epoch) to be safe
    * under streaming retries. */
  def save(df: DataFrame, conf: Map[String, String]): Unit
}

/** Parquet source with mandatory explicit schema (or a known corpus table
  * name via `table=`). */
object ParquetSource extends TableSource {
  def load(spark: SparkSession, conf: Map[String, String]): DataFrame =
    conf.get("table") match {
      case Some(name) => Tables.load(spark, conf("dir"), name)
      case None =>
        val schema = StructType.fromDDL(conf("schema"))
        spark.read.schema(schema).parquet(conf("path"))
    }
}

/** CSV source (explicit DDL schema; header configurable). */
object CsvSource extends TableSource {
  def load(spark: SparkSession, conf: Map[String, String]): DataFrame =
    spark.read
      .schema(StructType.fromDDL(conf("schema")))
      .option("header", conf.getOrElse("header", "true"))
      .csv(conf("path"))
}

/** JSON-lines source (explicit DDL schema — never inferred). */
object JsonSource extends TableSource {
  def load(spark: SparkSession, conf: Map[String, String]): DataFrame =
    spark.read.schema(StructType.fromDDL(conf("schema"))).json(conf("path"))
}

/** Deterministic parquet sink (what Verify uses). */
object ParquetSink extends DocumentSink {
  def save(df: DataFrame, conf: Map[String, String]): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(conf("path"))
}

/** Cassandra table scan — trireme's primary source.
  *
  * Production wiring (requires `spark-cassandra-connector` on the
  * classpath, unavailable in this zero-egress image):
  * {{{
  * spark.read
  *   .format("org.apache.spark.sql.cassandra")
  *   .options(Map("keyspace" -> conf("keyspace"), "table" -> conf("table")))
  *   .load()
  * }}}
  * The connector exposes token-range-aligned partitions, so a full-table
  * scan parallelizes across the ring without coordinator hotspots, and
  * pushes EQ/IN partition-key predicates server-side.
  */
object CassandraSource extends TableSource {
  def load(spark: SparkSession, conf: Map[String, String]): DataFrame =
    throw new UnsupportedOperationException(
      "Cassandra connector jar not available offline; see scaladoc for the production wiring")
}

/** Solr bulk index — trireme's primary sink.
  *
  * Production wiring (requires SolrJ; unavailable offline): map each
  * partition to `SolrInputDocument`s and bulk-add via a per-partition
  * `ConcurrentUpdateSolrClient` (batch size ~1000, commitWithin rather than
  * hard commits), i.e.
  * {{{
  * df.foreachPartition { rows =>
  *   val client = new ConcurrentUpdateHttp2SolrClient.Builder(url).build()
  *   rows.grouped(1000).foreach(g => client.add(collection, g.map(toDoc).asJava))
  *   client.blockUntilFinished(); client.close()
  * }
  * }}}
  * One client per partition keeps connection count = task count; documents
  * stream without driver involvement — the 100 TB-safe indexing shape.
  */
object SolrSink extends DocumentSink {
  def save(df: DataFrame, conf: Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "SolrJ not available offline; see scaladoc for the production wiring")
}
