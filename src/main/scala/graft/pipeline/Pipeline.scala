package graft.pipeline

import graft.sources.{DocumentSink, TableSource}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The trireme shape as a composable pipeline: scan a source system,
  * transform rows to search documents, bulk-load a sink — with batch and
  * micro-batch (streaming) execution over the same transform.
  *
  * In production the endpoints are `CassandraSource` → `SolrSink`
  * (offline stubs, see graft.sources); everything in between — and the
  * pipeline mechanics themselves — is connector-agnostic and exercised
  * with the parquet/CSV/JSON implementations in PipelineSpec.
  */
final case class Migration(
    source: TableSource,
    sourceConf: Map[String, String],
    transform: DataFrame => DataFrame,
    sink: DocumentSink,
    sinkConf: Map[String, String])

object Pipeline {

  /** Batch run: load → transform → save. Returns rows written. */
  def run(spark: SparkSession, m: Migration): Long = {
    val out = m.transform(m.source.load(spark, m.sourceConf))
    m.sink.save(out, m.sinkConf)
    // Row count re-runs the (lazy) lineage — acceptable for a migration
    // report; callers needing exact written-row metrics at scale should
    // read the sink's own commit stats instead of recomputing.
    out.count()
  }

  /** Micro-batch run: the same transform applied incrementally, one bulk
    * sink commit per micro-batch (the Solr indexing shape, I7). The caller
    * provides the streaming source DataFrame (e.g. Streams.eventsStream). */
  def runStreaming(stream: DataFrame, m: Migration, checkpointDir: String)
      : StreamingQuery =
    graft.streaming.Streams.foreachBatchSink(
      m.transform(stream), checkpointDir) { (batch, _) =>
      m.sink.save(batch, m.sinkConf)
    }
}
