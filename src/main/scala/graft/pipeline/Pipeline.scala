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

  /** Batch run with a dead-letter channel — the migration-tool contract
    * that ONE malformed source row must never abort a bulk load, and every
    * diverted row stays accounted for. Rows failing `isValid` are written
    * (raw, untransformed) to `deadLetterPath` for replay after repair;
    * valid rows proceed through transform → sink. Returns
    * (rows written, rows diverted).
    *
    * The canonical `isValid` for file ingest is
    * `col("_corrupt_record").isNull` over a PERMISSIVE-mode read
    * (PipelineSpec drives exactly that). The source is pinned in the cache
    * for the duration so the valid/invalid split reads one scan, not two.
    */
  def runWithDeadLetter(
      spark: SparkSession,
      m: Migration,
      isValid: org.apache.spark.sql.Column,
      deadLetterPath: String): (Long, Long) = {
    val src = m.source.load(spark, m.sourceConf).cache()
    val out = m.transform(src.filter(isValid)).cache()
    try {
      val bad = src.filter(!isValid)
      bad.write.mode("append").parquet(deadLetterPath)
      // Count from the pinned transform output BEFORE unpersisting, so the
      // reported metric is the exact batch the sink received — never a
      // recomputation that could rescan the source (or disagree under a
      // nondeterministic transform).
      m.sink.save(out, m.sinkConf)
      (out.count(), bad.count())
    } finally { out.unpersist(); src.unpersist() }
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
