package graft.sources

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a GraftLog table — the tail-the-log
  * read that completes the lakehouse loop (the Delta streaming-source
  * analogue): `spark.readStream.format("graftlog").option("path", table)`
  * yields each append commit's rows exactly once, tagged with
  * `_commit_version`, driven by the engine's own checkpointed offset
  * tracking.
  *
  *  - **Offsets ARE log versions** (LongOffset): getOffset reports the
  *    latest committed version; getBatch((v1, v2]) is
  *    [[TxLog.tableChanges]] over exactly that commit range — the same
  *    append-only change-read contract, so a copy-on-write rewrite
  *    (delete/merge/compact/overwrite) inside the range FAILS the stream
  *    rather than silently re-emitting rewritten rows (Delta's default
  *    without ignoreChanges). Appends and streaming-appends flow through.
  *  - **`startingVersion` option** (default 0 = full history): a table
  *    that carried maintenance rewrites in its PAST is still tailable —
  *    `"latest"` starts from the log head at source creation (only new
  *    commits flow), a number starts at that version inclusive. Without
  *    it, one historical compact would make a fresh stream permanently
  *    fail its first batch.
  *  - **Exactly-once**: the engine checkpoints the last committed offset;
  *    a restart replays from it, and version ranges are immutable (the
  *    log is append-only, commits are atomic CREATE_NEW claims), so the
  *    replayed batch is byte-identical. Combined with [[TxLog.appendBatch]]
  *    ([[graft.streaming.Streams.txLogSink]]) this closes the
  *    log → transform → log pipeline with exactly-once on BOTH ends.
  *  - **Pushdown preserved**: getBatch keeps the commit range as LOGICAL
  *    file relations re-tagged streaming (FileStreamSource's own
  *    pattern, GraftSqlBridge.asStreaming), so the streaming query's
  *    filters and projections still reach each micro-batch's parquet
  *    scan — at warehouse scale per-batch full-column decode would be
  *    the dominant wasted cost.
  *  - **100 TB**: getOffset is a log-directory listing (never the data
  *    dir); getBatch opens only the files the tailed commits added —
  *    incremental pipelines (dedup, tokenize, index) process deltas,
  *    never rescan the corpus.
  *
  * Schema is fixed at source creation ([[TxLog.changesSchema]]); an ADD
  * COLUMN evolution mid-stream is DETECTED at the next batch and fails
  * with an explicit restart-the-stream error (not the engine's opaque
  * output-arity assert), same contract as Delta. V1 Source API by
  * design: getBatch returns a DataFrame over the committed file list,
  * which is exactly the V1 contract; a DSv2 MicroBatchStream would force
  * a hand-rolled parquet reader for no additional semantics on a
  * single-table source.
  */
class GraftLogSource(sqlContext: SQLContext, table: String,
    startingVersion: Long) extends Source {

  override val schema: StructType = TxLog.changesSchema(table)

  private def versionOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => sys.error(s"unexpected offset type: $other")
  }

  override def getOffset: Option[OffsetV1] = {
    val latest = TxLog.latestVersion(table)
    if (latest < 0) None else Some(LongOffset(latest))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    // start is EXCLUSIVE; a fresh stream begins at startingVersion
    // inclusive (startingVersion - 1 exclusive).
    val from = start.map(versionOf).getOrElse(startingVersion - 1)
    val to = versionOf(end)
    val batch = TxLog.tableChanges(sqlContext.sparkSession, table, from, to)
    // Nullability-erased comparison: file reads surface asNullable while
    // the log DDL carries NOT NULL — only a name/type change (an evolve
    // commit) is a real schema change.
    def shape(s: StructType) = s.map(f => (f.name, f.dataType))
    if (shape(batch.schema) != shape(schema))
      throw new IllegalStateException(
        s"GraftLog table $table changed schema mid-stream (declared " +
          s"${schema.toDDL}, commits now carry ${batch.schema.toDDL}); " +
          "schema evolution requires a stream restart")
    GraftSqlBridge.asStreaming(sqlContext.sparkSession, batch)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftLogSource[$table]"
}

/** `format("graftlog")` registration (also reachable by full class name
  * when the services file is absent from a classpath). */
class GraftLogSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graftlog"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graftlog source requires .option(\"path\", <table dir>)"))

  /** The log defines the schema; a user-supplied one would be silently
    * wrong (the Kafka/rate fixed-schema-source convention is to refuse). */
  private def rejectUserSchema(schema: Option[StructType]): Unit =
    schema.foreach(s => throw new IllegalArgumentException(
      s"graftlog source defines its own schema from the table log; " +
        s"remove .schema(${s.simpleString})"))

  private def startingVersion(parameters: Map[String, String],
      table: String): Long =
    parameters.get("startingversion").orElse(parameters.get("startingVersion"))
      .map {
        case "latest" => TxLog.latestVersion(table) + 1
        case v => v.toLong
      }.getOrElse(0L)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    rejectUserSchema(schema)
    (shortName(), TxLog.changesSchema(tablePath(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    rejectUserSchema(schema)
    val table = tablePath(parameters)
    new GraftLogSource(sqlContext, table, startingVersion(parameters, table))
  }
}
