package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus export, wave 30 (round 6): the JSONL shard sink — the
  * format LLM training loaders actually consume (one JSON object per
  * line, bounded-size shards, deterministic shard assignment). The
  * declared query performs the full export round-trip and returns the
  * shard accounting, so the sink is exercised (and its losslessness
  * proven) on every Verify run, the A2/sink_parquet convention.
  *
  * Shard assignment is the corpus_shard_shuffle convention (md5-nibble of
  * the doc id → 16 shards — deterministic, reproducible splits), written
  * via partitionBy so each shard is its own directory of JSON lines; at
  * 100 TB the same write fans out per executor with no pre-shuffle
  * beyond the partitionBy clustering, and `maxRecordsPerFile` bounds
  * individual file sizes.
  *
  * Oracled since round 7 (VERDICT r6 item 6): the oracle recomputes the
  * EXPECTED per-shard accounting straight from the source `documents`
  * table (md5-nibble shard assignment is plain SQL), so the DuckDB
  * compare proves the write→read round-trip preserved exactly the rows
  * and chars the source dictates — a stronger check than re-reading the
  * shards, which would compare the export against itself. ExportSpec
  * additionally proves field-level losslessness.
  */
object ExportOps {

  private def nib(h: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"

  /** Export documents as 16 JSONL shards, read them back, and report
    * per-shard docs/chars — the export audit a data loader validates
    * against its manifest. */
  val sinkJsonlSharded = Q(
    "sink_jsonl_sharded",
    s"""SELECT ${nib("md5('sh:' || CAST(doc_id AS VARCHAR))", 1)} AS shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val base = s"/tmp/graft_jsonl_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val docs = Tables.load(s, dir, "documents")
      .withColumn("h", md5(concat(lit("sh:"), col("doc_id").cast("string"))))
      .withColumn("shard", expr(s"CAST(${nib("h", 1)} AS INT)"))
      .drop("h")
    docs.repartition(col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .option("maxRecordsPerFile", 10000)
      .json(base)
    s.read.json(base)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        countDistinct("doc_id").as("n_distinct"))
      .orderBy("shard")
      .select(col("shard").cast("int").as("shard"), col("n_docs"),
        col("sum_chars").cast("long").as("sum_chars"), col("n_distinct"))
  }

  val all: Seq[Q] = Seq(sinkJsonlSharded)
}
