package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Zero-job cardinality/size estimation for plan-construction scale guards.
  *
  * Catalyst's `optimizedPlan.stats.sizeInBytes` for a parquet scan is the
  * COMPRESSED on-disk size (scaled by `spark.sql.sources.fileCompressionFactor`,
  * default 1.0) — so a byte-derived row estimate (`bytes / minRowWidth`)
  * silently under-counts whenever dictionary/zstd compression beats the
  * min-width conservatism margin (round-7 ADVICE, medium). The authoritative
  * fix is the parquet FOOTER: every file's metadata carries the exact row
  * count and the uncompressed (encoded) byte size, readable on the driver
  * without launching a Spark job — the same metadata-only I/O class as the
  * FileIndex listing Spark itself performs at planning time. Footers are
  * cached per path (corpus files are immutable; overwrites produce new
  * part-file names).
  *
  * Estimation precedence, most→least authoritative:
  *   1. `stats.rowCount` — exact for LocalRelation (spec fixtures) and for
  *      ANALYZEd catalog tables under CBO.
  *   2. Parquet footer sums — exact scan cardinality whenever EVERY leaf of
  *      the plan is a parquet file relation (for filtered/projected plans
  *      this is the pre-filter count: a conservative OVERestimate, the safe
  *      direction for a reroute guard).
  *   3. `sizeInBytes × decompressionFactor / minRowBytes` — the round-7
  *      stats heuristic hardened with a decompression factor so compressed
  *      leaves no longer masquerade as small corpora.
  */
object PlanStats {

  /** Conservative default multiplier applied to `sizeInBytes` when neither
    * exact source is available: covers zstd/dictionary ratios typical for
    * mixed columnar data without being so large that bench-scale corpora
    * reroute off their exact paths (footer metadata, branch 2, makes this
    * fallback unreachable for all parquet-backed inputs anyway). */
  val DefaultDecompressionFactor = 4

  /** Cap on driver-side footer reads per estimate: beyond this many files
    * the corpus is unambiguously huge and the byte-derived branch decides
    * (any guard it feeds reroutes to the scale path regardless). */
  private val MaxFooterFiles = 512

  /** (rows, uncompressedBytes) per already-read footer path. */
  private val footerCache =
    new ConcurrentHashMap[String, (Long, Long)]()

  /** Exact (rowCount, uncompressedByteSize) summed over parquet footers,
    * when every leaf of `df`'s optimized plan is a parquet file relation
    * with ≤ [[MaxFooterFiles]] files. Driver-side metadata I/O only — no
    * Spark job (asserted suite-wide by ConstructionSpec). */
  def parquetLeafStats(df: DataFrame): Option[(BigInt, BigInt)] = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val parquetRels = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          Some(fs)
        case _ => None
      }
      case _ => None
    }
    if (parquetRels.isEmpty || parquetRels.exists(_.isEmpty)) None
    else {
      val files = parquetRels.flatten.flatMap(_.location.inputFiles).distinct
      if (files.isEmpty || files.length > MaxFooterFiles) None
      else try {
        val conf = df.sparkSession.sessionState.newHadoopConf()
        var rows = BigInt(0)
        var bytes = BigInt(0)
        files.foreach { f =>
          val (r, b) = footerCache.computeIfAbsent(f, { _ =>
            val reader =
              ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
            try {
              val blocks = reader.getFooter.getBlocks.asScala
              (blocks.map(_.getRowCount).sum, blocks.map(_.getTotalByteSize).sum)
            } finally reader.close()
          })
          rows += r
          bytes += b
        }
        Some((rows, bytes))
      } catch { case NonFatal(_) => None }
    }
  }

  /** Row estimate for `df` with zero Spark jobs. Exact whenever plan stats
    * carry a rowCount or the plan bottoms out in parquet files; otherwise a
    * decompression-adjusted overestimate (`sizeInBytes × factor /
    * minRowBytes`) whose conservatism errs toward rerouting. */
  def estRows(df: DataFrame, minRowBytes: Long,
      decompressionFactor: Int = DefaultDecompressionFactor): BigInt = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.orElse(parquetLeafStats(df).map(_._1))
      .getOrElse(stats.sizeInBytes * decompressionFactor / minRowBytes)
  }

  /** Uncompressed byte estimate for `df` with zero Spark jobs: exact
    * encoded size from parquet footers when available, else
    * `sizeInBytes × decompressionFactor`. */
  def estRawBytes(df: DataFrame,
      decompressionFactor: Int = DefaultDecompressionFactor): BigInt =
    parquetLeafStats(df).map(_._2).getOrElse(
      df.queryExecution.optimizedPlan.stats.sizeInBytes * decompressionFactor)
}
