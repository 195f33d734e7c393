package graft.scale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming near-dedup ingest rung (round 15, VERDICT r14 next-item 6):
  * the full replica corpus streamed through
  * [[graft.streaming.Streams.nearDupIngestSink]] in micro-batches —
  * incremental MinHash vs the stored survivor index, exactly-once
  * survivor MERGE + index APPEND, poison dead-lettering. Reports ingest
  * rows/s and the survivor/dead counts. The replica corpus is the
  * adversarial clone shape (~1000 copies per distinct text), so the
  * cross-set rep-collapse discipline carries the whole run.
  *
  * Usage: StreamNearDupProbe [sfDir] [outRoot] [nBatches]
  */
object StreamNearDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfx1000")
    val root = args.drop(1).headOption.getOrElse("/tmp/ndistream")
    val nBatches = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val n = docs.count()

    // Feed: nBatches parquet files, hash-partitioned so clones of one
    // text land across MANY batches (the worst case for incremental
    // dedup — every batch probes history AND self-pairs).
    val feed = s"$root/feed"
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { i =>
      docs.filter(pmod(xxhash64(col("doc_id")), lit(nBatches)) === i)
        .coalesce(4)
        .write.mode("overwrite").parquet(s"$feed/b$i")
    }
    println(f"[ndistream] feed layout ($nBatches batches, $n rows): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 4)
      .parquet(s"$feed/*")
    val t1 = System.nanoTime()
    graft.streaming.Streams.nearDupIngestSink(spark, stream,
      s"$root/survivors", s"$root/index", s"$root/dead",
      s"$root/ckpt", "ndi-probe").awaitTermination()
    val wall = (System.nanoTime() - t1) / 1e9
    val surv = graft.sources.TxLog.snapshot(spark, s"$root/survivors").count()
    val idx = graft.sources.TxLog.snapshot(spark, s"$root/index").count()
    val dead =
      try spark.read.parquet(s"$root/dead").count()
      catch { case scala.util.control.NonFatal(_) => 0L }
    println(f"[ndistream] ingest $n rows in $wall%.1f s = " +
      f"${n / wall}%.0f rows/s; survivors=$surv index=$idx dead=$dead")
    require(surv == idx, "survivors and index row counts diverged")
    spark.stop()
  }
}
