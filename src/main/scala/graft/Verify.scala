package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Usage: Verify <sfDir> <outDir> [queryName...] — trailing names
    // restrict the dump for fast local iteration; the driver passes two
    // args and gets every declared query.
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query...]")
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The sf dirs are single-file tables; 8 MB splits restore scan
      // parallelism for per-row HOF-heavy operators (simhash/rolling-hash
      // folds ran on ONE task otherwise). At cluster scale inputs are
      // many files and the 128 MB default is right.
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Layout contract (round-6 post-mortem): the loader's ts-unit handling
    // must land events inside the corpus's documented era. A testdata
    // regeneration that changes the physical layout now fails HERE with a
    // named error instead of as 12 silent wrong-answer oracle rows (the
    // round-5 failure mode: int64-ns assumption applied to timestamp[us]
    // collapsed the 30-day corpus to ~43 minutes of 1970).
    locally {
      val maxTs = Tables.load(spark, sfDir, "events")
        .agg(org.apache.spark.sql.functions.max("ts")).head.getTimestamp(0)
      val yr = maxTs.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
      require(yr >= 2020 && yr <= 2035,
        s"events ts-unit contract violated: max(ts)=$maxTs (year $yr) is " +
          s"outside 2020..2035 — the parquet layout of $sfDir/events.parquet " +
          "and Tables.loadEvents' sniff disagree")
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Stdout timing line per query (driver ignores stdout; the scale
        // runs read these to find the slow tail).
        println(f"[verify-time] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
