package graft.scale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** exact_dedup cost decomposition at the replica tier (round 14): the key
  * stayed >2× vs DuckDB after the layout and cache levers, so attribute
  * its wall-clock to scan vs hash vs shuffle+agg before deciding whether
  * a floor or a fix remains. Best-of-3 per stage, same session.
  * Usage: DedupFloorProbe [sfDir]
  */
object DedupFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfx1000")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    def best3(label: String)(f: => Long): Unit = {
      f
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[dedupfloor] $label%-28s best3=$t%.3f s")
    }
    best3("scan text count")(docs.select("text").count())
    best3("scan text length-sum")(
      docs.select(sum(length(col("text")))).count())
    best3("xxhash64(text) agg")(
      docs.groupBy(xxhash64(col("text")).as("fp"))
        .agg(min("doc_id")).count())
    best3("md5(text) count only")(
      docs.select(md5(col("text")).as("fp")).filter(col("fp").isNotNull)
        .count())
    best3("md5 group no sort")(
      docs.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("s"), count(lit(1)).as("n")).count())
    best3("declared exact_dedup")(
      graft.SparkEntry.queries("exact_dedup")(spark, sfDir).count())
    spark.stop()
  }
}
