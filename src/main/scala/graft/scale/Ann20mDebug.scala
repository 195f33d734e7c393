package graft.scale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AnnOps

/** One-off: explain + run the IVF exact-rerank serve at the 20M tier. */
object Ann20mDebug {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/annscale20m"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val nLists = 141
    val model = AnnOps.fitAnnModel(spark, e, nLists = nLists, m = 48,
      dsub = 8, ksub = 16)
    println("[dbg] fit done")
    val stored = spark.read.parquet("/tmp/graft_annscale_idx_20000000")
    val df = AnnOps.ivfKnnFromIndex(spark, e, stored, model,
      queryId = 0L, k = 20, nProbe = 17)
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Sort") || l.contains("TakeOrdered"))
      .mkString("\n"))
    val t0 = System.nanoTime()
    df.count()
    println(f"[dbg] serve done ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
