package graft

import org.apache.spark.sql.SparkSession

/** Library entry points for users of the engine (SURVEY §3).
  *
  * `GraftSession.builder()` is the recommended way to build a session: it
  * wires GraftExtensions (cosine_sim / dot_product / rule seam) and the
  * engine's baseline configs. `Views.register` exposes the corpus tables
  * as temp views so every operator is reachable from SQL text
  * (`spark.sql(...)`) as well as the DataFrame API.
  */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
}

object Views {
  /** Register all ten corpus tables as temp views named after the tables. */
  def register(spark: SparkSession, dir: String): Unit =
    Tables.schemas.keys.foreach { name =>
      Tables.load(spark, dir, name).createOrReplaceTempView(name)
    }
}
