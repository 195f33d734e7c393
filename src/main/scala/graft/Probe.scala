package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main for feature checks (kept out of the declared
  * surface; used during development to test engine capabilities). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM r WHERE n < 5)
          |SELECT * FROM r ORDER BY n""".stripMargin)
      println("RECURSIVE-OK: " + df.collect().map(_.getInt(0)).mkString(","))
    } catch {
      case e: Exception => println("RECURSIVE-UNSUPPORTED: " +
        e.getMessage.linesIterator.next())
    }
    spark.stop()
  }
}
