package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew and co-location utilities (SCALE.md; the knobs a 100 TB deployment
  * actually turns).
  *
  * AQE's skew-join splitting handles most runtime skew automatically;
  * [[saltedJoin]] is the explicit form for pathological producers (one key
  * = 30% of a fact table) where you want deterministic plan shape.
  * [[writeBucketed]] + reading via the table catalog gives shuffle-free
  * sort-merge joins between tables bucketed on the same key — the standard
  * layout for fact⋈fact joins repeated across many queries.
  */
object Scale {

  /** Equi-join where `left`'s join key is heavily skewed: left rows get a
    * salt in [0, salts); the (small enough to replicate) `right` side is
    * exploded once per salt, so each hot key fans out over `salts`
    * reducers instead of one. Result is identical to the plain join —
    * the salt only changes the shuffle distribution, never the matches.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedL = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedR = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedL.join(saltedR,
      saltedL(leftKey) === saltedR(rightKey) &&
        saltedL("__salt") === saltedR("__salt"))
      .drop("__salt")
  }

  /** Write `df` as a bucketed (+ per-bucket sorted) catalog table. Two
    * tables bucketed on their join keys with the same bucket count join
    * with NO exchange on either side (verified in ScaleSpec). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
