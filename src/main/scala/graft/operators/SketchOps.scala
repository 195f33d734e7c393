package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sketch-based distinct counting — the two shapes a 100 TB pipeline
  * actually runs instead of COUNT(DISTINCT)'s Expand:
  *
  *  - EXACT via roaring-style bitmaps: group by (key, bitmap bucket),
  *    build a fixed-size bitmap per bucket (mergeable map-side partial),
  *    then sum per-bucket cardinalities. Cost is one shuffle of small
  *    bitmap blobs — no row explosion, perfectly mergeable across
  *    executors. Oracle = plain COUNT(DISTINCT).
  *  - APPROXIMATE via Apache DataSketches HLL: `hll_sketch_agg` partials
  *    merged with `hll_union_agg` — the sketch COLUMN is storable, so
  *    daily partials union into monthly distincts without re-scanning
  *    (the property approx_count_distinct's internal HLL doesn't expose).
  *    No DuckDB oracle (sketch internals aren't portable); SketchSpec
  *    proves the merge law and accuracy against the exact twin.
  */
object SketchOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Exact distinct parts per return flag via bitmap buckets. */
  val aggBitmapDistinct = Q(
    "agg_bitmap_distinct",
    """SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
      |    AS n_distinct_parts
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          expr("bitmap_bucket_number(l_partkey)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").as("bm"))
        .groupBy("l_returnflag")
        .agg(sum(expr("bitmap_count(bm)")).as("n_distinct_parts"))
        .orderBy("l_returnflag")
  }

  /** HLL sketch distincts per return flag: estimate next to the exact
    * count and the relative error, so the declared output is its own
    * accuracy ledger (rows-only driver check; SketchSpec asserts the
    * bound and the partial-merge law). */
  val aggHllSketch = Q.noOracle("agg_hll_sketch") { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val est = li.groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").as("hll_est"))
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_exact"))
    est.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("hll_est"), col("n_exact"),
        round(abs(col("hll_est") - col("n_exact")) /
          col("n_exact").cast("double"), 6).as("rel_err"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(aggBitmapDistinct, aggHllSketch)
}
