package graft.operators

import graft.{Q, Tables}
import graft.Parity._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial search, wave 14 (round 6): distance ranking, radius search,
  * and density heatmaps — the geo filter/boost surface of a search engine
  * (geodist sort, bbox/radius facet). Coordinates are a deterministic
  * fixture derived per customer from md5 nibbles (dyadic arithmetic —
  * lat/lon are bit-identical across engines); in production they are real
  * point columns and every plan below is unchanged.
  *
  * Distance model: planar equirectangular d² = Δlat² + (k·Δlon)² with the
  * latitude-compression factor k embedded as a literal — pure IEEE
  * arithmetic, so the oracle is hash-exact (no libm sin/cos dependence;
  * production swaps in haversine and the plan shape is identical — the
  * swap changes one projected expression, not the join/partition design).
  *
  * Scale design:
  *  - geo_radius_grid is the 100 TB shape: points bucket into r-sized grid
  *    cells (one scan, integer cell keys), each query center expands to
  *    its 3×3 neighbor cells, and candidates come from an EQUI-join on the
  *    cell key — candidate volume is (points near centers), never the
  *    |points|×|centers| cross product the oracle runs. The exact d² ≤ r²
  *    filter then prunes the corner cells.
  *  - geo_distance_topk is scan → project → TakeOrderedAndProject (the
  *    global top-k pattern: per-partition heaps, no full sort).
  *  - geo_cell_density is a straight two-phase hash aggregate on integer
  *    cell keys.
  */
object GeoOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def nib(h: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"

  /** 16-bit md5 slice as an integer expression (nibbles i..i+3). */
  private def nib4(h: String, i: Int): String =
    s"((((${nib(h, i)}) * 16 + (${nib(h, i + 1)})) * 16 + " +
      s"(${nib(h, i + 2)})) * 16 + (${nib(h, i + 3)}))"

  /** SQL points fixture: uniform lat ∈ [−90, 90), lon ∈ [−180, 180) from
    * two 16-bit md5 slices — dyadic v/65536 grid, exact in both engines. */
  private val PtsSql: String =
    s"""pts AS (
       |  SELECT c_custkey,
       |    (${nib4("h", 1)} / 65536.0) * 180 - 90 AS lat,
       |    (${nib4("h", 5)} / 65536.0) * 360 - 180 AS lon
       |  FROM (SELECT c_custkey,
       |          md5(concat('geo:', CAST(c_custkey AS VARCHAR))) AS h
       |        FROM customer))""".stripMargin

  private[graft] def points(customer: DataFrame): DataFrame = {
    val h = md5(concat(lit("geo:"), col("c_custkey").cast("string")))
    customer.select(col("c_custkey"), h.as("h"))
      .select(col("c_custkey"),
        ((expr(nib4("h", 1)) / lit(65536.0)) * lit(180) - lit(90)).as("lat"),
        ((expr(nib4("h", 5)) / lit(65536.0)) * lit(360) - lit(180)).as("lon"))
  }

  /** The 5 query centers (search-app "stores"): exact-literal coordinates
    * shared by engine and oracle. */
  private val Centers: Seq[(Int, Double, Double)] = Seq(
    (1, 10.0, 20.0), (2, -45.5, 100.25), (3, 80.0, -170.0),
    (4, 0.0, 0.0), (5, -30.0, 60.0))

  /** DuckDB VALUES types decimal literals as DECIMAL — cast to DOUBLE so
    * the oracle's distance arithmetic matches Spark's (and no decimal
    * column can leak into the output, which compare.py rejects). */
  private val CentersSql: String = Centers
    .map { case (i, la, lo) =>
      s"($i, CAST($la AS DOUBLE), CAST($lo AS DOUBLE))" }.mkString(", ")

  /** Geodist ranking: the 100 points nearest to the fixed query point
    * (40.7, −74.0), planar-compressed d² — scan, project, top-k heap. */
  val geoDistanceTopk = Q(
    "geo_distance_topk",
    s"""WITH $PtsSql
       |SELECT c_custkey, lat, lon,
       |  ROUND((lat - 40.7) * (lat - 40.7)
       |    + ((lon - (-74.0)) * 0.7580) * ((lon - (-74.0)) * 0.7580), 6)
       |    AS d2
       |FROM pts ORDER BY (lat - 40.7) * (lat - 40.7)
       |    + ((lon - (-74.0)) * 0.7580) * ((lon - (-74.0)) * 0.7580),
       |  c_custkey
       |LIMIT 100""".stripMargin) { (s, dir) =>
    val p = points(t(s, dir, "customer"))
    val dlon = (col("lon") - lit(-74.0)) * lit(0.7580)
    val d2 = (col("lat") - lit(40.7)) * (col("lat") - lit(40.7)) + dlon * dlon
    p.select(col("c_custkey"), col("lat"), col("lon"), d2.as("d2_raw"))
      .orderBy(col("d2_raw"), col("c_custkey"))
      .limit(100)
      .select(col("c_custkey"), col("lat"), col("lon"),
        round(col("d2_raw"), 6).as("d2"))
  }

  /** Radius search around the 5 centers (r = 5°): grid-cell equi-join
    * candidates (cell = floor(coord/r), centers expand to 3×3 neighbors),
    * exact d² ≤ r² refine, per-center hit count + nearest distance. The
    * oracle is the naive cross-join — answer-invariance of the grid
    * pruning is re-proven on every run. (3×3 suffices because a distance-r
    * hit at cell distance 2 requires |Δ| = r EXACTLY on one axis, which
    * the dyadic point grid cannot produce against these center literals;
    * with arbitrary coordinates use d² < r² strict or widen to 5×5.) */
  val geoRadiusGrid = Q(
    "geo_radius_grid",
    s"""WITH $PtsSql,
       |centers AS (SELECT * FROM (VALUES $CentersSql) AS c(center_id, clat, clon))
       |SELECT center_id, COUNT(*) AS n_pts,
       |  ROUND(MIN((lat - clat) * (lat - clat)
       |    + (lon - clon) * (lon - clon)), 6) AS min_d2
       |FROM centers JOIN pts
       |  ON (lat - clat) * (lat - clat) + (lon - clon) * (lon - clon) <= 25.0
       |GROUP BY center_id ORDER BY center_id""".stripMargin) { (s, dir) =>
    val p = points(t(s, dir, "customer"))
      .withColumn("cell_lat", floor(col("lat") / lit(5.0)).cast("long"))
      .withColumn("cell_lon", floor(col("lon") / lit(5.0)).cast("long"))
    val centers = { import s.implicits._; Centers.toDF("center_id", "clat", "clon") }
    val off = { import s.implicits._
      (for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)).toDF("dx", "dy") }
    val probes = centers.crossJoin(off).select(
      col("center_id"), col("clat"), col("clon"),
      (floor(col("clat") / lit(5.0)).cast("long") + col("dx")).as("cell_lat"),
      (floor(col("clon") / lit(5.0)).cast("long") + col("dy")).as("cell_lon"))
    val d2 = (col("lat") - col("clat")) * (col("lat") - col("clat")) +
      (col("lon") - col("clon")) * (col("lon") - col("clon"))
    p.join(broadcast(probes), Seq("cell_lat", "cell_lon"))
      .filter(d2 <= lit(25.0))
      .groupBy("center_id")
      .agg(count(lit(1)).as("n_pts"), round(min(d2), 6).as("min_d2"))
      .orderBy("center_id")
  }

  /** Density heatmap: 10°×10° cell counts + mean account balance, top 30
    * cells — the geo-facet aggregation (two-phase hash agg on integer
    * cell keys). */
  val geoCellDensity = Q(
    "geo_cell_density",
    s"""WITH $PtsSql
       |SELECT CAST(FLOOR(lat / 10) AS BIGINT) AS cell_lat,
       |  CAST(FLOOR(lon / 10) AS BIGINT) AS cell_lon,
       |  COUNT(*) AS n, ${sqlRavg("c_acctbal")} AS avg_bal
       |FROM pts JOIN customer USING (c_custkey)
       |GROUP BY 1, 2 ORDER BY n DESC, cell_lat, cell_lon LIMIT 30""".stripMargin) { (s, dir) =>
    val cust = t(s, dir, "customer")
    points(cust).join(cust, "c_custkey")
      .groupBy(
        floor(col("lat") / lit(10)).cast("long").as("cell_lat"),
        floor(col("lon") / lit(10)).cast("long").as("cell_lon"))
      .agg(count(lit(1)).as("n"), ravg(col("c_acctbal")).as("avg_bal"))
      .orderBy(col("n").desc, col("cell_lat"), col("cell_lon"))
      .limit(30)
  }

  val all: Seq[Q] = Seq(geoDistanceTopk, geoRadiusGrid, geoCellDensity)
}
