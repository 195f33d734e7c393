package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Parity._

/** Second-wave analytics surface: pivot, percentiles, conditional
  * expressions, ordered string aggregation. All plan as ordinary two-phase
  * aggregations / projections (SCALE.md conventions apply unchanged). */
object Analytics {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Pivot (long→wide): order counts per priority × status. The Spark side
    * uses the native `pivot` relational operator with an explicit value
    * list (deterministic column set); the oracle spells the same result as
    * portable conditional aggregation. */
  val aggPivot = Q(
    "agg_pivot",
    s"""SELECT o_orderpriority,
       |  COUNT(*) FILTER (o_orderstatus = 'F') AS F,
       |  COUNT(*) FILTER (o_orderstatus = 'O') AS O,
       |  COUNT(*) FILTER (o_orderstatus = 'P') AS P
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
  }

  /** Exact percentiles (linear interpolation — same definition as SQL
    * percentile_cont / DuckDB quantile_cont). Exact median at 100 TB is a
    * full sort per group; the scale path is approx_percentile (t-digest
    * partials) declared alongside. */
  val aggPercentile = Q(
    "agg_percentile",
    """SELECT o_orderstatus,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy("o_orderstatus")
  }

  /** t-digest/interpolated approximate percentile — constant-size partial
    * state, the 100 TB path. No SQL oracle (engine-specific sketch);
    * AnalyticsSpec asserts tolerance vs exact. The declared output renders
    * the quantile array as a comma-joined decimal string (raw array columns
    * are not hashable by the driver's comparator). */
  val aggApproxPercentile = Q.noOracle("agg_approx_percentile") { (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)")
        .as("approx_arr"))
      .select(col("o_orderstatus"),
        array_join(transform(col("approx_arr"),
          x => x.cast("decimal(18,4)").cast("string")), ",").as("approx_p"))
      .orderBy("o_orderstatus")
  }

  /** Conditional scalar surface: greatest/least/if/nullif/nvl chains. */
  val fnConditional = Q(
    "fn_conditional",
    """SELECT l_orderkey, l_linenumber,
      |  GREATEST(l_quantity, l_discount * 100, l_tax * 100) AS g,
      |  LEAST(l_quantity, l_extendedprice / 1000) AS l,
      |  IF(l_returnflag = 'R', 'ret', 'ok') AS flag,
      |  IFNULL(NULLIF(l_linestatus, 'O'), 'open') AS status
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, g, l, flag, status LIMIT 2000""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          greatest(col("l_quantity"), col("l_discount") * 100, col("l_tax") * 100).as("g"),
          least(col("l_quantity"), col("l_extendedprice") / 1000).as("l"),
          when(col("l_returnflag") === "R", "ret").otherwise("ok").as("flag"),
          coalesce(nullif(col("l_linestatus"), lit("O")), lit("open")).as("status"))
        .orderBy("l_orderkey", "l_linenumber", "g", "l", "flag", "status")
        .limit(2000)
  }

  /** Ordered string aggregation (listagg shape — Solr multivalued fields
    * rendered as one delimited field). */
  val aggStringAgg = Q(
    "agg_string_agg",
    """SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) {
    (s, dir) =>
      t(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"))
        .orderBy("s_nationkey")
  }

  /** Distinct + count-orderable histogram of a derived bucket (width_bucket
    * shape via explicit arithmetic — portable across both engines). */
  val aggHistogram = Q(
    "agg_histogram",
    """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(floor(col("o_totalprice") / 50000).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Statistical aggregates (stddev/variance/correlation/covariance) via
    * exact decimal moment sums: built-in stddev/corr accumulate doubles in
    * partition order (non-reproducible last bits across engines), so the
    * moments Σx, Σy, Σxy, Σx², Σy² are taken in exact decimal and only the
    * final closed-form arithmetic runs in double — bit-identical on both
    * engines. Same two-phase aggregate shape, just deterministic. */
  val aggStats = Q(
    "agg_stats",
    """WITH m AS (
      |  SELECT l_returnflag,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
      |  ROUND((syy - sy * sy / n) / (n - 1), 4) AS var_price,
      |  ROUND((sxy - sx * sy / n) / (n - 1), 4) AS covar_qp,
      |  ROUND((sxy - sx * sy / n) /
      |        (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 6) AS corr_qp
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val dq = col("l_quantity").cast("decimal(18,4)")
    val dp = col("l_extendedprice").cast("decimal(18,4)")
    val dq2 = col("l_quantity").cast("decimal(12,4)")
    val dp2 = col("l_extendedprice").cast("decimal(12,4)")
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(dq).cast("double").as("sx"),
        sum(dp).cast("double").as("sy"),
        sum(dq2 * dq2).cast("double").as("sxx"),
        sum(dp2 * dp2).cast("double").as("syy"),
        sum(dq2 * dp2).cast("double").as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6)
          .as("stddev_qty"),
        round((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1), 4)
          .as("var_price"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 4)
          .as("covar_qp"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
           sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qp"))
      .orderBy("l_returnflag")
  }

  /** explode_outer semantics: rows with an empty generator output survive
    * with NULL (the LEFT JOIN LATERAL shape). The oracle emulates outer
    * unnest portably via a CASE to a single-NULL list. */
  val fnExplodeOuter = Q(
    "fn_explode_outer",
    """SELECT doc_id, unnest(CASE WHEN len(long_toks) = 0 THEN [NULL]
      |                           ELSE long_toks END) AS long_tok
      |FROM (SELECT doc_id, list_filter(string_split(text, ' '),
      |             x -> length(x) > 9) AS long_toks FROM documents)
      |ORDER BY doc_id, long_tok NULLS FIRST""".stripMargin) { (s, dir) =>
    val longToks = filter(split(col("text"), " "), x => length(x) > 9)
    t(s, dir, "documents")
      .select(col("doc_id"), explode_outer(longToks).as("long_tok"))
      .orderBy(col("doc_id"), col("long_tok").asc_nulls_first)
  }

  /** ANSI-mode-safe error handling: `try_*` variants return NULL where the
    * strict form raises (division by zero, bad casts, overflow) — the
    * dirty-data posture of a 100 TB ingest pipeline. Oracle spells the same
    * semantics with guards/TRY_CAST. */
  val fnTry = Q(
    "fn_try",
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_discount = 0 THEN NULL ELSE l_extendedprice / l_discount END AS safe_div,
      |  TRY_CAST(l_returnflag AS INTEGER) AS bad_cast,
      |  TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS good_cast
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, safe_div NULLS FIRST, good_cast
      |LIMIT 2000""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_extendedprice, l_discount)").as("safe_div"),
        expr("try_cast(l_returnflag AS INT)").as("bad_cast"),
        expr("try_cast(CAST(l_quantity AS STRING) AS DOUBLE)").as("good_cast"))
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("safe_div").asc_nulls_first, col("good_cast"))
      .limit(2000)
  }

  val all: Seq[Q] = Seq(aggPivot, aggPercentile, aggApproxPercentile,
    fnConditional, aggStringAgg, aggHistogram, aggStats, fnExplodeOuter, fnTry)
}
