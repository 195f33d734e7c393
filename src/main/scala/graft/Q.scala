package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared operator: a Spark query plus (usually) a DuckDB oracle.
  *
  * `fn(spark, sfDir)` must return a DataFrame whose row order and values are
  * deterministic and exactly reproducible by `oracle` running in DuckDB on
  * the same parquet tables (driver contract, SURVEY §5.1).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def aliased(alias: String): Q = copy(name = alias)
}

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Oracle-parity helpers (SURVEY §5.4).
  *
  * Hash-compare against DuckDB demands bit-identical values. Double
  * summation is order-dependent, so any `SUM(double)` differs across
  * engines in the last bits. Convention used by every declared query:
  *
  *  - Sums of doubles go through `DECIMAL(18,4)` per row — decimal
  *    accumulation is exact and order-independent, and both engines cast
  *    the identical input doubles to the identical decimals — then back to
  *    double for a stable simple schema. Mirror in SQL:
  *    `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  *  - Averages are rounded to 4 decimals (`round(avg(x),4)`): the residual
  *    cross-engine error (~1e-9 relative) is far inside the rounding
  *    granularity, and round-to-nearest of the same decimal yields the same
  *    double in both engines.
  *  - Date-valued timestamps are compared as DATE on both sides.
  *  - Every query ends in an ORDER BY over a unique key set.
  *
  * At 100 TB these conventions cost nothing: decimal partial aggregation is
  * still a two-phase hash aggregate with map-side combine.
  */
object Parity {
  /** Exact, order-independent sum of a double column, as double.
    *
    * The sum is ROUNDED to scale 2 BEFORE the double cast: decimal→double
    * is only engine-identical while the scaled integer stays below 2^53
    * (DuckDB converts int128→double then divides — double-rounds above
    * it; Spark's BigDecimal converts correctly rounded — the 1-ulp
    * divergence the round-4 10× run caught on q1's scale-6 sum_charge).
    * Scale 2 keeps money-valued sums exact through ~9·10¹³ — sf ≈ 1000
    * for this corpus — versus ~9·10¹¹ at scale 4. ROUND, not a downscale
    * CAST: DuckDB's decimal downscale cast TRUNCATES while Spark's
    * rounds HALF_UP; both engines' ROUND(decimal, 2) is half-away-from-
    * zero (verified empirically), so ROUND is the convention. */
  def dsum(c: Column): Column = round(sum(c.cast(DecimalType(18, 4))), 2)
    .cast(DoubleType)
  /** Cast a cent-valued double factor to exact decimal. Products of
    * computed doubles must NOT be cast after multiplying (the double
    * product's shortest-repr rounding differs between engines at .xxxx5
    * boundaries); cast each on-grid factor first, then multiply in exact
    * decimal arithmetic.
    *
    * Validity domain note: a `CAST(SUM(dec2(x) * dec2(y)) AS DOUBLE)`
    * (scale-4 sum) stays engine-identical while |sum| < 2^53 / 10⁴ ≈
    * 9·10¹¹ — sf ≈ 100 for this corpus's revenue sums. Beyond that,
    * apply the [[dsum]] ROUND(…, 2) convention to the sum before the
    * double cast (see dsum's scaladoc for why ROUND, not CAST). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** SQL twin of [[dec2]]. */
  def sqlDec2(expr: String): String = s"CAST($expr AS DECIMAL(12,2))"
  /** Deterministic-to-4-decimals average of a double column. */
  def ravg(c: Column): Column = round(avg(c), 4)
  /** SQL twin of [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(18,4))), 2) AS DOUBLE)"
  /** SQL twin of [[ravg]]. */
  def sqlRavg(expr: String): String = s"ROUND(AVG($expr), 4)"

  /** Global ORDER BY of a DOMAIN-BOUNDED final result.
    *
    * For a result whose cardinality is fixed by a column DOMAIN (status /
    * flag / nation / event-type groupings — a few to a few hundred rows at
    * ANY corpus size), a range-exchange sort is the wrong plan: it adds a
    * whole extra shuffle stage (plus, for non-aggregate inputs, a
    * range-sampling job) to order rows that fit in one task at 100 TB as
    * surely as at sf0.001. `coalesce(1)` is a NARROW dependency over the
    * final-aggregate partitions — the merge task reads the (already
    * partially-aggregated, domain-bounded) shuffle output and sorts it
    * in-stage, so the plan is scan → one shuffle → merge+sort: one stage
    * and ~45 ms of per-action dispatch less than the range-exchange form
    * (NOTES_r11 floor table). The distributed aggregation below the sort
    * is untouched — this is a FINAL-RESULT merge, the same single-stream
    * tail every engine's ORDER-BY-tiny-result plan has.
    *
    * Do NOT use on corpus-linear outputs (per-doc, per-customer rows):
    * those need the distributed range sort. */
  def sortedSmall(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)
}
