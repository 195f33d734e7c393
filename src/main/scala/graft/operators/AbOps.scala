package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experimentation analytics, wave 26 (round 6): the A/B readout — a
  * two-proportion z-test over hash-split cohorts — and a Flesch-style
  * readability score, the classic text-quality signal the corpus filters
  * rank on.
  *
  * Exactness: cohort/conversion counts are integers; p̂ and the pooled
  * variance are single-ratio doubles; the z statistic adds one
  * correctly-rounded sqrt — all bit-identical across engines. The
  * readability formula consumes three integer counts per doc (words,
  * sentences, vowel-group "syllables") and the identical IEEE constant
  * arithmetic; the regex classes used ('[.!?]', '[aeiouy]+') behave
  * identically in Spark's Java regex and DuckDB's RE2.
  *
  * Scale: the z-test is two grouped aggregates over the event scan (user
  * frame reduced first, map-side combined); readability is a pure
  * projection — one scan, no shuffle except the output ORDER BY.
  */
object AbOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Two-proportion z-test: cohorts A/B by user_id parity, conversion =
    * user logged ≥1 HIGH-VALUE purchase (value > 150 — rare enough that
    * per-user conversion lands mid-range and stays strictly inside (0, 1)
    * at every scale; plain "any purchase" saturates at 1.0 on this event
    * density and degenerates the variance). Output: per-cohort n/conversions/rate
    * plus the pooled z statistic (one row). |z| > 1.96 is the 95%
    * read. */
  val eventsAbTestZtest = Q(
    "events_ab_test_ztest",
    """WITH u AS (
      |  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS cohort,
      |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
      |      THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT cohort, COUNT(*) AS n, SUM(conv) AS convs
      |  FROM u GROUP BY cohort),
      |w AS (
      |  SELECT
      |    MAX(CASE WHEN cohort = 0 THEN n END) AS n0,
      |    MAX(CASE WHEN cohort = 0 THEN convs END) AS c0,
      |    MAX(CASE WHEN cohort = 1 THEN n END) AS n1,
      |    MAX(CASE WHEN cohort = 1 THEN convs END) AS c1
      |  FROM g)
      |SELECT CAST(n0 AS BIGINT) AS n_a, CAST(c0 AS BIGINT) AS conv_a,
      |  ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS rate_a,
      |  CAST(n1 AS BIGINT) AS n_b, CAST(c1 AS BIGINT) AS conv_b,
      |  ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS rate_b,
      |  ROUND((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) /
      |    NULLIF(SQRT((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
      |      * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
      |      * (1.0 / n0 + 1.0 / n1)), 0.0), 6) AS z
      |FROM w""".stripMargin) { (s, dir) =>
    val u = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 150.0,
        1).otherwise(0)).as("conv"))
      .withColumn("cohort", (col("user_id") % 2).cast("int"))
    val g = u.groupBy("cohort")
      .agg(count(lit(1)).as("n"), sum("conv").as("convs"))
    val w = g.agg(
      max(when(col("cohort") === 0, col("n"))).as("n0"),
      max(when(col("cohort") === 0, col("convs"))).as("c0"),
      max(when(col("cohort") === 1, col("n"))).as("n1"),
      max(when(col("cohort") === 1, col("convs"))).as("c1"))
    val p0 = col("c0").cast("double") / col("n0")
    val p1 = col("c1").cast("double") / col("n1")
    val pPool = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    w.select(
      col("n0").cast("long").as("n_a"), col("c0").cast("long").as("conv_a"),
      round(p0, 6).as("rate_a"),
      col("n1").cast("long").as("n_b"), col("c1").cast("long").as("conv_b"),
      round(p1, 6).as("rate_b"),
      // NULLIF guards the degenerate all-convert / none-convert corpus
      // (pooled variance 0): z is NULL, not a crash, on both engines.
      round((p0 - p1) / nullif(sqrt(pPool * (lit(1.0) - pPool) *
        (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), lit(0.0)), 6).as("z"))
  }

  /** Flesch-style readability per source: words (whitespace tokens),
    * sentences ('[.!?]' runs, min 1), syllables ('[aeiouy]+' vowel
    * groups, the standard approximation) — score = 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), averaged per
    * source over exact per-doc integer counts. */
  val textReadability = Q(
    "text_readability",
    """WITH d AS (
      |  SELECT source,
      |    len(string_split(text, ' ')) AS words,
      |    GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(words) AS BIGINT) AS words,
      |  CAST(SUM(sentences) AS BIGINT) AS sentences,
      |  CAST(SUM(syllables) AS BIGINT) AS syllables,
      |  ROUND(206.835
      |    - 1.015 * (CAST(SUM(words) AS DOUBLE) / SUM(sentences))
      |    - 84.6 * (CAST(SUM(syllables) AS DOUBLE) / SUM(words)), 6)
      |    AS flesch
      |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents").select(
      col("source"),
      size(split(col("text"), " ")).cast("long").as("words"),
      greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
        .cast("long").as("sentences"),
      size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("long").as("syllables"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("words").as("words"), sum("sentences").as("sentences"),
        sum("syllables").as("syllables"))
      .select(col("source"), col("n_docs"), col("words"), col("sentences"),
        col("syllables"),
        round(lit(206.835)
          - lit(1.015) * (col("words").cast("double") / col("sentences"))
          - lit(84.6) * (col("syllables").cast("double") / col("words")), 6)
          .as("flesch"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(eventsAbTestZtest, textReadability)
}
