package graft.operators

import graft.{Q, Tables}
import graft.Parity._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-evaluation suite, wave 13 (round 6): the metrics a quality-filter /
  * ranking-model training pipeline computes over held-out scores — ROC AUC,
  * calibration (reliability bins), thresholded confusion matrices, and the
  * Kolmogorov–Smirnov separation statistic. The classifier under test is a
  * deterministic fixture (see [[scored]]) so every metric is oracle-exact;
  * in production the `score` column comes from the model being evaluated
  * (e.g. quality_train_logreg's σ(w·x)) and the plans are identical.
  *
  * Exactness design (the Parity conventions, applied to metrics):
  *  - The fixture score is transcendental-free: a rational signal
  *    `n_chars / (n_chars + 300.0)` blended with a dyadic md5-nibble noise
  *    term (`v/256`), so both engines evaluate the identical IEEE
  *    expression tree — scores are bit-identical with no libm dependence.
  *  - AUC/KS run on the GROUPED score frame: counts are integers, the
  *    0.5·tie correction is dyadic, and every partial sum stays exactly
  *    representable — the metric is exact regardless of partitioning.
  *  - Precision/recall/F1 are ratios of integer counts (f1 via the
  *    2tp/(2tp+fp+fn) identity — no composed double rounding).
  *
  * Scale notes (100 TB):
  *  - Every metric starts with a two-phase hash aggregate on `score`
  *    (map-side combined), collapsing the corpus to its distinct-score
  *    frame BEFORE any ordered pass. The cumsum itself is a
  *    range-partitioned prefix sum ([[withCumCounts]]): per-bucket KEYED
  *    windows plus a broadcast 16-row bucket-offset dim — never a
  *    keyless single-partition window over the corpus.
  *  - eval_confusion_threshold is ONE corpus scan: the 3-row threshold dim
  *    broadcast-cross-joins the scored frame and all 12 counters come out
  *    of a single grouped aggregate.
  */
object EvalOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def nib(h: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"

  /** Deterministic scored-prediction fixture: label y = long-document
    * (n_chars > 300, the quality_train_logreg target), score = 0.75·signal
    * + 0.25·noise with signal monotone in n_chars and noise a dyadic
    * md5-derived uniform — an imperfect-but-informative classifier, so
    * AUC/KS land strictly between coin-flip and perfect. */
  private val ScoredSql: String =
    s"""scored AS (
       |  SELECT doc_id, CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS y,
       |    0.75 * (n_chars / (n_chars + 300.0)) +
       |    0.25 * (((${nib("h", 1)}) * 16 + (${nib("h", 2)})) / 256.0) AS score
       |  FROM (SELECT doc_id, n_chars,
       |          md5(concat('ev:', CAST(doc_id AS VARCHAR))) AS h
       |        FROM documents))""".stripMargin

  private[graft] def scored(docs: DataFrame): DataFrame = {
    val h = md5(concat(lit("ev:"), col("doc_id").cast("string")))
    docs
      .select(col("doc_id"), col("n_chars"), h.as("h"))
      .select(
        col("doc_id"),
        when(col("n_chars") > 300, 1L).otherwise(0L).cast("int").as("y"),
        (lit(0.75) * (col("n_chars") / (col("n_chars") + lit(300.0))) +
          lit(0.25) * ((expr(nib("h", 1)) * 16 + expr(nib("h", 2))) / lit(256.0)))
          .as("score"))
  }

  /** Distinct-score frame with positive/negative counts per score — the
    * reduced frame every rank-based metric runs on. */
  private def scoreGroups(sc: DataFrame): DataFrame =
    sc.groupBy("score").agg(
      sum(col("y").cast("long")).as("pos_g"),
      sum(lit(1L) - col("y")).as("neg_g"))

  /** Range-partitioned prefix sums over the score-grouped frame: scores
    * land in 16 contiguous buckets, the cumulative runs per-bucket under a
    * KEYED window, and each bucket's starting offset comes from the 16-row
    * bucket-totals frame (computed with a tiny triangular self-join and
    * broadcast back). This is the cluster-scale cumsum — no keyless
    * single-partition window anywhere (PlanSpec's sweep enforces it), and
    * the only all-to-one data is the 16-row offset dim. `frame` picks
    * strictly-below (−1, AUC) or inclusive (0, KS) cumulatives. */
  private def withCumCounts(g: DataFrame, frame: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = g.withColumn("bucket",
      least(floor(col("score") * 16).cast("long"), lit(15L)))
    val tots = b.groupBy("bucket").agg(
      sum("pos_g").as("tot_pos"), sum("neg_g").as("tot_neg"))
    val offs = tots.as("a")
      .join(tots.as("b"), col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("b.tot_pos")), lit(0L)).as("off_pos"),
        coalesce(sum(col("b.tot_neg")), lit(0L)).as("off_neg"))
    val w = Window.partitionBy("bucket").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, frame)
    b.join(broadcast(offs), "bucket")
      .withColumn("cum_pos",
        col("off_pos") + coalesce(sum("pos_g").over(w), lit(0L)))
      .withColumn("cum_neg",
        col("off_neg") + coalesce(sum("neg_g").over(w), lit(0L)))
  }

  /** ROC AUC by the grouped Mann–Whitney formulation: for each distinct
    * score, positives there beat every negative strictly below and tie
    * (worth ½) the negatives at the same score —
    * AUC = Σ pos_g·(cum_neg_below + ½·neg_g) / (P·N). */
  val evalAucRoc = Q(
    "eval_auc_roc",
    s"""WITH $ScoredSql,
       |g AS (SELECT score, SUM(y) AS pos_g, SUM(1 - y) AS neg_g
       |      FROM scored GROUP BY score),
       |c AS (SELECT score, pos_g, neg_g,
       |        COALESCE(SUM(neg_g) OVER (ORDER BY score
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS cum_neg
       |      FROM g)
       |SELECT CAST(SUM(pos_g) AS BIGINT) AS pos_cnt,
       |  CAST(SUM(neg_g) AS BIGINT) AS neg_cnt,
       |  ROUND(SUM(pos_g * (cum_neg + 0.5 * neg_g))
       |    / (CAST(SUM(pos_g) AS DOUBLE) * SUM(neg_g)), 6) AS auc,
       |  ROUND(2.0 * (SUM(pos_g * (cum_neg + 0.5 * neg_g))
       |    / (CAST(SUM(pos_g) AS DOUBLE) * SUM(neg_g))) - 1.0, 6) AS gini
       |FROM c""".stripMargin) { (s, dir) =>
    val c = withCumCounts(scoreGroups(scored(t(s, dir, "documents"))), -1)
    val auc = sum(col("pos_g") * (col("cum_neg") + lit(0.5) * col("neg_g"))) /
      (sum("pos_g").cast("double") * sum("neg_g"))
    c.agg(
      sum("pos_g").cast("long").as("pos_cnt"),
      sum("neg_g").cast("long").as("neg_cnt"),
      round(auc, 6).as("auc"),
      round(lit(2.0) * auc - lit(1.0), 6).as("gini"))
  }

  /** Reliability diagram: decile bins of the score, each with its count,
    * mean predicted score, empirical positive rate, and the absolute
    * calibration gap. */
  val evalCalibrationBins = Q(
    "eval_calibration_bins",
    s"""WITH $ScoredSql
       |SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin,
       |  COUNT(*) AS n,
       |  ${sqlRavg("score")} AS mean_score,
       |  ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
       |  ROUND(ABS(${sqlRavg("score")}
       |    - ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6)), 6) AS gap
       |FROM scored GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
    val sc = scored(t(s, dir, "documents"))
    val fracPos = round(sum(col("y").cast("long")).cast("double") /
      count(lit(1)), 6)
    sc.groupBy(least(floor(col("score") * 10).cast("long"), lit(9L)).as("bin"))
      .agg(
        count(lit(1)).as("n"),
        ravg(col("score")).as("mean_score"),
        fracPos.as("frac_pos"),
        round(abs(ravg(col("score")) - fracPos), 6).as("gap"))
      .orderBy("bin")
  }

  /** Confusion matrix + precision/recall/F1 at operating thresholds 0.3 /
    * 0.5 / 0.7 — one corpus scan, 3-row broadcast threshold dim, all
    * counters from a single grouped aggregate; F1 by the integer identity
    * 2tp/(2tp+fp+fn). */
  val evalConfusionThreshold = Q(
    "eval_confusion_threshold",
    s"""WITH $ScoredSql,
       |th AS (SELECT CAST(unnest([0.3, 0.5, 0.7]) AS DOUBLE) AS threshold),
       |m AS (
       |  SELECT threshold,
       |    SUM(CASE WHEN score >= threshold AND y = 1 THEN 1 ELSE 0 END) AS tp,
       |    SUM(CASE WHEN score >= threshold AND y = 0 THEN 1 ELSE 0 END) AS fp,
       |    SUM(CASE WHEN score < threshold AND y = 1 THEN 1 ELSE 0 END) AS fn,
       |    SUM(CASE WHEN score < threshold AND y = 0 THEN 1 ELSE 0 END) AS tn
       |  FROM th CROSS JOIN scored GROUP BY threshold)
       |SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       |  ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision,
       |  ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall,
       |  ROUND(CAST(2 * tp AS DOUBLE) / NULLIF(2 * tp + fp + fn, 0), 6) AS f1
       |FROM m ORDER BY threshold""".stripMargin) { (s, dir) =>
    val sc = scored(t(s, dir, "documents"))
    val th = { import s.implicits._; Seq(0.3, 0.5, 0.7).toDF("threshold") }
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val m = sc.crossJoin(broadcast(th))
      .groupBy("threshold")
      .agg(
        cnt(col("score") >= col("threshold") && col("y") === 1).as("tp"),
        cnt(col("score") >= col("threshold") && col("y") === 0).as("fp"),
        cnt(col("score") < col("threshold") && col("y") === 1).as("fn"),
        cnt(col("score") < col("threshold") && col("y") === 0).as("tn"))
    m.select(
      col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
      round(col("tp").cast("double") / nullif(col("tp") + col("fp"), lit(0L)), 6)
        .as("precision"),
      round(col("tp").cast("double") / nullif(col("tp") + col("fn"), lit(0L)), 6)
        .as("recall"),
      round((col("tp") * 2).cast("double")
        / nullif(col("tp") * 2 + col("fp") + col("fn"), lit(0L)), 6).as("f1"))
      .orderBy("threshold")
  }

  /** Kolmogorov–Smirnov separation: max over score cut-points of
    * |F_neg(s) − F_pos(s)| on the grouped frame — the class-separation
    * monitor a score distribution shift alarm reads. */
  val evalKsStat = Q(
    "eval_ks_stat",
    s"""WITH $ScoredSql,
       |g AS (SELECT score, SUM(y) AS pos_g, SUM(1 - y) AS neg_g
       |      FROM scored GROUP BY score),
       |c AS (SELECT
       |        SUM(pos_g) OVER (ORDER BY score) AS cum_pos,
       |        SUM(neg_g) OVER (ORDER BY score) AS cum_neg
       |      FROM g),
       |tot AS (SELECT MAX(cum_pos) AS p, MAX(cum_neg) AS n FROM c)
       |SELECT CAST(p AS BIGINT) AS pos_cnt, CAST(n AS BIGINT) AS neg_cnt,
       |  ROUND(MAX(ABS(CAST(cum_neg AS DOUBLE) / n
       |    - CAST(cum_pos AS DOUBLE) / p)), 6) AS ks
       |FROM c CROSS JOIN tot GROUP BY p, n""".stripMargin) { (s, dir) =>
    val c = withCumCounts(scoreGroups(scored(t(s, dir, "documents"))), 0)
      .select("cum_pos", "cum_neg")
    val tot = c.agg(max("cum_pos").as("p"), max("cum_neg").as("n"))
    c.crossJoin(broadcast(tot))
      .groupBy("p", "n")
      .agg(round(max(abs(col("cum_neg").cast("double") / col("n")
        - col("cum_pos").cast("double") / col("p"))), 6).as("ks"))
      .select(col("p").cast("long").as("pos_cnt"),
        col("n").cast("long").as("neg_cnt"), col("ks"))
  }

  val all: Seq[Q] =
    Seq(evalAucRoc, evalCalibrationBins, evalConfusionThreshold, evalKsStat)
}
