package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** In-engine model tooling, wave 12 (round 6): learning-to-rank feature
  * extraction (the training-data export a ranking model consumes) and a
  * full-batch logistic-regression trainer (the quality-classifier shape —
  * a FastText-style filter's optimization loop, run as Spark aggregates).
  *
  * Scale notes:
  *  - search_ltr_features: same plan family as bm25_topk — the term filter
  *    lands before the (doc, token) shuffle, stats broadcast, and the
  *    top-20 doc restriction is a broadcast semi join; output is
  *    (queries × k) rows, model-sized.
  *  - quality_train_logreg: each GD iteration is ONE aggregate over the
  *    feature frame (map-side combined) fetching a single gradient row to
  *    the driver — the Lloyd's-iteration precedent (ClusterOps.kmeansFit).
  *    Gradient sums are laundered through DECIMAL(28,12) per term, so the
  *    learned weights are partition-count-invariant (CPUS-4 ≡ CPUS-32
  *    byte-identical), which float summation would not give.
  */
object MlOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val K1 = 1.2
  private val B = 0.75

  /** Learning-to-rank training-data export: for each query term and each
    * document in the BM25 fused top-20, the per-term feature vector a
    * ranker trains on — tf, df, dl, idf, the BM25 term score — plus the
    * graded judgment rel = least(tf, 3) (relevance_ndcg's label). Docs
    * missing a term emit tf = 0 rows (the negative examples a pairwise
    * ranker needs). */
  val searchLtrFeatures = Q(
    "search_ltr_features",
    s"""WITH ${CorpusOps.Bm25OracleCtes},
       |top20 AS (SELECT doc_id FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
       |terms AS (SELECT unnest(['hash', 'join', 'vector']) AS token),
       |grid AS (SELECT token, doc_id FROM terms CROSS JOIN top20),
       |feat AS (
       |  SELECT g.token, g.doc_id,
       |    COALESCE(tf.tf, 0) AS tf, df.df, dl.dl,
       |    ROUND(LN(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)), 6) AS idf,
       |    ROUND(COALESCE(
       |      LN(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) *
       |      (tf.tf * (${K1} + 1.0)) /
       |      (tf.tf + ${K1} * (1.0 - ${B} + ${B} * dl.dl /
       |         (CAST(sum_dl AS DOUBLE) / n_docs))), 0.0), 6) AS score
       |  FROM grid g
       |  LEFT JOIN tf ON tf.token = g.token AND tf.doc_id = g.doc_id
       |  JOIN df ON df.token = g.token
       |  JOIN dl ON dl.doc_id = g.doc_id
       |  CROSS JOIN stats)
       |SELECT token, doc_id, CAST(tf AS BIGINT) AS tf,
       |  CAST(df AS BIGINT) AS df, CAST(dl AS BIGINT) AS dl,
       |  idf, score, CAST(LEAST(tf, 3) AS BIGINT) AS rel
       |FROM feat ORDER BY token, doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val toks = split(col("text"), " ")
    val tf = docs
      .select(col("doc_id"), explode(toks).as("token"))
      .filter(col("token").isin(CorpusOps.Bm25Terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val dl = docs.select(col("doc_id"), size(toks).as("dl"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"), sum(size(toks)).as("sum_dl"))
    val top20 = CorpusOps.bm25Scores(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(20).select("doc_id")
    val terms = { import s.implicits._; CorpusOps.Bm25Terms.toDF("token") }
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    val score = idf * (col("tf") * (K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
    top20.crossJoin(broadcast(terms))
      .join(tf, Seq("token", "doc_id"), "left")
      .na.fill(0L, Seq("tf"))
      .join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("token"), col("doc_id"), col("tf"),
        col("df"), col("dl").cast("long").as("dl"),
        round(idf, 6).as("idf"),
        round(coalesce(score, lit(0.0)), 6).as("score"),
        least(col("tf"), lit(3L)).as("rel"))
      .orderBy("token", "doc_id")
  }

  /** Deterministic doc feature frame for the trainer: label = "long
    * document" (n_chars > 300, near the corpus median — a learnable fixture stand-in for a real
    * quality label), features = bias, tokens/100, avg word length, vowel
    * ratio. */
  private[operators] def qualityFeatures(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      when(col("n_chars") > 300, 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("x0"),
      (size(toks) / 100.0).as("x1"),
      (length(col("text")).cast(DoubleType) / size(toks)).as("x2"),
      (length(regexp_replace(col("text"), "[^aeiou]", ""))
        .cast(DoubleType) / length(col("text"))).as("x3"))
  }

  /** Full-batch logistic-regression trainer (15 GD steps, lr = 1.0): the
    * quality-classifier optimization loop run entirely as Spark
    * aggregates — per step, ONE job computes the decimal-laundered
    * gradient Σ (σ(w·x) − y)·x and the driver updates the 4 weights (the
    * kmeansFit iteration shape; weights broadcast back inside the next
    * step's expression). Output: learned weights + training accuracy +
    * log-loss, rounded to 6.
    *
    * Oracled since round 8 (the kmeans/PCA/PQ replay family): the DuckDB
    * oracle unrolls the 15 steps as CTEs over the same standardized
    * feature frame — DECIMAL(28,12) gradient sums are order-exact on
    * both engines, and the per-step 1e-9 weight rounding absorbs the
    * libm-exp last-ulp leakage, so both engines walk identical weight
    * vectors. MlSpec still pins loss decrease, accuracy floor, and
    * partition-count invariance. In production the label column is a
    * human/model quality signal and the loop is identical. */
  val qualityTrainLogreg = Q("quality_train_logreg", {
    val sig = (m: String) => s"(1.0 / (1.0 + EXP(-($m))))"
    def marginSql(w: String) =
      s"x0 * $w.w0 + x1 * $w.w1 + x2 * $w.w2 + x3 * $w.w3"
    val steps = (1 to 15).map { k =>
      val prev = s"w${k - 1}"
      val p = sig(marginSql(prev))
      def g(j: Int) =
        s"""CAST(SUM(CAST(($p - y) * x$j AS DECIMAL(28, 12))) AS DOUBLE)"""
      s"""w$k AS MATERIALIZED (
         |  SELECT ${(0 to 3).map(j =>
              s"ROUND($prev.w$j - ${g(j)} / (SELECT n FROM nn), 9) AS w$j")
              .mkString(", ")}
         |  FROM feats CROSS JOIN $prev GROUP BY ${(0 to 3).map(j =>
              s"$prev.w$j").mkString(", ")})""".stripMargin
    }.mkString(",\n")
    val pf = sig(marginSql("w15"))
    s"""WITH raw AS (
       |  SELECT CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END AS y,
       |    1.0 AS x0,
       |    len(string_split(text, ' ')) / 100.0 AS x1,
       |    CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
       |      AS x2,
       |    CAST(length(regexp_replace(text, '[^aeiou]', '', 'g'))
       |      AS DOUBLE) / length(text) AS x3
       |  FROM documents),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM raw),
       |mom AS (
       |  SELECT ${(1 to 3).map(j =>
            s"CAST(SUM(CAST(x$j AS DECIMAL(28, 12))) AS DOUBLE) AS s$j, " +
            s"CAST(SUM(CAST(x$j * x$j AS DECIMAL(28, 12))) AS DOUBLE) AS q$j")
            .mkString(", ")}
       |  FROM raw),
       |sds AS (
       |  SELECT ${(1 to 3).map(j =>
            s"s$j / (SELECT n FROM nn) AS m$j, " +
            s"SQRT(GREATEST(q$j / (SELECT n FROM nn) - " +
            s"(s$j / (SELECT n FROM nn)) * (s$j / (SELECT n FROM nn)), " +
            s"0.000000000001)) AS d$j").mkString(", ")}
       |  FROM mom),
       |feats AS MATERIALIZED (
       |  SELECT y, x0, ${(1 to 3).map(j =>
            s"(x$j - sds.m$j) / sds.d$j AS x$j").mkString(", ")}
       |  FROM raw CROSS JOIN sds),
       |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |$steps
       |SELECT ${(0 to 3).map(j => s"ROUND(w15.w$j, 6) AS " +
          Seq("w_bias", "w_ntok", "w_awl", "w_vowel")(j)).mkString(", ")},
       |  ROUND(SUM(CASE WHEN ($pf >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END)
       |    / (SELECT n FROM nn), 6) AS train_acc,
       |  ROUND(-CAST(SUM(CAST(
       |      y * LN(GREATEST($pf, 0.000000000001)) +
       |      (1.0 - y) * LN(GREATEST(1.0 - ($pf), 0.000000000001))
       |    AS DECIMAL(28, 12))) AS DOUBLE) / (SELECT n FROM nn), 6)
       |    AS log_loss
       |FROM feats CROSS JOIN w15
       |GROUP BY w15.w0, w15.w1, w15.w2, w15.w3""".stripMargin
  }) { (s, dir) =>
    import graft.Stage.StagedOps
    val raw = qualityFeatures(t(s, dir, "documents")).staged
    def dsum(c: Column): Column =
      sum(c.cast(DecimalType(28, 12))).cast(DoubleType)
    // Standardize the non-bias features (z-score from decimal-laundered
    // moments) so full-batch GD is well-conditioned — without this the
    // raw avg-word-length scale (~5.5) makes lr=1 diverge (observed:
    // oscillating weights, 0.51 accuracy). One bounded 1-row fetch, the
    // kmeans centroid precedent.
    val m = raw.agg(
      count(lit(1)).cast(DoubleType),
      dsum(col("x1")), dsum(col("x2")), dsum(col("x3")),
      dsum(col("x1") * col("x1")), dsum(col("x2") * col("x2")),
      dsum(col("x3") * col("x3"))).head()
    val n = m.getDouble(0)
    val mean = (1 to 3).map(j => m.getDouble(j) / n)
    val sd = (1 to 3).map(j =>
      math.sqrt(math.max(m.getDouble(j + 3) / n - mean(j - 1) * mean(j - 1),
        1e-12)))
    val feats = raw.select(col("y") +: col("x0") +:
      (1 to 3).map(j =>
        ((col(s"x$j") - mean(j - 1)) / sd(j - 1)).as(s"x$j")): _*)
    val xs = Seq("x0", "x1", "x2", "x3")
    var w = Array(0.0, 0.0, 0.0, 0.0)
    def margin: Column = xs.zipWithIndex
      .map { case (c, j) => col(c) * w(j) }.reduce(_ + _)
    def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))
    for (_ <- 1 to 15) {
      val err = sigmoid(margin) - col("y")
      val g = feats.agg(
        dsum(err * col("x0")), dsum(err * col("x1")),
        dsum(err * col("x2")), dsum(err * col("x3"))).head()
      // Weights round to the 1e-9 grid per step (round-8, the kmeans /
      // pqFit precedent): the decimal-laundered gradient is order-exact,
      // but σ() rides on libm exp() whose last ulp differs across
      // engines — at the 1e-12 decimal grid a knife-edge cast can leak
      // ~1e-15 into w. Rounding far above the drift and far below the
      // learning signal makes the 15-step recurrence replayable in SQL.
      w = w.indices.map(j => BigDecimal(w(j) - 1.0 * g.getDouble(j) / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
    }
    val p = sigmoid(margin)
    val eps = 1e-12
    feats.agg(
      round(sum(when((p >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L))
        / n, 6).as("train_acc"),
      round(-dsum(col("y") * log(greatest(p, lit(eps))) +
        (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(eps)))) / n, 6)
        .as("log_loss"))
      .select(
        round(lit(w(0)), 6).as("w_bias"), round(lit(w(1)), 6).as("w_ntok"),
        round(lit(w(2)), 6).as("w_awl"), round(lit(w(3)), 6).as("w_vowel"),
        col("train_acc"), col("log_loss"))
  }

  val all: Seq[Q] = Seq(searchLtrFeatures, qualityTrainLogreg)
}
