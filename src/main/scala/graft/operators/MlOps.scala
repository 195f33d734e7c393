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
    * log-loss, rounded to 6. No oracle by design (iterative); MlSpec pins
    * loss decrease, accuracy floor, and partition-count invariance rides
    * the decimal laundering. In production the label column is a
    * human/model quality signal and the loop is identical. */
  val qualityTrainLogreg = Q.noOracle("quality_train_logreg") { (s, dir) =>
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
      w = w.indices.map(j => w(j) - 1.0 * g.getDouble(j) / n).toArray
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
