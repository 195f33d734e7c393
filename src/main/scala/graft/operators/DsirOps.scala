package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DSIR-style data selection (round-10): hashed-n-gram importance
  * resampling weights — the published data-selection method (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling")
  * that scores every raw document by how much it resembles a target
  * distribution, using hashed bigram features instead of a trained model:
  *
  *   weight(doc) = Σ_buckets count_doc(b) · log( p̂_target(b) / p̂_raw(b) )
  *
  * with Laplace-smoothed bucket probabilities over a FIXED 16^4-bucket
  * hash space. High-weight documents look like the target (here: the
  * English slice) and survive resampling; the weights feed the
  * temperature-resampling / budget-waterfilling operators downstream.
  *
  * Scale shape: the two bucket-distribution tables are ≤ 65 536 rows each
  * (grouped map-side, broadcast back), so the corpus is touched in exactly
  * two linear passes — bigram explode → per-(doc, bucket) counts → one
  * broadcast join — no shuffle wider than (doc_id, bucket). At 100 TB the
  * distributions are ingest-time artifacts refreshed per corpus snapshot.
  *
  * Oracle parity: the bucket function is the first 4 hex chars of
  * md5(bigram) — byte-identical in both engines — and the weight rounds
  * to 4 decimals (the ravg convention; the cross-engine log()/summation
  * residual is ~1e-12 relative, far inside the grid). */
object DsirOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val NumBuckets = 65536 // 16^4 — the fixed hashed-feature dimension

  val corpusDsirWeights = Q(
    "corpus_dsir_weights",
    s"""WITH toks AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok,
       |         generate_subscripts(string_split(text, ' '), 1) AS i
       |  FROM documents),
       |big AS (
       |  SELECT a.doc_id, a.lang,
       |         substr(md5(a.tok || ' ' || b.tok), 1, 4) AS bucket
       |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
       |raw_d AS (SELECT bucket, COUNT(*) AS cr FROM big GROUP BY bucket),
       |tgt_d AS (SELECT bucket, COUNT(*) AS ct FROM big
       |          WHERE lang = 'en' GROUP BY bucket),
       |tot AS (SELECT (SELECT COUNT(*) FROM big) AS tr,
       |               (SELECT COUNT(*) FROM big WHERE lang = 'en') AS tt),
       |ratio AS (
       |  SELECT r.bucket,
       |         LN((COALESCE(t.ct, 0) + 1.0) / (tot.tt + $NumBuckets))
       |       - LN((r.cr + 1.0) / (tot.tr + $NumBuckets)) AS lr
       |  FROM raw_d r LEFT JOIN tgt_d t USING (bucket) CROSS JOIN tot),
       |docb AS (
       |  SELECT doc_id, bucket, COUNT(*) AS n
       |  FROM big GROUP BY doc_id, bucket)
       |SELECT d.doc_id, CAST(SUM(d.n) AS BIGINT) AS n_bigrams,
       |       ROUND(SUM(d.n * ratio.lr), 4) AS dsir_weight
       |FROM docb d JOIN ratio USING (bucket)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    // Bigram explode: one pass, (doc_id, lang, bucket) rows. The <2-token
    // filter is CORRECTNESS, not just hygiene: sequence(1, size-1) on a
    // single-token doc is the DESCENDING [1, 0] and the lambda would
    // evaluate element_at(tk, 0)/element_at(tk, 2) — a crash (review
    // round-10; the oracle's i+1 self-join naturally omits such docs).
    val big = docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(1, size(tk) - 1),
          |  i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"""
          .stripMargin)).as("bigram"))
      .select(col("doc_id"), col("lang"),
        substring(md5(col("bigram")), 1, 4).as("bucket"))
    // Per-(doc, bucket) counts — the only corpus-wide shuffle.
    val docb = big.groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("n"), max(col("lang")).as("lang"))
    // Distributions over the ≤65 536-bucket space, derived from docb (so
    // the corpus is scanned once): raw = all docs, target = the 'en'
    // slice. Totals ride along as 1-row broadcast aggregates.
    val rawD = docb.groupBy("bucket").agg(sum("n").as("cr"))
    val tgtD = docb.filter(col("lang") === "en")
      .groupBy("bucket").agg(sum("n").as("ct"))
    val tot = docb.agg(
      sum("n").as("tr"),
      sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("tt"))
    val ratio = rawD
      .join(tgtD, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("tt") + NumBuckets))
          - log((col("cr") + 1.0) / (col("tr") + NumBuckets))).as("lr"))
    docb
      .join(broadcast(ratio), "bucket")
      .groupBy("doc_id")
      .agg(sum("n").cast("long").as("n_bigrams"),
        round(sum(col("n") * col("lr")), 4).as("dsir_weight"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(corpusDsirWeights)
}
