package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-similarity additions, wave 8 (round 6). */
object TextOps2 {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Asymmetric n-gram containment — quote/inclusion detection: for
    * document pairs sharing ≥ 1 word-8-gram, containment =
    * |shingles(A) ∩ shingles(B)| / min(|A|, |B|) — near 1.0 when the
    * smaller document is quoted inside the larger even though Jaccard
    * (dedup_ngram_jaccard's metric) stays low. Pairs ≥ 0.5, top-50.
    *
    * Scale design (the round-5 clone-clique lessons, applied):
    *  - exact duplicates collapse to one representative (min doc_id per
    *    md5(text)) BEFORE pairing, so a million-clone text contributes
    *    ONE row to the candidate join, not 10¹² pairs;
    *  - candidates come from a shared-shingle bucket join (linear in
    *    shingle incidence), never an all-pairs product;
    *  - stop-shingles (in > 50 distinct reps) are dropped from BOTH
    *    sides symmetrically — the standard boilerplate guard that keeps
    *    any one bucket's pair volume bounded; sizes |A| are counted on
    *    the same filtered shingle set so the ratio stays internally
    *    consistent (and the oracle mirrors it).
    * All counts are integers; the single division rounds to 6. */
  val textContainmentNgram = Q(
    "text_containment_ngram",
    """WITH reps AS (
      |  SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 8
      |  GROUP BY md5(text)),
      |sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(1, len(string_split(text, ' ')) - 6),
      |    i -> md5(array_to_string(string_split(text, ' ')[i:i+7], ' ')))) AS h
      |  FROM reps),
      |kept AS (
      |  SELECT doc_id, h FROM sh
      |  WHERE h IN (SELECT h FROM sh GROUP BY h HAVING COUNT(*) <= 50)),
      |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
      |  FROM kept GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY a_id, b_id)
      |SELECT a_id, b_id, n_shared,
      |  ROUND(CAST(n_shared AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 6)
      |    AS containment
      |FROM pairs
      |JOIN sizes sa ON a_id = sa.doc_id
      |JOIN sizes sb ON b_id = sb.doc_id
      |WHERE CAST(n_shared AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= 0.5
      |ORDER BY containment DESC, a_id, b_id LIMIT 50""".stripMargin) {
    (s, dir) =>
      val reps = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 8)
        .groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("doc_id"), any_value(col("text")).as("text"))
      val sh = reps
        .select(col("doc_id"), explode(CorpusOps.shingles8("text")).as("h"))
        .distinct()
      val stop = sh.groupBy("h").agg(count(lit(1)).as("dfh"))
        .filter(col("dfh") > 50).select("h")
      val kept = sh.join(stop, Seq("h"), "left_anti")
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val a = kept.select(col("h"), col("doc_id").as("a_id"))
      val b = kept.select(col("h").as("h2"), col("doc_id").as("b_id"))
      val pairs = a
        .join(b, col("h") === col("h2") && col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      val cont = round(
        col("n_shared").cast("double") / least(col("sa"), col("sb")), 6)
      pairs
        .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("sa")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("sb")), "b_id")
        .filter(col("n_shared").cast("double") / least(col("sa"), col("sb")) >= 0.5)
        .select(col("a_id"), col("b_id"), col("n_shared"),
          cont.as("containment"))
        .orderBy(col("containment").desc, col("a_id"), col("b_id"))
        .limit(50)
  }

  /** Portable hex-nibble value of the md5 prefix (the corpus_shard_shuffle
    * convention): both engines evaluate the identical `instr` arithmetic,
    * so the bucket assignment is engine-exact with no native-hash
    * dependence. */
  private def hexNibble(h: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"

  /** Feature hashing (the HashingTF / hashing-trick embedder): every token
    * maps to one of 64 buckets by its md5 prefix, with a ±1 sign from the
    * third nibble (the signed hashing variant that keeps collisions
    * unbiased), and each document becomes the sparse integer vector of
    * signed term-frequency sums. The deterministic, vocabulary-free way to
    * embed text for similarity/dedup when no model is available — ALL
    * arithmetic is integer, so cross-engine parity is exact by
    * construction. Pure map + one (doc, bucket) aggregate; at 100 TB this
    * is a single two-phase hash agg over the tokenize stream. */
  val textHashingFeatures = Q(
    "text_hashing_features", {
      val b = s"(${hexNibble("h", 1)} * 16 + ${hexNibble("h", 2)}) % 64"
      val sign = s"CASE WHEN ${hexNibble("h", 3)} < 8 THEN 1 ELSE -1 END"
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |h AS (SELECT doc_id, token, md5(token) AS h FROM tok),
         |m AS (
         |  SELECT doc_id, CAST($b AS BIGINT) AS bucket,
         |    CAST($sign AS BIGINT) AS sign
         |  FROM h)
         |SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
         |FROM m GROUP BY doc_id, bucket
         |HAVING SUM(sign) <> 0
         |ORDER BY doc_id, bucket""".stripMargin
    }) { (s, dir) =>
    val b = s"(${hexNibble("h", 1)} * 16 + ${hexNibble("h", 2)}) % 64"
    val sign = s"CASE WHEN ${hexNibble("h", 3)} < 8 THEN 1 ELSE -1 END"
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .withColumn("h", md5(col("token")))
      .select(col("doc_id"),
        expr(s"CAST($b AS BIGINT)").as("bucket"),
        expr(s"CAST($sign AS BIGINT)").as("sign"))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sign")).as("weight"))
      .filter(col("weight") =!= 0)
      .orderBy("doc_id", "bucket")
  }

  /** Tf-idf cosine retrieval: rank the corpus against ONE query document's
    * tf-idf vector (doc 42) — the real-valued upgrade of
    * search_more_like_this's integer overlap, and the linear-scale shape
    * (the join ships only the query's terms' postings; at 100 TB tf/df
    * come from the stored inverted index).
    *
    * Parity engineering: weights ROUND to 6 decimals and cast to
    * DECIMAL(12,6) — EXACT, since a 6-rounded double is on the scale-6
    * grid — so every product/sum runs in exact decimal arithmetic
    * (order-independent); sums ROUND to 6 again BEFORE the double cast
    * (the int128 double-rounding rule); ln() on identical doubles is
    * empirically engine-identical (the bm25 convention, oracle-proven at
    * every scale tier). */
  val searchTfidfCosine = Q(
    "search_tfidf_cosine",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY doc_id, token),
      |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |w AS (
      |  SELECT doc_id, token,
      |    CAST(ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 6)
      |      AS DECIMAL(12,6)) AS w
      |  FROM tf JOIN df USING (token) CROSS JOIN n),
      |nrm AS (
      |  SELECT doc_id,
      |    SQRT(CAST(ROUND(SUM(w * w), 6) AS DOUBLE)) AS nrm
      |  FROM w GROUP BY doc_id),
      |q AS (SELECT token, w AS wq FROM w WHERE doc_id = 42),
      |dots AS (
      |  SELECT w.doc_id,
      |    CAST(ROUND(SUM(w.w * q.wq), 6) AS DOUBLE) AS dot
      |  FROM w JOIN q USING (token)
      |  WHERE w.doc_id <> 42 GROUP BY w.doc_id)
      |SELECT d.doc_id,
      |  ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
      |FROM dots d
      |JOIN nrm na ON na.doc_id = 42
      |JOIN nrm nb ON nb.doc_id = d.doc_id
      |ORDER BY cosine DESC, d.doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = tf.join(broadcast(df), "token").crossJoin(broadcast(nDf))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(12, 6)).as("w"))
    val nrm = w.groupBy("doc_id")
      .agg(sqrt(round(sum(col("w") * col("w")), 6).cast("double")).as("nrm"))
    val q = w.filter(col("doc_id") === 42)
      .select(col("token"), col("w").as("wq"))
    val dots = w.filter(col("doc_id") =!= 42)
      .join(broadcast(q), "token")
      .groupBy("doc_id")
      .agg(round(sum(col("w") * col("wq")), 6).cast("double").as("dot"))
    val qn = nrm.filter(col("doc_id") === 42).select(col("nrm").as("qnrm"))
    dots.join(nrm, "doc_id").crossJoin(broadcast(qn))
      .select(col("doc_id"),
        round(col("dot") / (col("qnrm") * col("nrm")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(textContainmentNgram, textHashingFeatures,
    searchTfidfCosine)
}
