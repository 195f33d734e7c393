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

  val all: Seq[Q] = Seq(textContainmentNgram)
}
