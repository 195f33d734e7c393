package graft.operators

import graft.{Q, Tables}
import graft.Stage.StagedOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-pipeline operators, wave 15 (round 6): training a subword
  * vocabulary and preparing corruption targets — the steps between raw
  * text curation and the training loop.
  *
  *  - bpe_train_merges: BPE merge-rule LEARNING (text_token_bpe applies
  *    rules; this derives them). Runs the way production BPE trainers do:
  *    collapse the corpus to its distinct-word frame with counts once
  *    (the vocabulary is orders of magnitude smaller than the corpus),
  *    then per round count weighted adjacent symbol pairs, pick the
  *    arg-max pair (count desc, pair asc — fully deterministic), and
  *    apply the merge with a left-to-right greedy array fold. Each round
  *    is ONE hash aggregate over the word frame plus a 1-row driver fetch
  *    (the kmeansFit / quality_train_logreg iteration shape); the word
  *    frame is Stage()d per round so plans stay flat.
  *  - span_corruption: T5-style span-mask preparation stats. Mask starts
  *    are a deterministic md5-nibble Bernoulli(1/16) per position, spans
  *    run 3 tokens; output = per-doc token/span/mask counts + corruption
  *    rate. Pure map + explode + distinct-collapse — linear, shuffle only
  *    on (doc, pos).
  *  - tokenizer_vocab_coverage: OOV audit of a top-1000 frequency vocab
  *    per source — the coverage report that decides vocab size. Token
  *    stream aggregates once; the learned vocab is a 1000-row broadcast.
  *
  * All integer arithmetic; rates are exact integer ratios — oracle-exact
  * where declared (bpe_train_merges is no-oracle by design: DuckDB cannot
  * express the iterative merge loop; BpeSpec pins a hand-computed corpus
  * and determinism instead).
  */
object TokenizerOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def nib(h: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"

  /** One greedy left-to-right merge pass: fold the symbol array, joining
    * each adjacent (left, right) occurrence into one symbol. The fold
    * cannot re-merge its own output with a FOLLOWING symbol in the same
    * step unless that forms the pair again ("aaaa" + (a,a) → [aa,aa] —
    * the standard greedy semantics). */
  private def applyMerge(syms: Column, left: String, right: String): Column = {
    val l = lit(left); val r = lit(right)
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
          .otherwise(concat(acc, array(x))))
  }

  /** Distinct-word frame with counts and initial character symbols. */
  private[graft] def wordFrame(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", split(col("word"), ""))

  /** The trainer core, separable for spec corpora: `rounds` merge rules
    * learned from a (word, cnt, syms) frame. Returns (rank, left, right,
    * merged, pair_count) driver-side. */
  private[graft] def bpeTrain(words0: DataFrame, rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var words = words0.staged
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val pairs = words
        .filter(size(col("syms")) > 1) // 1-symbol words carry no pairs (and
        // sequence(1, 0) would count DOWN, probing index 0)
        .select(col("cnt"), col("syms"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
        .select(element_at(col("syms"), col("i")).as("left"),
          element_at(col("syms"), col("i") + 1).as("right"), col("cnt"))
        .groupBy("left", "right").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("left"), col("right"))
        .limit(1).collect()
      if (pairs.nonEmpty) {
        val best = pairs.head
        val (l, rr, c) = (best.getString(0), best.getString(1), best.getLong(2))
        out += ((r, l, rr, l + rr, c))
        words = words
          .withColumn("syms", applyMerge(col("syms"), l, rr))
          .staged
      }
    }
    out.result()
  }

  /** BPE merge-rule training over the documents corpus: the first 8 merge
    * rules with their pair counts. No oracle by design (iterative driver
    * loop); BpeSpec pins a hand-computed corpus, merge-validity laws, and
    * determinism. */
  val bpeTrainMerges = Q.noOracle("bpe_train_merges") { (s, dir) =>
    val learned = bpeTrain(wordFrame(t(s, dir, "documents")), 8)
    import s.implicits._
    learned.toDF("rank", "left", "right", "merged", "pair_count")
      .select(col("rank"), col("left"), col("right"), col("merged"),
        col("pair_count"))
      .orderBy("rank")
  }

  /** T5-style span-corruption preparation: deterministic Bernoulli(1/16)
    * span starts (md5 nibble of doc:pos), 3-token spans, per-doc mask
    * accounting. Every doc reports (zero-span docs included via the left
    * join — rate 0). */
  val spanCorruption = Q(
    "span_corruption",
    s"""WITH tok AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, n_tokens, unnest(range(1, n_tokens + 1)) AS i
       |  FROM tok),
       |starts AS (
       |  SELECT doc_id, n_tokens, i FROM pos
       |  WHERE ${nib(s"md5(concat(CAST(doc_id AS VARCHAR), ':', CAST(i AS VARCHAR)))", 1)} = 0),
       |masked AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(range(i, LEAST(i + 2, n_tokens) + 1)) AS j
       |  FROM starts),
       |spans AS (SELECT doc_id, COUNT(*) AS n_spans FROM starts GROUP BY doc_id),
       |maskedc AS (SELECT doc_id, COUNT(*) AS n_masked FROM masked GROUP BY doc_id)
       |SELECT t.doc_id, t.n_tokens,
       |  COALESCE(s.n_spans, 0) AS n_spans,
       |  COALESCE(m.n_masked, 0) AS n_masked,
       |  ROUND(CAST(COALESCE(m.n_masked, 0) AS DOUBLE) / t.n_tokens, 6)
       |    AS mask_rate
       |FROM tok t LEFT JOIN spans s USING (doc_id)
       |  LEFT JOIN maskedc m USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
    val h = md5(concat(col("doc_id").cast("string"), lit(":"),
      col("i").cast("string")))
    val starts = tok
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(1), col("n_tokens"))).as("i"))
      .withColumn("h", h)
      .filter(expr(nib("h", 1)) === 0)
    val masked = starts
      .select(col("doc_id"),
        explode(sequence(col("i"), least(col("i") + 2, col("n_tokens"))))
          .as("j"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_masked"))
    val spans = starts.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    tok.join(spans, Seq("doc_id"), "left")
      .join(masked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        round(coalesce(col("n_masked"), lit(0L)).cast("double")
          / col("n_tokens"), 6).as("mask_rate"))
      .orderBy("doc_id")
  }

  /** Vocab coverage audit: top-1000-frequency vocabulary (count desc,
    * token asc), then per-source token totals, in-vocab hits, and OOV
    * rate — one token-stream aggregate + a 1000-row broadcast join. */
  val tokenizerVocabCoverage = Q(
    "tokenizer_vocab_coverage",
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |vocab AS (
      |  SELECT token FROM (
      |    SELECT token, COUNT(*) AS c FROM tok GROUP BY token
      |    ORDER BY c DESC, token LIMIT 1000)),
      |hits AS (
      |  SELECT t.source, CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS hit
      |  FROM tok t LEFT JOIN vocab v ON t.token = v.token)
      |SELECT source, COUNT(*) AS n_tokens,
      |  CAST(SUM(hit) AS BIGINT) AS in_vocab,
      |  ROUND(1.0 - CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS oov_rate
      |FROM hits GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val tok = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(1000).select("token")
    tok.join(broadcast(vocab.withColumn("hit", lit(1L))), Seq("token"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("hit"), lit(0L))).as("in_vocab"),
        round(lit(1.0) - sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1)), 6).as("oov_rate"))
      .orderBy("source")
  }

  val all: Seq[Q] =
    Seq(bpeTrainMerges, spanCorruption, tokenizerVocabCoverage)
}
