package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level search-relevance and training-data-curation operators:
  * BM25 ranking, eval-set n-gram decontamination, and repetition-quality
  * signals (the Gopher-rule family).
  *
  * Scale notes:
  *  - bm25_topk: the term filter lands BEFORE the tokenize-explode's
  *    groupBy, so the (doc, term) shuffle carries only query-term hits —
  *    at 100 TB that is |docs containing a query term| rows, not the
  *    corpus. df/N/avgdl are single-row or per-term aggregates,
  *    broadcast-joined. Final ranking is TakeOrderedAndProject (top-k),
  *    never a global sort.
  *  - decontaminate_ngram: shingles are md5-compressed to 32-char keys so
  *    the contamination semi-join shuffles fixed-width hashes, not 8-word
  *    strings. The eval-set shingle list (a benchmark suite, small by
  *    nature) is broadcast; the corpus side never shuffles at all —
  *    explode → semi-join → distinct-on-doc_id → anti-join, all map-side
  *    except the distinct.
  *  - text_repetition: one tokenize-explode shuffle keyed by (doc_id,
  *    token) then doc_id — the canonical two-phase agg; bigram metrics
  *    ride scan-side expressions (no extra pass over the corpus).
  */
object CorpusOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Fixed query for the declared bm25_topk operator (mid-frequency corpus
    * terms — present in many but not all documents). Shared with the
    * RelevanceOps rankers (RRF fusion, nDCG eval). */
  private[operators] val Bm25Terms = Seq("hash", "join", "vector")
  private val K1 = 1.2
  private val B = 0.75

  /** Reusable BM25 scorer over a (doc_id, text) corpus: per-doc rounded
    * score for [[Bm25Terms]], unsorted (callers rank/limit). Same pipeline
    * shape as [[bm25TopK]]: term filter lands before the (doc, token)
    * shuffle, df/stats are broadcast. */
  private[operators] def bm25Scores(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val tf = docs
      .select(col("doc_id"), explode(toks).as("token"))
      .filter(col("token").isin(Bm25Terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val dl = docs.select(col("doc_id"), size(toks).as("dl"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks)).as("sum_dl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val term = idf * (col("tf") * (K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
    // df here is bounded by CONSTRUCTION, not by corpus size: the term
    // filter lands before the (doc, token) shuffle, so df has at most
    // |Bm25Terms| rows regardless of scale — always broadcastable. The
    // full-vocabulary analog (TextOps.tokenizeTfidf) needs the
    // TextOps.vocabJoin guard instead.
    tf.join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(term), 6).as("bm25"))
  }

  /** Batched per-query BM25 (round-14 — the lexical arm of the batched
    * hybrid serve): `queryTerms` = (query_id, term) rows; output =
    * (query_id, doc_id, bm25) for docs containing at least one of the
    * query's terms. One corpus tokenize serves EVERY query: tf is
    * computed once over the UNION of all query terms (broadcast
    * semi-join BEFORE the (doc, token) shuffle — the [[bm25Scores]]
    * constant-filter shape, with the union bounded by the query frame,
    * not the corpus), per-(doc, token) term scores then fan out to the
    * querying queries by one broadcast join, and the per-(query, doc)
    * sum reuses the exact term formula — a single-query batch reproduces
    * [[bm25Scores]] row-for-row after the shared 1e-6 rounding
    * (IndexOpsSpec pins it through the hybrid fusion). */
  private[graft] def bm25ScoresBatch(docs: DataFrame,
      queryTerms: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val terms = queryTerms.select(col("term").as("token")).distinct()
    val tf = docs
      .select(col("doc_id"), explode(toks).as("token"))
      .join(broadcast(terms), Seq("token"), "left_semi")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val dl = docs.select(col("doc_id"), size(toks).as("dl"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks)).as("sum_dl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val term = idf * (col("tf") * (K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
    tf.join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(queryTerms.withColumnRenamed("term", "token")),
        Seq("token"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(term), 6).as("bm25"))
  }

  /** Per-doc token-length norms — the companion side table a stored
    * inverted index ships with (Lucene's norms file): built once at
    * ingest next to CurationOps3.invertedIndex, consulted by every
    * index-backed BM25 serve. dl derives from the same whitespace split
    * as [[bm25Scores]], so the two paths agree bit-for-bit. */
  def docNorms(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))

  /** Index-backed batched BM25 (round-14): identical output to
    * [[bm25ScoresBatch]], with tf/df read from the STORED inverted index
    * (CurationOps3.invertedIndex layout — csv postings per (token,
    * block)) and dl from the [[docNorms]] side table, instead of a
    * corpus re-tokenize. This is the 100 TB lexical serve: the query
    * terms' index rows are the ONLY postings read (broadcast semi-join
    * on the token key prunes the index scan), the corpus text is never
    * touched, and the per-batch cost scales with the matched postings,
    * not the corpus. df per term = one count over the term's exploded
    * postings (each (token, doc) appears in exactly one block row);
    * corpus stats are one narrow aggregate over the norms table (at
    * ingest these two numbers would be stored with the index — deriving
    * them here is one 2-column scan, not a tokenize). */
  def bm25FromIndexBatch(index: DataFrame, norms: DataFrame,
      queryTerms: DataFrame): DataFrame = {
    val terms = queryTerms.select(col("term").as("token")).distinct()
    val post = index
      .join(broadcast(terms), Seq("token"), "left_semi")
      .select(col("token"), explode(arrays_zip(
        split(col("doc_ids"), ","), split(col("tfs"), ","))).as("p"))
      .select(col("token"),
        col("p").getField("0").cast("long").as("doc_id"),
        col("p").getField("1").cast("long").as("tf"))
    val df = post.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = norms.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val term = idf * (col("tf") * (K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
    post.join(broadcast(df), "token")
      .join(norms, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(queryTerms.withColumnRenamed("term", "token")),
        Seq("token"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(term), 6).as("bm25"))
  }

  /** DuckDB CTE block computing the same per-doc rounded BM25 scores as
    * [[bm25Scores]] (terminal CTE name: `bm`). */
  private[operators] val Bm25OracleCtes: String =
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM tok
       |  WHERE token IN ('hash', 'join', 'vector') GROUP BY doc_id, token),
       |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
       |bm AS (
       |  SELECT doc_id,
       |    ROUND(SUM(
       |      LN(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
       |      (tf * (${K1} + 1.0)) /
       |      (tf + ${K1} * (1.0 - ${B} + ${B} * dl /
       |         (CAST(sum_dl AS DOUBLE) / n_docs)))), 6) AS bm25
       |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
       |  GROUP BY doc_id)""".stripMargin

  /** Search-relevance ranking: Lucene-shape BM25 over whitespace tokens.
    *
    * score(d) = Σ_t ln(1 + (N - df + 0.5)/(df + 0.5))
    *            · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    *
    * avgdl is computed as an exact BIGINT sum divided by an exact BIGINT
    * count — bit-identical in both engines (AVG() aggregation order is
    * not). Scores ROUND to 6 decimals; ties break on doc_id.
    */
  val bm25TopK = Q(
    "bm25_topk",
    s"""WITH $Bm25OracleCtes
       |SELECT doc_id, bm25 FROM bm
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) {
    (s, dir) =>
      bm25Scores(t(s, dir, "documents"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
  }

  /** Index-backed BM25 top-k (round-14): the SAME result set and the
    * SAME DuckDB oracle as [[bm25TopK]], served from the inverted-index
    * layout + norms table instead of a corpus tokenize — the oracle
    * hash-compare therefore proves index-serve ≡ direct ≡ DuckDB in one
    * check. The inline index build keeps the key oracle-able on the
    * shipped corpus; Bm25IndexSpec pins the stored parquet round-trip
    * (the production shape) equal to the inline form, the
    * phraseMatchFromIndex convention. */
  val bm25TopKIndexed = Q(
    "bm25_topk_indexed",
    s"""WITH $Bm25OracleCtes
       |SELECT doc_id, bm25 FROM bm
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents")
      val qt = Bm25Terms.map(w => (0L, w)).toDF("query_id", "term")
      bm25FromIndexBatch(CurationOps3.invertedIndex(docs), docNorms(docs), qt)
        .select(col("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  /** Shingle expression shared by decontamination: word-8-grams, md5'd to
    * fixed-width join keys. Callers filter to docs with ≥ 8 tokens first
    * (Spark's `sequence(1, n)` descends for n < 1 — the short-doc trap). */
  private[operators] def shingles8(textCol: String): org.apache.spark.sql.Column =
    expr(
      s"""transform(sequence(1, size(split($textCol, ' ')) - 7),
         |  i -> md5(concat_ws(' ',
         |    slice(split($textCol, ' '), i, 8))))""".stripMargin)

  /** Training-data decontamination: drop every training document sharing
    * at least one word-8-gram with the held-out eval set (stand-in eval
    * set: the deterministic md5-prefix sample, the engine-portable
    * sampling convention). Returns surviving doc_ids. */
  val decontaminateNgram = Q(
    "decontaminate_ngram",
    """WITH ev AS (SELECT * FROM documents WHERE md5(text) LIKE '0%'),
      |tr AS (SELECT * FROM documents WHERE md5(text) NOT LIKE '0%'),
      |evsh AS (
      |  SELECT DISTINCT unnest(list_transform(
      |    range(1, len(string_split(text, ' ')) - 6),
      |    i -> md5(array_to_string(string_split(text, ' ')[i:i+7], ' ')))) AS h
      |  FROM ev),
      |trsh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(1, len(string_split(text, ' ')) - 6),
      |    i -> md5(array_to_string(string_split(text, ' ')[i:i+7], ' ')))) AS h
      |  FROM tr),
      |bad AS (SELECT DISTINCT doc_id FROM trsh WHERE h IN (SELECT h FROM evsh))
      |SELECT doc_id FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM bad)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val isEval = md5(col("text")).like("0%")
    val ev = docs.filter(isEval)
    val tr = docs.filter(!isEval)
    val long = size(split(col("text"), " ")) >= 8
    val evSh = ev.filter(long)
      .select(explode(shingles8("text")).as("h")).distinct()
    val trSh = tr.filter(long)
      .select(col("doc_id"), explode(shingles8("text")).as("h"))
    // Eval shingle sets are benchmark-sized — broadcast; the corpus side
    // stays map-local through the semi-join.
    val bad = trSh.join(broadcast(evSh), Seq("h"), "left_semi")
      .select("doc_id").distinct()
    tr.join(bad, Seq("doc_id"), "left_anti")
      .select("doc_id").orderBy("doc_id")
  }

  /** Gopher-family repetition signals per document:
    * duplicate-bigram fraction and most-frequent-token fraction. NULL for
    * degenerate docs (0 tokens / 0 bigrams) on both engines. */
  val textRepetition = Q(
    "text_repetition",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
      |top AS (
      |  SELECT doc_id, MAX(tf) AS max_tf, CAST(SUM(tf) AS BIGINT) AS n_tok
      |  FROM tf GROUP BY doc_id),
      |bg AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) - 1 AS n_bigrams,
      |    len(list_distinct(list_transform(
      |      range(1, len(string_split(text, ' '))),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i+1]))) AS n_distinct
      |  FROM documents)
      |SELECT doc_id,
      |  ROUND(1.0 - n_distinct / CAST(NULLIF(n_bigrams, 0) AS DOUBLE), 6)
      |    AS dup_bigram_frac,
      |  ROUND(max_tf / CAST(NULLIF(n_tok, 0) AS DOUBLE), 6) AS top_token_frac
      |FROM bg JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      val docs = t(s, dir, "documents")
      val toks = split(col("text"), " ")
      val tf = docs.select(col("doc_id"), explode(toks).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val top = tf.groupBy("doc_id")
        .agg(max(col("tf")).as("max_tf"), sum(col("tf")).as("n_tok"))
      // CASE guard: sequence(1, 0) DESCENDS in Spark — 1-token docs must
      // yield an empty bigram list, not element_at(arr, 0) crashes.
      val bigrams = expr(
        """CASE WHEN size(split(text, ' ')) >= 2 THEN
          |  transform(sequence(1, size(split(text, ' ')) - 1),
          |    i -> concat(element_at(split(text, ' '), i), ' ',
          |                element_at(split(text, ' '), i + 1)))
          |ELSE array() END""".stripMargin)
      val bg = docs.select(
        col("doc_id"),
        (size(toks) - 1).as("n_bigrams"),
        size(array_distinct(bigrams)).as("n_distinct"))
      bg.join(top, "doc_id")
        .select(
          col("doc_id"),
          round(lit(1.0) - col("n_distinct") /
            nullif(col("n_bigrams"), lit(0)).cast("double"), 6)
            .as("dup_bigram_frac"),
          round(col("max_tf") /
            nullif(col("n_tok"), lit(0)).cast("double"), 6)
            .as("top_token_frac"))
        .orderBy("doc_id")
  }

  /** Training-mixture accounting: per (lang, source) document/token counts
    * and each cell's share of total corpus tokens — the table a sampling-
    * weight scheduler consumes. Shares divide exact BIGINT token counts
    * (integer division order is engine-independent; double AVG is not). */
  val mixtureStats = Q(
    "corpus_mixture_stats",
    """WITH g AS (
      |  SELECT lang, source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang, source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM g)
      |SELECT lang, source, n_docs, n_tokens,
      |  ROUND(n_tokens / CAST(total_tokens AS DOUBLE), 6) AS token_share
      |FROM g CROSS JOIN tot ORDER BY lang, source""".stripMargin) { (s, dir) =>
    val g = t(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("n_tokens"))
    val tot = g.agg(sum(col("n_tokens")).as("total_tokens"))
    g.crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("total_tokens").cast("double"), 6)
          .as("token_share"))
      .orderBy("lang", "source")
  }

  /** Embedding int8 affine quantization audit: per-vector (min, max) range
    * and the mean absolute reconstruction error of round((x-min)/scale)
    * codes. The point at 100 TB is the 4x shuffle/storage reduction of
    * shipping int8 codes + 2 floats instead of float32 vectors; this
    * operator reports the accuracy cost per vector. Zero-range vectors
    * quantize to NULL (scale 0) on both engines. */
  val embeddingQuantize = Q(
    "embedding_quantize_int8",
    """WITH base AS (
      |  SELECT vec_id, embedding,
      |    CAST(list_min(embedding) AS DOUBLE) AS mn,
      |    (CAST(list_max(embedding) AS DOUBLE) -
      |     CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS sc
      |  FROM embeddings)
      |SELECT vec_id, ROUND(mn, 6) AS q_min, ROUND(mn + 255.0 * sc, 6) AS q_max,
      |  ROUND(list_sum(list_transform(embedding,
      |    x -> abs(CAST(x AS DOUBLE) -
      |      (mn + ROUND((CAST(x AS DOUBLE) - mn) / NULLIF(sc, 0.0)) * sc))))
      |    / len(embedding), 6) AS mean_abs_err
      |FROM base ORDER BY vec_id""".stripMargin) { (s, dir) =>
    t(s, dir, "embeddings")
      .withColumn("mn", array_min(col("embedding")).cast("double"))
      .withColumn("sc",
        (array_max(col("embedding")).cast("double") - col("mn")) / 255.0)
      .select(col("vec_id"),
        round(col("mn"), 6).as("q_min"),
        round(col("mn") + lit(255.0) * col("sc"), 6).as("q_max"),
        round(expr(
          """aggregate(embedding, cast(0.0 as double),
            |  (acc, x) -> acc + abs(cast(x as double) -
            |    (mn + round((cast(x as double) - mn) / nullif(sc, 0.0d)) * sc)))
            |""".stripMargin) / size(col("embedding")), 6)
          .as("mean_abs_err"))
      .orderBy("vec_id")
  }

  /** Text normalization — the canonical pre-dedup scrub: lowercase, strip
    * sentence punctuation, collapse whitespace runs, trim. Pure per-row
    * scan (no shuffle); the md5 of the normalized form is the join key a
    * normalized-exact dedup would group on, so the declared output proves
    * the normalization is bit-identical cross-engine. Regexes use only
    * character classes + explicit repetition (Java regex ≡ RE2). */
  val textNormalize = Q(
    "text_normalize",
    """SELECT doc_id,
      |  length(text) AS n_chars_raw,
      |  length(trim(regexp_replace(regexp_replace(lower(text),
      |    '[.,!?;:]', '', 'g'), '[ \t]+', ' ', 'g'))) AS n_chars_norm,
      |  md5(trim(regexp_replace(regexp_replace(lower(text),
      |    '[.,!?;:]', '', 'g'), '[ \t]+', ' ', 'g'))) AS norm_md5
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val norm = trim(regexp_replace(regexp_replace(lower(col("text")),
      "[.,!?;:]", ""), "[ \t]+", " "))
    t(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).as("n_chars_raw"),
        length(norm).as("n_chars_norm"),
        md5(norm).as("norm_md5"))
      .orderBy("doc_id")
  }

  /** Per-language heavy hitters: exact top-3 most frequent tokens per
    * lang — the vocabulary-skew audit run before tokenizer training. Two
    * phases: (lang, token) counts with map-side partial aggregation over
    * the exploded scan, then a top-k window over the REDUCED side (rows =
    * distinct tokens, not token occurrences). Deterministic tie-break
    * (count DESC, token ASC). At 100 TB the count table is what shuffles —
    * the explode never crosses the wire. */
  val textHeavyHitters = Q(
    "text_heavy_hitters",
    """WITH tok AS (
      |  SELECT lang, UNNEST(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |counts AS (
      |  SELECT lang, token, COUNT(*) AS n FROM tok
      |  WHERE token <> '' GROUP BY lang, token),
      |ranked AS (
      |  SELECT lang, token, n, ROW_NUMBER() OVER (PARTITION BY lang
      |    ORDER BY n DESC, token) AS rank
      |  FROM counts)
      |SELECT lang, rank, token, n FROM ranked WHERE rank <= 3
      |ORDER BY lang, rank""".stripMargin) { (s, dir) =>
    val counts = t(s, dir, "documents")
      .select(col("lang"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("token"))))
      .filter(col("rank") <= 3)
      .select(col("lang"), col("rank"), col("token"), col("n"))
      .orderBy("lang", "rank")
  }

  /** Per-document token-distribution Shannon entropy — the repetition/
    * diversity quality signal (low entropy ⇒ boilerplate or degenerate
    * repetition). Computed as ln(T) - Σ n·ln(n) / T over the per-doc token
    * counts: n and T stay exact integers until the final double division,
    * and the ln() last-bit libm drift is absorbed by round(·, 6). Docs
    * with no non-empty token (empty text) drop out on both sides. One
    * shuffle on (doc_id, token), then a per-doc reduce. */
  val textTokenEntropy = Q(
    "text_token_entropy",
    """WITH tok AS (
      |  SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, token, COUNT(*) AS n FROM tok
      |  WHERE token <> '' GROUP BY doc_id, token)
      |SELECT doc_id,
      |  CAST(SUM(n) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_distinct,
      |  ROUND(LN(CAST(SUM(n) AS DOUBLE))
      |    - SUM(CAST(n AS DOUBLE) * LN(CAST(n AS DOUBLE)))
      |      / CAST(SUM(n) AS DOUBLE), 6) AS token_entropy
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val counts = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("n"))
    counts.groupBy("doc_id")
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(log(sum(col("n")).cast("double")) -
          sum(col("n").cast("double") * log(col("n").cast("double"))) /
            sum(col("n")).cast("double"), 6).as("token_entropy"))
      .orderBy("doc_id")
  }

  /** Paragraph-level (sub-document) deduplication — the RefinedWeb-style
    * pass that drops repeated boilerplate BLOCKS while keeping the host
    * documents. The corpus has no paragraph breaks, so "paragraph" =
    * 20-token chunk; each chunk is md5'd to a fixed-width key and the
    * FIRST occurrence (by doc_id, chunk index) survives.
    *
    * Scale: the shuffle carries (doc_id, idx, 16-byte hash) — never chunk
    * text; the window partitions by chunk hash (max partition = one
    * duplicated paragraph's occurrence list). Per-doc rollup is the
    * canonical two-phase agg. */
  val dedupParagraph = Q(
    "dedup_paragraph",
    """WITH ch AS (
      |  SELECT doc_id, u.idx AS idx, u.h AS h FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS BIGINT)),
      |      i -> {'idx': i, 'h': md5(array_to_string(
      |        string_split(text, ' ')[(i*20+1):(i*20+20)], ' '))})) AS u
      |    FROM documents)),
      |rn AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
      |  FROM ch)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  ROUND(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) /
      |    CAST(COUNT(*) AS BIGINT), 6) AS dup_ratio
      |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    paragraphDupStats(t(s, dir, "documents"))
  }

  /** Shared chunk-dedup pipeline over a (doc_id, text, …) corpus. */
  def paragraphDupStats(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = expr(
      """transform(
        |  sequence(0, cast(ceil(size(split(text, ' ')) / 20.0) as int) - 1),
        |  i -> struct(i as idx,
        |    md5(array_join(slice(split(text, ' '), i*20+1, 20), ' ')) as h))"""
        .stripMargin)
    val dup = sum(when(col("rn") > 1, 1L).otherwise(0L))
    docs.select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"), col("c.h").as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "idx")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), dup.as("n_dup"),
        round(dup / count(lit(1)), 6).as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** Training-sequence packing, concat-and-split strategy: documents are
    * concatenated in a deterministic order (doc_id) within each language
    * stream and cut into fixed 512-token packs — each doc is assigned the
    * pack its FIRST token lands in, with its offset inside that pack.
    * The layout step before writing pretraining shards; packs are
    * language-pure (the mixture weights stay controllable downstream).
    *
    * Scale: one running-sum window per language partition (the natural
    * shard key — never keyless) over (doc_id, n_tokens) pairs; the text
    * itself never moves for the planning pass. */
  val packSequences = Q(
    "corpus_pack_sequences",
    """WITH d AS (
      |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT lang, doc_id, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS tokens_before
      |  FROM d)
      |SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(tokens_before // 512 AS BIGINT) AS pack_id,
      |  CAST(tokens_before % 512 AS BIGINT) AS pack_offset
      |FROM c ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("tokens_before",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        (col("tokens_before") / 512).cast("long").as("pack_id"),
        (col("tokens_before") % 512).as("pack_offset"))
      .orderBy("lang", "doc_id")
  }

  /** Solr QueryElevationComponent semantics: a curated elevation map pins
    * specific documents at the top in CURATED order (even when they score
    * 0 for the query — coalesced via the full outer join), an exclusion
    * list removes documents entirely, and organic BM25 ranking fills the
    * rest. The elevation/exclusion maps are editorial config — tiny by
    * nature, broadcast literals here, a broadcast dim table at 100 TB;
    * the organic arm is bm25_topk's scale shape unchanged, and the final
    * ranking is TakeOrderedAndProject. */
  val searchQueryElevation = Q(
    "search_query_elevation",
    s"""WITH $Bm25OracleCtes,
       |elev AS (SELECT * FROM (VALUES (CAST(7 AS BIGINT), 1),
       |                               (CAST(42 AS BIGINT), 2)) e(doc_id, elev_rank)),
       |exc AS (SELECT CAST(13 AS BIGINT) AS doc_id),
       |cand AS (
       |  SELECT COALESCE(b.doc_id, e.doc_id) AS doc_id,
       |    COALESCE(b.bm25, 0.0) AS bm25, e.elev_rank
       |  FROM bm b FULL OUTER JOIN elev e ON b.doc_id = e.doc_id)
       |SELECT doc_id, CAST(elev_rank IS NOT NULL AS BIGINT) AS elevated, bm25
       |FROM cand WHERE doc_id NOT IN (SELECT doc_id FROM exc)
       |ORDER BY elevated DESC, elev_rank ASC NULLS LAST, bm25 DESC, doc_id
       |LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    val organic = bm25Scores(t(s, dir, "documents"))
    val elev = Seq((7L, 1), (42L, 2)).toDF("e_doc_id", "elev_rank")
    organic.join(broadcast(elev), col("doc_id") === col("e_doc_id"),
        "full_outer")
      .select(coalesce(col("doc_id"), col("e_doc_id")).as("doc_id"),
        coalesce(col("bm25"), lit(0.0)).as("bm25"), col("elev_rank"))
      .filter(col("doc_id") =!= 13L)
      .select(col("doc_id"),
        col("elev_rank").isNotNull.cast("long").as("elevated"), col("bm25"))
      .orderBy(col("elevated").desc, col("elev_rank").asc_nulls_last,
        col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** Solr field collapsing (collapse + expand counts): one result row per
    * `source` group — the group's best-scoring document for the query —
    * plus the collapsed group size. The per-group pick is max_by over a
    * keyed aggregation (one shuffle on the collapse field, no window);
    * group count rides the same aggregation. At 100 TB the shuffle
    * carries only query-term-matching docs (bm25_topk's term-filter-first
    * shape upstream). */
  val searchFieldCollapse = Q(
    "search_field_collapse",
    s"""WITH $Bm25OracleCtes,
       |scored AS (
       |  SELECT d.source, b.doc_id, b.bm25
       |  FROM bm b JOIN documents d USING (doc_id))
       |SELECT source,
       |  (ARRAY_AGG(doc_id ORDER BY bm25 DESC, doc_id))[1] AS top_doc_id,
       |  MAX(bm25) AS top_bm25,
       |  COUNT(*) AS n_collapsed
       |FROM scored GROUP BY source
       |ORDER BY top_bm25 DESC, source""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    bm25Scores(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(
        // max_by with an explicit (bm25, -doc_id) struct: DETERMINISTIC
        // tie-break to the lowest doc_id (bare max_by ties are
        // partition-order-dependent).
        max(struct(col("bm25"), (-col("doc_id")).as("neg_id")))
          .getField("neg_id").unary_-.as("top_doc_id"),
        max(col("bm25")).as("top_bm25"),
        count(lit(1)).as("n_collapsed"))
      .select(col("source"), col("top_doc_id"), col("top_bm25"),
        col("n_collapsed"))
      .orderBy(col("top_bm25").desc, col("source"))
  }

  /** Solr cursorMark semantics — OFFSET-free deep paging: the cursor is
    * the last row's full sort tuple (bm25, doc_id), and the next page is
    * a FILTER on the total order + top-k, so page N costs the same
    * one filtered top-k pass as page 1. At 100 TB this is the difference
    * between deep paging and a job that materializes-and-discards
    * offset·pagesize rows per request (why Solr deprecated start= for
    * deep pages). The cursor here is the 5th-ranked row's tuple, derived
    * IN-PLAN (a 1-row broadcast of the anchor subquery — no driver
    * round-trip), returning ranks 6–15. */
  val searchCursorPage = Q(
    "search_cursor_page",
    s"""WITH $Bm25OracleCtes,
       |anchor AS (
       |  SELECT bm25, doc_id FROM bm
       |  ORDER BY bm25 DESC, doc_id LIMIT 1 OFFSET 4)
       |SELECT b.doc_id, b.bm25 FROM bm b, anchor a
       |WHERE b.bm25 < a.bm25 OR (b.bm25 = a.bm25 AND b.doc_id > a.doc_id)
       |ORDER BY b.bm25 DESC, b.doc_id LIMIT 10""".stripMargin) { (s, dir) =>
    val scored = bm25Scores(t(s, dir, "documents"))
    val anchor = scored.orderBy(col("bm25").desc, col("doc_id"))
      .limit(5).orderBy(col("bm25").asc, col("doc_id").desc).limit(1)
      .select(col("bm25").as("a_bm25"), col("doc_id").as("a_doc_id"))
    scored.crossJoin(broadcast(anchor))
      .filter(col("bm25") < col("a_bm25") ||
        (col("bm25") === col("a_bm25") && col("doc_id") > col("a_doc_id")))
      .select("doc_id", "bm25")
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)
  }

  val all: Seq[Q] = Seq(bm25TopK, bm25TopKIndexed, decontaminateNgram,
    textRepetition,
    mixtureStats, embeddingQuantize, textNormalize, textHeavyHitters,
    textTokenEntropy, dedupParagraph, packSequences, searchQueryElevation,
    searchFieldCollapse, searchCursorPage)
}
