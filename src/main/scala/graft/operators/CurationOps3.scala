package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search-index and corpus-hygiene operators, fifth wave (round 5): the
  * inverted-index build + positional phrase query (the search-engine-native
  * pair — postings are what a Solr-class engine serves), C4-style duplicate
  * span REMOVAL (dedup_paragraph reports; this one actually scrubs and
  * reassembles), a Gopher-style composite rule filter with per-rule fail
  * reasons, and incremental minhash dedup of a new batch against the stored
  * historical index (the continuous-ingest production shape).
  *
  * Conventions as everywhere: flat uniquely-ordered schemas (arrays render
  * as CSV strings for the driver comparator), exact portable arithmetic
  * (integer counts, int-division doubles, ROUND only at the output), and
  * content-hash determinism.
  */
object CurationOps3 {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // ---------------------------------------------------------------- index

  /** Block-partitioned inverted index: per (token, doc-id block) the block
    * document frequency, summed term frequency, and the doc-id/tf postings
    * (doc-id-ordered). Blocks are doc-id ranges (`doc_id div 4096`) — NOT a
    * per-token dense rank, so no window over a hot token is ever needed:
    * the whole build is two hash aggregations with map-side combine
    * (token×doc tf, then token×block rollup). At 100 TB this matters
    * because a stopword's posting list is O(corpus) — unbounded in one row;
    * blocking bounds every output row at 4096 postings and makes the index
    * mergeable per ingest batch (new doc-id ranges append new blocks,
    * existing blocks untouched — the Lucene segment idea as ordinary
    * columnar rows). Global df/tf = SUM over a token's blocks. */
  def invertedIndex(docs: DataFrame, blockSize: Int = 4096): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .withColumn("block_id",
        floor(col("doc_id") / lit(blockSize)).cast("long"))
    def csv(field: String): Column = array_join(
      transform(sort_array(collect_list(struct(col("doc_id"), col("tf")))),
        x => x.getField(field).cast("string")), ",")
    tf.groupBy("token", "block_id")
      .agg(count(lit(1)).as("df_block"),
        sum("tf").as("tf_block"),
        csv("doc_id").as("doc_ids"),
        csv("tf").as("tfs"))
      .orderBy("token", "block_id")
  }

  val indexInvertedBuild = Q(
    "index_inverted_build",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (
      |  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY token, doc_id),
      |b AS (
      |  SELECT token, doc_id, tf,
      |    CAST(FLOOR(doc_id / 4096.0) AS BIGINT) AS block_id
      |  FROM tf)
      |SELECT token, block_id,
      |  CAST(COUNT(*) AS BIGINT) AS df_block,
      |  CAST(SUM(tf) AS BIGINT) AS tf_block,
      |  array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',')
      |    AS doc_ids,
      |  array_to_string(list(CAST(tf AS VARCHAR) ORDER BY doc_id), ',')
      |    AS tfs
      |FROM b GROUP BY token, block_id
      |ORDER BY token, block_id""".stripMargin) { (s, dir) =>
    invertedIndex(t(s, dir, "documents"))
  }

  // --------------------------------------------------------------- phrase

  /** Positional postings: (token, doc_id, sorted 0-based positions). The
    * per-(token, doc) row is the unit a phrase/proximity query consumes. */
  def positionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("token"))
      .groupBy("token", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Exact phrase query over positional postings — the Lucene/Solr phrase
    * shape: fetch each phrase word's posting row per doc (an equi-join on
    * doc_id between lists already collapsed to one row per (token, doc)),
    * then intersect position lists with a +1 shift per step. The running
    * `acc` holds the positions of the LAST matched word, so
    * `size(acc)` after the fold is the exact occurrence count. At 100 TB
    * each join ships only the phrase words' postings (a filter on the
    * token key prunes the index scan), never the corpus text. */
  def phraseMatch(docs: DataFrame, words: Seq[String]): DataFrame =
    phraseMatchFromIndex(positionalPostings(docs), words)

  /** Phrase query over a STORED positional index (parquet round-trip ≡
    * inline build — Curation3Spec pins it): at 100 TB the tokenize +
    * postings aggregation happens once at ingest and every phrase query
    * reads only its words' index rows (the token filter prunes the index
    * scan — verified pushed below the aggregate in the inline form too). */
  def phraseMatchFromIndex(idx: DataFrame, words: Seq[String]): DataFrame = {
    require(words.nonEmpty, "phrase must have at least one word")
    val head = idx.filter(col("token") === words.head)
      .select(col("doc_id"), col("positions").as("acc"))
    val matched = words.zipWithIndex.drop(1).foldLeft(head) {
      case (cur, (w, i)) =>
        val nxt = idx.filter(col("token") === w)
          .select(col("doc_id"), col("positions").as(s"p$i"))
        cur.join(nxt, "doc_id")
          .withColumn("acc", array_intersect(
            transform(col("acc"), p => p + 1), col(s"p$i")))
          .drop(s"p$i")
    }
    matched
      .select(col("doc_id"), size(col("acc")).cast("long").as("n_occ"))
      .filter(col("n_occ") > 0)
      .orderBy("doc_id")
  }

  val searchPhraseMatch = Q(
    "search_phrase_match",
    """WITH tok AS (
      |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(1, len(string_split(text, ' ')) + 1),
      |      i -> {'pos': i, 'w': string_split(text, ' ')[i]})) AS u
      |    FROM documents))
      |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
      |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |WHERE a.w = 'table' AND b.w = 'scan'
      |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin) { (s, dir) =>
    phraseMatch(t(s, dir, "documents"), Seq("table", "scan"))
  }

  // ---------------------------------------------------------------- scrub

  /** C4-style duplicate-span REMOVAL: every 20-token chunk that already
    * occurred anywhere earlier in the corpus (first occurrence by
    * (doc_id, idx) wins) is deleted, and each document is reassembled from
    * its surviving chunks in order. [[CorpusOps.dedupParagraph]] reports
    * the dup ratio; this is the transform a pipeline actually applies
    * before training. Chunk identity is keyed by md5 — the shuffle ships
    * fixed-width keys, and a chunk duplicated a million times still lands
    * on one reducer only for its rank, not its text. */
  def chunkScrub(docs: DataFrame): DataFrame = {
    val chunkExpr = expr(
      """transform(
        |  sequence(0, cast(ceil(size(split(text, ' ')) / 20.0) as int) - 1),
        |  i -> struct(i as idx,
        |    array_join(slice(split(text, ' '), i*20+1, 20), ' ') as chunk))"""
        .stripMargin)
    val ch = docs.select(col("doc_id"), explode(chunkExpr).as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"), col("c.chunk").as("chunk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("chunk"))).orderBy("doc_id", "idx")))
    ch.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(sort_array(collect_list(
          when(col("rn") === 1, struct(col("idx"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  val corpusChunkScrub = Q(
    "corpus_chunk_scrub",
    """WITH ch AS (
      |  SELECT doc_id, u.idx AS idx, u.chunk AS chunk FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS BIGINT)),
      |      i -> {'idx': i, 'chunk': array_to_string(
      |        string_split(text, ' ')[(i*20+1):(i*20+20)], ' ')})) AS u
      |    FROM documents)),
      |rn AS (
      |  SELECT doc_id, idx, chunk,
      |    ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx)
      |      AS rn
      |  FROM ch)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
      |    ORDER BY idx), '') AS clean_text
      |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    chunkScrub(t(s, dir, "documents"))
  }

  // --------------------------------------------------------------- filter

  /** Gopher-style composite rule filter: word count in [30, 150], mean
    * word length in [3.0, 4.5], unique-token ratio ≥ 0.5, and at least one
    * stop token present. Emits every doc with its metrics, the
    * comma-joined list of failed rule names (fixed order — deterministic),
    * and keep = 1 iff no rule failed. Rule thresholds compare RAW values
    * (exact int-division doubles — engine-identical); rounding is
    * display-only. One scan, no shuffle beyond the output sort. */
  def gopherFilter(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTokens = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val nChars = length(translate(col("text"), " ", "")).cast("long")
    val mwlRaw = nChars.cast("double") * 1.0 / nTokens
    val urRaw = nUniq.cast("double") * 1.0 / nTokens
    val hasStop = arrays_overlap(toks,
      array(lit("the"), lit("a"), lit("value")))
    val reasons = concat_ws(",",
      when(!(nTokens >= 30 && nTokens <= 150), lit("word_count")),
      when(!(mwlRaw >= 3.0 && mwlRaw <= 4.5), lit("mean_word_length")),
      when(urRaw < 0.5, lit("uniq_ratio")),
      when(!hasStop, lit("no_stopword")))
    docs.select(
        col("doc_id"),
        nTokens.as("n_tokens"),
        round(mwlRaw, 4).as("mean_wlen"),
        round(urRaw, 6).as("uniq_ratio"),
        reasons.as("fail_reasons"))
      .withColumn("keep",
        when(col("fail_reasons") === "", 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  val corpusGopherFilter = Q(
    "corpus_gopher_filter",
    """WITH q AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
      |    len(replace(text, ' ', '')) AS n_chars,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a', 'value'))) AS n_stop
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_tokens,
      |    n_chars * 1.0 / n_tokens AS mwl_raw,
      |    n_uniq * 1.0 / n_tokens AS ur_raw,
      |    n_stop
      |  FROM q),
      |f AS (
      |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |    ROUND(mwl_raw, 4) AS mean_wlen,
      |    ROUND(ur_raw, 6) AS uniq_ratio,
      |    concat_ws(',',
      |      CASE WHEN NOT (n_tokens BETWEEN 30 AND 150)
      |           THEN 'word_count' END,
      |      CASE WHEN NOT (mwl_raw >= 3.0 AND mwl_raw <= 4.5)
      |           THEN 'mean_word_length' END,
      |      CASE WHEN ur_raw < 0.5 THEN 'uniq_ratio' END,
      |      CASE WHEN n_stop = 0 THEN 'no_stopword' END) AS fail_reasons
      |  FROM r)
      |SELECT doc_id, n_tokens, mean_wlen, uniq_ratio, fail_reasons,
      |  CAST(CASE WHEN fail_reasons = '' THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    gopherFilter(t(s, dir, "documents"))
  }

  // ---------------------------------------------------------- incremental

  /** Incremental minhash dedup: the batch (doc_id % 10 = 0 — the "new
    * ingest") checked against the stored index of the rest (the
    * "history"). See [[VectorOps.minhashIncrementalDups]] for the
    * cross-set-only candidate discipline. No-oracle (minhash-permutation
    * internals, K2 precedent); Curation3Spec pins planted clones,
    * keepers, and equivalence with the self-join pairs restricted to
    * cross pairs. */
  val dedupIncremental = Q.noOracle("dedup_incremental_minhash") { (s, dir) =>
    val docs = t(s, dir, "documents")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val hist = docs.filter(col("doc_id") % 10 =!= 0)
    VectorOps.minhashIncrementalDups(
      VectorOps.minhashIndex(batch, numHashes = 32),
      VectorOps.minhashIndex(hist, numHashes = 32),
      numHashes = 32, bands = 8, jaccardThreshold = 0.4)
  }

  val all: Seq[Q] = Seq(indexInvertedBuild, searchPhraseMatch,
    corpusChunkScrub, corpusGopherFilter, dedupIncremental)
}
