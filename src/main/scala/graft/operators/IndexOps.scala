package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index lifecycle + serving operability, wave 9 (round 6): segment merge
  * for the inverted index (the Lucene merge step, proven ≡ a full
  * rebuild), min-max hybrid score blending (the other standard fusion
  * next to RRF), and an ANN recall report (the index-quality monitor a
  * production vector platform exposes).
  *
  * Scale notes:
  *  - index_segment_merge: merging is a hash aggregate over the two
  *    segments' INDEX ROWS (≪ corpus); postings concatenate inside a
  *    codegen HOF per (token, block) and re-sort only within one block's
  *    ≤ 4096 entries. This is the operation that makes per-batch ingest
  *    indexes (index_inverted_build's design) compose into one logical
  *    index without re-tokenizing anything.
  *  - search_hybrid_blend: both retrievers end in TakeOrderedAndProject(50)
  *    before any fusion math; min/max normalizers are 1-row broadcasts
  *    computed over those 50-row frames.
  *  - ann_recall_report: each branch intersects two bounded top-k pair
  *    frames (left-semi on the pair key) — the whole report costs two
  *    retrievals regardless of corpus size.
  */
object IndexOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // -------------------------------------------------------- segment merge

  /** Merge two inverted-index segments into one (same schema as
    * [[CurationOps3.invertedIndex]]): per (token, block) the block df/tf
    * SUM and the postings CSVs re-sort-merged by doc_id. */
  def mergeSegments(segA: DataFrame, segB: DataFrame): DataFrame = {
    def arr(c: String, as: String): Column =
      transform(split(col(c), ","), x => x.cast("long")).as(as)
    val both = segA.unionByName(segB)
      .select(col("token"), col("block_id"), col("df_block"), col("tf_block"),
        arr("doc_ids", "ids"), arr("tfs", "tfv"))
      .withColumn("pairs", zip_with(col("ids"), col("tfv"),
        (i, f) => struct(i.as("doc_id"), f.as("tf"))))
    def csv(field: String): Column = array_join(
      transform(sort_array(flatten(collect_list(col("pairs")))),
        x => x.getField(field).cast("string")), ",")
    both.groupBy("token", "block_id")
      .agg(sum(col("df_block")).as("df_block"),
        sum(col("tf_block")).as("tf_block"),
        csv("doc_id").as("doc_ids"),
        csv("tf").as("tfs"))
      .orderBy("token", "block_id")
  }

  /** Segment merge ≡ full rebuild, proven by the oracle: the corpus splits
    * into two interleaved segments (doc_id parity — both segments hit the
    * SAME blocks, forcing real postings merges, not block concatenation),
    * each is indexed independently (the ingest-batch shape), and the
    * merged result must equal the full-corpus index — the oracle IS
    * index_inverted_build's full-build SQL. */
  val indexSegmentMerge = Q(
    "index_segment_merge",
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
    val docs = t(s, dir, "documents")
    val segA = CurationOps3.invertedIndex(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    val segB = CurationOps3.invertedIndex(docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    mergeSegments(segA, segB)
  }

  // -------------------------------------------------------- hybrid blend

  /** Hybrid retrieval, weighted-blend form (the standard alternative to
    * rank_fusion_rrf): min-max-normalize each retriever's top-50 scores
    * to [0, 1], then blend 0.6·lexical + 0.4·vector; docs on one list
    * only contribute their one normalized term. All divisions/products
    * operate on already-ROUNDED scores, so both engines do identical IEEE
    * arithmetic; the blend re-rounds to 6. */
  val searchHybridBlend = Q(
    "search_hybrid_blend",
    s"""WITH ${CorpusOps.Bm25OracleCtes},
       |${RelevanceOps.VecOracleCtes},
       |bmtop AS (
       |  SELECT doc_id, bm25 AS score FROM bm
       |  ORDER BY bm25 DESC, doc_id LIMIT 50),
       |vtop AS (
       |  SELECT doc_id, score FROM vsim
       |  ORDER BY score DESC, doc_id LIMIT 50),
       |bmn AS (
       |  SELECT doc_id, ROUND(CASE WHEN mx = mn THEN 1.0
       |    ELSE (score - mn) / (mx - mn) END, 6) AS nbm FROM bmtop,
       |    (SELECT MIN(score) AS mn, MAX(score) AS mx FROM bmtop)),
       |vn AS (
       |  SELECT doc_id, ROUND(CASE WHEN mx = mn THEN 1.0
       |    ELSE (score - mn) / (mx - mn) END, 6) AS nvec FROM vtop,
       |    (SELECT MIN(score) AS mn, MAX(score) AS mx FROM vtop))
       |SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
       |  ROUND(0.6 * COALESCE(nbm, 0.0) + 0.4 * COALESCE(nvec, 0.0), 6)
       |    AS blend,
       |  ROUND(COALESCE(nbm, -1.0), 6) AS nbm,
       |  ROUND(COALESCE(nvec, -1.0), 6) AS nvec
       |FROM bmn b FULL OUTER JOIN vn v ON b.doc_id = v.doc_id
       |ORDER BY blend DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    VectorOps.registerFns(s)
    val bmTop = CorpusOps.bm25Scores(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(50)
      .select(col("doc_id"), col("bm25").as("score"))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val vTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(call_function("cosine_sim", col("embedding"), col("qe")), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
    // Degenerate-range guard (100×-replica finding): a clone-heavy corpus
    // can tie ALL top-50 scores (mx = mn) — every doc then normalizes to
    // 1.0 instead of dividing by zero.
    def normed(top: DataFrame, as: String): DataFrame = {
      val mm = top.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
      top.crossJoin(broadcast(mm))
        .select(col("doc_id"),
          round(when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("score") - col("mn")) /
              (col("mx") - col("mn"))), 6).as(as))
    }
    normed(bmTop, "nbm").join(normed(vTop, "nvec"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(lit(0.6) * coalesce(col("nbm"), lit(0.0)) +
          lit(0.4) * coalesce(col("nvec"), lit(0.0)), 6).as("blend"),
        round(coalesce(col("nbm"), lit(-1.0)), 6).as("nbm"),
        round(coalesce(col("nvec"), lit(-1.0)), 6).as("nvec"))
      .orderBy(col("blend").desc, col("doc_id"))
      .limit(20)
  }

  // -------------------------------------------------------- recall report

  /** ANN index-quality monitor: recall@k of the SRP-LSH top-k pair
    * retrieval against the exact cosine kernel, at k = 10/50/100 — the
    * number a vector platform dashboards to decide when an index needs
    * re-tuning. No SQL oracle (the LSH side isn't SQL-expressible);
    * IndexOpsSpec pins the recall floor and the exact-side agreement. */
  val annRecallReport = Q.noOracle("ann_recall_report") { (s, dir) =>
    import graft.Stage.StagedOps
    val emb = t(s, dir, "embeddings")
    // Both retrievals are consumed by THREE @k branches each — Stage()
    // materializes the two 100-row pair frames once so the branches read
    // blocks instead of re-running the kernel/LSH pipelines (3× the
    // retrieval cost without it; reliable checkpoint when a dir is set).
    val exact = VectorOps.similarityTopKPairs(s, emb, k = 100)
      .select(col("a_id"), col("b_id")).staged
    val approx = AnnOps.lshTopKPairs(s, emb, k = 100)
      .select(col("a_id"), col("b_id")).staged
    val reports = Seq(10, 50, 100).map { k =>
      exact.limit(k).join(approx.limit(k), Seq("a_id", "b_id"), "left_semi")
        .agg(count(lit(1)).as("n_overlap"))
        .select(lit(k).as("k"), col("n_overlap"),
          round(col("n_overlap") / k.toDouble, 6).as("recall"))
    }
    reports.reduce(_ unionByName _).orderBy("k")
  }

  // ----------------------------------------------------------- percolate

  /** Reverse search (the Solr/ES percolator): STORED queries — each a set
    * of required terms (AND semantics) — matched against an incoming
    * document batch (deterministic md5-prefix sample, the house batch
    * convention). A doc matches a query when it contains every term; the
    * response aggregates per query. The stored-query table is small by
    * nature and broadcasts into an equi-join on the term — alerting /
    * saved-search evaluation without ever scanning queries per doc. */
  val searchPercolate = Q(
    "search_percolate",
    """WITH queries AS (
      |  SELECT * FROM (VALUES
      |    ('alert_tables', 'table,scan'),
      |    ('alert_vectors', 'vector'),
      |    ('alert_joins', 'hash,join'),
      |    ('alert_streaming', 'spark,stream'),
      |    ('alert_errors', 'slow,error')) AS v(query_id, terms)),
      |qterms AS (
      |  SELECT query_id, unnest(string_split(terms, ',')) AS term,
      |    len(string_split(terms, ',')) AS n_terms
      |  FROM queries),
      |batch AS (
      |  SELECT doc_id, text FROM documents WHERE md5(text) LIKE '1%'),
      |inc AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM batch),
      |matches AS (
      |  SELECT query_id, doc_id
      |  FROM inc JOIN qterms ON token = term
      |  GROUP BY query_id, doc_id, n_terms
      |  HAVING COUNT(*) = n_terms),
      |agg AS (
      |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
      |    CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      |    CAST(MAX(doc_id) AS BIGINT) AS last_doc
      |  FROM matches GROUP BY query_id)
      |SELECT q.query_id, COALESCE(n_matched, 0) AS n_matched,
      |  first_doc, last_doc
      |FROM queries q LEFT JOIN agg USING (query_id)
      |ORDER BY q.query_id""".stripMargin) { (s, dir) =>
    val queries = {
      import s.implicits._
      Seq("alert_tables" -> "table,scan", "alert_vectors" -> "vector",
        "alert_joins" -> "hash,join", "alert_streaming" -> "spark,stream",
        "alert_errors" -> "slow,error").toDF("query_id", "terms")
    }
    val qterms = queries
      .select(col("query_id"),
        explode(split(col("terms"), ",")).as("term"),
        size(split(col("terms"), ",")).as("n_terms"))
    val inc = t(s, dir, "documents")
      .filter(md5(col("text")).startsWith("1"))
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    val agg = inc.join(broadcast(qterms), col("token") === col("term"))
      .groupBy("query_id", "doc_id", "n_terms")
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === col("n_terms"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_matched"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
    // Zero-match queries still report (a percolator response is per
    // stored query, not per hit).
    queries.select("query_id").join(agg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        col("first_doc"), col("last_doc"))
      .orderBy("query_id")
  }

  // ------------------------------------------------------------ deletion

  /** Apply a delete set to a STORED inverted index (tombstone merge): the
    * deleted doc ids group per block and LEFT-join the index, so ONLY
    * blocks containing deletions rewrite their postings (a codegen HOF
    * filter over ≤ 4096 entries); untouched blocks pass through, emptied
    * rows drop. */
  def deleteFromIndex(idx: DataFrame, deleted: DataFrame): DataFrame = {
    val delByBlock = deleted
      .withColumn("block_id", floor(col("doc_id") / lit(4096)).cast("long"))
      .groupBy("block_id")
      .agg(collect_set(col("doc_id")).as("del_ids"))
    def arr(c: String): Column =
      transform(split(col(c), ","), x => x.cast("long"))
    idx.join(broadcast(delByBlock), Seq("block_id"), "left")
      .withColumn("pairs", zip_with(arr("doc_ids"), arr("tfs"),
        (i, f) => struct(i.as("doc_id"), f.as("tf"))))
      .withColumn("kept", when(col("del_ids").isNull, col("pairs"))
        .otherwise(filter(col("pairs"),
          x => !array_contains(col("del_ids"), x.getField("doc_id")))))
      .filter(size(col("kept")) > 0)
      .select(col("token"), col("block_id"),
        size(col("kept")).cast("long").as("df_block"),
        aggregate(col("kept"), lit(0L), (acc, x) =>
          acc + x.getField("tf")).as("tf_block"),
        array_join(transform(col("kept"),
          x => x.getField("doc_id").cast("string")), ",").as("doc_ids"),
        array_join(transform(col("kept"),
          x => x.getField("tf").cast("string")), ",").as("tfs"))
      .orderBy("token", "block_id")
  }

  /** Delete-equals-rebuild, proven by the oracle: the full index minus a
    * deterministic delete set (md5-prefix '0' docs) must equal the index
    * rebuilt from the surviving corpus — the oracle IS the rebuild SQL.
    * Deletion touches only index rows; the surviving corpus is never
    * re-tokenized. */
  val indexDeleteDocs = Q(
    "index_delete_docs",
    """WITH keep AS (
      |  SELECT doc_id, text FROM documents WHERE md5(text) NOT LIKE '0%'),
      |tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM keep),
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
    val docs = t(s, dir, "documents")
    val idx = CurationOps3.invertedIndex(docs)
    val deleted = docs.filter(md5(col("text")).startsWith("0"))
      .select("doc_id")
    deleteFromIndex(idx, deleted)
  }

  /** Incremental doc-delta upsert (round 15, VERDICT r14 next-item 4):
    * the maintenance op between per-batch segment appends and a full
    * rebuild. `changedDocs` (new docs AND updated texts of existing ids)
    * upsert as: tombstone the changed ids out of the base segment
    * ([[deleteFromIndex]] — only blocks containing those ids rewrite),
    * tokenize ONLY the delta into a fresh segment, and serve the
    * SEGMENT UNION. The union may carry two rows per (token, block) —
    * base remainder + delta — which every postings consumer handles by
    * construction: [[CorpusOps.bm25FromIndexBatch]] explodes postings to
    * (token, doc) pairs (each doc lives in exactly one segment, so df/tf
    * stay exact) and a physical [[mergeSegments]] compaction re-merges
    * lazily, the Lucene schedule. Norms maintain the same way: drop
    * changed ids, append the delta's.
    *
    * Cost at 100 TB: tokenize(delta) + a block-local tombstone pass over
    * the base index rows — the corpus itself is NEVER re-read (the 5 M-doc
    * tier measured 91.2 s full rebuild vs delta seconds, SCALE.md r15). */
  def upsertSegments(baseIdx: DataFrame, baseNorms: DataFrame,
      changedDocs: DataFrame): (DataFrame, DataFrame) = {
    val ids = changedDocs.select(col("doc_id"))
    val cleaned = deleteFromIndex(baseIdx, ids)
    val delta = CurationOps3.invertedIndex(changedDocs)
    val norms = baseNorms.join(ids, Seq("doc_id"), "left_anti")
      .unionByName(CorpusOps.docNorms(changedDocs))
    (cleaned.unionByName(delta), norms)
  }

  /** Delta-ingest ≡ full-rebuild ≡ DuckDB, in one hash: base = 90 % of
    * the corpus, delta = the held-out tenth (inserts) PLUS every seventh
    * doc re-upserted (updates — their stale postings must tombstone out
    * before the re-add, or df/tf double-count). The upserted segment
    * union serves the SAME top-k as [[CorpusOps.bm25TopK]]'s full-corpus
    * oracle, so the hash match proves the whole maintenance path.
    * Bm25IndexSpec additionally pins a CHANGED-text update (stale
    * postings removed, not just identical re-adds) and the stored
    * parquet round-trip. */
  val bm25TopKDelta = Q(
    "bm25_topk_delta", CorpusOps.bm25TopK.oracle.get) { (s, dir) =>
    import s.implicits._
    val docs = t(s, dir, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val changed = docs.filter(col("doc_id") % 10 === 0 ||
      col("doc_id") % 7 === 0)
    val (idx, norms) = upsertSegments(
      CurationOps3.invertedIndex(base), CorpusOps.docNorms(base), changed)
    val qt = CorpusOps.Bm25Terms.map(w => (0L, w)).toDF("query_id", "term")
    CorpusOps.bm25FromIndexBatch(idx, norms, qt)
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  /** Posting-list delta/varbyte cost model — wave 32: the storage-layer
    * decision every inverted index makes (Lucene's VInt postings). Gaps
    * are computed WITHIN the 4096-doc blocks of `index_inverted_build`'s
    * design (first gap = offset from the block base), so the keyed window
    * partitions are bounded at 4096 rows regardless of how degenerate a
    * stopword's posting list gets — the same blocking that makes the
    * index mergeable makes its compression model shuffle-safe. All
    * arithmetic is integer-exact; the one ratio is a rounded division of
    * two exact int64s. Output: the 100 highest-df tokens — where
    * compression decisions actually matter. */
  val indexPostingDeltaStats = Q(
    "index_posting_delta_stats",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (
      |  SELECT token, doc_id FROM tok GROUP BY token, doc_id),
      |g AS (
      |  SELECT token, CAST(FLOOR(doc_id / 4096.0) AS BIGINT) AS block_id,
      |    doc_id,
      |    COALESCE(doc_id - LAG(doc_id) OVER (
      |        PARTITION BY token, CAST(FLOOR(doc_id / 4096.0) AS BIGINT)
      |        ORDER BY doc_id),
      |      doc_id - CAST(FLOOR(doc_id / 4096.0) AS BIGINT) * 4096) AS gap
      |  FROM tf),
      |vb AS (
      |  SELECT token, block_id,
      |    CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
      |         WHEN gap < 2097152 THEN 3 ELSE 4 END AS nbytes
      |  FROM g)
      |SELECT token,
      |  CAST(COUNT(*) AS BIGINT) AS df,
      |  CAST(COUNT(DISTINCT block_id) AS BIGINT) AS n_blocks,
      |  CAST(SUM(nbytes) AS BIGINT) AS varbyte_bytes,
      |  CAST(COUNT(*) * 8 AS BIGINT) AS fixed_bytes,
      |  ROUND(CAST(COUNT(*) * 8 AS DOUBLE) / SUM(nbytes), 4) AS ratio
      |FROM vb GROUP BY token
      |ORDER BY df DESC, token LIMIT 100""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val tf = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("block_id", floor(col("doc_id") / lit(4096)).cast("long"))
    val w = Window.partitionBy("token", "block_id").orderBy("doc_id")
    val gaps = tf.withColumn("gap",
      coalesce(col("doc_id") - lag(col("doc_id"), 1).over(w),
        col("doc_id") - col("block_id") * 4096))
    val vb = gaps.withColumn("nbytes",
      when(col("gap") < 128, 1).when(col("gap") < 16384, 2)
        .when(col("gap") < 2097152, 3).otherwise(4))
    vb.groupBy("token")
      .agg(count(lit(1)).as("df"),
        countDistinct(col("block_id")).as("n_blocks"),
        sum("nbytes").cast("long").as("varbyte_bytes"),
        (count(lit(1)) * 8).as("fixed_bytes"),
        round((count(lit(1)) * 8).cast("double") / sum("nbytes"), 4)
          .as("ratio"))
      .orderBy(col("df").desc, col("token")).limit(100)
  }

  // -------------------------------------------------------- batched hybrid

  /** BATCHED hybrid retrieval (round-14, VERDICT r13 next-item 8): one
    * plan serves a whole query frame through BOTH retrievers and the
    * fusion — the batched composition of [[searchHybridBlend]]:
    *
    *  - lexical arm: [[CorpusOps.bm25ScoresBatch]] — one corpus tokenize
    *    for every query (per-query term sets), per-query top-`topN` by a
    *    rank window;
    *  - vector arm: [[AnnOps.ivfPqKnnBatch]] — the stored-index composed
    *    IVF+PQ batched serve, top-`topN` per query;
    *  - fusion: per-query min-max normalization (window min/max over each
    *    query's 50-row arm — the degenerate-range guard carries over),
    *    0.6·lexical + 0.4·vector blend on ROUNDED scores, top-`k` per
    *    query.
    *
    * With a full probe and corpus-sized pool the vector arm is
    * exact-equivalent, and a single-query batch with [[CorpusOps.Bm25Terms]]
    * reproduces the ORACLED single-shot [[searchHybridBlend]] row-for-row
    * (IndexOpsSpec pins both). At 100 TB: the corpus is tokenized once
    * per batch (not per query), both arms end in rank windows over
    * per-query bounded frames, and the fusion join carries ≤ 2·topN rows
    * per query. */
  def hybridBlendBatch(s: SparkSession, docs: DataFrame, emb: DataFrame,
      index: DataFrame, model: AnnOps.AnnModel, queries: DataFrame,
      queryTerms: DataFrame, k: Int = 20, topN: Int = 50, nProbe: Int = 3,
      nCandidates: Int = -1,
      invIndex: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorOps.registerFns(s)
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    // Lexical arm: the tokenize path by default; a stored
    // (invertedIndex, docNorms) pair routes it through
    // CorpusOps.bm25FromIndexBatch — identical scores (Bm25IndexSpec),
    // no corpus text touched, the 100 TB serve shape.
    val bmScores = invIndex match {
      case Some((inv, norms)) =>
        CorpusOps.bm25FromIndexBatch(inv, norms, queryTerms)
      case None => CorpusOps.bm25ScoresBatch(docs, queryTerms)
    }
    val bmTop = bmScores
      .select(col("query_id"), col("doc_id"), col("bm25").as("score"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topN).drop("rn")
    val vTop = AnnOps.ivfPqKnnBatch(s, emb, index, model, queries,
        k = topN, nProbe = nProbe, nCandidates = nCandidates)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("sim").as("score"))
    def normed(top: DataFrame, as: String): DataFrame = {
      val w = Window.partitionBy("query_id")
      top
        .withColumn("mn", min("score").over(w))
        .withColumn("mx", max("score").over(w))
        .select(col("query_id"), col("doc_id"),
          round(when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("score") - col("mn")) /
              (col("mx") - col("mn"))), 6).as(as))
    }
    normed(bmTop, "nbm")
      .join(normed(vTop, "nvec"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(lit(0.6) * coalesce(col("nbm"), lit(0.0)) +
          lit(0.4) * coalesce(col("nvec"), lit(0.0)), 6).as("blend"),
        round(coalesce(col("nbm"), lit(-1.0)), 6).as("nbm"),
        round(coalesce(col("nvec"), lit(-1.0)), 6).as("nvec"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("blend").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("blend"), col("nbm"),
        col("nvec"), col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** The declared batched hybrid: 3 queries with DISTINCT term sets
    * served in one plan against the stored composed index. No-oracle
    * (learned quantizer in the vector arm — the ann_batch_knn
    * precedent); the Verify selfcheck proves batched ≡ the single-query
    * composition per query every run; IndexOpsSpec additionally pins the
    * exact-equivalent single-query batch against the ORACLED
    * search_hybrid_blend. */
  val searchHybridBatch = Q.noOracle("search_hybrid_batch") { (s, dir) =>
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    val model = AnnOps.fitAnnModel(s, emb)
    val index = AnnOps.annIndex(s, emb, model)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val terms = Seq(
      (0L, "hash"), (0L, "join"), (0L, "vector"),
      (1L, "hash"), (1L, "join"),
      (2L, "vector"))
    import s.implicits._
    hybridBlendBatch(s, docs, emb, index, model, queries,
      terms.toDF("query_id", "term"), k = 10)
  }

  val all: Seq[Q] = Seq(indexSegmentMerge, searchHybridBlend, annRecallReport,
    searchPercolate, indexDeleteDocs, indexPostingDeltaStats,
    searchHybridBatch, bm25TopKDelta)
}
