package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Search-relevance evaluation + hybrid-retrieval operators — the trireme
  * domain (search-relevance engineering): rank fusion of lexical and vector
  * retrievers, offline relevance metrics (nDCG), and hit highlighting.
  *
  * Scale notes:
  *  - rank_fusion_rrf: each retriever ends in TakeOrderedAndProject(k)
  *    BEFORE fusion — the fused stage sees 2k rows regardless of corpus
  *    size. The rank window partitions by `ranker` (never keyless; each
  *    partition is ≤ k rows by construction).
  *  - relevance_ndcg: judgment lists and rankings are per-query-term;
  *    every window partitions by term. At 100 TB the judgments table is
  *    eval-set-sized (small); the only corpus-wide work is the BM25
  *    scorer, which shares bm25_topk's term-filter-before-shuffle plan.
  *  - snippet_extract: pure scan-side string expressions — no shuffle,
  *    no window; predicate (`contains`) pushes to the parquet scan.
  */
object RelevanceOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def cosine(s: SparkSession, a: Column, b: Column): Column = {
    VectorOps.registerFns(s)
    call_function("cosine_sim", a, b)
  }

  /** DuckDB CTEs for the vector retriever: rounded cosine of every
    * embedding against the query vector (vec_id = 0), terminal CTE `vsim`
    * with (doc_id, score). Mirrors VectorOps.knnQuery's oracle. */
  private[operators] val VecOracleCtes =
    """q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |un AS (
      |  SELECT e.vec_id, unnest(e.embedding) AS xe, unnest((SELECT qe FROM q)) AS xq
      |  FROM embeddings e WHERE e.vec_id <> 0),
      |vsim AS (
      |  SELECT vec_id AS doc_id,
      |    ROUND(SUM(CAST(xe AS DOUBLE) * CAST(xq AS DOUBLE)) /
      |      (SQRT(SUM(CAST(xe AS DOUBLE) * CAST(xe AS DOUBLE))) *
      |       SQRT(SUM(CAST(xq AS DOUBLE) * CAST(xq AS DOUBLE)))), 6) AS score
      |  FROM un GROUP BY vec_id)""".stripMargin

  /** Hybrid search: reciprocal-rank fusion of the BM25 lexical retriever
    * and the cosine vector retriever (query = embedding 0), the standard
    * fusion rule rrf(d) = Σ_r 1/(60 + rank_r(d)).
    *
    * Ranks are assigned over ROUNDED scores (ties → doc_id) so both
    * engines rank identically; each reciprocal term is an exact IEEE
    * division and the ≤2-term sum is order-independent (double addition
    * is commutative). */
  val rankFusionRrf = Q(
    "rank_fusion_rrf",
    s"""WITH ${CorpusOps.Bm25OracleCtes},
       |$VecOracleCtes,
       |bmtop AS (
       |  SELECT 'bm25' AS ranker, doc_id, bm25 AS score FROM bm
       |  ORDER BY bm25 DESC, doc_id LIMIT 50),
       |vtop AS (
       |  SELECT 'vec' AS ranker, doc_id, score FROM vsim
       |  ORDER BY score DESC, doc_id LIMIT 50),
       |ranked AS (
       |  SELECT ranker, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY ranker ORDER BY score DESC, doc_id) AS rk
       |  FROM (SELECT * FROM bmtop UNION ALL SELECT * FROM vtop))
       |SELECT doc_id,
       |  ROUND(SUM(CAST(1.0 AS DOUBLE) / (60 + rk)), 6) AS rrf,
       |  CAST(COUNT(*) AS BIGINT) AS n_lists
       |FROM ranked GROUP BY doc_id
       |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    val bmTop = CorpusOps.bm25Scores(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(50)
      .select(lit("bm25").as("ranker"), col("doc_id"), col("bm25").as("score"))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val vecTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(cosine(s, col("embedding"), col("qe")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
      .select(lit("vec").as("ranker"), col("doc_id"), col("score"))
    val rk = row_number().over(
      Window.partitionBy("ranker").orderBy(col("score").desc, col("doc_id")))
    bmTop.unionByName(vecTop)
      .withColumn("rk", rk)
      .groupBy("doc_id")
      .agg(
        round(sum(lit(1.0) / (lit(60) + col("rk"))), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** Per-element DCG gain, summed exactly: (2^rel − 1) / log2(rank + 1),
    * decimal(18,6)-cast per row so the sum is order-independent and any
    * last-ulp libm log2 drift between engines is rounded away. */
  private def gain(rel: Column, rk: Column): Column =
    ((pow(lit(2.0), rel) - 1.0) / log2(rk + 1)).cast(DecimalType(18, 6))

  /** Offline relevance evaluation: nDCG@10 of the fused 3-term BM25
    * ranking, judged per query term. Judgments are graded by capped term
    * frequency — rel(term, doc) = least(tf, 3) — the deterministic
    * stand-in for human labels; the metric reads "how well does the
    * blended ranking serve each term's intent". IDCG comes from the full
    * judgment list (not just ranked docs), the textbook normalizer. */
  val relevanceNdcg = Q(
    "relevance_ndcg",
    s"""WITH ${CorpusOps.Bm25OracleCtes},
       |top10 AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10),
       |terms AS (SELECT unnest(['hash', 'join', 'vector']) AS token),
       |judg AS (SELECT token, doc_id, LEAST(tf, 3) AS rel FROM tf),
       |ranked AS (
       |  SELECT token, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY token ORDER BY bm25 DESC, doc_id) AS rk
       |  FROM top10 CROSS JOIN terms),
       |gains AS (
       |  SELECT r.token,
       |    CAST((POWER(2.0, COALESCE(j.rel, 0)) - 1.0) / LOG2(r.rk + 1)
       |      AS DECIMAL(18,6)) AS g
       |  FROM ranked r LEFT JOIN judg j ON r.token = j.token AND r.doc_id = j.doc_id),
       |dcg AS (SELECT token, CAST(SUM(g) AS DOUBLE) AS dcg FROM gains GROUP BY token),
       |ideal AS (
       |  SELECT token, CAST(SUM(g) AS DOUBLE) AS idcg FROM (
       |    SELECT token,
       |      CAST((POWER(2.0, rel) - 1.0) / LOG2(rk + 1) AS DECIMAL(18,6)) AS g
       |    FROM (
       |      SELECT token, rel,
       |        ROW_NUMBER() OVER (PARTITION BY token ORDER BY rel DESC, doc_id) AS rk
       |      FROM judg)
       |    WHERE rk <= 10)
       |  GROUP BY token)
       |SELECT d.token, ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
       |  ROUND(CASE WHEN idcg = 0 THEN 0.0 ELSE dcg / idcg END, 6) AS ndcg
       |FROM dcg d JOIN ideal i ON d.token = i.token
       |ORDER BY d.token""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(CorpusOps.Bm25Terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val judg = tf.select(col("token"), col("doc_id"),
      least(col("tf"), lit(3L)).as("rel"))
    val top10 = CorpusOps.bm25Scores(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    val terms = { import s.implicits._; CorpusOps.Bm25Terms.toDF("token") }
    val ranked = top10.crossJoin(broadcast(terms))
      .withColumn("rk", row_number().over(
        Window.partitionBy("token").orderBy(col("bm25").desc, col("doc_id"))))
    val dcg = ranked.join(judg, Seq("token", "doc_id"), "left")
      .select(col("token"), gain(coalesce(col("rel"), lit(0L)), col("rk")).as("g"))
      .groupBy("token").agg(sum(col("g")).cast(DoubleType).as("dcg"))
    val ideal = judg
      .withColumn("rk", row_number().over(
        Window.partitionBy("token").orderBy(col("rel").desc, col("doc_id"))))
      .filter(col("rk") <= 10)
      .select(col("token"), gain(col("rel"), col("rk")).as("g"))
      .groupBy("token").agg(sum(col("g")).cast(DoubleType).as("idcg"))
    dcg.join(ideal, "token")
      .select(col("token"),
        round(col("dcg"), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        round(when(col("idcg") === 0.0, 0.0)
          .otherwise(col("dcg") / col("idcg")), 6).as("ndcg"))
      .orderBy("token")
  }

  /** Offline relevance evaluation, set-based family: precision@10,
    * recall@10 and MRR of the fused BM25 ranking per query term, with
    * binary relevance = "document contains the term" (tf ≥ 1). All inputs
    * to the divisions are exact integers, so cross-engine parity is exact
    * IEEE arithmetic — no decimal laundering needed. */
  val relevancePrk = Q(
    "relevance_prk",
    s"""WITH ${CorpusOps.Bm25OracleCtes},
       |top10 AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10),
       |terms AS (SELECT unnest(['hash', 'join', 'vector']) AS token),
       |judg AS (SELECT token, doc_id FROM tf),
       |ranked AS (
       |  SELECT token, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY token ORDER BY bm25 DESC, doc_id) AS rk
       |  FROM top10 CROSS JOIN terms),
       |hits AS (
       |  SELECT r.token,
       |    CAST(COUNT(j.doc_id) AS BIGINT) AS hits10,
       |    MIN(CASE WHEN j.doc_id IS NOT NULL THEN r.rk END) AS first_rk
       |  FROM ranked r LEFT JOIN judg j ON r.token = j.token AND r.doc_id = j.doc_id
       |  GROUP BY r.token),
       |rel AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_rel FROM judg GROUP BY token)
       |SELECT h.token, n_rel, hits10,
       |  ROUND(hits10 / CAST(10 AS DOUBLE), 6) AS p_at_10,
       |  ROUND(hits10 / CAST(n_rel AS DOUBLE), 6) AS r_at_10,
       |  ROUND(COALESCE(CAST(1.0 AS DOUBLE) / first_rk, 0.0), 6) AS mrr
       |FROM hits h JOIN rel USING (token)
       |ORDER BY h.token""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val judg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(CorpusOps.Bm25Terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .select(col("token"), col("doc_id"))
    val top10 = CorpusOps.bm25Scores(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    val terms = { import s.implicits._; CorpusOps.Bm25Terms.toDF("token") }
    val ranked = top10.crossJoin(broadcast(terms))
      .withColumn("rk", row_number().over(
        Window.partitionBy("token").orderBy(col("bm25").desc, col("doc_id"))))
    val hits = ranked
      .join(judg.withColumn("hit", lit(1)), Seq("token", "doc_id"), "left")
      .groupBy("token")
      .agg(count(col("hit")).as("hits10"),
        min(when(col("hit").isNotNull, col("rk"))).as("first_rk"))
    val rel = judg.groupBy("token").agg(count(lit(1)).as("n_rel"))
    hits.join(rel, "token")
      .select(col("token"), col("n_rel"), col("hits10"),
        round(col("hits10") / 10.0, 6).as("p_at_10"),
        round(col("hits10") / col("n_rel").cast(DoubleType), 6).as("r_at_10"),
        round(coalesce(lit(1.0) / col("first_rk"), lit(0.0)), 6).as("mrr"))
      .orderBy("token")
  }

  /** Hit highlighting: first-match position + a ±30-char context window
    * with the hit bracketed — the snippet stage of a search response.
    * Scan-side only; the `contains` predicate reaches the parquet scan. */
  val snippetExtract = Q(
    "snippet_extract",
    """SELECT doc_id,
      |  CAST(STRPOS(text, 'vector') AS BIGINT) AS pos,
      |  CAST(len(string_split(text, 'vector')) - 1 AS BIGINT) AS n_hits,
      |  REPLACE(SUBSTR(text, GREATEST(1, STRPOS(text, 'vector') - 30), 66),
      |    'vector', '[vector]') AS snippet
      |FROM documents WHERE STRPOS(text, 'vector') > 0
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val pos = locate("vector", col("text"))
    t(s, dir, "documents")
      .filter(pos > 0)
      .select(col("doc_id"),
        pos.cast("long").as("pos"),
        (size(split(col("text"), "vector")) - 1).cast("long").as("n_hits"),
        regexp_replace(
          col("text").substr(greatest(lit(1), pos - 30), lit(66)),
          "vector", "[vector]").as("snippet"))
      .orderBy("doc_id")
  }

  /** Search autocomplete: the suggest dictionary — for every 2..4-char
    * token prefix, the top-3 completions by corpus frequency (ties →
    * lexicographic). The index a suggester serves from; build is one
    * tokenize-explode + prefix-explode, ranked inside a prefix-keyed
    * window. At 100 TB the (prefix, token) shuffle carries ≤ 3 fixed-size
    * prefix keys per token occurrence and the window partitions by
    * prefix (bounded-cardinality, never keyless). */
  val suggestDictionary = Q(
    "suggest_dictionary",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (
      |  SELECT token, COUNT(*) AS freq FROM tok
      |  WHERE len(token) >= 2 GROUP BY token),
      |pref AS (
      |  SELECT substr(token, 1, p) AS prefix, token, freq
      |  FROM tf, unnest([2, 3, 4]) AS u(p)
      |  WHERE len(token) >= p),
      |ranked AS (
      |  SELECT prefix, token, freq,
      |    ROW_NUMBER() OVER (PARTITION BY prefix
      |      ORDER BY freq DESC, token) AS rk
      |  FROM pref)
      |SELECT prefix, token, freq, CAST(rk AS INTEGER) AS rk
      |FROM ranked WHERE rk <= 3
      |ORDER BY prefix, rk""".stripMargin) { (s, dir) =>
    val tf = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 2)
      .groupBy("token").agg(count(lit(1)).as("freq"))
    // substr CLAMPS (substr('ab',1,3) = 'ab'), so filter on the true
    // prefix length p, not length(prefix) — else short tokens emit
    // duplicate (prefix, token) rows the oracle doesn't have.
    val pref = tf
      .select(col("token"), col("freq"),
        explode(expr(
          "transform(sequence(2, 4), p -> struct(p as p, substr(token, 1, p) as prefix))"))
          .as("pp"))
      .filter(length(col("token")) >= col("pp.p"))
      .select(col("token"), col("freq"), col("pp.prefix").as("prefix"))
    pref
      .withColumn("rk", row_number().over(
        Window.partitionBy("prefix").orderBy(col("freq").desc, col("token"))))
      .filter(col("rk") <= 3)
      .select("prefix", "token", "freq", "rk")
      .orderBy("prefix", "rk")
  }

  /** More-like-this (the Solr/Lucene MLT endpoint): the seed document's
    * top-5 terms by (tf DESC, df ASC, token ASC) — high in the doc, rare
    * in the corpus, the classic MLT term selection — retrieve every other
    * document containing any of them, scored by how many seed terms it
    * shares. Scoring is an INTEGER overlap count (not a float similarity)
    * so the ranking is bit-portable across engines; ties break on doc_id.
    * The 5-row seed-term set broadcasts; the only shuffles are the tf/df
    * aggregations any index build already does — at 100 TB both come
    * straight from the stored inverted index instead of a re-tokenize. */
  val searchMoreLikeThis = Q(
    "search_more_like_this",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY doc_id, token),
      |df AS (
      |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
      |seed AS (
      |  SELECT tf.token FROM tf JOIN df USING (token)
      |  WHERE tf.doc_id = 42
      |  ORDER BY tf.tf DESC, df.df ASC, tf.token LIMIT 5)
      |SELECT tf.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
      |  array_to_string(list_sort(list(tf.token)), ',') AS matched_terms
      |FROM tf JOIN seed USING (token) WHERE tf.doc_id <> 42
      |GROUP BY tf.doc_id
      |ORDER BY n_matched DESC, tf.doc_id LIMIT 50""".stripMargin) { (s, dir) =>
    val tf = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val seed = tf.filter(col("doc_id") === 42).join(df, "token")
      .orderBy(col("tf").desc, col("df").asc, col("token"))
      .limit(5).select("token")
    tf.filter(col("doc_id") =!= 42)
      .join(broadcast(seed), "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"),
        array_join(array_sort(collect_list(col("token"))), ",")
          .as("matched_terms"))
      .orderBy(col("n_matched").desc, col("doc_id")).limit(50)
  }

  /** Faceting (the Solr facet response): documents matching a term query,
    * counted per source AND per lang in ONE pass — GROUPING SETS expands
    * each hit into its two facet rows and a single hash aggregate counts
    * them, exactly how a search engine computes multi-field facets without
    * re-scanning per field. The oracle spells the same semantics as a
    * UNION ALL of per-field GROUP BYs (the different-plan/same-answer
    * convention). The term predicate stays scan-side. */
  val searchFacetCounts = Q(
    "search_facet_counts",
    """WITH hits AS (
      |  SELECT source, lang FROM documents
      |  WHERE len(list_filter(string_split(text, ' '),
      |        x -> x = 'spark')) > 0)
      |SELECT 'source' AS facet_field, source AS facet_value,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM hits GROUP BY source
      |UNION ALL
      |SELECT 'lang', lang, CAST(COUNT(*) AS BIGINT)
      |FROM hits GROUP BY lang
      |ORDER BY facet_field, facet_value""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .filter(array_contains(split(col("text"), " "), "spark"))
      .select(col("source"), col("lang"))
      .groupingSets(Seq(Seq(col("source")), Seq(col("lang"))),
        col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .select(
        when(col("source").isNotNull, lit("source")).otherwise(lit("lang"))
          .as("facet_field"),
        coalesce(col("source"), col("lang")).as("facet_value"),
        col("n"))
      .orderBy("facet_field", "facet_value")
  }

  /** Boolean retrieval — `("table" AND "scan") OR "vector", NOT "slow"` —
    * evaluated the way an index engine does: per-term doc-id sets from the
    * (distinct) token incidence, AND = semi join, OR = full outer union
    * with a clause bitmask, NOT = anti join. Every join is an equi-join on
    * doc_id between already-collapsed posting sets; the corpus text never
    * enters a shuffle. match_mask bit 1 = AND-clause hit, bit 2 = term
    * hit — the per-clause explain a search response carries. The oracle
    * spells the same semantics scan-side (list_contains CASE arithmetic —
    * the different-plan/same-answer convention). */
  val searchBooleanQuery = Q(
    "search_boolean_query",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    list_contains(ts, 'table') AND list_contains(ts, 'scan') AS tabscan,
      |    list_contains(ts, 'vector') AS vec,
      |    list_contains(ts, 'slow') AS slow
      |  FROM d)
      |SELECT doc_id,
      |  CAST(CASE WHEN tabscan THEN 1 ELSE 0 END
      |     + CASE WHEN vec THEN 2 ELSE 0 END AS BIGINT) AS match_mask
      |FROM m WHERE (tabscan OR vec) AND NOT slow
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val inc = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    def ids(w: String) = inc.filter(col("token") === w).select("doc_id")
    val tabScan = ids("table")
      .join(ids("scan"), Seq("doc_id"), "left_semi")
      .withColumn("m1", lit(1L))
    val vec = ids("vector").withColumn("m2", lit(2L))
    tabScan.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("m1"), lit(0L)) + coalesce(col("m2"), lit(0L)))
          .as("match_mask"))
      .join(ids("slow"), Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(rankFusionRrf, relevanceNdcg, relevancePrk,
    snippetExtract, suggestDictionary, searchMoreLikeThis, searchFacetCounts,
    searchBooleanQuery)
}
