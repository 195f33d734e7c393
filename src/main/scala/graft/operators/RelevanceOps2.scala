package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Search-relevance pack, wave 7 (round 6): the remaining offline metric
  * (average precision / MAP), two query-understanding stages (pseudo-
  * relevance-feedback expansion, edit-distance spell correction), a
  * proximity query over the positional index (the Lucene SpanNear shape),
  * and a max-score-pruned BM25 top-k — the WAND idea re-expressed as a
  * two-phase columnar plan that provably returns the exact top-k.
  *
  * Scale notes:
  *  - relevance_map: identical plan skeleton to relevance_ndcg — every
  *    window partitions by query term; the only corpus-wide work is the
  *    shared BM25 scorer.
  *  - search_span_near: each side of the doc_id equi-join ships ONLY the
  *    queried tokens' posting rows (token filter prunes the index scan);
  *    the pair count folds inside a codegen'd higher-order function, so
  *    position lists never explode into rows.
  *  - search_query_expansion: the feedback set is k docs by construction —
  *    its term-frequency table is vocabulary-of-k-docs sized and
  *    broadcasts; the corpus-side df aggregation is the same two-phase
  *    hash agg the inverted-index build already runs (at 100 TB it reads
  *    the stored index instead).
  *  - suggest_spell_correct: distance against each (constant) query token
  *    is a scan-side expression over the vocabulary AGGREGATE (vocab ≪
  *    corpus), unioned per query — no join at all, so no NLJ even though
  *    the semantics are a cross product of queries × vocab.
  *  - search_wand_topk: phase 1 fully scores only the rarest term's
  *    posting list and derives threshold θ; phase 2 prunes the remaining
  *    docs by their matched-term upper-bound sum (3-row broadcast) before
  *    scoring survivors. At 100 TB the prune drops every doc that matches
  *    only common terms without touching its length or stats rows.
  */
object RelevanceOps2 {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val K1 = 1.2
  private val B = 0.75

  // ------------------------------------------------------------- metrics

  /** Average precision at 10 per query term (MAP = mean of `ap_at_10`
    * over terms): AP = Σ_{k : hit at k} P@k / min(n_rel, 10), binary
    * relevance = "document contains the term" (same judgments as
    * relevance_prk). P@k = cum_hits/k is an exact small-integer IEEE
    * division (bit-identical across engines); the ≤10-term sum is
    * decimal(18,9)-laundered so summation order cannot matter. */
  val relevanceMap = Q(
    "relevance_map",
    s"""WITH ${CorpusOps.Bm25OracleCtes},
       |top10 AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10),
       |terms AS (SELECT unnest(['hash', 'join', 'vector']) AS token),
       |judg AS (SELECT token, doc_id FROM tf),
       |ranked AS (
       |  SELECT token, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY token ORDER BY bm25 DESC, doc_id) AS rk
       |  FROM top10 CROSS JOIN terms),
       |hits AS (
       |  SELECT r.token, r.rk,
       |    CASE WHEN j.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM ranked r LEFT JOIN judg j ON r.token = j.token AND r.doc_id = j.doc_id),
       |cum AS (
       |  SELECT token, rk, hit,
       |    SUM(hit) OVER (PARTITION BY token ORDER BY rk) AS cum_hits
       |  FROM hits),
       |ap AS (
       |  SELECT token,
       |    CAST(SUM(CASE WHEN hit = 1
       |      THEN CAST(CAST(cum_hits AS DOUBLE) / rk AS DECIMAL(18,9))
       |      ELSE CAST(0 AS DECIMAL(18,9)) END) AS DOUBLE) AS sum_prec,
       |    CAST(SUM(hit) AS BIGINT) AS hits10
       |  FROM cum GROUP BY token),
       |rel AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_rel FROM judg GROUP BY token)
       |SELECT a.token, n_rel, hits10,
       |  ROUND(sum_prec / LEAST(n_rel, 10), 6) AS ap_at_10
       |FROM ap a JOIN rel USING (token)
       |ORDER BY a.token""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val judg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(CorpusOps.Bm25Terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .select("token", "doc_id")
    val top10 = CorpusOps.bm25Scores(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    val terms = { import s.implicits._; CorpusOps.Bm25Terms.toDF("token") }
    val ranked = top10.crossJoin(broadcast(terms))
      .withColumn("rk", row_number().over(
        Window.partitionBy("token").orderBy(col("bm25").desc, col("doc_id"))))
    val hits = ranked
      .join(judg.withColumn("hitmark", lit(1)), Seq("token", "doc_id"), "left")
      .select(col("token"), col("rk"),
        when(col("hitmark").isNotNull, lit(1)).otherwise(lit(0)).as("hit"))
    val cum = hits.withColumn("cum_hits",
      sum(col("hit")).over(Window.partitionBy("token").orderBy("rk")))
    val ap = cum.groupBy("token").agg(
      sum(when(col("hit") === 1,
        (col("cum_hits").cast(DoubleType) / col("rk")).cast(DecimalType(18, 9)))
        .otherwise(lit(0).cast(DecimalType(18, 9))))
        .cast(DoubleType).as("sum_prec"),
      sum(col("hit")).cast("long").as("hits10"))
    val rel = judg.groupBy("token").agg(count(lit(1)).as("n_rel"))
    ap.join(rel, "token")
      .select(col("token"), col("n_rel"), col("hits10"),
        round(col("sum_prec") / least(col("n_rel"), lit(10L)), 6).as("ap_at_10"))
      .orderBy("token")
  }

  // ----------------------------------------------------------- proximity

  /** SpanNear proximity query: documents where 'hash' and 'vector' occur
    * within 5 token positions of each other (any order), with the exact
    * pair count — the Lucene span_near / Solr surround shape, evaluated by
    * intersecting two positional posting rows per doc. The pair count is
    * a fold over the (bounded) position lists inside codegen; nothing
    * re-explodes. */
  val searchSpanNear = Q(
    "search_span_near",
    """WITH tok AS (
      |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(1, len(string_split(text, ' ')) + 1),
      |      i -> {'pos': i, 'w': string_split(text, ' ')[i]})) AS u
      |    FROM documents))
      |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM tok a JOIN tok b
      |  ON a.doc_id = b.doc_id AND ABS(a.pos - b.pos) <= 5
      |WHERE a.w = 'hash' AND b.w = 'vector'
      |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin) { (s, dir) =>
    val idx = CurationOps3.positionalPostings(t(s, dir, "documents"))
    val a = idx.filter(col("token") === "hash")
      .select(col("doc_id"), col("positions").as("pa"))
    val b = idx.filter(col("token") === "vector")
      .select(col("doc_id"), col("positions").as("pb"))
    a.join(b, "doc_id")
      .select(col("doc_id"),
        expr("""aggregate(pa, CAST(0 AS BIGINT),
               |  (acc, x) -> acc + CAST(size(filter(pb,
               |    y -> abs(y - x) <= 5)) AS BIGINT))""".stripMargin)
          .as("n_pairs"))
      .filter(col("n_pairs") > 0)
      .orderBy("doc_id")
  }

  // --------------------------------------------------- query understanding

  /** Pseudo-relevance-feedback query expansion (the RM3 idea, term-select
    * stage): take the BM25 top-10 feedback docs, rank their terms by
    * (feedback tf DESC, corpus df ASC, token) — frequent in the feedback
    * set, rare in the corpus — excluding the original query terms and
    * short tokens. Integer-only ranking: bit-portable across engines. */
  val searchQueryExpansion = Q(
    "search_query_expansion",
    s"""WITH ${CorpusOps.Bm25OracleCtes},
       |top10 AS (SELECT doc_id FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10),
       |fbtf AS (
       |  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf_fb
       |  FROM tok JOIN top10 USING (doc_id)
       |  WHERE len(token) >= 4 AND token NOT IN ('hash', 'join', 'vector')
       |  GROUP BY token),
       |gdf AS (
       |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM tok GROUP BY token)
       |SELECT f.token, tf_fb, df FROM fbtf f JOIN gdf USING (token)
       |ORDER BY tf_fb DESC, df ASC, f.token LIMIT 10""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val top10 = CorpusOps.bm25Scores(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(10).select("doc_id")
    val fbtf = docs.join(top10, Seq("doc_id"), "left_semi")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 4 &&
        !col("token").isin(CorpusOps.Bm25Terms: _*))
      .groupBy("token").agg(count(lit(1)).as("tf_fb"))
    val gdf = docs
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    gdf.join(broadcast(fbtf), "token")
      .select(col("token"), col("tf_fb"), col("df"))
      .orderBy(col("tf_fb").desc, col("df").asc, col("token"))
      .limit(10)
  }

  /** "Did you mean": spell-correct misspelled query tokens against the
    * corpus vocabulary by Levenshtein distance ≤ 2, top-5 per query by
    * (distance ASC, corpus frequency DESC, token). The distance against a
    * CONSTANT query token is a scan-side expression over the vocabulary
    * aggregate — one union branch per query term, no join, no NLJ. At
    * 100 TB the vocabulary is the small side by construction; a SymSpell
    * delete-index is the constant-factor upgrade if the query stream is
    * hot, but the plan shape stays "expression over the vocab". */
  val suggestSpellCorrect = Q(
    "suggest_spell_correct",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |vocab AS (
      |  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok
      |  WHERE len(token) >= 4 GROUP BY token HAVING COUNT(*) >= 3),
      |q AS (SELECT unnest(['tabel', 'vectr']) AS query),
      |cand AS (
      |  SELECT query, token, freq,
      |    CAST(levenshtein(token, query) AS BIGINT) AS dist
      |  FROM vocab CROSS JOIN q WHERE levenshtein(token, query) <= 2),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query
      |    ORDER BY dist, freq DESC, token) AS rk
      |  FROM cand)
      |SELECT query, token, freq, dist, CAST(rk AS INTEGER) AS rk
      |FROM ranked WHERE rk <= 5 ORDER BY query, rk""".stripMargin) { (s, dir) =>
    val vocab = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 4)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= 3)
    val perQuery = Seq("tabel", "vectr").map { qw =>
      vocab.select(lit(qw).as("query"), col("token"), col("freq"),
        levenshtein(col("token"), lit(qw)).cast("long").as("dist"))
        .filter(col("dist") <= 2)
    }
    perQuery.reduce(_ unionByName _)
      .withColumn("rk", row_number().over(Window.partitionBy("query")
        .orderBy(col("dist"), col("freq").desc, col("token"))))
      .filter(col("rk") <= 5)
      .orderBy("query", "rk")
  }

  // ------------------------------------------------------------ wand top-k

  /** Max-score-pruned BM25 top-20 — the WAND/MaxScore family idea as a
    * two-phase columnar plan, returning EXACTLY the bm25_topk answer
    * (oracle = the exact ranking; the different-plan/same-answer
    * convention):
    *
    *  1. fully score only the docs containing the rarest (highest
    *     upper-bound) query term; θ = their k-th best score when ≥ k of
    *     them exist, else −∞;
    *  2. every other matching doc is kept only if Σ upper bounds of its
    *     matched terms clears θ (per-term UB = idf·(k1+1), the tf→∞
    *     limit of the BM25 term, joined from a 3-row broadcast), then
    *     survivors are scored and unioned with phase 1.
    *
    * Soundness: score(d) < Σ_matched UB(d), so no pruned doc can enter the
    * top-k; θ is compared with 1e-6 slack because emitted scores round to
    * 6 decimals. At 100 TB phase 1 touches one posting list and phase 2
    * never fetches dl/stats rows for pruned docs. */
  val searchWandTopK = Q(
    "search_wand_topk",
    s"""WITH ${CorpusOps.Bm25OracleCtes}
       |SELECT doc_id, bm25 FROM bm
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
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
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    // Per-term score upper bound: idf·(k1+1) ≥ idf·tf·(k1+1)/(tf + …).
    val ub = df.crossJoin(broadcast(stats))
      .select(col("token"), (idf * (K1 + 1.0)).as("ub"))
    val rareTok = ub.orderBy(col("ub").desc, col("token")).limit(1)
      .select("token")
    def score(incidence: DataFrame): DataFrame = {
      val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
      val term = log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
        (col("tf") * (K1 + 1.0)) /
        (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
      incidence.join(broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(round(sum(term), 6).as("bm25"))
    }
    val candIds = tf.join(broadcast(rareTok), "token").select("doc_id")
    val candScores = score(tf.join(candIds, Seq("doc_id"), "left_semi"))
    val theta = candScores.orderBy(col("bm25").desc, col("doc_id")).limit(20)
      .agg(when(count(lit(1)) === 20, min(col("bm25")))
        .otherwise(lit(Double.MinValue)).as("theta"))
    val rest = tf.join(candIds, Seq("doc_id"), "left_anti")
    val survivors = rest.join(broadcast(ub), "token")
      .groupBy("doc_id").agg(sum(col("ub")).as("ub_sum"))
      .crossJoin(broadcast(theta))
      .filter(col("ub_sum") >= col("theta") - 1e-6)
      .select("doc_id")
    val restScores = score(tf.join(survivors, Seq("doc_id"), "left_semi"))
    candScores.unionByName(restScores)
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  val all: Seq[Q] = Seq(relevanceMap, searchSpanNear, searchQueryExpansion,
    suggestSpellCorrect, searchWandTopK)
}
