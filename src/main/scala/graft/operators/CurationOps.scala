package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators, third wave (round 5): per-domain cap
  * sampling, hashed-feature linear model scoring, and SemDeDup-style
  * semantic deduplication — the curation steps a 100 TB pretraining
  * pipeline runs between raw crawl and tokenization.
  *
  * Conventions as everywhere: content-hash determinism (never rand()),
  * driver-held model constants only when kilobyte-scale, every declared
  * output flat + uniquely ordered.
  */
object CurationOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Per-domain document cap (the C4/RefinedWeb "no domain may dominate"
    * rule): keep at most `cap` docs per source, picked by content-hash
    * rank — md5(doc_id) ordering is a deterministic uniform shuffle that
    * every engine reproduces, unlike rand(). The rank window shuffles on
    * `source` once; Spark's WindowGroupLimit rule (3.5+) pushes the
    * `pick_rank <= cap` predicate INTO the window sort, so each partition
    * keeps a cap-sized heap instead of sorting its full domain — the
    * skewed-giant-domain case (half the crawl in one domain) stays
    * bounded. At 100 TB the same plan is the write-path filter. */
  def domainCap(docs: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= cap)
      .select(col("doc_id"), col("source"), col("pick_rank"))
  }

  val corpusDomainCap = Q(
    "corpus_domain_cap",
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
      |  FROM documents)
      |SELECT doc_id, source, pick_rank FROM ranked
      |WHERE pick_rank <= 40 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    domainCap(t(s, dir, "documents"), cap = 40).orderBy("doc_id")
  }

  /** Hashed-feature linear scorer (the fastText-classifier APPLY shape):
    * tokens hash to `dim` buckets via the native rolling-hash expression,
    * each bucket carries a fixed weight from a Knuth multiplicative mix,
    * and a doc's score is the mean bucket weight of its tokens. The model
    * here is synthetic (a hash-derived weight table) but the PLAN is the
    * real one: a learned model would broadcast its weight array and
    * change nothing downstream — one scan, one explode, one keyed agg,
    * all integer arithmetic until the final division, so the oracle is
    * exact (weights are integers in [-1000, 1000]; their sum is an exact
    * BIGINT; one IEEE division at the end). The score is deliberately NOT
    * rounded: both operands are exactly-representable doubles (|w_sum| ≪
    * 2^53), so the correctly-rounded IEEE quotient is bit-identical
    * across engines — while ROUND(…, 4) of that quotient is NOT (the sf0.1
    * check caught w_sum/(1000·n) landing exactly on 0.07125: Spark
    * HALF_UPs the shortest decimal repr → 0.0713, DuckDB rounds the raw
    * double → 0.0712 — the .xxxx5 boundary trap in dec2's scaladoc). */
  def qualityScoreLinear(docs: DataFrame, dim: Int = 4096): DataFrame = {
    VectorOps.registerFns(docs.sparkSession)
    val w: Column =
      (call_function("rolling_hash31", col("tk")) % dim) * 2654435761L % 2001L -
        1000L
    docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("tk"))
      .filter(col("tk") =!= "")
      .select(col("doc_id"), w.as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("w_sum"))
      .select(col("doc_id"), col("n_tokens"), col("w_sum"),
        (col("w_sum").cast("double") /
          (col("n_tokens").cast("double") * 1000.0)).as("quality_score"))
  }

  val qualityLinear = Q(
    "quality_score_linear",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tk
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
      |       list_transform(string_split(tk, ''),
      |                      c -> CAST(ascii(c) AS BIGINT))),
      |       (h, c) -> (h * 31 + c) % 2147483647) % 4096)
      |      * 2654435761 % 2001 - 1000 AS w
      |  FROM tok WHERE tk <> '')
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(w) AS BIGINT) AS w_sum,
      |  CAST(SUM(w) AS DOUBLE) / (COUNT(*) * 1000.0) AS quality_score
      |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    qualityScoreLinear(t(s, dir, "documents")).orderBy("doc_id")
  }

  /** SemDeDup-style semantic dedup: cluster embeddings coarsely (k-means —
    * the same deterministic fit the IVF index uses), then drop any vector
    * with a LOWER-id in-cluster neighbor above the cosine threshold.
    * Survivors = one representative per semantic near-dup group (modulo
    * clusters splitting a group — the accepted SemDeDup approximation;
    * raising k trades recall for cost exactly as in the paper).
    *
    * Scale shape: the quadratic work is confined WITHIN clusters — the
    * pair join is an equi-join on cluster_id, so total cost is Σ c_i²,
    * not n². `k` defaults to n/1024 (clusters ~1k vectors → ≤ ~0.5 M
    * dot products per cluster) so the per-cluster work is bounded as n
    * grows; a skewed giant cluster is an AQE skew-join split plus, at the
    * extreme, a larger k. Only the k×d centroid model rides the driver. */
  def semanticDedup(s: SparkSession, emb: DataFrame, threshold: Double,
      k: Int = -1): DataFrame = {
    VectorOps.registerFns(s)
    val n = emb.count()
    val kk = if (k > 0) k else math.max(8L, n / 1024L).toInt
    val assigned = ClusterOps.kmeansAssign(s,
      emb.select(col("vec_id"), col("embedding")), k = kk, iters = 3)
    val a = assigned.select(col("cluster_id"), col("vec_id").as("a_id"),
      col("embedding").as("ea"))
    val b = assigned.select(col("cluster_id"), col("vec_id").as("b_id"),
      col("embedding").as("eb"))
    val dropped = a.join(b, Seq("cluster_id"))
      .filter(col("a_id") < col("b_id"))
      .filter(call_function("cosine_sim", col("ea"), col("eb")) >= threshold)
      .select(col("b_id").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster_id"))
  }

  /** K2-adjacent declared query.
    *
    * Oracled since round 8 (the kmeans_embed/ann_ivf_knn replay family):
    * at every oracle scale the auto-k floors at 8, so the DuckDB oracle
    * replays the SAME 3-iteration rounded-centroid Lloyd model
    * (ClusterOps.kmeansIterSql), takes a3's assignment, forms the
    * within-cluster pairs, drops the higher id of every pair whose exact
    * cosine clears the threshold (the unrounded ≥-compare follows the
    * dedup_embedding_cosine precedent), and emits the survivors.
    * CurationSpec still pins planted-clone drops, threshold monotonicity,
    * and the full-pairwise equivalence on a single cluster. */
  val dedupSemantic = Q(
    "dedup_semantic",
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
       |    AS v
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
       |    AS cid, v AS cent
       |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8) t),${
      Seq(1, 2, 3).map(ClusterOps.kmeansIterSql).mkString(",")},
       |m AS MATERIALIZED (
       |  SELECT a.vec_id, a.cluster_id, e.v,
       |    list_sum(list_transform(e.v, x -> x * x)) AS n2
       |  FROM a3 a JOIN e USING (vec_id)),
       |drp AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM m a JOIN m b
       |    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
       |  WHERE list_sum(list_transform(range(1, len(a.v) + 1),
       |          i -> a.v[i] * b.v[i])) /
       |        (SQRT(a.n2) * SQRT(b.n2)) >= 0.45)
       |SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id
       |FROM m WHERE vec_id NOT IN (SELECT vec_id FROM drp)
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    // 0.45 matches dedup_embedding_cosine's declared threshold (the
    // corpus's near-dup band tops out at cosine ≈ 0.51). k = auto
    // (max(8, n/1024)): the floor of 8 at the shipped corpus sizes, the
    // bounded-cluster scale shape beyond ~8 k vectors.
    semanticDedup(s, t(s, dir, "embeddings"), threshold = 0.45)
      .orderBy("vec_id")
  }

  /** Temperature-scaled mixture resampling (the multilingual data-mixing
    * staple): per-language token shares p_i are flattened to
    * q_i ∝ p_i^τ (τ = 0.5), and `sample_factor` = q_i/p_i is the
    * per-language up/down-sampling multiplier a pipeline applies at the
    * write path. All counting is exact BIGINT; the few-row share/power
    * arithmetic follows the corpus_mixture_stats parity precedent
    * (identical expression structure both engines, ROUND(…, 6) absorbing
    * last-ulp pow/sum drift). Two scans of group COUNTS only — the
    * corpus-sized work is the one token-count agg. */
  val temperatureResample = Q(
    "corpus_temperature_resample",
    """WITH g AS (
      |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |    AS n_tokens
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM g),
      |p AS (SELECT lang, n_tokens,
      |        n_tokens / CAST(total_tokens AS DOUBLE) AS p
      |      FROM g CROSS JOIN tot),
      |z AS (SELECT SUM(POW(p, 0.5)) AS z FROM p)
      |SELECT lang, n_tokens, ROUND(p, 6) AS p_share,
      |  ROUND(POW(p, 0.5) / z, 6) AS q_share,
      |  ROUND(POW(p, 0.5) / z / p, 6) AS sample_factor
      |FROM p CROSS JOIN z ORDER BY lang""".stripMargin) { (s, dir) =>
    val g = t(s, dir, "documents").groupBy("lang")
      .agg(sum(size(split(col("text"), " "))).as("n_tokens"))
    val tot = g.agg(sum("n_tokens").as("total_tokens"))
    val p = g.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_tokens"),
        (col("n_tokens") / col("total_tokens").cast("double")).as("p"))
    val z = p.agg(sum(pow(col("p"), 0.5)).as("z"))
    p.crossJoin(broadcast(z))
      .select(col("lang"), col("n_tokens"),
        round(col("p"), 6).as("p_share"),
        round(pow(col("p"), 0.5) / col("z"), 6).as("q_share"),
        round(pow(col("p"), 0.5) / col("z") / col("p"), 6)
          .as("sample_factor"))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(corpusDomainCap, qualityLinear, dedupSemantic,
    temperatureResample)
}
