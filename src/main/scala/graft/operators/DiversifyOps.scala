package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Result diversification + schema-evolution scan, wave 23 (round 6).
  *
  *  - search_mmr_diversify: Maximal Marginal Relevance re-ranking of the
  *    BM25 top-20 — the serving-time answer to clone-heavy result lists
  *    (score = λ·relevance − (1−λ)·max similarity to anything already
  *    picked). The candidate set is model-sized by construction (top-k),
  *    so the greedy selection runs driver-side over the collected 20 rows
  *    — the kmeans-centroid / WAND-θ precedent: distributed plans produce
  *    the candidates (BM25 pipeline + 64-bucket signed hashing-trick doc
  *    vectors), the O(k²) greedy is bounded driver arithmetic. Oracled
  *    since round 8 (unrolled greedy replay — see [[mmrOracleSql]]);
  *    DiversifySpec still plants a clone-heavy candidate list and pins
  *    the demotion, plus λ=1 ≡ plain BM25 order.
  *  - scan_merge_schema: reads a dataset whose parquet files carry
  *    EVOLVED schemas (a v2 partition adds a column) with mergeSchema —
  *    the A-section ingestion reality at 100 TB, where years of files
  *    never share one schema. Self-contained: writes the two epochs to a
  *    scratch dir from the corpus, then proves the union read. No oracle
  *    (writes files); the declared output is the per-epoch accounting.
  */
object DiversifyOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** 64-dim signed hashing-trick doc vector as a dense array column —
    * the text_hashing_features buckets, densified for cosine. */
  private def hashVec(docs: DataFrame): DataFrame = {
    val nib = (h: String, i: Int) =>
      s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"
    val b = s"(${nib("h", 1)} * 16 + ${nib("h", 2)}) % 64"
    val sign = s"CASE WHEN ${nib("h", 3)} < 8 THEN 1 ELSE -1 END"
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .withColumn("h", md5(col("token")))
      .select(col("doc_id"), expr(s"CAST($b AS INT)").as("bucket"),
        expr(s"CAST($sign AS BIGINT)").as("sign"))
      .groupBy("doc_id", "bucket").agg(sum("sign").as("w"))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("w"))))
        .as("m"))
      .select(col("doc_id"),
        expr("transform(sequence(0, 63), i -> coalesce(m[i], 0L))").as("vec"))
  }

  /** DuckDB replay oracle for the greedy MMR selection (round-8, the
    * kmeans_embed unrolled-iteration precedent): the 20-step greedy is
    * unrolled as 20 (score, pick, picked-set) CTE triples over a
    * pairwise-similarity table built from the SAME md5-nibble
    * hashing-trick vectors. Every quantity is cross-engine exact: bucket
    * weights are integer sign-sums, so dots and squared norms are exact
    * integers; BM25 enters pre-rounded to 6 decimals (the bm25_topk
    * contract); λ and 1−λ are written as the same double expressions
    * (`0.7`, `1.0 - 0.7`) both engines evaluate to the same IEEE values;
    * and the output rounding replays `math.rint` as
    * `round_even(x·1e6, 0)/1e6`. Argmax ties break on doc_id in both. */
  private def mmrOracleSql: String = {
    val lam = "0.7"
    val steps = (1 to 20).map { i =>
      val prev = s"pk${i - 1}"
      s"""sc$i AS (
         |  SELECT t.doc_id, t.bm25,
         |    $lam * t.bm25 - (1.0 - $lam) * COALESCE(
         |      (SELECT MAX(s.sim) FROM sims s
         |       WHERE s.ad = t.doc_id
         |         AND s.bd IN (SELECT doc_id FROM $prev)), 0.0) AS score
         |  FROM top t WHERE t.doc_id NOT IN (SELECT doc_id FROM $prev)),
         |p$i AS MATERIALIZED (
         |  SELECT doc_id, bm25, score FROM sc$i
         |  ORDER BY score DESC, doc_id LIMIT 1),
         |pk$i AS MATERIALIZED (
         |  SELECT doc_id FROM $prev UNION ALL SELECT doc_id FROM p$i)"""
        .stripMargin
    }.mkString(",\n")
    val out = (1 to 20).map { i =>
      s"""SELECT $i AS rank, doc_id,
         |  round_even(bm25 * 1000000, 0) / 1000000 AS bm25,
         |  round_even(score * 1000000, 0) / 1000000 AS mmr_score
         |FROM p$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    val nib = (h: String, i: Int) =>
      s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"
    s"""WITH ${CorpusOps.Bm25OracleCtes},
       |top AS MATERIALIZED (
       |  SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
       |hv AS MATERIALIZED (
       |  SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS w FROM (
       |    SELECT doc_id,
       |      (${nib("h", 1)} * 16 + ${nib("h", 2)}) % 64 AS bucket,
       |      CASE WHEN ${nib("h", 3)} < 8 THEN 1 ELSE -1 END AS sign
       |    FROM (
       |      SELECT d.doc_id,
       |        md5(unnest(string_split(d.text, ' '))) AS h
       |      FROM documents d JOIN top USING (doc_id))) GROUP BY 1, 2),
       |norms AS (SELECT doc_id, SUM(w * w) AS n2 FROM hv GROUP BY doc_id),
       |dots AS (
       |  SELECT a.doc_id AS ad, b.doc_id AS bd, SUM(a.w * b.w) AS d
       |  FROM hv a JOIN hv b ON a.bucket = b.bucket AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |sims AS MATERIALIZED (
       |  SELECT pa.doc_id AS ad, pb.doc_id AS bd,
       |    CASE WHEN COALESCE(na.n2, 0) = 0 OR COALESCE(nb.n2, 0) = 0
       |         THEN 0.0
       |         ELSE CAST(COALESCE(d.d, 0) AS DOUBLE) /
       |              (SQRT(na.n2) * SQRT(nb.n2)) END AS sim
       |  FROM top pa JOIN top pb ON pa.doc_id <> pb.doc_id
       |  LEFT JOIN dots d ON d.ad = pa.doc_id AND d.bd = pb.doc_id
       |  LEFT JOIN norms na ON na.doc_id = pa.doc_id
       |  LEFT JOIN norms nb ON nb.doc_id = pb.doc_id),
       |pk0 AS (SELECT CAST(NULL AS BIGINT) AS doc_id WHERE 1 = 0),
       |$steps
       |SELECT * FROM (
       |$out
       |) ORDER BY rank""".stripMargin
  }

  /** MMR re-rank (λ = 0.7) of the BM25 top-20 for the standing query.
    * Oracled since round 8 — see [[mmrOracleSql]]. */
  val searchMmrDiversify = Q("search_mmr_diversify", mmrOracleSql) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val top = CorpusOps.bm25Scores(docs)
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
    // Vectorize ONLY the 20 candidates (broadcast semi-join into the doc
    // scan) — hashing the whole corpus first cost 316 s at the 1000×
    // tier for vectors that were then discarded.
    val candDocs = docs.join(broadcast(top.select("doc_id")), "doc_id")
    val cand = top.join(hashVec(candDocs), "doc_id")
      .select("doc_id", "bm25", "vec").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Long](2).map(_.toDouble).toArray))
      .sortBy(x => (-x._2, x._1))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    val lambda = 0.7
    val vecById = cand.map(c => c._1 -> c._3).toMap // id → vector (O(1),
    // not a linear find inside the pairwise loop — review round-12)
    val picked = collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    val pool = collection.mutable.ArrayBuffer(cand: _*)
    while (pool.nonEmpty) {
      val best = pool.map { case (id, rel, v) =>
        val maxSim =
          if (picked.isEmpty) 0.0
          else picked.map(p => cos(v, vecById(p._1))).max
        (id, rel, lambda * rel - (1 - lambda) * maxSim)
      }.minBy(x => (-x._3, x._1))
      picked += best
      pool.remove(pool.indexWhere(_._1 == best._1))
    }
    import s.implicits._
    picked.zipWithIndex
      .map { case ((id, rel, sc), i) =>
        (i + 1, id, math.rint(rel * 1e6) / 1e6, math.rint(sc * 1e6) / 1e6) }
      .toSeq.toDF("rank", "doc_id", "bm25", "mmr_score")
      .orderBy("rank")
  }

  /** Schema-evolution read: epoch v1 (doc_id, text) and epoch v2
    * (+ lang) written as separate parquet files, read back with
    * mergeSchema — rows from v1 surface lang as NULL, the union schema
    * has all 3 columns. Output: per-epoch row/null accounting.
    *
    * Oracled since round 7: the expected accounting is derivable from the
    * source table alone — v1 holds the even doc_ids with lang absent (all
    * NULL after the merge), v2 the odd ones with lang present (never NULL:
    * the source column is non-nullable) — so the DuckDB compare proves the
    * evolution round-trip dropped or duplicated nothing. */
  val scanMergeSchema = Q(
    "scan_merge_schema",
    """SELECT 'v1' AS epoch, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(*) AS BIGINT) AS n_null_lang, 3 AS n_data_cols
      |FROM documents WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT 'v2', CAST(COUNT(*) AS BIGINT),
      |  CAST(0 AS BIGINT), 3
      |FROM documents WHERE doc_id % 2 <> 0
      |ORDER BY epoch""".stripMargin) { (s, dir) =>
    val base = s"/tmp/graft_evolve_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val docs = t(s, dir, "documents")
    docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/epoch=v1")
    docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$base/epoch=v2")
    val merged = s.read.option("mergeSchema", "true").parquet(base)
    merged.groupBy("epoch")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
        lit(merged.schema.fields.count(_.name != "epoch")).as("n_data_cols"))
      .orderBy("epoch")
  }

  val all: Seq[Q] = Seq(searchMmrDiversify, scanMergeSchema)
}
