package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pattern-mining operators: market-basket pair counting, a blocked fuzzy
  * (edit-distance) self-join, and corpus bigram language-model scoring.
  *
  * Scale notes:
  *  - basket_pairs explodes pairs WITHIN a basket only (sum of k² per
  *    basket, never n² across baskets); the pair shuffle carries (int,int)
  *    keys with map-side combine. Skewed mega-baskets would be capped
  *    upstream in a real pipeline — the synthetic baskets are ≤ ~8 items.
  *  - fuzzy_join_name uses deletion-neighborhood blocking (FastSS): each
  *    name emits itself plus every single-character-deletion variant as a
  *    block key; any pair within edit distance 1 provably shares a key
  *    (substitution → both delete the edited position; indel → the longer
  *    side's deletion IS the shorter), so candidates come from an
  *    EQUI-join on the variant key — never a cross join — then exact
  *    levenshtein verifies (the neighborhood admits rare distance-2 false
  *    candidates). O(n·L) keys; positional segment blocking would
  *    degenerate here because the names share a constant prefix, while
  *    deletion variants keep the discriminative suffix in every key.
  *    The oracle IS the O(n²) brute force.
  *  - text_bigram_logprob is two corpus-count aggregations + a broadcast
  *    join of the (small) conditional-probability model back onto doc
  *    bigrams; the model table is vocabulary-sized, not corpus-sized.
  */
object MiningOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Frequent co-purchased part pairs (support ≥ 3 baskets). */
  val basketPairs = Q(
    "basket_pairs",
    """WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_baskets
      |FROM it a JOIN it b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY p1, p2 HAVING COUNT(*) >= 3
      |ORDER BY n_baskets DESC, p1, p2""".stripMargin) { (s, dir) =>
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = items.select(col("l_orderkey").as("ok2"), col("l_partkey").as("p2"))
    a.join(b, col("l_orderkey") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= 3)
      .orderBy(col("n_baskets").desc, col("p1"), col("p2"))
  }

  /** Fuzzy self-join on customer names (edit distance ≤ 1), aggregated to
    * a per-customer match count. Candidates via FastSS deletion-variant
    * block keys; exact levenshtein verifies. */
  val fuzzyJoinName = Q(
    "fuzzy_join_name",
    """SELECT a.c_custkey, COUNT(*) AS n_fuzzy
      |FROM customer a JOIN customer b
      |  ON a.c_custkey <> b.c_custkey
      | AND levenshtein(a.c_name, b.c_name) <= 1
      |GROUP BY a.c_custkey ORDER BY a.c_custkey""".stripMargin) { (s, dir) =>
    // i = 0 keeps the string itself; i = 1..len deletes position i.
    val variants = expr(
      """transform(sequence(0, length(c_name)),
        |  i -> if(i = 0, c_name,
        |          concat(substr(c_name, 1, i - 1), substr(c_name, i + 1))))"""
        .stripMargin)
    def keyed(s0: SparkSession, dir0: String, kc: String, nc: String) =
      t(s0, dir0, "customer")
        .select(col("c_custkey").as(kc), col("c_name").as(nc),
          explode(variants).as("del_key"))
        .distinct()
    val a = keyed(s, dir, "a_key", "a_name")
    val b = keyed(s, dir, "b_key", "b_name")
    a.join(b, a("del_key") === b("del_key") &&
        col("a_key") =!= col("b_key"))
      .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"))
      .distinct()
      .filter(levenshtein(col("a_name"), col("b_name")) <= 1)
      .groupBy(col("a_key").as("c_custkey"))
      .agg(count(lit(1)).as("n_fuzzy"))
      .orderBy("c_custkey")
  }

  /** Corpus bigram LM scoring: P(w2|w1) from corpus bigram counts, each doc
    * scored by its mean log-probability — the cheap LM-quality signal a
    * training-data pipeline uses for filtering. Docs with < 2 tokens drop. */
  val textBigramLogprob = Q(
    "text_bigram_logprob",
    """WITH bg AS (
      |  SELECT doc_id, unnest(list_transform(
      |    range(1, len(string_split(text,' '))),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |  )) AS bigram
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |bc AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
      |uc AS (SELECT string_split(bigram, ' ')[1] AS w1, SUM(c2) AS c1
      |       FROM bc GROUP BY w1)
      |SELECT bg.doc_id,
      |  ROUND(AVG(LN(CAST(bc.c2 AS DOUBLE) / CAST(uc.c1 AS DOUBLE))), 4)
      |    AS mean_logprob,
      |  COUNT(*) AS n_bigrams
      |FROM bg JOIN bc USING (bigram)
      |JOIN uc ON string_split(bg.bigram, ' ')[1] = uc.w1
      |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin) { (s, dir) =>
    val toks = split(col("text"), " ")
    val bg = t(s, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          """transform(sequence(1, size(split(text,' ')) - 1),
            |  i -> concat(element_at(split(text,' '), i), ' ',
            |              element_at(split(text,' '), i + 1)))""".stripMargin))
          .as("bigram"))
    val bc = bg.groupBy("bigram").agg(count(lit(1)).as("c2"))
    val uc = bc
      .groupBy(element_at(split(col("bigram"), " "), 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    bg.join(broadcast(bc), "bigram")
      .join(broadcast(uc),
        element_at(split(col("bigram"), " "), 1) === col("w1"))
      .groupBy("doc_id")
      .agg(
        round(avg(log(col("c2").cast("double") / col("c1").cast("double"))), 4)
          .as("mean_logprob"),
        count(lit(1)).as("n_bigrams"))
      .orderBy("doc_id")
  }

  /** CCNet-style quality bucketing: score every doc with the corpus bigram
    * LM (same pipeline as [[textBigramLogprob]]), then split each language
    * into head/middle/tail terciles of LM quality — the standard recipe
    * for weighting web data by fluency before training.
    *
    * Parity: NTILE runs over (rounded logprob DESC, doc_id) in both
    * engines — identical ordering ⇒ identical bucket boundaries. The
    * window partitions by lang (never keyless). */
  val corpusQualityBuckets = Q(
    "corpus_quality_buckets",
    """WITH bg AS (
      |  SELECT doc_id, unnest(list_transform(
      |    range(1, len(string_split(text,' '))),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |  )) AS bigram
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |bc AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
      |uc AS (SELECT string_split(bigram, ' ')[1] AS w1, SUM(c2) AS c1
      |       FROM bc GROUP BY w1),
      |lp AS (
      |  SELECT bg.doc_id,
      |    ROUND(AVG(LN(CAST(bc.c2 AS DOUBLE) / CAST(uc.c1 AS DOUBLE))), 4)
      |      AS mean_logprob
      |  FROM bg JOIN bc USING (bigram)
      |  JOIN uc ON string_split(bg.bigram, ' ')[1] = uc.w1
      |  GROUP BY bg.doc_id)
      |SELECT d.doc_id, d.lang, lp.mean_logprob,
      |  CAST(NTILE(3) OVER (PARTITION BY d.lang
      |    ORDER BY lp.mean_logprob DESC, d.doc_id) AS INTEGER) AS bucket
      |FROM lp JOIN documents d USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val toksLen = size(split(col("text"), " "))
    val bg = docs.filter(toksLen >= 2)
      .select(col("doc_id"),
        explode(expr(
          """transform(sequence(1, size(split(text,' ')) - 1),
            |  i -> concat(element_at(split(text,' '), i), ' ',
            |              element_at(split(text,' '), i + 1)))""".stripMargin))
          .as("bigram"))
    val bc = bg.groupBy("bigram").agg(count(lit(1)).as("c2"))
    val uc = bc
      .groupBy(element_at(split(col("bigram"), " "), 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val lp = bg.join(broadcast(bc), "bigram")
      .join(broadcast(uc),
        element_at(split(col("bigram"), " "), 1) === col("w1"))
      .groupBy("doc_id")
      .agg(round(avg(log(col("c2").cast("double") / col("c1").cast("double"))), 4)
        .as("mean_logprob"))
    lp.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy("lang")
          .orderBy(col("mean_logprob").desc, col("doc_id"))))
      .select("doc_id", "lang", "mean_logprob", "bucket")
      .orderBy("doc_id")
  }

  /** Collocation mining: document-level PMI of token pairs —
    * pmi(a,b) = ln(df(a,b)·N / (df(a)·df(b))) over distinct
    * (doc, token) incidence, minimum co-support 5 — the signal behind
    * synonym/phrase discovery and feature crosses.
    *
    * Parity: the ln argument is (exact long · double N) / (exact long
    * product) — identical IEEE arithmetic in both engines; round(…, 6)
    * absorbs libm's last ulp. Ranking orders by the ROUNDED pmi with
    * (t1, t2) tiebreak.
    *
    * Scale: the pair join is basket_pairs' shape — distinct incidence
    * first (shrinks each doc to unique tokens), equi-join on doc_id;
    * df sides broadcast. */
  val tokenPmiPairs = Q(
    "token_pmi_pairs",
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |df AS (SELECT token, COUNT(*) AS c FROM dt GROUP BY token),
      |pairs AS (
      |  SELECT a.token AS t1, b.token AS t2, COUNT(*) AS c_ab
      |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
      |  GROUP BY t1, t2 HAVING COUNT(*) >= 5)
      |SELECT t1, t2, CAST(c_ab AS BIGINT) AS c_ab,
      |  ROUND(LN(c_ab * (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE)
      |                   FROM documents) / (d1.c * d2.c)), 6) AS pmi
      |FROM pairs JOIN df d1 ON t1 = d1.token JOIN df d2 ON t2 = d2.token
      |ORDER BY pmi DESC, t1, t2 LIMIT 50""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    // N rides as a broadcast 1-row side (the oracle's scalar subquery) so
    // building the DataFrame stays LAZY — no job at plan-construction time.
    val nDf = docs.agg(countDistinct(col("doc_id")).cast("double").as("n_docs"))
    val dt = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val df = dt.groupBy("token").agg(count(lit(1)).as("c"))
    val a = dt.select(col("doc_id"), col("token").as("t1"))
    val b = dt.select(col("doc_id").as("d2"), col("token").as("t2"))
    a.join(b, col("doc_id") === col("d2") && col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
      .join(broadcast(df.select(col("token").as("t1"), col("c").as("c1"))), "t1")
      .join(broadcast(df.select(col("token").as("t2"), col("c").as("c2"))), "t2")
      .crossJoin(broadcast(nDf))
      .select(col("t1"), col("t2"), col("c_ab"),
        round(log(col("c_ab") * col("n_docs") / (col("c1") * col("c2"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(50)
  }

  val all: Seq[Q] = Seq(basketPairs, fuzzyJoinName, textBigramLogprob,
    corpusQualityBuckets, tokenPmiPairs)
}
