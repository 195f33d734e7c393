package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-eval aggregation operators, wave 35 (round 8) — the metrics an
  * LLM training pipeline computes over sampled generations and judge
  * preferences.
  *
  *  - eval_pass_at_k: the unbiased pass@k estimator (Chen et al. 2021,
  *    the HumanEval combinatorial form) per task over n sampled trials
  *    with c successes: pass@k = 1 − C(n−c,k)/C(n,k), computed as the
  *    numerically-stable telescoped product Π_{i<k} (n−c−i)/(n−i). Trials
  *    are synthesized deterministically from the events stream (task =
  *    user_id % 32, success = 'purchase'): ONE hash aggregate over the
  *    event scan; the product is a k-term fold over two ints — exact in
  *    both engines (same ascending-i multiplication order), rounded to 6.
  *  - embedding_truncate_recall: Matryoshka-style truncation eval — how
  *    much of the full-width (64-d) top-10 neighborhood survives when
  *    cosine runs on the 16-d PREFIX only. Per sampled query: both
  *    rankings (sims rounded to 6 BEFORE ranking, vec_id tie-break — the
  *    drift-proof compare convention), overlap count, recall@10. The
  *    eval is query-sample-bounded by construction (5 queries), so the
  *    per-query window ranking is model-sized at any corpus scale; the
  *    production path for full-corpus retrieval remains AnnOps.
  *  - eval_bradley_terry: judge-preference aggregation — Bradley–Terry
  *    strengths over pairwise match outcomes via 10 minorize-maximize
  *    iterations (π_i ← W_i / Σ_j n_ij/(π_i+π_j), renormalized). Matches
  *    derive one-per-user from interaction counts (winner = the user's
  *    top item-mod-8, loser = second; count desc, player tie-break). The
  *    8-player model is driver-held (the kmeans/IVF bounded-model shape);
  *    every iteration rounds ratings to the 1e-9 grid so the DuckDB
  *    replay oracle (10 unrolled CTEs, the pagerank precedent) walks
  *    identical values despite summation-order drift.
  */
object EvalOps2 {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val PassKs = Seq(1, 5, 10)

  val evalPassAtK = Q(
    "eval_pass_at_k",
    s"""WITH trials AS (
       |  SELECT CAST(user_id % 32 AS BIGINT) AS task_id,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c
       |  FROM events GROUP BY 1)
       |SELECT task_id, n, c,
       |  ${PassKs.map(k =>
           s"""ROUND(CASE WHEN n - c < $k THEN 1.0 ELSE
              |    1.0 - list_aggregate(list_transform(range(0, $k),
              |      i -> (CAST(n - c - i AS DOUBLE)) / (n - i)), 'product')
              |    END, 6) AS pass_at_$k""".stripMargin).mkString(",\n  ")}
       |FROM trials WHERE n >= 10 ORDER BY task_id""".stripMargin) {
    (s, dir) =>
      val trials = t(s, dir, "events")
        .groupBy((col("user_id") % 32).cast("long").as("task_id"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c"))
      val passCols = PassKs.map { k =>
        round(
          when(col("n") - col("c") < k, 1.0).otherwise(
            lit(1.0) - aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
              (acc, i) => acc *
                (col("n") - col("c") - i).cast("double") / (col("n") - i))),
          6).as(s"pass_at_$k")
      }
      trials.filter(col("n") >= 10)
        .select(col("task_id") +: col("n") +: col("c") +: passCols: _*)
        .orderBy("task_id")
  }

  private val TruncDims = 16
  private val NQueries = 5

  val embeddingTruncateRecall = Q(
    "embedding_truncate_recall",
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
       |    AS v
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $NQueries),
       |scored AS MATERIALIZED (
       |  SELECT qid, vec_id,
       |    ROUND(CASE WHEN nf = 0 OR nqf = 0 THEN 0.0
       |      ELSE df / (SQRT(nf) * SQRT(nqf)) END, 6) AS sim_full,
       |    ROUND(CASE WHEN nt = 0 OR nqt = 0 THEN 0.0
       |      ELSE dt / (SQRT(nt) * SQRT(nqt)) END, 6) AS sim_trunc
       |  FROM (
       |    SELECT q.qid, e.vec_id,
       |      list_sum(list_transform(range(1, len(e.v) + 1),
       |        i -> e.v[i] * q.qv[i])) AS df,
       |      list_sum(list_transform(e.v, x -> x * x)) AS nf,
       |      list_sum(list_transform(q.qv, x -> x * x)) AS nqf,
       |      list_sum(list_transform(range(1, $TruncDims + 1),
       |        i -> e.v[i] * q.qv[i])) AS dt,
       |      list_sum(list_transform(e.v[1:$TruncDims], x -> x * x)) AS nt,
       |      list_sum(list_transform(q.qv[1:$TruncDims], x -> x * x)) AS nqt
       |    FROM e CROSS JOIN qs q WHERE e.vec_id <> q.qid) t),
       |topf AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY sim_full DESC, vec_id) AS rk FROM scored) t
       |  WHERE rk <= 10),
       |topt AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY sim_trunc DESC, vec_id) AS rk FROM scored) t
       |  WHERE rk <= 10)
       |SELECT f.qid, CAST(COUNT(tt.vec_id) AS BIGINT) AS n_overlap,
       |  ROUND(COUNT(tt.vec_id) / 10.0, 6) AS recall_at_10
       |FROM topf f LEFT JOIN topt tt
       |  ON tt.qid = f.qid AND tt.vec_id = f.vec_id
       |GROUP BY f.qid ORDER BY f.qid""".stripMargin) { (s, dir) =>
    VectorOps.registerFns(s)
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    val qs = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("qv")), 6)
          .as("sim_full"),
        round(call_function("cosine_sim",
          slice(col("embedding"), 1, TruncDims),
          slice(col("qv"), 1, TruncDims)), 6).as("sim_trunc"))
    def top10(simCol: String) = {
      val w = Window.partitionBy("qid")
        .orderBy(col(simCol).desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        .select("qid", "vec_id")
    }
    val topf = top10("sim_full")
    val topt = top10("sim_trunc")
      .select(col("qid").as("tqid"), col("vec_id").as("tvid"))
    topf.join(topt,
        col("tqid") === col("qid") && col("tvid") === col("vec_id"), "left")
      .groupBy("qid")
      .agg(count(col("tvid")).as("n_overlap"),
        round(count(col("tvid")) / 10.0, 6).as("recall_at_10"))
      .orderBy("qid")
  }

  private val BtPlayers = 8
  private val BtIters = 10

  val evalBradleyTerry = Q(
    "eval_bradley_terry",
    { val iters = (1 to BtIters).map { k =>
        val prev = s"r${k - 1}"
        // MM update against the symmetric match counts, then renormalize;
        // both steps round to 1e-9 (matching the Spark driver loop).
        s"""u$k AS (
           |  SELECT w.player,
           |    ROUND(w.wins / SUM(nm.n / (pa.pi + pb.pi)), 9) AS pi
           |  FROM wins w
           |  JOIN nmat nm ON nm.a = w.player
           |  JOIN $prev pa ON pa.player = nm.a
           |  JOIN $prev pb ON pb.player = nm.b
           |  GROUP BY w.player, w.wins),
           |r$k AS MATERIALIZED (
           |  SELECT player, ROUND(pi / (SELECT SUM(pi) FROM u$k), 9) AS pi
           |  FROM u$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH inter AS (
         |  SELECT user_id,
         |    CAST(TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) % 8
         |      AS INT) AS player,
         |    COUNT(*) AS cnt
         |  FROM events WHERE event_type IN ('view', 'click')
         |    AND regexp_matches(json_extract_string(props, '$$.k'),
         |          '^-?[0-9]+$$')
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT user_id, player,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY cnt DESC, player) AS rk
         |  FROM inter),
         |matches AS MATERIALIZED (
         |  SELECT a.player AS winner, b.player AS loser
         |  FROM ranked a JOIN ranked b
         |    ON a.user_id = b.user_id AND a.rk = 1 AND b.rk = 2),
         |players AS (SELECT CAST(unnest(range(0, $BtPlayers)) AS INT)
         |  AS player),
         |wins AS MATERIALIZED (
         |  SELECT p.player,
         |    CAST(COALESCE(w.n, 0) AS DOUBLE) AS wins,
         |    CAST(COALESCE(w.n, 0) AS BIGINT) AS wins_n
         |  FROM players p LEFT JOIN (
         |    SELECT winner AS player, COUNT(*) AS n FROM matches GROUP BY 1)
         |    w ON w.player = p.player),
         |nmat AS MATERIALIZED (
         |  SELECT a, b, CAST(SUM(n) AS DOUBLE) AS n FROM (
         |    SELECT winner AS a, loser AS b, COUNT(*) AS n FROM matches
         |      GROUP BY 1, 2
         |    UNION ALL
         |    SELECT loser AS a, winner AS b, COUNT(*) AS n FROM matches
         |      GROUP BY 1, 2) t GROUP BY a, b),
         |ntot AS (
         |  SELECT p.player, CAST(COALESCE(SUM(nm.n), 0) AS BIGINT) AS nm
         |  FROM players p LEFT JOIN nmat nm ON nm.a = p.player
         |  GROUP BY p.player),
         |r0 AS (SELECT player, 1.0 / $BtPlayers AS pi FROM players),
         |$iters
         |SELECT w.player, w.wins_n AS wins, nt.nm AS n_matches,
         |  ROUND(r.pi, 6) AS rating,
         |  CAST(ROW_NUMBER() OVER (ORDER BY ROUND(r.pi, 6) DESC, w.player)
         |    AS INT) AS rank
         |FROM wins w JOIN r$BtIters r ON r.player = w.player
         |JOIN ntot nt ON nt.player = w.player
         |ORDER BY w.player""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    val inter = t(s, dir, "events")
      .filter(col("event_type").isin("view", "click"))
      .filter(get_json_object(col("props"), "$.k").rlike("^-?[0-9]+$"))
      .groupBy(col("user_id"),
        (get_json_object(col("props"), "$.k").cast("bigint") % 8)
          .cast("int").as("player"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("cnt").desc, col("player"))
    val ranked = inter.withColumn("rk", row_number().over(w))
    val matches = ranked.filter(col("rk") === 1)
      .select(col("user_id"), col("player").as("winner"))
      .join(ranked.filter(col("rk") === 2)
        .select(col("user_id"), col("player").as("loser")), "user_id")
      .select("winner", "loser")
    // Bounded 8-player model: collect the (wins, n_ij) sufficient stats
    // once, run the MM iterations driver-side (the kmeans model shape).
    val winRows = matches.groupBy("winner").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val pairRows = matches.groupBy("winner", "loser")
      .agg(count(lit(1)).as("n")).as[(Int, Int, Long)].collect()
    val nij = collection.mutable.Map.empty[(Int, Int), Long]
      .withDefaultValue(0L)
    pairRows.foreach { case (a, b, n) =>
      nij((a, b)) += n
      nij((b, a)) += n
    }
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pi = Array.fill(BtPlayers)(1.0 / BtPlayers)
    for (_ <- 1 to BtIters) {
      val updated = (0 until BtPlayers).map { i =>
        // Sum over opponents ascending — the same term order the oracle's
        // 8-term SUM reassociates within the 1e-9 rounding grid.
        val denom = (0 until BtPlayers).filter(j => nij((i, j)) > 0)
          .map(j => nij((i, j)).toDouble / (pi(i) + pi(j))).sum
        if (denom == 0.0) pi(i)
        else round9(winRows.getOrElse(i, 0L).toDouble / denom)
      }
      val z = updated.sum
      pi = updated.map(x => round9(x / z)).toArray
    }
    val rows = (0 until BtPlayers).map { i =>
      val nm = (0 until BtPlayers).map(j => nij((i, j))).sum
      (i, winRows.getOrElse(i, 0L), nm,
        BigDecimal(pi(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    // Rank assigned driver-side over the 8-row model (a keyless window
    // over the toy frame would trip the PlanSpec single-partition ban).
    val rankOf = rows.sortBy(r => (-r._4, r._1)).zipWithIndex
      .map { case (r, idx) => r._1 -> (idx + 1) }.toMap
    rows.map(r => (r._1, r._2, r._3, r._4, rankOf(r._1)))
      .toDF("player", "wins", "n_matches", "rating", "rank")
      .orderBy("player")
  }

  val all: Seq[Q] = Seq(evalPassAtK, embeddingTruncateRecall, evalBradleyTerry)
}
