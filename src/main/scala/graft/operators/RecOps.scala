package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Item-to-item collaborative filtering, wave 19 (round 6): co-occurrence
  * mining over the interaction stream ("users who engaged X also engaged
  * Y") — the recommender counterpart of search_more_like_this. Items are
  * the `$.k` json prop of view/click events (the ClickOps convention).
  *
  * Scale design — the pair explosion is THE hazard: per-user pair volume
  * is quadratic in user degree, so the interaction frame is capped at the
  * 50 strongest items per user (interaction count desc, item asc — a
  * deterministic, declared part of the contract, exactly how production
  * co-occurrence miners bound whale users). After the cap, pair
  * generation is a per-user self-join shuffled once on user_id, item
  * marginals come from the same capped frame, and similarity is an exact
  * integer Jaccard. The per-item ranking is a keyed window (never
  * global). The oracle replays the identical capped contract in SQL, so
  * the cap is verified, not just implemented.
  *
  * Exactness: all counts integer; jaccard = co/(na+nb−co) is one integer
  * ratio; round(…, 6) last.
  */
object RecOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Shared SQL CTEs: capped user→item frame, item marginals, pair
    * co-occurrence counts with jaccard. */
  private val PairsSql: String =
    """ui0 AS (
      |  SELECT user_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
      |      AS item, COUNT(*) AS n_inter
      |  FROM events WHERE event_type IN ('view', 'click')
      |    AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
      |  GROUP BY 1, 2),
      |ui AS (
      |  SELECT user_id, item FROM (
      |    SELECT user_id, item,
      |      ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY n_inter DESC, item) AS rk
      |    FROM ui0) WHERE rk <= 50),
      |marg AS (SELECT item, COUNT(*) AS n_users FROM ui GROUP BY item),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co_users
      |  FROM ui a JOIN ui b
      |    ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT item_a, item_b, co_users, ma.n_users AS na, mb.n_users AS nb,
      |    ROUND(CAST(co_users AS DOUBLE) / (ma.n_users + mb.n_users
      |      - co_users), 6) AS jaccard
      |  FROM pairs JOIN marg ma ON ma.item = pairs.item_a
      |    JOIN marg mb ON mb.item = pairs.item_b)""".stripMargin

  /** Spark twin of [[PairsSql]]'s `scored`. */
  private def scored(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui0 = events
      .filter(col("event_type").isin("view", "click"))
      // INTEGRAL-pattern parity guard — see ClickOps.itemCounts (r8
      // ADVICE): un-castable $.k must drop on both engines, and a
      // fractional "12.5" must not truncate (Spark) vs round (DuckDB).
      .filter(get_json_object(col("props"), "$.k").rlike("^-?[0-9]+$"))
      .groupBy(col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item"))
      .agg(count(lit(1)).as("n_inter"))
    val cap = Window.partitionBy("user_id")
      .orderBy(col("n_inter").desc, col("item"))
    val ui = ui0.withColumn("rk", row_number().over(cap))
      .filter(col("rk") <= 50).select("user_id", "item")
    val marg = ui.groupBy("item").agg(count(lit(1)).as("n_users"))
    val b = ui.select(col("user_id"), col("item").as("item_b"))
    val pairs = ui.select(col("user_id"), col("item").as("item_a"))
      .join(b, Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("co_users"))
    pairs
      .join(marg.select(col("item").as("item_a"), col("n_users").as("na")),
        "item_a")
      .join(marg.select(col("item").as("item_b"), col("n_users").as("nb")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("co_users"),
        col("na"), col("nb"),
        round(col("co_users").cast("double") /
          (col("na") + col("nb") - col("co_users")), 6).as("jaccard"))
  }

  /** Strongest 50 co-occurrence pairs corpus-wide (support first, then
    * the pair key) — the "frequently engaged together" report. */
  val recItemCooccur = Q(
    "rec_item_cooccur",
    s"""WITH $PairsSql
       |SELECT item_a, item_b, CAST(co_users AS BIGINT) AS co_users,
       |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb, jaccard
       |FROM scored ORDER BY co_users DESC, item_a, item_b
       |LIMIT 50""".stripMargin) { (s, dir) =>
    scored(t(s, dir, "events"))
      .orderBy(col("co_users").desc, col("item_a"), col("item_b"))
      .limit(50)
  }

  /** Top-3 recommendations per item by Jaccard (symmetrized pairs, keyed
    * per-item window rank). */
  val recTopkPerItem = Q(
    "rec_topk_per_item",
    s"""WITH $PairsSql,
       |sym AS (
       |  SELECT item_a AS item, item_b AS rec_item, co_users, jaccard
       |  FROM scored
       |  UNION ALL
       |  SELECT item_b, item_a, co_users, jaccard FROM scored),
       |ranked AS (
       |  SELECT item, rec_item, co_users, jaccard,
       |    ROW_NUMBER() OVER (PARTITION BY item
       |      ORDER BY jaccard DESC, rec_item) AS rk
       |  FROM sym)
       |SELECT item, rec_item, CAST(co_users AS BIGINT) AS co_users,
       |  jaccard, CAST(rk AS INTEGER) AS rk
       |FROM ranked WHERE rk <= 3 ORDER BY item, rk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val sc = scored(t(s, dir, "events"))
    val sym = sc.select(col("item_a").as("item"), col("item_b").as("rec_item"),
        col("co_users"), col("jaccard"))
      .union(sc.select(col("item_b").as("item"), col("item_a").as("rec_item"),
        col("co_users"), col("jaccard")))
    val w = Window.partitionBy("item")
      .orderBy(col("jaccard").desc, col("rec_item"))
    sym.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("item"), col("rec_item"), col("co_users"), col("jaccard"),
        col("rk"))
      .orderBy("item", "rk")
  }

  val all: Seq[Q] = Seq(recItemCooccur, recTopkPerItem)
}
