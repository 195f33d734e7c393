package graft.operators

import graft.{Parity, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Training-data-pipeline and operability ops, wave 7 (round 6): RAG-style
  * document chunking, chunk→document embedding pooling, hard-negative
  * mining for contrastive training, a salted skew join (the manual skew
  * mitigation, proven answer-identical to the plain join), gaps-and-islands
  * sessionization (the batch/production twin of the session window), and a
  * small-file compaction planner (the lakehouse maintenance pass as a
  * query).
  *
  * Scale notes:
  *  - rag_chunk_split: pure map + explode — no shuffle at all; chunk count
  *    per doc is ⌈(n−20)/15⌉+1, so output size is linear in corpus tokens.
  *  - embedding_pool_mean: one (label, dim) hash aggregate with map-side
  *    combine; per-element decimal laundering keeps the float sums
  *    order-independent so partition count cannot change the answer.
  *  - mine_hard_negatives: the anchor set is k rows by construction and
  *    broadcasts; the corpus streams past it once. At real scale the
  *    ANN paths (ann_lsh_topk / ann_ivf_knn) pre-select candidates and
  *    this exact kernel reranks — same shape as knn_query.
  *  - join_skew_salted: a hot build key is split across SALT reducers by
  *    replicating the dim row per salt and hashing the probe side's
  *    OTHER columns into a salt id. AQE's skew-join split is the first
  *    resort; the manual salt is for the known-hot-key case where even one
  *    map task's key range overflows. Proven: identical answer to the
  *    unsalted join (the oracle IS the plain join).
  *  - events_session_gaps: single shuffle by user_id; both windows and
  *    the final aggregate share the (user_id) partitioning, so Catalyst
  *    plans exactly one exchange.
  *  - table_compaction_plan: the cumulative-sum bin-packing runs INSIDE
  *    each table partition (window partitioned by part_year, never
  *    keyless); file inventories are metadata-sized (rows ≈ files, not
  *    data rows).
  */
object PipelineOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // ------------------------------------------------------------- chunking

  /** RAG ingestion chunking: fixed 20-token windows with 5-token overlap
    * (stride 15). Every document yields ≥ 1 chunk; the last chunk may be
    * short. Chunk identity is (doc_id, chunk_id) — stable under corpus
    * growth, the key a vector index stores. */
  val ragChunkSplit = Q(
    "rag_chunk_split",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id, i AS chunk_id, toks[i*15+1 : i*15+20] AS ctoks
      |  FROM d, unnest(range(0,
      |    GREATEST(CAST(0 AS BIGINT),
      |      CAST(CEIL((len(toks) - 20) / 15.0) AS BIGINT)) + 1)) AS u(i))
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(len(ctoks) AS BIGINT) AS n_tokens,
      |  array_to_string(ctoks, ' ') AS chunk
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """transform(
          |  sequence(0, greatest(0L,
          |    cast(ceil((size(toks) - 20) / 15.0) as bigint))),
          |  i -> struct(cast(i as bigint) as chunk_id,
          |              slice(toks, cast(i * 15 + 1 as int), 20) as ctoks))"""
          .stripMargin)).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        size(col("c.ctoks")).cast("long").as("n_tokens"),
        array_join(col("c.ctoks"), " ").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  // -------------------------------------------------------------- pooling

  /** Chunk→document pooling: the per-dimension mean embedding of each
    * label group (the mean-pool step that turns chunk embeddings into a
    * document/class vector). Float sums are laundered through
    * DECIMAL(18,9) per element — order-independent, so the answer is
    * partition-count-invariant; a float32's 24-bit mantissa cannot
    * produce a decimal tie at scale 9 (that needs a dyadic denominator
    * ≤ 2^10), so both engines round identically. The decimal sum is
    * ROUNDed to scale 6 BEFORE the double cast (the Parity.dsum rule:
    * keep the scaled integer below 2^53 so DuckDB's int128→double cast
    * cannot double-round — holds here to ~10^9 pooled vectors/group). */
  val embeddingPoolMean = Q(
    "embedding_pool_mean",
    """WITH e AS (
      |  SELECT label, unnest(embedding) AS x,
      |    generate_subscripts(embedding, 1) AS dim
      |  FROM embeddings)
      |SELECT label, CAST(dim - 1 AS INTEGER) AS dim,
      |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(CAST(ROUND(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))), 6)
      |      AS DOUBLE) / COUNT(*), 6) AS mean_val
      |FROM e GROUP BY label, dim
      |ORDER BY label, dim""".stripMargin) { (s, dir) =>
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").as("dim"),
        col("col").cast(DoubleType).cast(DecimalType(18, 9)).as("x"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n_vecs"),
        round(round(sum(col("x")), 6).cast(DoubleType) / count(lit(1)), 6)
          .as("mean_val"))
      .select(col("label"), col("dim"), col("n_vecs"), col("mean_val"))
      .orderBy("label", "dim")
  }

  // -------------------------------------------------------- hard negatives

  /** Hard-negative mining for contrastive/embedding training: for each
    * anchor vector (vec_id 1..5), the top-3 most-similar vectors with a
    * DIFFERENT label — the negatives that actually teach the model. The
    * label-mismatch join against the 5-row broadcast anchor set is a
    * BroadcastNestedLoopJoin by construction (bounded; PlanAudit
    * allowlisted); cosine parity follows knn_query's rounded-kernel
    * convention. */
  val mineHardNegatives = Q(
    "mine_hard_negatives",
    """WITH a AS (
      |  SELECT vec_id AS anchor_id, embedding AS qe, label AS alabel
      |  FROM embeddings WHERE vec_id BETWEEN 1 AND 5),
      |pairs AS (
      |  SELECT anchor_id, e.vec_id AS neg_id, e.label,
      |    e.embedding AS ve, qe
      |  FROM embeddings e JOIN a ON e.label <> a.alabel),
      |un AS (
      |  SELECT anchor_id, neg_id, label,
      |    unnest(ve) AS xv, unnest(qe) AS xq
      |  FROM pairs),
      |sim AS (
      |  SELECT anchor_id, neg_id, label,
      |    ROUND(SUM(CAST(xv AS DOUBLE) * CAST(xq AS DOUBLE)) /
      |      (SQRT(SUM(CAST(xv AS DOUBLE) * CAST(xv AS DOUBLE))) *
      |       SQRT(SUM(CAST(xq AS DOUBLE) * CAST(xq AS DOUBLE)))), 6) AS sim
      |  FROM un GROUP BY anchor_id, neg_id, label),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
      |    ORDER BY sim DESC, neg_id) AS rk
      |  FROM sim)
      |SELECT anchor_id, neg_id, label, sim, CAST(rk AS INTEGER) AS rk
      |FROM ranked WHERE rk <= 3
      |ORDER BY anchor_id, rk""".stripMargin) { (s, dir) =>
    VectorOps.registerFns(s)
    val emb = t(s, dir, "embeddings")
    val anchors = emb.filter(col("vec_id").between(1, 5))
      .select(col("vec_id").as("anchor_id"), col("embedding").as("qe"),
        col("label").as("alabel"))
    emb.join(broadcast(anchors), col("label") =!= col("alabel"))
      .select(col("anchor_id"), col("vec_id").as("neg_id"), col("label"),
        round(call_function("cosine_sim", col("embedding"), col("qe")), 6)
          .as("sim"))
      .withColumn("rk", row_number().over(Window.partitionBy("anchor_id")
        .orderBy(col("sim").desc, col("neg_id"))))
      .filter(col("rk") <= 3)
      .orderBy("anchor_id", "rk")
  }

  // ------------------------------------------------------------ skew join

  /** Salted skew join, SELECTIVE form: only join keys whose probe-side
    * row count clears a hotness threshold are split across 8 salt buckets
    * (probe rows salt by a hash of their non-key columns; the matching
    * dim rows replicate 8×); every cold key joins unsalted (salt 0, one
    * dim copy). This is the production shape — the blanket-salt variant
    * replicates the ENTIRE dim side 8×, which at 10× already cost ~7× the
    * plain join here. The hot-key set is an aggregate of the probe side,
    * bounded by construction (few keys clear the threshold), and
    * broadcasts to both sides. AQE's skew split is the first resort; the
    * manual salt is for the known-hot-key case where a single key
    * overflows one task. The oracle is the PLAIN join: salting must be
    * answer-invariant, and this query proves it on every run. */
  val joinSkewSalted = Q(
    "join_skew_salted",
    s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       |  ${Parity.sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val salt = 8
    val liRaw = t(s, dir, "lineitem")
    // Hot keys: > 4 probe rows (TPC-H tops out at 7 lineitems/order, so
    // this exercises BOTH paths; production sets it from the key
    // histogram, e.g. rows-per-task overflow). Bounded + broadcast.
    val hot = liRaw.groupBy(col("l_orderkey").as("hot_key"))
      .agg(count(lit(1)).as("kc")).filter(col("kc") > 4)
      .select("hot_key")
    val li = liRaw
      .join(broadcast(hot), col("l_orderkey") === col("hot_key"), "left")
      .withColumn("salt",
        when(col("hot_key").isNotNull,
          pmod(xxhash64(col("l_linenumber"), col("l_partkey")), lit(salt)))
          .otherwise(lit(0)).cast("int"))
      .drop("hot_key")
    val ord = t(s, dir, "orders")
      .join(broadcast(hot), col("o_orderkey") === col("hot_key"), "left")
      .withColumn("salt", explode(expr(
        s"sequence(0, if(hot_key is not null, ${salt - 1}, 0))")))
      .drop("hot_key")
    li.join(ord,
        li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Parity.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  // -------------------------------------------------------- sessionization

  /** Gaps-and-islands session assignment: appends `session_id` (1-based
    * per user, ordered by ts then event_id) to the given event rows; a new
    * session starts after a > 30 min silence. Both windows share the
    * (user_id) partitioning, so Catalyst plans exactly one exchange.
    * Shared by events_session_gaps and the path-analysis ops. */
  private[operators] def withSessionIds(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("pts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("pts")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(w).cast("long"))
      .drop("pts", "new_s")
  }

  /** Gaps-and-islands sessionization: a new session starts after a > 30 min
    * silence per user (ties broken by event_id so the lag frame is total).
    * The production batch twin of the stream_session window — this is the
    * form a warehouse job runs nightly at 100 TB: one shuffle by user_id
    * shared by both windows and the final aggregate. */
  val eventsSessionGaps = Q(
    "events_session_gaps",
    """WITH o AS (
      |  SELECT user_id, ts, event_id,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN pts IS NULL
      |      OR date_diff('microsecond', pts, ts) > 1800000000
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM o),
      |s AS (
      |  SELECT user_id, ts, event_id,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS session_id
      |  FROM f)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(ts) AS start_ts, MAX(ts) AS end_ts,
      |  CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT)
      |    AS duration_us
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
    withSessionIds(t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id")))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  // ----------------------------------------------------------- compaction

  /** Small-file compaction planner: from a per-partition file inventory
    * (pseudo-files: 1000-orderkey ranges of lineitem, bytes ≈ rows × 128),
    * pack files in id order into ≥ 256 KiB target groups by
    * cumulative-sum bucketing — floor(preceding_bytes / target) — the
    * standard lakehouse OPTIMIZE planning pass expressed as a query.
    * Integer-only arithmetic; the window partitions by part_year. */
  val tableCompactionPlan = Q(
    "table_compaction_plan",
    """WITH files AS (
      |  SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS part_year,
      |    CAST(l_orderkey // 1000 AS BIGINT) AS file_id,
      |    CAST(COUNT(*) * 128 AS BIGINT) AS bytes
      |  FROM lineitem GROUP BY 1, 2),
      |packed AS (
      |  SELECT part_year, file_id, bytes,
      |    CAST((SUM(bytes) OVER (PARTITION BY part_year ORDER BY file_id)
      |      - bytes) // 262144 AS BIGINT) AS bucket
      |  FROM files)
      |SELECT part_year, bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_files,
      |  CAST(SUM(bytes) AS BIGINT) AS total_bytes,
      |  CAST(MIN(file_id) AS BIGINT) AS first_file,
      |  CAST(MAX(file_id) AS BIGINT) AS last_file
      |FROM packed GROUP BY part_year, bucket
      |ORDER BY part_year, bucket""".stripMargin) { (s, dir) =>
    val files = t(s, dir, "lineitem")
      .groupBy(year(col("l_shipdate")).as("part_year"),
        (col("l_orderkey") / 1000).cast("long").as("file_id"))
      .agg((count(lit(1)) * 128).as("bytes"))
    val w = Window.partitionBy("part_year").orderBy("file_id")
    files
      .withColumn("bucket",
        floor((sum(col("bytes")).over(w) - col("bytes")) / 262144L))
      .groupBy("part_year", "bucket")
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"))
      .orderBy("part_year", "bucket")
  }

  val all: Seq[Q] = Seq(ragChunkSplit, embeddingPoolMean, mineHardNegatives,
    joinSkewSalted, eventsSessionGaps, tableCompactionPlan)
}
