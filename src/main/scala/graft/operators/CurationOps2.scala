package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators, fourth wave (round 5): deterministic
  * split assignment, sharded shuffle ordering, and eval-set
  * decontamination by embedding similarity — the steps between a curated
  * corpus and the tokenizer's input manifest.
  *
  * Conventions as everywhere: content-hash determinism (never rand() — a
  * re-run on recovered partitions must produce identical rows), exact
  * portable arithmetic in every oracled output, flat uniquely-ordered
  * schemas.
  */
object CurationOps2 {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Deterministic train/valid/test split by content hash: the md5 hex
    * prefix of the doc id is a uniform 256-bucket draw both engines (and
    * any future re-run, on any partitioning) reproduce bit-identically —
    * the property rand() lacks and salted-hash splits exist for. Prefix
    * thresholds: `< "f0"` → train (240/256 = 93.75%), `< "f8"` → valid
    * (3.125%), rest → test. Pure map — no shuffle at any scale; at 100 TB
    * this is a write-path partition column ( `partitionBy("split")` ). */
  def splitHash(docs: DataFrame): DataFrame = {
    val h = md5(concat(lit("split-v1:"), col("doc_id").cast("string")))
    val bucket = substring(h, 1, 2)
    docs.select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < "f0", "train")
        .when(bucket < "f8", "valid")
        .otherwise("test").as("split"))
  }

  val docSplitHash = Q(
    "doc_split_hash",
    """WITH h AS (
      |  SELECT doc_id,
      |    substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |  FROM documents)
      |SELECT doc_id, bucket,
      |  CASE WHEN bucket < 'f0' THEN 'train'
      |       WHEN bucket < 'f8' THEN 'valid'
      |       ELSE 'test' END AS split
      |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    splitHash(t(s, dir, "documents")).orderBy("doc_id")
  }

  /** Deterministic sharded shuffle (the pretraining data-order staple):
    * every doc gets a shard and a position within it, both derived from a
    * seeded content hash, so the global reading order
    * (shard_id, pos_in_shard) is a reproducible uniform shuffle. The
    * within-shard rank windows partition by shard — `shards` is the
    * parallelism AND the unit of output (one file per shard at the write
    * path), so it scales with the corpus (thousands of shards at 100 TB),
    * never a global single-partition row_number. Hex-nibble arithmetic
    * (`instr` of the hex alphabet) instead of conv()/from_hex keeps the
    * bucket computation portable across engines. `shards` uses whole hex
    * prefix nibbles (16 = 1 nibble, 256 = 2). */
  def shardShuffle(docs: DataFrame, shards: Int = 256): DataFrame = {
    require(shards == 16 || shards == 256,
      "shards must use whole hex-prefix nibbles (16 or 256)")
    val h = md5(concat(lit("shuffle-v1:"), col("doc_id").cast("string")))
    val hexAlphabet = lit("0123456789abcdef")
    def nibble(i: Int) =
      call_function("instr", hexAlphabet, substring(h, i, 1)) - 1
    val shard = (shards match {
      case 16  => nibble(1)
      case 256 => nibble(1) * 16 + nibble(2)
    }).cast("long")
    val w = Window.partitionBy("shard_id").orderBy(col("h"), col("doc_id"))
    docs
      .select(col("doc_id"), h.as("h"), shard.as("shard_id"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard_id"), col("pos_in_shard"))
  }

  val corpusShardShuffle = Q(
    "corpus_shard_shuffle",
    """WITH h AS (
      |  SELECT doc_id,
      |    md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, h,
      |    CAST((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
      |       + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS BIGINT)
      |      AS shard_id
      |  FROM h)
      |SELECT doc_id, shard_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY h, doc_id)
      |    AS BIGINT) AS pos_in_shard
      |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    shardShuffle(t(s, dir, "documents")).orderBy("doc_id")
  }

  /** Eval-set decontamination by embedding similarity (the semantic
    * counterpart of decontaminate_ngram): drop any corpus vector whose
    * cosine against ANY held-out eval vector reaches `threshold`. The
    * eval set here is carved from the embeddings table (vec_id % 97 = 0)
    * so the oracle sees the same inputs; in production it is the
    * benchmark suite's embeddings — thousands to ~1 M rows, bounded by
    * nature, so the plan is a broadcast nested-loop ANTI join: one
    * map-side scan of the corpus, zero shuffles, no pair
    * materialization. The guard is COMPUTE-aware, not just memory-aware:
    * the NLJ evaluates corp × eval cosines, so beyond
    * `maxBroadcastEval` eval rows OR a corp×eval pair budget (the
    * measured ~7·10⁵ dots/s/core kernel rate × a 5-min budget ×
    * parallelism — the ngramJaccardPairs capacity formula) the operator
    * reroutes to [[AnnOps.lshCrossContaminatedIds]]: banded SRP
    * candidates from corp×eval bucket collisions only (never corp×corp —
    * the within-corpus pair kernel is output-quadratic in clone
    * multiplicity), exact-cosine verify — approximate recall, linear
    * candidate volume, the 100 TB shape. */
  def decontaminateEmbedding(s: SparkSession, emb: DataFrame,
      threshold: Double, maxBroadcastEval: Long = 1000000L,
      maxExactPairs: Long = -1L): DataFrame = {
    VectorOps.registerFns(s)
    val pairBudget =
      if (maxExactPairs >= 0) maxExactPairs
      else 210000000L * s.sparkContext.defaultParallelism
    val isEval = col("vec_id") % 97 === 0
    val corp = emb.filter(!isEval).select(col("vec_id"), col("embedding"))
      .withColumn("vh", xxhash64(col("embedding")))
    // Exact-duplicate collapse: the verdict is a function of the VECTOR
    // VALUE, not the id, so the probe runs on DISTINCT vectors (keyed by
    // xxhash64 of the array — the minhash verify-join precedent) and the
    // verdict fans back out by hash key. A duplication-heavy crawl
    // collapses to its distinct set (the 1000×-clone corpus: 2 M rows →
    // 2 k probe rows, 1168 s → seconds); a dup-free corpus pays one
    // hash-agg. The guard below sees the probe's TRUE input — the
    // distinct counts — per the probe-what-you-run rule (ADVICE r4).
    val corpReps = corp.groupBy("vh")
      .agg(min("vec_id").as("vec_id"), first("embedding").as("embedding"))
    val evalReps = emb.filter(isEval)
      .withColumn("vh", xxhash64(col("embedding")))
      .groupBy("vh")
      .agg(min("vec_id").as("eval_id"), first("embedding").as("ee"))
      .select(col("eval_id"), col("ee"))
    val (nCorp, nEval) = (corpReps.count(), evalReps.count())
    val contaminatedVh =
      if (nEval <= maxBroadcastEval && nCorp * nEval <= pairBudget) {
        corpReps.join(broadcast(evalReps),
            call_function("cosine_sim", col("embedding"), col("ee"))
              >= threshold,
            "left_semi")
          .select(col("vh"))
      } else {
        AnnOps.lshCrossContaminatedIds(s,
            corpReps.select(col("vec_id"), col("embedding")),
            evalReps.select(col("eval_id").as("vec_id"),
              col("ee").as("embedding")),
            threshold)
          .join(corpReps, Seq("vec_id"))
          .select(col("vh"))
      }
    corp.join(contaminatedVh, Seq("vh"), "left_anti")
      .select(col("vec_id"))
      .orderBy("vec_id")
  }

  val decontaminateEmb = Q(
    "decontaminate_embedding",
    """WITH ev AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0),
      |corp AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0),
      |un AS (
      |  SELECT c.vec_id AS cid, e.vec_id AS eid,
      |         unnest(c.embedding) AS xc, unnest(e.embedding) AS xe
      |  FROM corp c CROSS JOIN ev e),
      |sims AS (
      |  SELECT cid, eid,
      |    SUM(CAST(xc AS DOUBLE) * CAST(xe AS DOUBLE)) AS dot,
      |    SUM(CAST(xc AS DOUBLE) * CAST(xc AS DOUBLE)) AS nc,
      |    SUM(CAST(xe AS DOUBLE) * CAST(xe AS DOUBLE)) AS ne
      |  FROM un GROUP BY cid, eid),
      |bad AS (
      |  SELECT DISTINCT cid FROM sims
      |  WHERE dot / (SQRT(nc) * SQRT(ne)) >= 0.45)
      |SELECT vec_id FROM corp
      |WHERE vec_id NOT IN (SELECT cid FROM bad)
      |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    decontaminateEmbedding(s, t(s, dir, "embeddings"), threshold = 0.45)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each doc draws key = u^(1/w) from a CONTENT-HASH uniform u (md5
    * 13-nibble prefix / 16¹³ — exact dyadic double, identical on any
    * engine/partitioning/re-run, the no-rand() convention) and weight
    * w = max(n_chars, 1); the top-k keys ARE a weighted sample without
    * replacement. The length-weighted draw is the corpus-curation staple
    * (sample tokens, not documents). Ranking runs on the RAW key — a
    * 1-ulp libm pow() divergence flips an order only when two keys
    * near-tie (~n²·1e-15 odds), whereas grid-rounding would CREATE ties;
    * doc_id breaks exact ties, and the displayed key rounds to 6.
    * Scale shape: pure map + TakeOrderedAndProject — no shuffle beyond
    * the top-k reduction at any corpus size. */
  val sampleWeightedAes = Q(
    "sample_weighted_aes",
    """WITH keyed AS (
      |  SELECT doc_id, n_chars,
      |    POW(CAST(('0x' || substr(md5('aes-v1:' || CAST(doc_id AS VARCHAR)),
      |            1, 13)) AS BIGINT) / 4503599627370496.0,
      |        1.0 / GREATEST(n_chars, 1)) AS k
      |  FROM documents)
      |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      |  ROUND(k, 6) AS sample_key
      |FROM keyed ORDER BY k DESC, doc_id LIMIT 20""".stripMargin) {
    (s, dir) =>
      val u = conv(substring(
          md5(concat(lit("aes-v1:"), col("doc_id").cast("string"))), 1, 13),
          16, 10).cast("double") / lit(4503599627370496.0)
      val k = pow(u, lit(1.0) / greatest(col("n_chars"), lit(1)))
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          k.as("k"))
        .orderBy(col("k").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("n_chars"),
          round(col("k"), 6).as("sample_key"))
  }

  /** Token-budget waterfilling across domains (the data-mixing allocator
    * a pretraining pipeline runs under a fixed token budget B): every
    * domain keeps min(c_i, θ) tokens where the integer water level
    * θ = floor((B − Σ_{smaller domains} c_i) / #larger) equalizes the
    * capped domains — small domains survive whole, large ones are cut to
    * the common level (B = 50% of corpus tokens here). All arithmetic is
    * exact integers, so the oracle replays it bit-for-bit via sorted
    * prefix sums. The corpus-sized work is ONE token-count aggregate;
    * the ≤|domains|-row level search runs on the driver (the bounded-
    * model kmeans/Bradley–Terry shape — a keyless window over domains
    * would trip PlanSpec's single-partition ban for no gain). */
  val corpusBudgetWaterfill = Q(
    "corpus_budget_waterfill",
    """WITH g AS (
      |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |    AS n_tokens
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
      |        CAST(SUM(n_tokens) / 2 AS BIGINT) AS budget,
      |        COUNT(*) AS nd FROM g),
      |sorted AS (
      |  SELECT lang, n_tokens,
      |    ROW_NUMBER() OVER (ORDER BY n_tokens, lang) AS rk,
      |    SUM(n_tokens) OVER (ORDER BY n_tokens, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prefix
      |  FROM g),
      |lvl AS (
      |  SELECT CAST((budget - COALESCE(prefix, 0)) // (nd - rk + 1)
      |    AS BIGINT) AS theta
      |  FROM sorted CROSS JOIN tot
      |  WHERE n_tokens > (budget - COALESCE(prefix, 0)) // (nd - rk + 1)
      |  ORDER BY rk LIMIT 1),
      |theta AS (
      |  SELECT COALESCE((SELECT theta FROM lvl),
      |    9223372036854775807) AS theta)
      |SELECT lang, n_tokens,
      |  LEAST(n_tokens, theta) AS allocated,
      |  ROUND(CAST(LEAST(n_tokens, theta) AS DOUBLE) / n_tokens, 6)
      |    AS kept_frac
      |FROM g CROSS JOIN theta ORDER BY lang""".stripMargin) { (s, dir) =>
    import s.implicits._
    val g = t(s, dir, "documents").groupBy("lang")
      .agg(sum(size(split(col("text"), " "))).as("n_tokens"))
    // Bounded domain frame → driver; exact integer water-level search.
    val domains = g.as[(String, Long)].collect().sortBy(d => (d._2, d._1))
    val total = domains.map(_._2).sum
    val budget = total / 2
    val nd = domains.length
    var prefix = 0L
    var theta = Long.MaxValue
    var found = false
    for (((_, c), idx) <- domains.zipWithIndex if !found) {
      val candidate = (budget - prefix) / (nd - idx)
      if (c > candidate) { theta = candidate; found = true }
      else prefix += c
    }
    val thetaF = theta
    g.select(col("lang"), col("n_tokens"),
        least(col("n_tokens"), lit(thetaF)).as("allocated"),
        round(least(col("n_tokens"), lit(thetaF)).cast("double") /
          col("n_tokens"), 6).as("kept_frac"))
      .orderBy("lang")
  }

  val all: Seq[Q] =
    Seq(docSplitHash, corpusShardShuffle, decontaminateEmb, sampleWeightedAes,
      corpusBudgetWaterfill)
}
