package graft.operators

import graft.{Q, Tables}
import graft.Stage.StagedOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative fixpoint operators: PageRank on a derived trade graph and
  * Lloyd's k-means over the embedding table.
  *
  * Scale notes: both are the canonical distributed iteration shapes —
  * PageRank is per-iteration (edges ⋈ ranks) shuffled on src then a
  * groupBy dst (rank state stays a DataFrame, nothing driver-side except
  * the fixed iteration count); k-means keeps the DATA distributed and
  * only the k×d centroid model on the driver (kilobytes — the same
  * broadcast-model pattern as the IVF/PQ index builds). Damping < 1 makes
  * the PageRank recurrence a contraction, so cross-engine double-sum
  * reassociation (~1e-17/iter) cannot amplify — round(…,6) output is
  * deterministic and the unrolled-CTE DuckDB oracle reproduces it
  * exactly.
  */
object ClusterOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private val Damping = 0.85
  private val PrIters = 10

  /** PageRank (damping 0.85, 10 fixed iterations) over the nation-level
    * trade graph: an edge src→dst when any supplier in src shipped a line
    * to a customer in dst. Oracle = the same recurrence unrolled into 11
    * chained CTEs. */
  val graphPagerank: Q = {
    val edgesSql =
      """edges AS (
        |  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey),
        |deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d
        |        FROM edges GROUP BY src),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nation),
        |r0 AS (SELECT n_name AS node, 1.0 / (SELECT n FROM nn) AS pr
        |       FROM nation)""".stripMargin
    val iterSql = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT base.node,
         |    0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(inc.s, 0.0) AS pr
         |  FROM r0 base LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.pr / deg.d) AS s
         |    FROM edges e
         |    JOIN r${i - 1} r ON e.src = r.node
         |    JOIN deg ON deg.src = e.src
         |    GROUP BY e.dst) inc ON base.node = inc.node)""".stripMargin
    }.mkString(",\n")
    Q(
      "graph_pagerank",
      s"""WITH $edgesSql,
         |$iterSql
         |SELECT node, ROUND(pr, 6) AS pr FROM r$PrIters ORDER BY node"""
        .stripMargin) { (s, dir) =>
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("src"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("dst"))
      val edges = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .select("src", "dst").distinct()
        // Round-17: materialize the loop-invariant edge table ONCE (the
        // Stage seam, the pcaProject precedent), PRE-PARTITIONED on the
        // iteration's aggregation key. Unstaged, the 4-join lineitem
        // pipeline was embedded in all 10 iteration plans — exec dedup
        // then hung on ReuseExchange firing, and the analyzer/optimizer
        // walked a 10×-nested plan every action (Profile at sf0.1:
        // build+plan 2.0–26 s, swinging with plan size). Staged behind
        // repartition(dst), the checkpointed blocks CARRY
        // HashPartitioning(dst), so each iteration's groupBy(dst) is
        // exchange-free; with the nation-bounded rank/degree state
        // broadcast, an iteration schedules ZERO exchanges. At 100 TB
        // the staged form guarantees one fact-table pass, reuse-rule or
        // not, and the per-iteration network cost is the dim-scale rank
        // broadcast only.
        .repartition(col("dst"))
        .staged
      val deg = edges.groupBy("src")
        .agg(count(lit(1)).cast("double").as("d"))
      val nodes = t(s, dir, "nation").select(col("n_name").as("node"))
      val n = nodes.count().toDouble
      var ranks = nodes.withColumn("pr", lit(1.0) / lit(n))
      for (_ <- 1 to PrIters) {
        val inc = edges
          .join(broadcast(ranks), edges("src") === ranks("node"))
          .join(broadcast(deg), "src")
          .groupBy(col("dst"))
          .agg(sum(col("pr") / col("d")).as("s"))
        // Stage the nation-bounded rank state each step (the label-
        // propagation lesson): un-truncated, iteration i's rank
        // broadcast re-executes iterations 1..i-1 inside its build;
        // staged, every iteration reads a flat checkpointed dim-scale
        // source and the 10-step plan stays one join deep.
        ranks = nodes
          .join(broadcast(inc), nodes("node") === inc("dst"), "left")
          .select(col("node"),
            (lit(0.15) / lit(n) + lit(Damping) * coalesce(col("s"), lit(0.0)))
              .as("pr"))
          .staged
      }
      ranks.select(col("node"), round(col("pr"), 6).as("pr")).orderBy("node")
    }
  }

  /** One unrolled Lloyd iteration of the DuckDB replay oracle — see
    * [[kmeansEmbed]]. Shared with AnnOps' IVF oracle (round-8), which
    * replays the same 3-iteration model before probing. */
  private[operators] def kmeansIterSql(n: Int): String = {
    val prev = s"c${n - 1}"
    s"""
       |s$n AS (
       |  SELECT e.vec_id, c.cid,
       |    list_sum(list_transform(range(1, len(e.v) + 1),
       |      i -> e.v[i] * c.cent[i]))
       |    - list_sum(list_transform(c.cent, x -> x * x)) / 2.0 AS sc
       |  FROM e CROSS JOIN $prev c),
       |a$n AS (
       |  SELECT vec_id, cid AS cluster_id FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sc DESC, cid)
       |        AS rk
       |    FROM s$n) t WHERE rk = 1),
       |m$n AS (
       |  SELECT a.cluster_id AS cid, unnest(range(1, len(e.v) + 1)) AS i,
       |         unnest(e.v) AS x
       |  FROM a$n a JOIN e USING (vec_id)),
       |n$n AS (
       |  SELECT cid, list(m ORDER BY i) AS cent FROM (
       |    SELECT cid, i, ROUND(AVG(x), 6) AS m FROM m$n GROUP BY cid, i) t
       |  GROUP BY cid),
       |c$n AS (
       |  SELECT p.cid, COALESCE(u.cent, p.cent) AS cent
       |  FROM $prev p LEFT JOIN n$n u ON u.cid = p.cid)""".stripMargin
  }

  /** Lloyd's k-means (k = 8, 3 fixed iterations) over the embedding table.
    * Deterministic: seeds are the 8 lowest vec_ids; assignment tie-breaks
    * to the lowest cluster id. The data never leaves the cluster — only
    * the k×d centroid model rides the driver between iterations.
    *
    * Oracled since round 7 (the PageRank recursive-CTE precedent): the
    * DuckDB oracle REPLAYS the full algorithm as 3 unrolled SQL
    * iterations — same seeds, same dot(v,c) − ‖c‖²/2 score with the same
    * lowest-cid tie-break, same keep-previous-centroid rule for emptied
    * clusters. Dot products iterate dimensions in index order in both
    * engines (bit-identical given identical centroids); centroid MEANS sum
    * members in engine-specific order, so BOTH engines round each
    * recomputed centroid component to 6 decimals between iterations
    * (round-8 ADVICE, the pcaProject normRound precedent) — the ~1e-15
    * reassociation drift lands on the same 1e-6 grid, so a flipped
    * assignment can no longer cascade through later iterations as sf
    * grows. Seeds stay raw (float→double is exact on both sides). 500/500
    * assignments matched at sf0.01 on first contact. KmeansSpec still
    * proves WCSS monotonicity, determinism, and non-empty clusters. */
  val kmeansEmbed = Q(
    "kmeans_embed",
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
       |    AS v
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
       |    AS cid, v AS cent
       |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8) t),${
      Seq(1, 2, 3).map(kmeansIterSql).mkString(",")}
       |SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id
       |FROM a3 ORDER BY vec_id""".stripMargin) { (s, dir) =>
    VectorOps.registerFns(s)
    import s.implicits._
    val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
    kmeansAssign(s, emb, k = 8, iters = 3)
      .select(col("vec_id"), col("cluster_id"))
      .orderBy("vec_id")
  }

  /** Shared k-means pipeline; returns (vec_id, cluster_id) after `iters`
    * Lloyd steps. Assignment maximizes dot(v,c) − ‖c‖²/2 (equivalent to
    * min squared euclidean; ‖v‖² is constant per row) in codegen'd
    * expressions; centroid recompute reuses the typed mean Aggregator. */
  def kmeansAssign(s: SparkSession, emb: DataFrame, k: Int, iters: Int)
      : DataFrame = kmeansFit(s, emb, k, iters)._1

  /** Above this k, cluster assignment switches from the k-way
    * array_max-of-structs EXPRESSION to the broadcast-matrix KERNEL: the
    * expression path materializes k struct literals + k dot_product calls
    * in one projection, which blows past whole-stage-codegen method limits
    * (and falls back to interpreted eval, ~k× slower) in the hundreds —
    * while large-k k-means (SemDeDup wants k ≈ n/1024, i.e. thousands at
    * millions of vectors) is exactly a dense k×d matrix-vector scoring
    * pass, the broadcast-matrix mapPartitions shape the similarity block
    * kernel already uses. Both paths share arithmetic (sequential
    * float→double MAC, score = dot − ‖c‖²/2) and the lowest-cid tie-break,
    * so the assignment is bit-identical (KmeansSpec pins it). */
  private val ExprPathMaxK = 32

  /** Broadcast-matrix nearest-centroid assignment for large k. */
  private def assignKernel(s: SparkSession, emb: DataFrame,
      cents: Array[(Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    val k = cents.length
    val cids = cents.map(_._1)
    val mat = cents.map(_._2.toArray)
    val half = mat.map(c => { var h = 0.0; var i = 0
      while (i < c.length) { h += c(i) * c(i); i += 1 }; h / 2.0 })
    val bc = s.sparkContext.broadcast((cids, mat, half))
    emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val (ids, m, hf) = bc.value
        it.map { case (id, v) =>
          val vv = v.toArray
          var best = Double.NegativeInfinity; var bestCid = Int.MaxValue
          var j = 0
          while (j < k) {
            val c = m(j)
            var dot = 0.0; var i = 0
            while (i < c.length && i < vv.length) {
              dot += vv(i).toDouble * c(i); i += 1
            }
            val sc = dot - hf(j)
            // Strictly-greater update, centroids visited in ascending cid
            // order == the expression path's max-(sc, -cid) tie-break.
            if (sc > best || (sc == best && ids(j) < bestCid)) {
              best = sc; bestCid = ids(j)
            }
            j += 1
          }
          (id, v, bestCid)
        }
      }.toDF("vec_id", "embedding", "cluster_id")
  }

  /** k-means returning BOTH the assignment and the final k centroids —
    * the centroid model is what an IVF index build consumes
    * ([[graft.operators.AnnOps.ivfKnn]]). `emb` must be exactly
    * (vec_id, embedding). */
  def kmeansFit(s: SparkSession, emb: DataFrame, k: Int, iters: Int,
      exprPathMaxK: Int = ExprPathMaxK,
      init: Option[Array[(Int, Seq[Double])]] = None)
      : (DataFrame, Array[(Int, Seq[Double])]) = {
    require(init.forall(_.length == k),
      s"init must carry exactly k=$k centroids")
    VectorOps.registerFns(s)
    import s.implicits._
    val centroidAgg = udaf(Udx.centroidAgg)
    def assignCol(cents: Array[(Int, Seq[Double])])(v: Column): Column = {
      val scored = cents.map { case (cid, c) =>
        val half = c.map(x => x * x).sum / 2.0
        struct(
          (call_function("dot_product", v, typedLit(c)) - lit(half)).as("sc"),
          lit(-cid).as("negcid"))
      }
      (-array_max(array(scored.toIndexedSeq: _*)).getField("negcid"))
        .as("cluster_id")
    }
    def assignDf(cents: Array[(Int, Seq[Double])]): DataFrame =
      if (cents.length <= exprPathMaxK)
        emb.withColumn("cluster_id", assignCol(cents)(col("embedding")))
      else assignKernel(s, emb, cents)
    // Custom init = Lloyd REFINEMENT from an existing model (the ANN
    // rebalance path, round-14): centroid ids are preserved by position,
    // so most assignments survive small drift and the rebalance rewrite
    // stays proportional to the drift, not the corpus.
    var cents: Array[(Int, Seq[Double])] = init.getOrElse(emb
      .orderBy("vec_id").limit(k)
      .select(col("embedding"))
      .as[Seq[Float]].collect()
      .zipWithIndex
      .map { case (v, i) => (i, v.map(_.toDouble)) })
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assignDf(cents)
      val recomputed = assigned.groupBy("cluster_id")
        .agg(centroidAgg(col("embedding")).as("c"))
        .as[(Int, Seq[Double])].collect().toMap
      // A cluster that received no points this iteration KEEPS its previous
      // centroid instead of vanishing — otherwise k silently shrinks for
      // all later iterations and for every downstream consumer (the IVF
      // build sizes its inverted lists off this model). Recomputed means
      // are rounded to the 1e-6 grid (round-8: pins the cross-engine
      // replay oracle against summation-order drift; see kmeansEmbed).
      cents = cents.map { case (cid, prev) =>
        (cid, recomputed.get(cid).map(_.map(x =>
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)).getOrElse(prev))
      }
    }
    (assigned, cents)
  }

  /** Within-cluster sum of squares for a (vec_id, embedding, cluster_id)
    * assignment against its centroids — the KmeansSpec convergence metric. */
  def wcss(s: SparkSession, assigned: DataFrame): Double = {
    VectorOps.registerFns(s)
    import s.implicits._
    val centroidAgg = udaf(Udx.centroidAgg)
    val cents = assigned.groupBy("cluster_id")
      .agg(centroidAgg(col("embedding")).as("c"))
      .as[(Int, Seq[Double])].collect().toMap
    val centLit = typedLit(cents.map { case (k0, v) => (k0, v) })
    assigned
      .select(
        (call_function("dot_product", col("embedding"), col("embedding"))
          - lit(2.0) * call_function("dot_product", col("embedding"),
              element_at(centLit, col("cluster_id")))
          + aggregate(element_at(centLit, col("cluster_id")),
              lit(0.0), (acc, x) => acc + x * x)).as("d2"))
      .agg(sum(col("d2"))).head.getDouble(0)
  }

  /** Raw-mean vector aggregator for the power iteration: same mergeable
    * (sums, n) state as Udx.centroidAgg but over double vectors and with
    * the ROUNDED-to-6 finish applied by the caller AFTER normalization
    * (rounding the unit vector, not the raw sums, is what pins
    * determinism across merge orders). */
  private val dMeanAgg: org.apache.spark.sql.expressions.Aggregator[
      Seq[Double], Udx.CentroidBuf, Seq[Double]] =
    new org.apache.spark.sql.expressions.Aggregator[
        Seq[Double], Udx.CentroidBuf, Seq[Double]] {
      override def zero: Udx.CentroidBuf = Udx.CentroidBuf(Array.empty, 0L)
      override def reduce(b: Udx.CentroidBuf, v: Seq[Double]): Udx.CentroidBuf =
        Udx.VecSum.add(b, v(_), v.length)
      override def merge(a: Udx.CentroidBuf, b: Udx.CentroidBuf): Udx.CentroidBuf =
        Udx.VecSum.merge(a, b)
      override def finish(r: Udx.CentroidBuf): Seq[Double] =
        r.sums.toSeq.map(_ / r.n)
      override def bufferEncoder: org.apache.spark.sql.Encoder[Udx.CentroidBuf] =
        org.apache.spark.sql.Encoders.product
      override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** PCA top principal component by distributed power iteration, declared
    * as the per-vector projection onto it (the 1-D reduced feature) plus
    * the explained-variance ratio — the whitening/compression precursor a
    * vector pipeline runs before quantization.
    *
    * Per iteration: v ← normalize(mean_i[(xᵢ−μ)·v (xᵢ−μ)]) — one keyed-less
    * but MERGEABLE (sums, n) aggregation; only the d-length direction ever
    * reaches the driver (same broadcast-model contract as k-means/IVF).
    * The unit vector is rounded to 6 decimals each step, which pins the
    * result across aggregation merge orders (double-sum reassociation
    * drifts ~1e-15, the rounding grid is 1e-6). Deterministic start
    * v₀ = 1/√d; sign canonicalized so the largest-|component| is positive.
    *
    * Oracled since round 8 (the kmeans/IVF replay precedent): the
    * recurrence is DRIFT-PROOF because every iteration re-rounds the unit
    * vector to the 1e-6 grid — cross-engine aggregation-order drift in
    * the per-dim means (~1e-15) cannot survive normalization + rounding,
    * so both engines walk identical v's. The DuckDB oracle unrolls the 8
    * iterations as CTEs over exploded (dim, value) rows; μ stays
    * unrounded on both sides (its ~1e-16 drift is absorbed by the
    * rounded-6 outputs). KmeansSpec still asserts recovery of a planted
    * dominant axis and the projection laws. */
  val pcaPowerEmbed = Q(
    "pca_power_embed",
    { val iters = (1 to 8).map { k =>
        val prev = s"v${k - 1}"
        // t_k(i) = mean over docs of c[i]·(c·v_{k-1}); v_k = round(t/‖t‖).
        s"""pr$k AS (
           |  SELECT vec_id,
           |    list_sum(list_transform(range(1, len(c) + 1),
           |      i -> c[i] * u[i])) AS p
           |  FROM cent CROSS JOIN $prev),
           |t$k AS (
           |  SELECT ce.i, AVG(ce.x * pr.p) AS t
           |  FROM (SELECT vec_id, unnest(c) AS x,
           |          unnest(range(1, len(c) + 1)) AS i FROM cent) ce
           |  JOIN pr$k pr USING (vec_id) GROUP BY ce.i),
           |n$k AS (SELECT SQRT(SUM(t * t)) AS nrm FROM t$k),
           |v$k AS MATERIALIZED (
           |  SELECT list(ROUND(t / (SELECT nrm FROM n$k), 6) ORDER BY i)
           |    AS u
           |  FROM t$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
         |    AS v
         |  FROM embeddings),
         |mu AS MATERIALIZED (
         |  SELECT list(m ORDER BY i) AS mu FROM (
         |    SELECT i, AVG(x) AS m FROM (
         |      SELECT unnest(v) AS x, unnest(range(1, len(v) + 1)) AS i
         |      FROM e) t GROUP BY i) t2),
         |cent AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(range(1, len(v) + 1),
         |      i -> v[i] - mu[i]) AS c
         |  FROM e CROSS JOIN mu),
         |v0 AS MATERIALIZED (
         |  SELECT list_transform(range(1, len(mu) + 1),
         |    i -> ROUND(1.0 / SQRT(CAST(len(mu) AS DOUBLE)), 6)) AS u
         |  FROM mu),
         |$iters,
         |piv AS (
         |  SELECT u[i] AS pval FROM v8,
         |    (SELECT i FROM (SELECT unnest(range(1, len(u) + 1)) AS i,
         |       unnest(u) AS x FROM v8) t ORDER BY ABS(x) DESC, i LIMIT 1) m
         |  ),
         |vf AS MATERIALIZED (
         |  SELECT CASE WHEN (SELECT pval FROM piv) < 0
         |    THEN list_transform(u, x -> -x) ELSE u END AS u FROM v8),
         |proj AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_sum(list_transform(range(1, len(c) + 1),
         |      i -> c[i] * u[i])) AS p,
         |    list_sum(list_transform(c, x -> x * x)) AS n2
         |  FROM cent CROSS JOIN vf),
         |evr AS (
         |  SELECT CASE WHEN AVG(n2) = 0 THEN 0.0
         |    ELSE ROUND(AVG(p * p) / AVG(n2), 6) END AS evr FROM proj)
         |SELECT vec_id, ROUND(p, 6) AS pc1_proj,
         |  (SELECT evr FROM evr) AS evr
         |FROM proj ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
    VectorOps.registerFns(s)
    pcaProject(s, t(s, dir, "embeddings").select("vec_id", "embedding"))
  }

  /** Shared PCA pipeline: returns (vec_id, pc1_proj, evr). */
  def pcaProject(s: SparkSession, emb: DataFrame, iters: Int = 8): DataFrame = {
    VectorOps.registerFns(s)
    import s.implicits._
    val agg = udaf(dMeanAgg)
    val asD = expr("transform(embedding, x -> cast(x as double))")
    val mu = emb.select(agg(asD).as("mu")).as[Seq[Double]].head()
    // Materialize the centered working set ONCE (eager localCheckpoint,
    // blocks freed by the ContextCleaner): every power iteration is a full
    // corpus pass, and re-reading parquet + re-centering 8× dominated the
    // 10× scale run (~60 s). Caching the iteration working set is the
    // standard iterative-ML shape — the k×1 model rides the driver, the
    // data stays put in executor storage.
    val centeredDf = emb.select(col("vec_id"),
        zip_with(asD, typedLit(mu), (a, b) => a - b).as("c"))
      .staged
    val centered = col("c")
    def normRound(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      val u = if (n == 0.0) v.map(_ => 0.0) else v.map(_ / n)
      u.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }
    var v: Seq[Double] = normRound(Seq.fill(mu.length)(1.0))
    for (_ <- 1 to iters) {
      // Hoist the projection OUT of the element lambda: inside transform
      // it would re-evaluate the full d-length dot product once per array
      // element (O(d²) per row).
      val p = call_function("dot_product", centered, typedLit(v))
      val scaled = transform(centered, c => c * p)
      v = normRound(centeredDf.select(agg(scaled).as("t"))
        .as[Seq[Double]].head())
    }
    // Sign canonicalization: largest-|component| positive.
    val pivot = v.maxBy(math.abs)
    if (pivot < 0) v = v.map(-_)
    // λ = mean squared projection, total variance = mean ‖c‖²; their ratio
    // is the explained-variance share of the recovered axis.
    val proj = call_function("dot_product", centered, typedLit(v))
    val stats = centeredDf.select(
      avg(proj * proj).as("lambda"),
      avg(call_function("dot_product", centered, centered)).as("tot"))
      .head()
    // Degenerate corpus (every vector == mean) has zero total variance;
    // report evr 0 rather than NaN (NaN sorts above everything in Spark).
    val evr =
      if (stats.getDouble(1) == 0.0) 0.0
      else BigDecimal(stats.getDouble(0) / stats.getDouble(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    centeredDf.select(col("vec_id"), round(proj, 6).as("pc1_proj"),
        lit(evr).as("evr"))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(graphPagerank, kmeansEmbed, pcaPowerEmbed)
}
