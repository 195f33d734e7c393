package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor scale paths for embedding similarity
  * (SURVEY §2-K3 "scale path"; PAPERS.md top-k similarity line).
  *
  * Two standard index structures, both pure DataFrame + codegen
  * expressions, both deterministic:
  *
  *  - **SRP-LSH** (signed random projections): `nBits` deterministic
  *    hyperplanes → per-vector bit signature → banded bucket keys →
  *    equi-join candidates → exact cosine re-rank. Cross-join-free: the
  *    only shuffle is the (band, bucket) equi-join — the 100 TB shape.
  *  - **IVF** (inverted file): per-cluster centroids → each vector assigned
  *    to its nearest centroid (the inverted lists) → a query probes the
  *    `nProbe` nearest lists only. At 100 TB the lists are Hive/parquet
  *    partitions keyed by centroid id, so probing = partition pruning.
  *
  * Recall vs the exact kernel is asserted in AnnSpec (no SQL oracle —
  * approximate results; the exact baselines remain the verified truth).
  */
object AnnOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  private def planeComponent(plane: Int, dim: Int): Double = {
    // splitmix64-style scramble of (plane, dim) — stable across JVMs.
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z.toDouble / Long.MaxValue.toDouble)
  }

  private def plane(i: Int, dims: Int): Seq[Double] =
    (0 until dims).map(j => planeComponent(i, j))

  /** Bit signature column: bit i = (v · plane_i) > 0, packed per band. */
  private def bandKeys(s: SparkSession, v: Column, nBits: Int, bands: Int,
      dims: Int): Seq[Column] = {
    val bitsPerBand = nBits / bands
    (0 until bands).map { b =>
      (0 until bitsPerBand).map { i =>
        val p = typedLit(plane(b * bitsPerBand + i, dims))
        when(call_function("dot_product", v, p) > 0d,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
  }

  /** Shared SRP-LSH candidate → exact-rerank pipeline (also used by
    * AnnSpec). Returns the approximate global top-k pairs. */
  def lshTopKPairs(s: SparkSession, emb: DataFrame, k: Int, nBits: Int = 48,
      bands: Int = 8, dims: Int = 64): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    // 6-bit bands: for a sim≈0.4 pair the per-bit collision prob is ~0.63
    // (1 - acos(s)/π), so P(candidate) ≈ 1-(1-0.63^6)^8 ≈ 0.4, while random
    // near-orthogonal pairs collide at ~0.5^6 per band → ~12% candidate
    // volume. Tune bits/bands per corpus similarity profile.
    VectorOps.registerFns(s)
    val cands = srpCandidatePairs(s, emb, nBits, bands, dims)
    rejoinCosine(emb, cands)
      .select(col("a_id"), col("b_id"),
        round(col("sim_raw"), 6).as("sim"))
      .orderBy(col("sim").desc, col("a_id"), col("b_id"))
      .limit(k)
  }

  /** Banded SRP candidate generation carrying ONLY ids: the band equi-join
    * and the (a_id, b_id) distinct shuffle 24-byte rows, never embedding
    * payloads. The round-4 10× scale run caught the payload-carrying
    * version shuffling ~27 GB of duplicated vectors through the candidate
    * dedup (665 s on one stage at 20 k vecs with planted clone cliques);
    * id-only candidates are the 100 TB shape — vectors re-join AFTER the
    * dedup, touching each surviving pair once. */
  private def srpCandidatePairs(s: SparkSession, emb: DataFrame,
      nBits: Int, bands: Int, dims: Int): DataFrame = {
    val keys = bandKeys(s, col("embedding"), nBits, bands, dims)
    val banded = emb.select(col("vec_id"), posexplode(array(keys: _*)))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("vec_id").as("a_id"))
    val b = banded.select(col("band"), col("bucket"), col("vec_id").as("b_id"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
  }

  /** Re-join the vector table to an (a_id, b_id) candidate set and attach
    * the exact cosine as `sim_raw` — two equi-joins on id keys. */
  private def rejoinCosine(emb: DataFrame, cands: DataFrame): DataFrame = {
    val ea = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val eb = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    cands.join(ea, "a_id").join(eb, "b_id")
      .withColumn("sim_raw", call_function("cosine_sim", col("ea"), col("eb")))
  }

  /** Threshold twin of [[lshTopKPairs]]: ALL candidate pairs whose exact
    * cosine clears `threshold` (no top-k cut). This is the bucketed scale
    * path [[graft.operators.VectorOps.dedupEmbeddingPairs]] reroutes to
    * above its exact-quadratic bound — the only shuffles are the band-key
    * equi-join and the candidate distinct, never a cross join. */
  def lshThresholdPairs(s: SparkSession, emb: DataFrame, threshold: Double,
      nBits: Int = 48, bands: Int = 8, dims: Int = 64): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    VectorOps.registerFns(s)
    val cands = srpCandidatePairs(s, emb, nBits, bands, dims)
    rejoinCosine(emb, cands)
      .filter(col("sim_raw") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("sim_raw"), 6).as("sim"))
      .orderBy("a_id", "b_id")
  }

  /** K3-scale — approximate top-k most-similar pairs via banded SRP-LSH. */
  val annLshTopK = Q.noOracle("ann_lsh_topk") { (s, dir) =>
    lshTopKPairs(s, t(s, dir, "embeddings"), k = 100)
  }

  /** Shared IVF pipeline: k-means centroid build (ClusterOps.kmeansFit,
    * no label column consumed), nearest-centroid assignment, nProbe-list
    * probing, exact re-rank. */
  def ivfKnn(s: SparkSession, emb: DataFrame, queryId: Long, k: Int,
      nProbe: Int = 3, nLists: Int = 8): DataFrame = {
    VectorOps.registerFns(s)
    import s.implicits._
    // Index build: k-means centroids (ClusterOps.kmeansFit — deterministic
    // seeding, empty clusters keep their previous centroid). A real corpus
    // has no label column, so the coarse quantizer must be LEARNED; the
    // k×d model is a bounded driver-held index constant, the standard IVF
    // build shape.
    val centroids = ClusterOps.kmeansFit(s,
      emb.select(col("vec_id"), col("embedding")), k = nLists, iters = 3)
      ._2.sortBy(_._1)
    // Assignment expression: argmax over centroid dot products (vectors
    // are ~unit-scale; production would normalize both sides).
    def assignExpr(v: Column): Column = {
      val scored = centroids.map { case (cid, c) =>
        struct(call_function("dot_product", v, typedLit(c)).as("sim"),
          lit(cid).as("cid"))
      }
      array_max(array(scored: _*)).getField("cid")
    }
    val assigned = emb.withColumn("list_id", assignExpr(col("embedding")))
    // Query probe: rank centroids against the query vector, take nProbe.
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    val qVec = q.as[Seq[Float]].head()
    val probeLists = centroids.map { case (cid, c) =>
      val dot = c.zip(qVec).map { case (x, y) => x * y.toDouble }.sum
      (cid, dot)
    }.sortBy(-_._2).take(nProbe).map(_._1)
    assigned
      .filter(col("list_id").isin(probeLists: _*))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("list_id"),
        round(call_function("cosine_sim", col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** K4-scale — approximate kNN of one query via IVF probing. */
  val annIvfKnn = Q.noOracle("ann_ivf_knn") { (s, dir) =>
    ivfKnn(s, t(s, dir, "embeddings"), queryId = 0L, k = 20)
  }

  /** Shared product-quantization (PQ) kNN pipeline: per-subspace codebooks
    * (deterministic md5-sampled seeds + one Lloyd refinement, built with
    * the same centroid Aggregator as IVF), asymmetric-distance (ADC) scan
    * against a broadcast lookup table, exact cosine re-rank of the top
    * candidates.
    *
    * 100 TB shape: the index build is a handful of small aggregates (the
    * codebooks are m·ksub·dsub doubles — kilobytes, driver-held like the
    * IVF centroids); the query is ONE map-side scan computing
    * Σ_m lut[m][code_m(x)] in codegen (no shuffle), a TakeOrdered of
    * `nCandidates`, then an exact re-rank of candidates only. In a
    * production layout the codes (m bytes/vector, 8 vs 256 bytes here)
    * are precomputed once at ingest — 32× less scan I/O than raw floats;
    * here encode+scan fuse into one pass for the declared query. */
  def pqKnn(s: SparkSession, emb: DataFrame, queryId: Long, k: Int,
      m: Int = 8, dsub: Int = 8, ksub: Int = 16,
      nCandidates: Int = 100): DataFrame = {
    VectorOps.registerFns(s)
    import s.implicits._
    // --- index build (driver-side constants, as with the IVF centroids) ---
    val seedIds = emb.select(col("vec_id"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(ksub).as[Long].collect().sorted.toSeq
    val seeds = emb.filter(col("vec_id").isin(seedIds: _*))
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().sortBy(_._1).map(_._2)
    var codebooks: Array[Array[Seq[Double]]] =
      Array.tabulate(m)(mm => Array.tabulate(ksub)(j =>
        seeds(j).slice(mm * dsub, (mm + 1) * dsub).map(_.toDouble).toSeq))
    def subCol(mm: Int): Column = slice(col("embedding"), mm * dsub + 1, dsub)
    // argmin ||x-c||² == argmax (x·c − ||c||²/2); ties break to the higher
    // code via the struct max — deterministic either way.
    def codeCol(mm: Int, cb: Array[Array[Seq[Double]]]): Column = {
      val scored = (0 until ksub).map { j =>
        val c = cb(mm)(j)
        val half = c.map(x => x * x).sum / 2.0
        struct((call_function("dot_product", subCol(mm), typedLit(c)) - half)
          .as("s"), lit(j).as("code"))
      }
      array_max(array(scored: _*)).getField("code")
    }
    val centroid = udaf(Udx.centroidAgg)
    codebooks = Array.tabulate(m) { mm =>
      val means = emb
        .select(codeCol(mm, codebooks).as("code"), subCol(mm).as("sub"))
        .groupBy("code").agg(centroid(col("sub")).as("c"))
        .as[(Int, Seq[Double])].collect().toMap
      // Empty clusters keep their seed centroid.
      Array.tabulate(ksub)(j => means.getOrElse(j, codebooks(mm)(j)))
    }
    // --- query: ADC lookup table + fused encode-and-score scan ---
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    val qVec = q.as[Seq[Float]].head()
    val lut: Array[Seq[Double]] = Array.tabulate(m) { mm =>
      (0 until ksub).map { j =>
        codebooks(mm)(j).zipWithIndex
          .map { case (c, i) => c * qVec(mm * dsub + i) }.sum
      }
    }
    val adc = (0 until m).map { mm =>
      element_at(typedLit(lut(mm)), codeCol(mm, codebooks) + 1)
    }.reduce(_ + _)
    emb.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("embedding"), adc.as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(nCandidates)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("qe")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** K4-scale — approximate kNN via PQ codes + ADC (the byte-budget
    * complement to IVF's partition pruning). */
  val annPqKnn = Q.noOracle("ann_pq_knn") { (s, dir) =>
    pqKnn(s, t(s, dir, "embeddings"), queryId = 0L, k = 20)
  }

  val all: Seq[Q] = Seq(annLshTopK, annIvfKnn, annPqKnn)
}
