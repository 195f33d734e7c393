package graft

import org.apache.spark.sql.functions._

/** Lloyd's k-means invariants the no-oracle declared query rests on:
  * WCSS never increases across iterations, the assignment is deterministic
  * under repartitioning, and no cluster collapses empty on this data. */
class KmeansSpec extends SparkSpec {

  private def emb = Tables.load(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")

  test("wcss is non-increasing across Lloyd iterations") {
    val w = (1 to 3).map { it =>
      operators.ClusterOps.wcss(spark,
        operators.ClusterOps.kmeansAssign(spark, emb, k = 8, iters = it))
    }
    assert(w(1) <= w(0) + 1e-9 && w(2) <= w(1) + 1e-9, s"wcss=$w")
  }

  test("assignment is deterministic under repartitioning") {
    val a = operators.ClusterOps.kmeansAssign(spark, emb, 8, 3)
      .select("vec_id", "cluster_id").orderBy("vec_id").collect()
    val b = operators.ClusterOps.kmeansAssign(spark, emb.repartition(7), 8, 3)
      .select("vec_id", "cluster_id").orderBy("vec_id").collect()
    assert(a.sameElements(b))
  }

  test("large-k broadcast-matrix assignment kernel is bit-identical to " +
    "the expression path") {
    // Same k, both paths forced explicitly: exprPathMaxK above k takes the
    // array_max-of-structs expression, 0 takes the mapPartitions kernel.
    // Assignments (and therefore the fitted centroids) must agree exactly —
    // shared MAC order, shared lowest-cid tie-break.
    val (aDf, aCents) =
      operators.ClusterOps.kmeansFit(spark, emb, k = 12, iters = 3,
        exprPathMaxK = 32)
    val (bDf, bCents) =
      operators.ClusterOps.kmeansFit(spark, emb, k = 12, iters = 3,
        exprPathMaxK = 0)
    val a = aDf.select("vec_id", "cluster_id").orderBy("vec_id").collect()
    val b = bDf.select("vec_id", "cluster_id").orderBy("vec_id").collect()
    assert(a.sameElements(b))
    assert(aCents.toSeq == bCents.toSeq)
  }

  test("all 8 clusters are non-empty on the synthetic embeddings") {
    val n = SparkEntry.queries("kmeans_embed")(spark, sfDir)
      .select("cluster_id").distinct().count()
    assert(n == 8, s"expected 8 non-empty clusters, got $n")
  }

  test("pagerank ranks bounded: pr >= teleport floor, total <= 1") {
    // No dangling-mass redistribution in the declared recurrence: rank at
    // a no-outedge nation leaks, so total <= 1; the teleport term floors
    // every node at 0.15/n. (Exact values are driver-oracle-checked.)
    val rows = SparkEntry.queries("graph_pagerank")(spark, sfDir).collect()
    assert(rows.length == 25)
    val floor = 0.15 / 25 - 1e-9
    assert(rows.forall(_.getDouble(1) >= floor))
    val total = rows.map(_.getDouble(1)).sum
    assert(total <= 1.0 + 1e-6 && total >= 0.15, s"sum(pr)=$total")
  }

  test("pca power iteration recovers a planted dominant axis") {
    import spark.implicits._
    // Vectors ±t·e1 + small fixed off-axis wobble on e2: the top component
    // must align with e1 and explain almost all the variance.
    val rows = (0 until 64).map { i =>
      val t = if (i % 2 == 0) 10.0f + i else -(10.0f + i)
      (i.toLong, Seq(t, (i % 5) * 0.01f, 0.0f, 0.0f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = operators.ClusterOps.pcaProject(spark, emb).collect()
    val evr = out.head.getDouble(2)
    assert(evr > 0.999, s"evr=$evr")
    // Projections must reproduce each CENTERED vector's e1 coordinate
    // (global sign aside).
    val mean1 = rows.map(_._2.head.toDouble).sum / rows.size
    val byId = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      val expected = math.abs(v.head - mean1)
      assert(math.abs(math.abs(byId(id)) - expected) < 0.1,
        s"vec $id proj=${byId(id)} expected ±$expected")
    }
  }

  test("pca projection is deterministic under repartitioning") {
    val a = operators.ClusterOps.pcaProject(spark, emb).collect().toSeq
    val b = operators.ClusterOps.pcaProject(spark, emb.repartition(7))
      .collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
