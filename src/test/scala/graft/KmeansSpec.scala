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
}
