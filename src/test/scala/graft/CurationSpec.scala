package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** Third-wave curation operators (round 5): per-domain caps, hashed linear
  * scoring, SemDeDup semantic dedup. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("domainCap: respects the cap, keeps whole domains under it, and is " +
    "deterministic") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CurationOps.domainCap(docs, cap = 5).collect()
    val bySource = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource.values.forall(_ <= 5))
    val counts = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    counts.foreach { case (src, n) =>
      assert(bySource.getOrElse(src, 0) == math.min(n, 5L).toInt)
    }
    val again = CurationOps.domainCap(docs, cap = 5).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq ==
      again.map(_.getLong(0)).sorted.toSeq)
  }

  test("domainCap: picked set is cap-monotone (cap 3 picks ⊆ cap 7 picks)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val small = CurationOps.domainCap(docs, 3).select("doc_id")
      .as[Long].collect().toSet
    val big = CurationOps.domainCap(docs, 7).select("doc_id")
      .as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("qualityScoreLinear: deterministic, bounded in [-1, 1], exact token " +
    "count, and token-content-sensitive") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = CurationOps.qualityScoreLinear(docs).orderBy("doc_id").collect()
    val b = CurationOps.qualityScoreLinear(docs).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall { r =>
      val s = r.getDouble(3); s >= -1.0 && s <= 1.0
    })
    // A doc of one known token scores exactly that token's bucket weight.
    val one = CurationOps.qualityScoreLinear(
      Seq((1L, "hello")).toDF("doc_id", "text")).head()
    assert(one.getLong(1) == 1L)
    assert(one.getDouble(3) == one.getLong(2).toDouble / 1000.0)
    // Different tokens land in different buckets w.h.p. → different sums.
    val two = CurationOps.qualityScoreLinear(
      Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(two(0).getLong(2) != two(1).getLong(2))
  }

  test("temperature resample: q sums to 1 and flattens toward the mean " +
    "(down-samples dominant languages, up-samples rare ones)") {
    val out = operators.CurationOps.temperatureResample
      .fn(spark, sfDir).collect()
    val qSum = out.map(_.getDouble(3)).sum
    assert(math.abs(qSum - 1.0) < 1e-4, s"q_share sum=$qSum")
    // Token-budget preservation: the p-weighted mean factor is exactly 1
    // (Σ p·(q/p) = Σ q = 1) — resampling reshapes the mixture without
    // changing the total token budget.
    val budget = out.map(r => r.getDouble(2) * r.getDouble(4)).sum
    assert(math.abs(budget - 1.0) < 1e-4, s"p-weighted factor sum=$budget")
    // τ<1 flattening: the factor is strictly decreasing in p (rarer
    // languages up-sample relative to dominant ones).
    val byP = out.sortBy(_.getDouble(2)).toSeq
    byP.sliding(2).foreach { w =>
      if (w.length == 2 && w(0).getDouble(2) < w(1).getDouble(2))
        assert(w(0).getDouble(4) > w(1).getDouble(4),
          s"${w(0).getString(0)} vs ${w(1).getString(0)}")
    }
  }

  test("semanticDedup: planted clones drop, lowest id survives") {
    val base = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(40)
    // Clone vec 3 under ids 1003 and 2003: cosine(clone, original) = 1.
    val clones = base.filter($"vec_id" === 3L)
      .select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
      .union(base.filter($"vec_id" === 3L)
        .select(($"vec_id" + 2000L).as("vec_id"), $"embedding"))
    val all = base.union(clones)
    val out = CurationOps.semanticDedup(spark, all, threshold = 0.999, k = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(out.contains(3L))
    assert(!out.contains(1003L) && !out.contains(2003L))
    assert(out.size == 40)
  }

  test("semanticDedup: impossible threshold drops nothing") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(30)
    val out = CurationOps.semanticDedup(spark, emb, threshold = 1.1, k = 4)
    assert(out.count() == 30L)
  }

  test("semanticDedup: k=1 equals the full-pairwise greedy filter") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(60)
    val th = 0.4
    val semantic = CurationOps.semanticDedup(spark, emb, th, k = 1)
      .select("vec_id").as[Long].collect().toSet
    // Brute-force greedy: drop any id with a lower-id neighbor ≥ th.
    // (cosine_sim is session-registered via GraftExtensions.)
    val a = emb.select($"vec_id".as("a_id"), $"embedding".as("ea"))
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("eb"))
    val droppedBrute = a.crossJoin(b).filter($"a_id" < $"b_id")
      .filter(call_function("cosine_sim", $"ea", $"eb") >= th)
      .select($"b_id").as[Long].collect().toSet
    val expected = emb.select("vec_id").as[Long].collect().toSet -- droppedBrute
    assert(semantic == expected)
  }
}
