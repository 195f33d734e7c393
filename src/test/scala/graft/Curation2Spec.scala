package graft

import graft.operators.{CurationOps2, VectorOps}
import org.apache.spark.sql.functions._

/** Fourth-wave curation operators (round 5): hash splits, sharded shuffle,
  * embedding decontamination. The oracled properties (exact values vs
  * DuckDB) are the driver's; these pin the semantic properties the oracle
  * can't express. */
class Curation2Spec extends SparkSpec {
  import spark.implicits._

  test("splitHash: partitions the corpus, is deterministic, and lands near " +
    "the designed 93.75/3.125/3.125 fractions") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CurationOps2.splitHash(docs).collect()
    assert(out.length == docs.count())
    val bySplit = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    val n = out.length.toDouble
    // 500 docs, p=0.9375: a ±6 sigma band is ~±0.07 — loose but real.
    assert(bySplit("train") / n > 0.85 && bySplit("train") / n < 0.99)
    val again = CurationOps2.splitHash(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq)
  }

  test("splitHash: assignment depends only on doc_id — stable under " +
    "corpus growth (subset invariance)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val full = CurationOps2.splitHash(docs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val half = CurationOps2.splitHash(docs.filter($"doc_id" % 2 === 0))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    half.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("shardShuffle: positions are contiguous 1..n per shard, shards " +
    "cover the corpus, and the order is deterministic") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CurationOps2.shardShuffle(docs).collect()
    assert(out.length == docs.count())
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val pos = rows.map(_.getLong(2)).sorted
      assert(pos.toSeq == (1L to rows.length).toSeq,
        "pos_in_shard must be a contiguous rank")
    }
    val again = CurationOps2.shardShuffle(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
  }

  test("shardShuffle: 16-shard variant nests the 256-shard one " +
    "(first-nibble prefix consistency)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val s256 = CurationOps2.shardShuffle(docs, 256)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    val s16 = CurationOps2.shardShuffle(docs, 16)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    s16.foreach { case (id, s) => assert(s256(id) / 16 == s) }
  }

  test("decontaminateEmbedding: a planted eval clone is dropped, survivors " +
    "exclude the eval set, and threshold is monotone") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // Plant: give corpus vec 5000 the exact embedding of eval vec 97.
    val clone = emb.filter($"vec_id" === 97L)
      .select(lit(5000L).as("vec_id"), $"embedding", $"label")
    val planted = emb.unionByName(clone)
    val surv = CurationOps2.decontaminateEmbedding(spark, planted, 0.45)
      .as[Long].collect().toSet
    assert(!surv.contains(5000L), "exact eval clone must be dropped")
    assert(surv.forall(_ % 97 != 0), "eval rows are not corpus output")
    val loose = CurationOps2.decontaminateEmbedding(spark, planted, 0.99)
      .as[Long].collect().toSet
    assert(surv.subsetOf(loose), "lower threshold drops at least as much")
  }

  test("decontaminateEmbedding: LSH reroute (eval past broadcast bound) " +
    "still drops the planted clone") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val clone = emb.filter($"vec_id" === 97L)
      .select(lit(5000L).as("vec_id"), $"embedding", $"label")
    val planted = emb.unionByName(clone)
    val surv = CurationOps2.decontaminateEmbedding(spark, planted, 0.45,
      maxBroadcastEval = 0L).as[Long].collect().toSet
    assert(!surv.contains(5000L), "reroute must still catch the exact clone")
    assert(surv.forall(_ % 97 != 0))
  }
}
