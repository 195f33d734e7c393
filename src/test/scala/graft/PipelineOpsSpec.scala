package graft

import graft.operators.PipelineOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-7 pipeline pack: chunk reassembly, pooling
  * arithmetic, negative-mining invariants, salt-invariance, session gap
  * semantics, and compaction-plan coverage. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rag_chunk_split: overlapped chunks reassemble every document exactly") {
    val chunks = PipelineOps.ragChunkSplit.fn(spark, sfDir)
      .select($"doc_id", $"chunk_id", $"chunk").as[(Long, Long, String)]
      .collect().groupBy(_._1)
    val texts = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(chunks.keySet == texts.keySet) // every doc yields >= 1 chunk
    texts.foreach { case (id, text) =>
      val ordered = chunks(id).sortBy(_._2).map(_._3.split(" ").toSeq)
      // stride 15, window 20: drop the 5-token overlap on every chunk
      // after the first, and the original token stream reappears.
      val rebuilt = ordered.head ++ ordered.tail.flatMap(_.drop(5))
      assert(rebuilt == text.split(" ").toSeq, s"doc $id reassembly")
      ordered.init.foreach(c => assert(c.length == 20))
      assert(ordered.last.length <= 20 && ordered.last.nonEmpty)
    }
  }

  test("embedding_pool_mean: matches a driver-side recomputation") {
    val out = PipelineOps.embeddingPoolMean.fn(spark, sfDir).collect()
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select($"label", $"embedding").as[(Int, Seq[Float])].collect()
    val dims = vecs.head._2.length
    assert(out.length == vecs.map(_._1).distinct.length * dims)
    out.take(8).foreach { r =>
      val (label, dim, n, mean) =
        (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      val grp = vecs.filter(_._1 == label)
      assert(n == grp.length)
      val exact = grp.map(_._2(dim).toDouble).sum / grp.length
      assert(math.abs(mean - exact) < 1e-6, s"label $label dim $dim")
    }
  }

  test("hard negatives: wrong-label only, ranked by similarity, k per anchor") {
    val out = PipelineOps.mineHardNegatives.fn(spark, sfDir).collect()
    val labels = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val byAnchor = out.groupBy(_.getLong(0))
    assert(byAnchor.keySet == Set(1L, 2L, 3L, 4L, 5L))
    byAnchor.foreach { case (a, rs) =>
      assert(rs.length == 3)
      rs.foreach(r => assert(r.getInt(2) != labels(a))) // label mismatch
      val sims = rs.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq
      assert(sims == sims.sorted.reverse)
      sims.foreach(s => assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
    }
  }

  test("salted join: answer identical to the plain unsalted join") {
    val salted = PipelineOps.joinSkewSalted.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Parity.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == plain)
  }

  test("session gaps: intra-session gaps <= 30 min, sessions partition events") {
    val out = PipelineOps.eventsSessionGaps.fn(spark, sfDir).collect()
    val nEvents = Tables.load(spark, sfDir, "events").count()
    assert(out.map(_.getLong(2)).sum == nEvents)
    val events = Tables.load(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts").as("us"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val gapUs = 1800000000L
    out.groupBy(_.getLong(0)).foreach { case (user, sessions) =>
      val sorted = sessions.sortBy(_.getLong(1))
      // sessions are disjoint in time and separated by > 30 min
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = a.getTimestamp(4).getTime * 1000
          val bStart = b.getTimestamp(3).getTime * 1000
          assert(bStart - aEnd > gapUs, s"user $user adjacent sessions")
        case _ =>
      }
      // within a session the max gap between CONSECUTIVE events <= 30 min
      // (weak form via duration: duration <= (n-1) * gap)
      sorted.foreach { r =>
        assert(r.getLong(5) <= (r.getLong(2) - 1) * gapUs)
      }
      assert(sorted.map(_.getLong(2)).sum == events(user).length)
    }
  }

  test("compaction plan: buckets tile each partition's file range, bytes conserve") {
    val out = PipelineOps.tableCompactionPlan.fn(spark, sfDir).collect()
    val li = Tables.load(spark, sfDir, "lineitem")
    val files = li.groupBy(year(col("l_shipdate")).as("y"),
        (col("l_orderkey") / 1000).cast("long").as("f"))
      .agg((count(lit(1)) * 128).as("b")).collect()
    val totBytes = files.map(_.getLong(2)).sum
    assert(out.map(_.getLong(3)).sum == totBytes)
    assert(out.map(_.getLong(2)).sum == files.length)
    out.groupBy(_.getInt(0)).foreach { case (_, buckets) =>
      val sorted = buckets.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => // file ranges ordered and non-overlapping
          assert(a.getLong(5) < b.getLong(4))
        case _ =>
      }
    }
  }
}
