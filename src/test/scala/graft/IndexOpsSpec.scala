package graft

import graft.operators.{CurationOps3, IndexOps}
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-9 index-lifecycle pack. */
class IndexOpsSpec extends SparkSpec {

  test("segment merge: two interleaved segments rebuild the full index exactly") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merged = IndexOps.indexSegmentMerge.fn(spark, sfDir).collect()
    val full = CurationOps3.invertedIndex(docs).collect()
    assert(merged.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("segment merge: three-way batch composition is associative") {
    val docs = Tables.load(spark, sfDir, "documents")
    def seg(m: Int) =
      CurationOps3.invertedIndex(docs.filter(pmod(col("doc_id"), lit(3)) === m))
    val abThenC = IndexOps.mergeSegments(
      IndexOps.mergeSegments(seg(0), seg(1)), seg(2)).collect()
    val full = CurationOps3.invertedIndex(docs).collect()
    assert(abThenC.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("hybrid blend: normalized scores in [0,1], blend bounded and descending") {
    val out = IndexOps.searchHybridBlend.fn(spark, sfDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (blend, nbm, nvec) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(blend >= 0.0 && blend <= 1.0 + 1e-9)
      // -1 marks "absent from that retriever's top-50"
      assert(nbm == -1.0 || (nbm >= 0.0 && nbm <= 1.0 + 1e-9))
      assert(nvec == -1.0 || (nvec >= 0.0 && nvec <= 1.0 + 1e-9))
      val expected = 0.6 * math.max(nbm, 0.0) + 0.4 * math.max(nvec, 0.0)
      assert(math.abs(blend - math.rint(expected * 1e6) / 1e6) <= 1e-6)
    }
    val blends = out.map(_.getDouble(1)).toSeq
    assert(blends == blends.sorted.reverse)
    // The lexical top doc normalizes to exactly 1.0 and must surface.
    assert(out.exists(_.getDouble(2) == 1.0))
    assert(out.exists(_.getDouble(3) == 1.0))
  }

  test("recall report: internally consistent, nonvacuous recall floor") {
    val out = IndexOps.annRecallReport.fn(spark, sfDir).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(10, 50, 100))
    out.foreach { r =>
      val (k, n, rec) = (r.getInt(0), r.getLong(1), r.getDouble(2))
      assert(n >= 0 && n <= k)
      assert(math.abs(rec - math.rint(n.toDouble / k * 1e6) / 1e6) <= 1e-9)
    }
    // The LSH retrieval must find a nontrivial share of the exact head.
    assert(out.head.getDouble(2) >= 0.3)
  }
}
