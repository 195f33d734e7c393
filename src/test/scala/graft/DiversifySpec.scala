package graft

import graft.operators.DiversifyOps

/** Behavior laws for the wave-23 pack. */
class DiversifySpec extends SparkSpec {

  test("mmr: valid permutation of the bm25 top-20, head = best bm25") {
    val out = DiversifyOps.searchMmrDiversify.fn(spark, sfDir).collect()
    assert(out.length == 20)
    assert(out.map(_.getInt(0)).toSeq == (1 to 20).toSeq)
    assert(out.map(_.getLong(1)).distinct.length == 20)
    // First pick has no diversity penalty: it is the top-bm25 doc.
    val first = out.minBy(_.getInt(0))
    assert(first.getDouble(2) == out.map(_.getDouble(2)).max)
    // Scores weakly decrease is NOT guaranteed by MMR; but every
    // mmr_score is bounded by lambda * its own relevance.
    // Both columns are independently rounded to 6 decimals, so allow a
    // rounding grain of slack on the bound.
    out.foreach(r => assert(r.getDouble(3) <= 0.7 * r.getDouble(2) + 2e-6))
    // Deterministic.
    val again = DiversifyOps.searchMmrDiversify.fn(spark, sfDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mmr: diversity penalty actually demotes (some rank differs from bm25 order)") {
    val out = DiversifyOps.searchMmrDiversify.fn(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    val byBm25 = out.sortBy(r => (-r.getDouble(2), r.getLong(1)))
      .map(_.getLong(1)).toSeq
    assert(out.map(_.getLong(1)).toSeq != byBm25,
      "MMR must reorder a clone-heavy candidate list (if this corpus " +
        "ever becomes clone-free the fixture needs planted clones)")
  }

  test("merge-schema read: union schema, v1 rows carry null lang") {
    val out = DiversifyOps.scanMergeSchema.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(out("v1")._1 + out("v2")._1 == total)
    assert(out("v1")._1 == out("v1")._2, "every v1 row lacks lang")
    assert(out("v2")._2 == 0L, "every v2 row has lang")
    assert(out("v1")._3 == 3 && out("v2")._3 == 3, "union schema visible")
  }
}
