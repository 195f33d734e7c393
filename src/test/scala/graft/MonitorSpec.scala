package graft

import graft.operators.MonitorOps

/** Behavior laws for the wave-22 dedup recall monitor. */
class MonitorSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    // Two identical docs (j = 1.0, every band collides -> must be
    // recalled), one near pair sharing most shingles, and noise docs.
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "one two three four five six seven eight"),
      (5L, "red orange yellow green blue indigo violet umber"),
      (6L, "cat dog bird fish horse sheep goat cow")
    ).toDF("doc_id", "text")
  }

  test("monitor: identical pair always recalled, precision structurally 1") {
    val out = MonitorOps.dedupRecall(corpus(), 0.4).collect()
    assert(out.length == 1)
    val r = out.head
    val (nT, nP, nH) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nT >= 2, s"truth must contain the planted pairs, got $nT")
    assert(nH >= 1, "the identical pair collides in every band")
    assert(nH <= math.min(nT, nP))
    // Every predicted pair is exact-Jaccard verified at the same
    // threshold, so predicted is a subset of truth.
    assert(r.getDouble(4) == 1.0, s"precision ${r.getDouble(4)}")
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("monitor: deterministic, and shipped corpus report is coherent") {
    val a = MonitorOps.dedupRecallReport.fn(spark, sfDir).collect()
    val b = MonitorOps.dedupRecallReport.fn(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val r = a.head
    assert(r.getLong(2) <= math.min(r.getLong(0), r.getLong(1)))
  }
}
