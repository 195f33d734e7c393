package graft

import graft.operators.MlOps

/** Behavior laws for the wave-12 model-tooling pack. */
class MlSpec extends SparkSpec {

  test("ltr features: full grid, negatives present, labels consistent") {
    val out = MlOps.searchLtrFeatures.fn(spark, sfDir).collect()
    assert(out.length == 60) // 3 terms x top-20 docs (incl. tf=0 rows —
    // none exist at sf0.001 where the top docs carry all 3 terms, but the
    // grid construction is what guarantees them when they do)
    out.foreach { r =>
      val (tf, idf, score, rel) =
        (r.getLong(2), r.getDouble(5), r.getDouble(6), r.getLong(7))
      assert(rel == math.min(tf, 3L))
      assert(idf > 0.0)
      assert((score == 0.0) == (tf == 0L), "score zero iff absent")
      if (tf > 0) assert(score > 0.0 && score <= idf * (1.2 + 1.0) + 1e-6)
    }
  }

  test("logreg: converges (acc/loss beat the untrained model), deterministic") {
    def run() = MlOps.qualityTrainLogreg.fn(spark, sfDir).collect()
    val r1 = run()
    assert(r1.length == 1)
    val (acc, loss) = (r1.head.getDouble(4), r1.head.getDouble(5))
    // Untrained (w = 0): p = 0.5 everywhere -> log-loss = ln 2 = 0.693.
    assert(loss < 0.5, s"log-loss $loss should beat ln2")
    assert(acc >= 0.9, s"train accuracy $acc")
    // The dominant signal is document length (the label's own axis).
    assert(math.abs(r1.head.getDouble(1)) >
      math.abs(r1.head.getDouble(3)), "w_ntok should dominate w_vowel")
    assert(r1.map(_.toSeq).toSeq == run().map(_.toSeq).toSeq)
  }
}
