package graft

import graft.operators.ClickOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-17 click-analytics pack: Wilson must be a
  * true lower bound that rewards evidence, the position curve must account
  * for every impression, and shrinkage must pull toward the prior. */
class ClickSpec extends SparkSpec {

  test("wilson lcb: bounded by ctr, evidence-monotone, brute-force exact") {
    val out = ClickOps.ctrWilsonTopk.fn(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 50)
    out.foreach { r =>
      val (views, clicks) = (r.getLong(1), r.getLong(2))
      val (ctr, lcb) = (r.getDouble(3), r.getDouble(4))
      val p = math.min(clicks, views).toDouble / views
      val z = 1.96; val n = views.toDouble
      val brute = (p + z * z / (2.0 * n) -
        z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))) /
        (1.0 + z * z / n)
      assert(math.abs(lcb - brute) < 5e-7)
      assert(lcb <= math.min(ctr, 1.0) + 1e-9, "LCB below the point estimate")
      assert(lcb >= 0.0 - 1e-9)
    }
    val lcbs = out.map(_.getDouble(4))
    assert(lcbs.zip(lcbs.tail).forall { case (a, b) => a >= b }, "ranked")
  }

  test("wilson rewards evidence: same ctr, more views => higher lcb") {
    // Law of the estimator itself (driver-side): 8/10 vs 80/100.
    def lcb(c: Long, v: Long): Double = {
      val p = c.toDouble / v; val z = 1.96; val n = v.toDouble
      (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) /
        (1 + z * z / n)
    }
    assert(lcb(80, 100) > lcb(8, 10))
  }

  test("position curve: covers all events, lift averages to ~1") {
    val out = ClickOps.clickPositionCurve.fn(spark, sfDir).collect()
    val totalViews = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "view").count()
    val totalClicks = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "click").count()
    assert(out.map(_.getLong(1)).sum == totalViews)
    assert(out.map(_.getLong(2)).sum == totalClicks)
    // view-weighted mean of per-position CTR equals the global CTR, so
    // view-weighted mean lift is exactly 1.
    val wLift = out.map(r => r.getLong(1) * r.getDouble(4)).sum /
      out.map(_.getLong(1)).sum
    assert(math.abs(wLift - 1.0) < 1e-3, s"weighted lift $wLift")
  }

  test("shrinkage pulls toward the 2/52 prior and never reorders evidence") {
    val out = ClickOps.itemCtrShrinkage.fn(spark, sfDir).collect()
    val prior = 2.0 / 52.0
    out.foreach { r =>
      val (views, clicks) = (r.getLong(1), r.getLong(2))
      val (raw, shrunk) = (r.getDouble(3), r.getDouble(4))
      val brute = (clicks + 2).toDouble / (views + 52)
      assert(math.abs(shrunk - brute) < 5e-7)
      // Posterior mean lies between prior and raw estimate.
      assert(shrunk >= math.min(raw, prior) - 1e-6 &&
        shrunk <= math.max(raw, prior) + 1e-6)
    }
  }
}
