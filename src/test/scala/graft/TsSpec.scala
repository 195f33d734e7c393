package graft

import graft.operators.TsOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-16 time-series pack, each pinned against a
  * driver-side brute-force recompute of the daily (type, day, count)
  * series. */
class TsSpec extends SparkSpec {

  private def dailySeries(): Map[String, Seq[(java.sql.Date, Long)]] = {
    val rows = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
    rows.map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, xs) =>
        t -> xs.map(x => (x._2, x._3)).sortBy(_._1.getTime).toSeq }
  }

  test("autocorr matches brute-force Pearson on aligned lag pairs") {
    val series = dailySeries()
    val out = TsOps.tsAutocorr.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (t, k) = (r.getString(0), r.getInt(1))
      val byDay = series(t).toMap
      val dayMs = 86400000L
      val pairs = series(t).flatMap { case (d, x) =>
        byDay.get(new java.sql.Date(d.getTime + k * dayMs)).map(y => (x, y))
      }
      assert(r.getLong(2) == pairs.length.toLong)
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val sx2 = pairs.map(p => p._1 * p._1).sum.toDouble
      val sy2 = pairs.map(p => p._2 * p._2).sum.toDouble
      val brute = (n * sxy - sx * sy) /
        math.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
      assert(math.abs(r.getDouble(3) - brute) < 5e-7,
        s"$t lag $k: ${r.getDouble(3)} vs $brute")
      assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    }
  }

  test("cusum changepoint is the argmax of the scaled deviation") {
    val series = dailySeries()
    val out = TsOps.tsCusumChangepoint.fn(spark, sfDir).collect()
    assert(out.length == series.size)
    out.foreach { r =>
      val t = r.getString(0)
      val xs = series(t)
      val total = xs.map(_._2).sum
      val n = xs.length.toLong
      var prefix = 0L
      val stats = xs.zipWithIndex.map { case ((d, c), i) =>
        prefix += c
        (d, math.abs(n * prefix - (i + 1) * total))
      }
      val best = stats.maxBy(s => (s._2, -s._1.getTime))
      // argmax with earliest-day tie-break
      val expected = stats.filter(_._2 == best._2).minBy(_._1.getTime)
      assert(r.getDate(1) == expected._1 && r.getLong(2) == expected._2,
        s"$t: got (${r.getDate(1)}, ${r.getLong(2)}), want $expected")
    }
  }

  test("seasonal-naive eval matches brute force; wape is the Σ|e|/Σx ratio") {
    val series = dailySeries()
    val out = TsOps.tsSeasonalNaiveEval.fn(spark, sfDir).collect()
    val dayMs = 86400000L
    out.foreach { r =>
      val t = r.getString(0)
      val byDay = series(t).toMap
      val pairs = series(t).flatMap { case (d, x) =>
        byDay.get(new java.sql.Date(d.getTime - 7 * dayMs)).map(f => (x, f))
      }
      assert(r.getLong(1) == pairs.length.toLong)
      val errs = pairs.map(p => math.abs(p._1 - p._2))
      assert(r.getLong(4) == errs.max)
      assert(math.abs(r.getDouble(2) - errs.sum.toDouble / errs.length) < 5e-7)
      assert(math.abs(r.getDouble(3) -
        errs.sum.toDouble / pairs.map(_._1).sum) < 5e-7)
    }
  }
}
