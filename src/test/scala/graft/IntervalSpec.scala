package graft

import graft.operators.IntervalOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-29 interval-overlap join. */
class IntervalSpec extends SparkSpec {

  test("overlap rollup matches a driver-side interval replay") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("user_id", "ts", "event_id").collect()
      .map { r =>
        val t = r.getTimestamp(1)
        (r.getLong(0), t.getTime * 1000 + t.getNanos / 1000 % 1000,
          r.getLong(2))
      }
    // Re-sessionize driver-side: 30-min gaps, (ts, event_id) order.
    val gap = 1800000000L
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._3))
      val bounds = collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var (start, last) = (sorted.head._2, sorted.head._2)
      sorted.tail.foreach { x =>
        if (x._2 - last > gap) { bounds += ((u, start, last)); start = x._2 }
        last = x._2
      }
      bounds += ((u, start, last))
      bounds
    }
    def us(s: String): Long =
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000
    val promos = Seq(
      ("P1", us("2024-01-03 00:00:00"), us("2024-01-05 00:00:00")),
      ("P2", us("2024-01-08 12:00:00"), us("2024-01-09 12:00:00")),
      ("P3", us("2024-01-15 00:00:00"), us("2024-01-22 00:00:00")),
      ("P4", us("2024-01-25 06:00:00"), us("2024-01-25 18:00:00")),
      ("P5", us("2024-01-28 00:00:00"), us("2024-02-04 00:00:00")))
    val brute = promos.flatMap { case (id, ps, pe) =>
      val hits = sessions.filter { case (_, ss, se) => ss < pe && ps < se }
      if (hits.isEmpty) None
      else Some((id, hits.length.toLong,
        hits.map(_._1).distinct.length.toLong,
        hits.map { case (_, ss, se) =>
          math.min(se, pe) - math.max(ss, ps) }.sum))
    }
    val out = IntervalOps.joinIntervalOverlap.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == brute, s"got ${out.toSeq}\nwant $brute")
  }

  test("overlap durations are positive and bounded by the promo length") {
    val out = IntervalOps.joinIntervalOverlap.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // Point sessions (one event) overlap with zero duration, so the
      // total is non-negative, not strictly positive.
      assert(r.getLong(3) >= 0, "overlap durations never negative")
      // Total overlap <= n_sessions * promo length (7 days max window).
      assert(r.getLong(3) <= r.getLong(1) * 7L * 86400 * 1000000)
    }
  }
}
