package graft

import graft.operators.InterpOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-25 interpolation/nearest pack. */
class InterpSpec extends SparkSpec {

  test("lerp: observed rows exact, gaps strictly between their neighbors") {
    val out = InterpOps.timeResampleLerp.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getTimestamp(1).getTime)
      // Spine endpoints are observed (min/max are real hours).
      assert(!sorted.head.getBoolean(3) && !sorted.last.getBoolean(3))
      sorted.sliding(3).foreach {
        case Array(a, b, c) =>
          if (b.getBoolean(3)) {
            // A gap's lerp value lies within [min, max] of the two
            // nearest OBSERVED values — and for a single-hour gap those
            // are exactly its neighbors a and c.
            if (!a.getBoolean(3) && !c.getBoolean(3)) {
              val lo = math.min(a.getDouble(4), c.getDouble(4))
              val hi = math.max(a.getDouble(4), c.getDouble(4))
              assert(b.getDouble(4) >= lo - 1e-6 && b.getDouble(4) <= hi + 1e-6,
                s"gap value ${b.getDouble(4)} outside [$lo, $hi]")
            }
            assert(b.getLong(2) == 0L, "gap hours have n = 0")
          }
        case _ =>
      }
    }
  }

  test("nearest asof: every match is truly the argmin |gap| per user") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime * 1000 +
        r.getTimestamp(2).getNanos / 1000 % 1000, r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val out = InterpOps.joinAsofNearest.fn(spark, sfDir).collect()
    out.foreach { r =>
      val (pid, uid) = (r.getLong(0), r.getLong(1))
      val pts = ev.find(_._1 == pid).get._3
      clicksByUser.get(uid) match {
        case None => assert(r.isNullAt(3), s"purchase $pid: no clicks")
        case Some(cs) =>
          val best = cs.map(c => (math.abs(pts - c._3), c._3, c._1))
            .minBy(identity)
          assert(r.getLong(3) == best._3 && r.getLong(4) == best._1,
            s"purchase $pid: got (${r.getLong(3)}, ${r.getLong(4)}), want $best")
      }
    }
  }
}
