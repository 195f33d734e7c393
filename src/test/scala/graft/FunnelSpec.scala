package graft

import graft.operators.FunnelOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-28 windowed funnel. */
class FunnelSpec extends SparkSpec {

  test("windowed funnel: monotone stages, bounded by the unbounded funnel") {
    val out = FunnelOps.eventsFunnelWindowed.fn(spark, sfDir).collect().head
    val (v, c, p) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(v >= c && c >= p, "stages can only shrink")
    val viewers = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "view").select("user_id")
      .distinct().count()
    assert(v == viewers, "stage 1 is every viewer")
    // The windowed counts are bounded above by the unbounded chain.
    val unbounded = graft.operators.EventsOps.all
      .find(_.name == "events_funnel").get.fn(spark, sfDir).collect().head
    assert(c <= unbounded.getLong(1) && p <= unbounded.getLong(2))
  }

  test("windowed funnel matches a driver-side min-ts chain replay") {
    val ev = Tables.load(spark, sfDir, "events")
      .select("user_id", "event_type", "ts").collect()
      .map { r =>
        val t = r.getTimestamp(2) // µs precision, matching the engine
        (r.getLong(0), r.getString(1),
          t.getTime * 1000 + t.getNanos / 1000 % 1000)
      }
    val win = 24L * 3600 * 1000 * 1000
    val byUser = ev.groupBy(_._1)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.foreach { case (_, xs) =>
      val views = xs.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        nv += 1
        val t1 = views.min
        val clicks = xs.filter(x => x._2 == "click" && x._3 >= t1 &&
          x._3 <= t1 + win).map(_._3)
        if (clicks.nonEmpty) {
          nc += 1
          val t2 = clicks.min
          if (xs.exists(x => x._2 == "purchase" && x._3 >= t2 &&
            x._3 <= t2 + win)) np += 1
        }
      }
    }
    val out = FunnelOps.eventsFunnelWindowed.fn(spark, sfDir).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == ((nv, nc, np)))
  }
}
