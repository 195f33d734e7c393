package graft

import graft.operators.RfmOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-24 engagement pack. */
class RfmSpec extends SparkSpec {

  test("rfm: segments partition the purchasing users, bands in range") {
    val buyers = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    val out = RfmOps.eventsRfmSegments.fn(spark, sfDir).collect()
    assert(out.map(_.getLong(3)).sum == buyers, "every buyer in one segment")
    out.foreach { r =>
      (0 to 2).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 3))
      assert(r.getLong(3) > 0)
      assert(r.getDouble(4) >= 0.0) // recency can't be negative
    }
  }

  test("stickiness: dau <= wau, ratio in (0,1], day-1 wau == dau") {
    val out = RfmOps.eventsStickinessWau.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "DAU bounded by WAU")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    // Brute-force check one mid-corpus day.
    val ud = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1)))
    val mid = out(out.length / 2)
    val d = mid.getDate(0); val dayMs = 86400000L
    val wauBrute = ud.filter { case (_, day) =>
      day.getTime <= d.getTime && day.getTime >= d.getTime - 6 * dayMs
    }.map(_._1).distinct.length
    val dauBrute = ud.filter(_._2 == d).map(_._1).distinct.length
    assert(mid.getLong(1) == dauBrute && mid.getLong(2) == wauBrute)
  }
}
