package graft

import graft.operators.RecOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-19 recommender pack: co-occurrence counts
  * must match a driver-side brute-force replay of the capped contract,
  * and the per-item ranking must be a valid top-3. */
class RecSpec extends SparkSpec {

  private def cappedUserItems(): Map[Long, Set[Long]] = {
    val rows = Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("view", "click"))
      .groupBy(col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).map { case (u, xs) =>
      u -> xs.sortBy(x => (-x._3, x._2)).take(50).map(_._2).toSet
    }
  }

  test("co-occurrence pairs match the brute-force capped replay") {
    val ui = cappedUserItems()
    val co = collection.mutable.Map[(Long, Long), Long]()
    val marg = collection.mutable.Map[Long, Long]()
    ui.values.foreach { items =>
      items.foreach(i => marg(i) = marg.getOrElse(i, 0L) + 1)
      val s = items.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        co((s(i), s(j))) = co.getOrElse((s(i), s(j)), 0L) + 1
    }
    val expected = co.toSeq
      .map { case ((a, b), c) => (a, b, c, marg(a), marg(b)) }
      .sortBy(x => (-x._3, x._1, x._2)).take(50)
    val out = RecOps.recItemCooccur.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == expected, s"head got ${out.take(3).toSeq} want ${expected.take(3)}")
    RecOps.recItemCooccur.fn(spark, sfDir).collect().foreach { r =>
      val j = r.getLong(2).toDouble / (r.getLong(3) + r.getLong(4) - r.getLong(2))
      assert(math.abs(r.getDouble(5) -
        BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        < 1e-9)
    }
  }

  test("per-item recs: valid top-3, symmetric support, jaccard in (0,1]") {
    val out = RecOps.recTopkPerItem.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val rks = rows.map(_.getInt(4)).sorted
      assert(rks.toSeq == (1 to rks.length).toSeq, "dense ranks from 1")
      assert(rks.length <= 3)
      val js = rows.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(js.zip(js.tail).forall { case (a, b) => a >= b }, "rank order")
    }
    out.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "no self-recommendation")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
