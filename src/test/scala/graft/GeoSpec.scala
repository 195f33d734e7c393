package graft

import graft.operators.GeoOps

/** Behavior laws for the wave-14 geo pack: the grid-pruned radius join must
  * equal the brute-force cross join, distances must rank, and the derived
  * coordinate fixture must stay inside its documented domain. */
class GeoSpec extends SparkSpec {

  private def pts(): Array[(Long, Double, Double)] = {
    import spark.implicits._
    GeoOps.points(Tables.load(spark, sfDir, "customer"))
      .as[(Long, Double, Double)].collect()
  }

  test("points fixture: lat/lon inside domain, deterministic") {
    val p = pts()
    assert(p.nonEmpty)
    p.foreach { case (_, lat, lon) =>
      assert(lat >= -90.0 && lat < 90.0)
      assert(lon >= -180.0 && lon < 180.0)
    }
    assert(p.toSeq == pts().toSeq)
  }

  test("radius grid join equals the brute-force cross join") {
    val p = pts()
    val centers = Seq((1, 10.0, 20.0), (2, -45.5, 100.25), (3, 80.0, -170.0),
      (4, 0.0, 0.0), (5, -30.0, 60.0))
    val brute = centers.flatMap { case (id, clat, clon) =>
      val hits = p.map { case (_, lat, lon) =>
        (lat - clat) * (lat - clat) + (lon - clon) * (lon - clon)
      }.filter(_ <= 25.0)
      if (hits.isEmpty) None
      else Some((id, hits.length.toLong,
        BigDecimal(hits.min).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }
    val out = GeoOps.geoRadiusGrid.fn(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == brute, s"grid $out vs brute $brute")
  }

  test("distance topk: ranked, unique, and truly the nearest") {
    val out = GeoOps.geoDistanceTopk.fn(spark, sfDir).collect()
    assert(out.length == 100)
    val d2s = out.map(_.getDouble(3))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a <= b }, "sorted")
    assert(out.map(_.getLong(0)).distinct.length == 100, "unique keys")
    // The worst of the reported top-100 must beat every unreported point.
    val reported = out.map(_.getLong(0)).toSet
    val worst = d2s.max
    pts().foreach { case (k, lat, lon) =>
      if (!reported(k)) {
        val dlon = (lon - -74.0) * 0.7580
        val d2 = (lat - 40.7) * (lat - 40.7) + dlon * dlon
        assert(d2 >= worst - 1e-6, s"point $k (d2=$d2) beats reported worst")
      }
    }
  }

  test("cell density: valid cells, counts bounded by corpus") {
    val total = Tables.load(spark, sfDir, "customer").count()
    val out = GeoOps.geoCellDensity.fn(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 30)
    val ns = out.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "count-ordered")
    assert(ns.sum <= total)
    out.foreach { r =>
      assert(r.getLong(0) >= -9 && r.getLong(0) <= 8, "lat cell")
      assert(r.getLong(1) >= -18 && r.getLong(1) <= 17, "lon cell")
    }
  }
}
