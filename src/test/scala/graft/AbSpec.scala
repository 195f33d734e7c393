package graft

import graft.operators.AbOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-26 experimentation pack. */
class AbSpec extends SparkSpec {

  test("ztest: cohorts partition users, z matches the brute formula") {
    val out = AbOps.eventsAbTestZtest.fn(spark, sfDir).collect().head
    val users = Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    val (na, ca, nb, cb) =
      (out.getLong(0), out.getLong(1), out.getLong(3), out.getLong(4))
    assert(na + nb == users, "cohorts partition the user base")
    assert(ca <= na && cb <= nb)
    if (!out.isNullAt(6)) {
      val (p0, p1) = (ca.toDouble / na, cb.toDouble / nb)
      val pp = (ca + cb).toDouble / (na + nb)
      val z = (p0 - p1) /
        math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
      assert(math.abs(out.getDouble(6) - z) < 5e-7)
      // A parity split is a null experiment: the readout should not be
      // wildly significant (|z| < 5 guards against a formula error that
      // would inflate the statistic).
      assert(math.abs(z) < 5.0, s"null experiment z=$z")
    }
  }

  test("readability: counts cover the corpus, flesch matches brute force") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select("source", "text").as[(String, String)].collect()
    val out = AbOps.textReadability.fn(spark, sfDir).collect()
    assert(out.map(_.getLong(1)).sum == docs.length)
    out.foreach { r =>
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src).map(_._2)
      val words = mine.map(_.split(" ", -1).length.toLong).sum
      val sentences = mine.map(t =>
        math.max("[.!?]+".r.findAllIn(t).length, 1).toLong).sum
      val syll = mine.map(t =>
        "[aeiouy]+".r.findAllIn(t.toLowerCase).length.toLong).sum
      assert(r.getLong(2) == words && r.getLong(3) == sentences &&
        r.getLong(4) == syll, s"$src counts")
      val flesch = 206.835 - 1.015 * (words.toDouble / sentences) -
        84.6 * (syll.toDouble / words)
      assert(math.abs(r.getDouble(5) - flesch) < 5e-7)
    }
  }
}
