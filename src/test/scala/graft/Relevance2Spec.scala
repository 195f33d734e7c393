package graft

import graft.operators.{CorpusOps, RelevanceOps2}
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-7 search-relevance pack — the oracle pins
  * engine parity; these pin the semantics (metric bounds, proximity
  * ground truth, pruning exactness). */
class Relevance2Spec extends SparkSpec {
  import spark.implicits._

  test("map: one row per term, 0 <= ap <= 1, ap = 0 iff no top-10 hits") {
    val out = RelevanceOps2.relevanceMap.fn(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("hash", "join", "vector"))
    out.foreach { r =>
      val (hits10, ap) = (r.getLong(2), r.getDouble(3))
      assert(ap >= 0.0 && ap <= 1.0 + 1e-9)
      assert((ap == 0.0) == (hits10 == 0L))
    }
  }

  test("span_near: pair counts match a brute-force recount of the text") {
    val out = RelevanceOps2.searchSpanNear.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = texts.map { case (id, text) =>
      val toks = text.split(" ")
      val ha = toks.zipWithIndex.collect { case ("hash", i) => i }
      val ve = toks.zipWithIndex.collect { case ("vector", i) => i }
      id -> ha.map(x => ve.count(y => math.abs(y - x) <= 5)).map(_.toLong).sum
    }.filter(_._2 > 0).toMap
    assert(out == expected)
  }

  test("query_expansion: excludes query terms, short tokens; sorted by tf_fb/df") {
    val out = RelevanceOps2.searchQueryExpansion.fn(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      val tok = r.getString(0)
      assert(tok.length >= 4 && !Seq("hash", "join", "vector").contains(tok))
    }
    val keys = out.map(r => (-r.getLong(1), r.getLong(2), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("spell_correct: finds the intended corrections within distance 2") {
    val out = RelevanceOps2.suggestSpellCorrect.fn(spark, sfDir).collect()
    val byQuery = out.groupBy(_.getString(0))
    assert(byQuery("tabel").exists(_.getString(1) == "table"))
    assert(byQuery("vectr").exists(_.getString(1) == "vector"))
    out.foreach { r => assert(r.getLong(3) <= 2L && r.getInt(4) <= 5) }
  }

  test("wand_topk: the pruned plan returns exactly the exact BM25 top-20") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(RelevanceOps2.searchWandTopK.fn(spark, sfDir)) ==
      rows(CorpusOps.bm25TopK.fn(spark, sfDir)))
  }
}
