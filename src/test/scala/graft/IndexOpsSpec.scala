package graft

import graft.operators.{CurationOps3, IndexOps}
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-9 index-lifecycle pack. */
class IndexOpsSpec extends SparkSpec {

  test("segment merge: two interleaved segments rebuild the full index exactly") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merged = IndexOps.indexSegmentMerge.fn(spark, sfDir).collect()
    val full = CurationOps3.invertedIndex(docs).collect()
    assert(merged.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("segment merge: three-way batch composition is associative") {
    val docs = Tables.load(spark, sfDir, "documents")
    def seg(m: Int) =
      CurationOps3.invertedIndex(docs.filter(pmod(col("doc_id"), lit(3)) === m))
    val abThenC = IndexOps.mergeSegments(
      IndexOps.mergeSegments(seg(0), seg(1)), seg(2)).collect()
    val full = CurationOps3.invertedIndex(docs).collect()
    assert(abThenC.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("hybrid blend: normalized scores in [0,1], blend bounded and descending") {
    val out = IndexOps.searchHybridBlend.fn(spark, sfDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (blend, nbm, nvec) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(blend >= 0.0 && blend <= 1.0 + 1e-9)
      // -1 marks "absent from that retriever's top-50"
      assert(nbm == -1.0 || (nbm >= 0.0 && nbm <= 1.0 + 1e-9))
      assert(nvec == -1.0 || (nvec >= 0.0 && nvec <= 1.0 + 1e-9))
      val expected = 0.6 * math.max(nbm, 0.0) + 0.4 * math.max(nvec, 0.0)
      assert(math.abs(blend - math.rint(expected * 1e6) / 1e6) <= 1e-6)
    }
    val blends = out.map(_.getDouble(1)).toSeq
    assert(blends == blends.sorted.reverse)
    // The lexical top doc normalizes to exactly 1.0 and must surface.
    assert(out.exists(_.getDouble(2) == 1.0))
    assert(out.exists(_.getDouble(3) == 1.0))
  }

  test("percolate: agrees with a driver-side match of every stored query") {
    import spark.implicits._
    val out = IndexOps.searchPercolate.fn(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    val queries = Map(
      "alert_tables" -> Seq("table", "scan"),
      "alert_vectors" -> Seq("vector"),
      "alert_joins" -> Seq("hash", "join"),
      "alert_streaming" -> Seq("spark", "stream"),
      "alert_errors" -> Seq("slow", "error"))
    assert(out.keySet == queries.keySet) // zero-match queries still report
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val batch = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(t => md5hex(t._2).startsWith("1"))
      .map(t => t._1 -> t._2.split(" ").toSet)
    queries.foreach { case (qid, terms) =>
      val matched = batch.filter(d => terms.forall(d._2)).map(_._1)
      val (n, first, last) = out(qid)
      assert(n == matched.length, s"$qid count")
      if (matched.nonEmpty) {
        assert(first.contains(matched.min) && last.contains(matched.max))
      } else assert(first.isEmpty && last.isEmpty)
    }
  }

  test("index delete: empty set is identity; delete-all empties the index") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val idx = CurationOps3.invertedIndex(docs)
    val noneDeleted = IndexOps.deleteFromIndex(idx,
      Seq.empty[Long].toDF("doc_id"))
    assert(noneDeleted.collect().map(_.toSeq).toSeq ==
      idx.collect().map(_.toSeq).toSeq)
    val allIds = docs.select($"doc_id")
    assert(IndexOps.deleteFromIndex(idx, allIds).count() == 0L)
  }

  test("recall report: internally consistent, nonvacuous recall floor") {
    val out = IndexOps.annRecallReport.fn(spark, sfDir).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(10, 50, 100))
    out.foreach { r =>
      val (k, n, rec) = (r.getInt(0), r.getLong(1), r.getDouble(2))
      assert(n >= 0 && n <= k)
      assert(math.abs(rec - math.rint(n.toDouble / k * 1e6) / 1e6) <= 1e-9)
    }
    // The LSH retrieval must find a nontrivial share of the exact head.
    assert(out.head.getDouble(2) >= 0.3)
  }

  test("batched hybrid: exact-equivalent single-query batch reproduces the " +
      "oracled search_hybrid_blend row-for-row") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val model = graft.operators.AnnOps.fitAnnModel(spark, emb)
    val index = graft.operators.AnnOps.annIndex(spark, emb, model)
    val queries = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    // The single-shot key's canned term set (CorpusOps.Bm25Terms).
    val terms = Seq("hash", "join", "vector").map((0L, _))
      .toDF("query_id", "term")
    // Full probe + corpus-sized pool make the vector arm exact; the
    // single-shot key's vector arm IS the exact cosine top-50 — so the
    // batch must reproduce the ORACLED key bit-for-bit.
    val batch = IndexOps.hybridBlendBatch(spark, docs, emb, index, model,
        queries, terms, k = 20, nProbe = model.centroids.size,
        nCandidates = emb.count().toInt)
      .select("doc_id", "blend", "nbm", "nvec")
      .collect().map(_.toSeq).toSeq
    val single = IndexOps.searchHybridBlend.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(batch == single)
  }

  test("batched hybrid: multi-query batch == per-query batches " +
      "row-for-row (the declared key's composition)") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val model = graft.operators.AnnOps.fitAnnModel(spark, emb)
    val index = graft.operators.AnnOps.annIndex(spark, emb, model)
    val terms = Seq(
      (0L, "hash"), (0L, "join"), (0L, "vector"),
      (1L, "hash"), (1L, "join"),
      (2L, "vector"))
    def queriesFor(ids: Seq[Long]) = emb.filter($"vec_id".isin(ids: _*))
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val batched: Map[Long, Seq[Seq[Any]]] =
      IndexOps.hybridBlendBatch(spark, docs, emb, index, model,
          queriesFor(Seq(0L, 1L, 2L)), terms.toDF("query_id", "term"), k = 10)
        .collect().map(_.toSeq).toSeq
        .groupBy(_.head.asInstanceOf[Long])
    (0L to 2L).foreach { qid =>
      val single = IndexOps.hybridBlendBatch(spark, docs, emb, index,
          model, queriesFor(Seq(qid)),
          terms.filter(_._1 == qid).toDF("query_id", "term"), k = 10)
        .collect().map(_.toSeq).toSeq
      assert(batched.getOrElse(qid, Nil) == single,
        s"query $qid diverges between batched and single serve")
    }
  }
}
