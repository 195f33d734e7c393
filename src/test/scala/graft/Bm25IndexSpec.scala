package graft

import graft.operators.{AnnOps, CorpusOps, CurationOps3, IndexOps}
import org.apache.spark.sql.functions._

/** Laws for the index-backed BM25 serve (round 14): the stored
  * inverted-index path must reproduce the tokenize path bit-for-bit —
  * per (query, doc) score, through a parquet round-trip of the index +
  * norms (the production shape), and through the hybrid fusion.
  */
class Bm25IndexSpec extends SparkSpec {

  private def docs = Tables.load(spark, sfDir, "documents")

  private def queryTerms = {
    import spark.implicits._
    Seq((0L, "hash"), (0L, "join"), (0L, "vector"),
      (1L, "hash"), (1L, "spark"),
      (2L, "window")).toDF("query_id", "term")
  }

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "doc_id", "bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq

  test("index-backed batch == tokenize batch, per (query, doc) score") {
    val direct = collected(
      CorpusOps.bm25ScoresBatch(docs, queryTerms))
    val indexed = collected(CorpusOps.bm25FromIndexBatch(
      CurationOps3.invertedIndex(docs), CorpusOps.docNorms(docs),
      queryTerms))
    assert(indexed.nonEmpty && indexed == direct)
  }

  test("stored parquet round-trip of index + norms is identical") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bm25idx").toString
    CurationOps3.invertedIndex(docs)
      .write.mode("overwrite").parquet(s"$tmp/inv")
    CorpusOps.docNorms(docs)
      .write.mode("overwrite").parquet(s"$tmp/norms")
    val stored = collected(CorpusOps.bm25FromIndexBatch(
      spark.read.parquet(s"$tmp/inv"), spark.read.parquet(s"$tmp/norms"),
      queryTerms))
    val inline = collected(CorpusOps.bm25FromIndexBatch(
      CurationOps3.invertedIndex(docs), CorpusOps.docNorms(docs),
      queryTerms))
    assert(stored.nonEmpty && stored == inline)
  }

  test("declared bm25_topk_indexed == declared bm25_topk rows") {
    val a = CorpusOps.bm25TopK.fn(spark, sfDir).collect().toSeq
    val b = CorpusOps.bm25TopKIndexed.fn(spark, sfDir)
      .collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("hybrid fusion with the index-backed lexical arm is identical") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val model = AnnOps.fitAnnModel(spark, emb)
    val annIdx = AnnOps.annIndex(spark, emb, model)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    def run(inv: Option[(org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame)]) =
      IndexOps.hybridBlendBatch(spark, docs, emb, annIdx, model,
          queries, queryTerms, k = 10, invIndex = inv)
        .collect().toSeq
    val direct = run(None)
    val viaIndex = run(Some((CurationOps3.invertedIndex(docs),
      CorpusOps.docNorms(docs))))
    assert(direct.nonEmpty && direct == viaIndex)
  }
}
