package graft

import graft.operators.{AnnIndexLog, AnnOps}
import graft.sources.TxLog
import org.apache.spark.sql.functions._

/** Laws for the GraftLog-versioned ANN index (round 15, VERDICT r14
  * next-item 3): serve ≡ direct, snapshot isolation under a concurrent
  * rebalance, time travel, upsert/delete lifecycle, and the
  * rebalance ≡ fresh-build equivalence at threshold 0.
  */
class AnnLogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  private def freshDir(): String = java.nio.file.Files
    .createTempDirectory("graft_annlog_spec").toString

  /** Structural model equality — AnnModel's codebooks are Arrays, whose
    * case-class equals is reference-based. */
  private def modelEq(a: AnnOps.AnnModel, b: AnnOps.AnnModel): Boolean =
    a.nLists == b.nLists && a.m == b.m && a.dsub == b.dsub &&
      a.ksub == b.ksub && a.centroids == b.centroids &&
      a.codebooks.length == b.codebooks.length &&
      a.codebooks.zip(b.codebooks).forall { case (x, y) => x.toSeq == y.toSeq }

  private def indexRows(df: org.apache.spark.sql.DataFrame) = df
    .select($"vec_id", $"list_id", concat_ws(",", $"codes").as("c"))
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    .sortBy(_._1).toSeq

  test("log-backed serve == direct from-index serve, row for row") {
    val model = AnnOps.fitAnnModel(spark, emb)
    val dir = freshDir()
    AnnIndexLog.build(spark, dir, emb, model)
    val served = AnnIndexLog
      .serveIvfKnn(spark, dir, emb, queryId = 0L, k = 20, nProbe = 3)
      .collect().toSeq
    val direct = AnnOps.ivfKnnFromIndex(spark, emb,
        AnnOps.annIndex(spark, emb, model), model,
        queryId = 0L, k = 20, nProbe = 3)
      .collect().toSeq
    assert(served == direct)
  }

  test("serve-during-rebalance: a resolved snapshot is immune to a " +
      "concurrent rebalance commit; the next resolve sees the new pair") {
    // History excludes a tenth of the corpus; the fresh model is fit on
    // history only, then the held-out tenth upserts under the FROZEN
    // model — the drift a rebalance exists to repair.
    val hist = emb.filter($"vec_id" % 10 =!= 0)
    val churn = emb.filter($"vec_id" % 10 === 0)
    val model = AnnOps.fitAnnModel(spark, hist)
    val dir = freshDir()
    AnnIndexLog.build(spark, dir, emb = hist, model = model)
    AnnIndexLog.upsert(spark, dir, churn)

    // The serve resolves ONCE (the isolation contract) …
    val r1 = AnnIndexLog.resolve(spark, dir)
    val before = AnnIndexLog
      .serveIvfKnnResolved(spark, dir, emb, r1, queryId = 0L, k = 20)
      .collect().toSeq
    val postingsBefore = indexRows(AnnIndexLog.postings(spark, dir, r1))

    // … then a rebalance commits new postings files + a refined model.
    val (seq3, refined) = AnnIndexLog.rebalance(spark, dir, emb)
    assert(seq3 == r1.seq + 1)

    // Re-executing against the RESOLVED snapshot reads the exact same
    // rows and serves the exact same result — nothing the rebalance
    // wrote is visible through r1.
    assert(indexRows(AnnIndexLog.postings(spark, dir, r1))
      == postingsBefore, "resolved snapshot postings changed under rebalance")
    val after = AnnIndexLog
      .serveIvfKnnResolved(spark, dir, emb, r1, queryId = 0L, k = 20)
      .collect().toSeq
    assert(after == before, "resolved serve changed under rebalance")

    // Time travel to the pre-rebalance seq resolves the OLD model bytes
    // and the OLD postings version.
    val rOld = AnnIndexLog.resolve(spark, dir, asOfSeq = Some(r1.seq))
    assert(rOld.postingsVersion == r1.postingsVersion)
    assert(modelEq(rOld.model, r1.model))

    // A fresh resolve rides the refined pair, and its postings content
    // is row-identical to a fresh build under the refined model (the
    // threshold-0 rebalance equivalence).
    val r2 = AnnIndexLog.resolve(spark, dir)
    assert(r2.seq == seq3)
    assert(modelEq(r2.model, refined))
    assert(indexRows(AnnIndexLog.postings(spark, dir, r2))
      == indexRows(AnnOps.annIndex(spark, emb, refined)))
  }

  test("upsert publishes atomically and equals a same-model rebuild") {
    val hist = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
    val model = AnnOps.fitAnnModel(spark, hist)
    val dir = freshDir()
    AnnIndexLog.build(spark, dir, hist, model)
    val r1 = AnnIndexLog.resolve(spark, dir)
    AnnIndexLog.upsert(spark, dir, batch)
    // The pre-upsert snapshot still reads only history.
    assert(AnnIndexLog.postings(spark, dir, r1).count() == hist.count())
    val r2 = AnnIndexLog.resolve(spark, dir)
    assert(modelEq(r2.model, model), "upsert must not change the model")
    assert(indexRows(AnnIndexLog.postings(spark, dir, r2))
      == indexRows(AnnOps.annIndex(spark, emb, model)))
  }

  test("delete rewrites only stats-overlapping files and masks the " +
      "tombstoned rows from the next snapshot") {
    val model = AnnOps.fitAnnModel(spark, emb)
    val dir = freshDir()
    AnnIndexLog.build(spark, dir, emb, model)
    val r1 = AnnIndexLog.resolve(spark, dir)
    val tombs = emb.select($"vec_id").filter($"vec_id" % 7 === 0)
    val nTombs = tombs.count()
    AnnIndexLog.delete(spark, dir, tombs)
    val r2 = AnnIndexLog.resolve(spark, dir)
    val post2 = AnnIndexLog.postings(spark, dir, r2)
    assert(post2.count() == emb.count() - nTombs)
    assert(post2.filter($"vec_id" % 7 === 0).count() == 0)
    // The pre-delete snapshot still serves the full corpus.
    assert(AnnIndexLog.postings(spark, dir, r1).count() == emb.count())
  }

  test("mutators refuse an orphaned postings commit (crashed mutation)") {
    val model = AnnOps.fitAnnModel(spark, emb)
    val dir = freshDir()
    AnnIndexLog.build(spark, dir, emb, model)
    // Simulate a crash AFTER a postings append but BEFORE its manifest
    // row: commit straight to the postings log.
    TxLog.append(spark, s"$dir/postings",
      AnnOps.annIndex(spark, emb.filter($"vec_id" === 0L), model))
    val e = intercept[IllegalArgumentException] {
      AnnIndexLog.upsert(spark, dir, emb.filter($"vec_id" === 1L))
    }
    assert(e.getMessage.contains("orphan"))
    // Serves keep working — the orphan is invisible through the manifest.
    val served = AnnIndexLog
      .serveIvfKnn(spark, dir, emb, queryId = 0L, k = 5)
    assert(served.count() == 5)
  }

  test("model blob round-trips bit-exactly") {
    val model = AnnOps.fitAnnModel(spark, emb)
    val dir = freshDir()
    AnnIndexLog.build(spark, dir, emb, model)
    val r = AnnIndexLog.resolve(spark, dir)
    assert(r.model.nLists == model.nLists)
    assert(r.model.centroids == model.centroids)
    assert(r.model.m == model.m && r.model.dsub == model.dsub &&
      r.model.ksub == model.ksub)
    assert(r.model.codebooks.length == model.codebooks.length)
    r.model.codebooks.zip(model.codebooks).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
  }
}
