package graft

import graft.operators.ExportOps
import org.apache.spark.sql.functions._

/** Behavior laws for the wave-30 JSONL shard export. */
class ExportSpec extends SparkSpec {

  test("jsonl export: lossless round-trip, complete and duplicate-free") {
    val out = ExportOps.sinkJsonlSharded.fn(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(out.map(_.getLong(1)).sum == docs.count(), "every doc exported")
    out.foreach(r => assert(r.getLong(1) == r.getLong(3), "no dup ids in shard"))
    assert(out.map(_.getInt(0)).forall(s => s >= 0 && s <= 15))
    // Field-level losslessness: read the JSONL back and diff against the
    // source on every column.
    val base = s"/tmp/graft_jsonl_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val back = spark.read.json(base)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val src = docs.select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.exceptAll(src).count() == 0 &&
      src.exceptAll(back).count() == 0, "round-trip must be lossless")
  }

  test("jsonl export: shard assignment is deterministic across runs") {
    val a = ExportOps.sinkJsonlSharded.fn(spark, sfDir).collect().map(_.toSeq)
    val b = ExportOps.sinkJsonlSharded.fn(spark, sfDir).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
