package graft

import graft.operators.DocAssembly

/** Driver-contract smoke tests (SURVEY §5.1): entry returns rows, every
  * declared query runs at sf0.001, oracle keys are consistent, and
  * column names match between Spark results and oracle SQL aliases. */
class EntrySpec extends SparkSpec {

  test("entry returns rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("no duplicate query keys across modules") {
    val names = SparkEntry.allQs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate keys: $dups")
  }

  test("every declared query executes at sf0.001 (schema + rows)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, sfDir).count(); None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("multimodal decode stub is deterministic and total") {
    val a = DocAssembly.fakeDecode(1L, "hello world".getBytes)
    val b = DocAssembly.fakeDecode(1L, "hello world".getBytes)
    assert(a == b)
    assert(a.n_bytes == 11)
    val empty = DocAssembly.fakeDecode(2L, Array.emptyByteArray)
    assert(empty.n_bytes == 0)
  }

  test("multimodal resize/frame-sample shapes are deterministic") {
    val resized = DocAssembly.multimodalResize.fn(spark, sfDir).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.getLong(2) <= 64), "resized payload <= 64 bytes")
    assert(resized.forall(r => r.getLong(2) <= r.getLong(1)))
    val frames = DocAssembly.multimodalFrameSample.fn(spark, sfDir)
    val f1 = frames.collect().map(_.toSeq).toSeq
    assert(f1.nonEmpty && f1 == frames.collect().map(_.toSeq).toSeq)
  }

  test("bench headline keys are all declared") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline without query: $missing")
  }
}
