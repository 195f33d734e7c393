package graft

import graft.operators.TextOps

/** Rolling-hash fingerprint laws (no SQL oracle — TextOps scaladoc). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("rolling hash: deterministic, content-sensitive, matches reference fold") {
    val docs = Seq((0L, "abc"), (1L, "abd"), (2L, "abc")).toDF("doc_id", "text")
    val out = TextOps.rollingHash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => Math.floorMod(h * 31L + c.toLong, 2147483647L))
    assert(out(0L) == ref("abc"))
    assert(out(0L) == out(2L), "same content, same hash")
    assert(out(0L) != out(1L), "different content, different hash")
  }

  test("rolling hash on the corpus has no spurious collisions at sf0.001") {
    val docs = Tables.load(spark, sfDir, "documents")
    val hashes = TextOps.rollingHash(docs).collect().map(_.getLong(1))
    // 500 distinct texts (verified corpus property) -> 500 distinct hashes
    // with overwhelming probability for a 31-bit hash.
    assert(hashes.distinct.length == hashes.length)
  }
}
