package graft

import graft.operators.TokenizerOps

/** Behavior laws for the wave-15 tokenizer pack: the BPE trainer must
  * reproduce a hand-computed merge sequence (including the tie-break and
  * the merged-symbol reuse in later rounds), span corruption must match a
  * brute-force recount, and vocab coverage must be a probability. */
class BpeSpec extends SparkSpec {

  test("bpe trainer reproduces the hand-computed aaab sequence") {
    import spark.implicits._
    // Corpus: the word "aaab" 3 times. Round 1: (a,a) count 6 beats (a,b)
    // count 3 -> [aa, a, b]. Round 2: (aa,a) and (a,b) tie at 3 ->
    // lexicographic pick (a,b) -> [aa, ab]. Round 3: (aa,ab) at 3.
    val docs = Seq("aaab aaab aaab").toDF("text")
    val learned = TokenizerOps.bpeTrain(TokenizerOps.wordFrame(docs), 3)
    assert(learned == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 3L)), learned.toString)
  }

  test("bpe greedy fold handles overlap runs (aaaa + (a,a) -> two aa's)") {
    import spark.implicits._
    val docs = Seq("aaaa aaaa").toDF("text")
    val learned = TokenizerOps.bpeTrain(TokenizerOps.wordFrame(docs), 2)
    // Round 1: (a,a) appears 3 times per word x 2 = 6. Greedy apply gives
    // [aa, aa], so round 2's best is (aa,aa) at 2.
    assert(learned.head == ((1, "a", "a", "aa", 6L)))
    assert(learned(1) == ((2, "aa", "aa", "aaaa", 2L)), learned.toString)
  }

  test("bpe on the corpus: merges valid, deterministic, counts positive") {
    val out = TokenizerOps.bpeTrainMerges.fn(spark, sfDir).collect()
    assert(out.length == 8)
    out.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0)
    }
    val again = TokenizerOps.bpeTrainMerges.fn(spark, sfDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("span corruption matches a brute-force recount") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def nib(s: String): Int = "0123456789abcdef".indexOf(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0))
    val brute = docs.map { case (id, text) =>
      val n = text.split(" ", -1).length
      val starts = (1 to n).filter(i => nib(s"$id:$i") == 0)
      val masked = starts.flatMap(i => i to math.min(i + 2, n)).distinct
      (id, n.toLong, starts.length.toLong, masked.length.toLong)
    }.sortBy(_._1)
    val out = TokenizerOps.spanCorruption.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == brute.toSeq)
  }

  test("vocab coverage: rates in [0,1], hits bounded by totals") {
    val out = TokenizerOps.tokenizerVocabCoverage.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
