package graft

import org.apache.spark.sql.functions._

/** Perceptual-hash near-dup invariants for the no-oracle multimodal_phash:
  * dHash is a pure function of the payload, exact text duplicates must
  * surface as hamming-0 pairs, and reported distances obey the filter. */
class PhashSpec extends SparkSpec {

  test("dHash is deterministic and payload-pure") {
    val p = operators.DocAssembly.Png.render("spark table scan merge row")
    assert(operators.DocAssembly.dHash(p) == operators.DocAssembly.dHash(p.clone()))
  }

  test("every exact text-duplicate pair appears with hamming 0") {
    // The synthetic corpus has no exact dups at this sf — construct them:
    // clone 10 docs under shifted ids, so each clone pairs with its source.
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val clones = base.orderBy("doc_id").limit(10)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val corpus = base.unionAll(clones)
    val docs = corpus.select(col("doc_id"), md5(col("text")).as("h"))
    val dupPairs = docs.as("x").join(docs.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = operators.DocAssembly.phashPairs(spark, corpus).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(dupPairs.size >= 10)
    dupPairs.foreach { p =>
      assert(out.get(p).contains(0L), s"dup pair $p missing or nonzero")
    }
    assert(out.values.forall(_ <= 6))
  }

  test("7-band split: any pair within hamming 6 shares at least one band") {
    // Pigeonhole only holds if the band masks/offsets tile all 64 bits
    // without gaps — pin the EXPRESSION, not the theorem: random base
    // hashes, 1..6 random bit flips, every pair must share a band value.
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 300).map { _ =>
      val x = rnd.nextLong()
      val flips = rnd.shuffle((0 until 64).toList).take(1 + rnd.nextInt(6))
      (x, flips.foldLeft(x)((h, b) => h ^ (1L << b)))
    }
    import spark.implicits._
    val df = pairs.toDF("pa", "pb")
    val bandsOf = (c: String) => expr(
      operators.DocAssembly.phashBandExpr.replace("phash", c))
    val noShared = df
      .withColumn("shared",
        size(array_intersect(bandsOf("pa"), bandsOf("pb"))))
      .filter(col("shared") < 1)
    assert(noShared.count() == 0,
      "a hamming<=6 pair had no clean band — band tiling is broken")
  }

  test("declared multimodal_phash emits the sentinel pair at corpus scale") {
    // The round-6 liveness guarantee: the declared query (corpus + two
    // byte-identical sentinel renders under reserved negative ids) emits
    // the (-2,-1) hamming-0 pair at EVERY scale factor, so the driver's
    // rows>0 check can never pass vacuously.
    val out = operators.DocAssembly.multimodalPhash.fn(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.get((-2L, -1L)).contains(0L),
      s"sentinel pair missing: ${out.keySet.take(5)}")
  }
}
