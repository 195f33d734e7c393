package graft

import graft.operators.DocAssembly
import org.apache.spark.sql.functions._

/** Poison-payload laws for the safe media decode (round 15, VERDICT r14
  * next-item 7): corrupt binaries divert to null+audit, clean rows decode
  * identically to the strict kernel, and the partition is exact.
  */
class MultimodalSafeSpec extends SparkSpec {

  private lazy val out =
    DocAssembly.multimodalDecodeSafe.fn(spark, sfDir).cache()

  private def poisoned = DocAssembly.poisonPlanted(col("doc_id"))

  test("planted corrupt payloads divert with null metadata + audit tag") {
    val bad = out.filter(poisoned)
    assert(bad.count() > 0, "fixture must plant poison rows")
    assert(bad.filter(col("error").isNull).count() == 0)
    assert(bad.filter(col("width").isNotNull || col("height").isNotNull ||
      col("checksum").isNotNull).count() == 0)
    // Both corruption classes produce their own deterministic tag.
    val tags = bad.select("error").distinct()
      .collect().map(_.getString(0)).toSet
    assert(tags.contains("UnrecognizedContainer"), s"tags: $tags")
    assert(tags.size >= 2, s"expected both corruption classes, got $tags")
  }

  test("clean rows decode byte-identically to the strict kernel") {
    assert(out.filter(!poisoned && col("error").isNotNull).count() == 0)
    val strict = DocAssembly.multimodalDecode.fn(spark, sfDir)
      .select("doc_id", "width", "height", "checksum")
      .filter(!poisoned)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSeq
    val safe = out.filter(!poisoned)
      .select("doc_id", "width", "height", "checksum")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(safe.nonEmpty && safe == strict)
  }

  test("a corrupt payload never kills the stage: direct kernel contract") {
    // Truncated-PNG and bad-magic payloads both return a diverted record.
    val png = DocAssembly.Png.render("some text to render")
    val truncated = java.util.Arrays.copyOfRange(png, 0, png.length / 3)
    val r1 = DocAssembly.decodeSafe(7L, truncated)
    assert(r1.error.nonEmpty && r1.width.isEmpty)
    val noMagic = png.clone(); (0 until 8).foreach(i => noMagic(i) = 0)
    val r2 = DocAssembly.decodeSafe(8L, noMagic)
    assert(r2.error.contains("UnrecognizedContainer"))
    val ok = DocAssembly.decodeSafe(9L, png)
    assert(ok.error.isEmpty && ok.width.nonEmpty && ok.checksum.nonEmpty)
  }
}
