package graft

import graft.operators.DsirOps
import org.apache.spark.sql.functions._

/** Semantic law of the DSIR weights (the oracle pins the arithmetic; this
  * pins that the method does what it is FOR): documents from the target
  * distribution must score higher on average than documents outside it. */
class DsirSpec extends SparkSpec {

  test("target-language docs carry higher mean importance weight") {
    val w = DsirOps.corpusDsirWeights.fn(spark, sfDir)
      .join(Tables.load(spark, sfDir, "documents")
        .select("doc_id", "lang"), "doc_id")
    val means = w.groupBy(col("lang") === "en")
      .agg(avg("dsir_weight").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"mean weight en=${means(true)} must exceed non-en=${means(false)}")
    // Per-bigram normalization sanity: the log-ratio sum is negative-ish
    // for off-target docs; every doc with bigrams gets a weight row.
    val docsWithBigrams = Tables.load(spark, sfDir, "documents")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(w.count() == docsWithBigrams)
  }
}
