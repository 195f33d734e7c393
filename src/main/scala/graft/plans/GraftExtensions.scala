package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SURVEY §4.3: the SparkSessionExtensions seam, wired from day one so a
  * future rule/strategy/function injection doesn't reshape the engine.
  *
  * Usage: `SparkSession.builder().withExtensions(GraftExtensions).…`
  * (Verify/Bench/tests all do). Injection points intentionally live here
  * rather than ad hoc at call sites.
  */
object GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SimilarityRewriteSeam)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      graft.functions.CosineSimilarity.info,
      graft.functions.CosineSimilarity.builder))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      graft.functions.DotProduct.info,
      graft.functions.DotProduct.builder))
  }
}

/** Placeholder optimizer rule marking the planned rewrite seam.
  *
  * The intended production rule (not needed for correctness, SURVEY §4.3):
  * recognize `GlobalLimit(k, Sort(sim desc, Join(cond = a.id < b.id)))`
  * over a cosine-similarity expression and rewrite the O(n²) pair join into
  * the SimHash/LSH bucketed candidate join (VectorOps.minhashPairs shape),
  * falling back to brute force below a size threshold. Until that rule
  * lands, the rewrite is done at the API level by choosing the
  * `dedup_near_minhash` / `dedup_simhash` operators for large inputs.
  */
object SimilarityRewriteSeam extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan
}
