package graft

import org.apache.spark.sql.functions._

/** The Stage materialization seam (VERDICT r5 item 7): localCheckpoint by
  * default, RELIABLE checkpoint when a checkpoint dir is configured —
  * the cluster deployment shape where executor loss must not kill an
  * iterative query. Same results either way.
  */
class StageSpec extends SparkSpec {
  import spark.implicits._

  test("reliable-checkpoint path: same CC results, files in the ckpt dir") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = operators.TextOps.ngramJaccardPairs(docs, 0.4)
    val localRes = operators.TextCluster
      .connectedComponents(docs.select(col("doc_id")), pairs)
      .orderBy("doc_id").collect().toSeq
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_reliable_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val reliableRes = operators.TextCluster
        .connectedComponents(docs.select(col("doc_id")), pairs)
        .orderBy("doc_id").collect().toSeq
      assert(reliableRes == localRes,
        "reliable-checkpoint run must match the localCheckpoint run")
      def count(d: java.io.File): Int =
        d.listFiles() match {
          case null => 0
          case fs => fs.map(f => if (f.isDirectory) count(f) else 1).sum
        }
      assert(count(new java.io.File(ckptDir)) > 0,
        "reliable run must write checkpoint files to the configured dir")
    } finally {
      // Option(null) → None inside setCheckpointDir: restores the shared
      // session to the localCheckpoint default for later suites.
      spark.sparkContext.setCheckpointDir(null)
    }
  }
}
