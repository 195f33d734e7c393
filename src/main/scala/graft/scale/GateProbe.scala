package graft.scale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Diagnostic: print every input to q5's customer-arm gate decision at a
  * given corpus dir (plan-stats bytes, measured counts, the
  * Dims.localizeSmall outcome + its wall cost). Round-11 used it to pin
  * the sfx100 regression where localize refusal forced an
  * optimizer-broadcastable arm onto shuffle_hash — keep it for future
  * gate forensics. Usage: GateProbe <sfDir>. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = SparkSession.builder().master("local[32]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val custProj = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val custBytes = custProj.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"custBytes=$custBytes thresh=${
      org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold}")
    val asiaSuppliersArm = Tables.load(s, dir, "supplier")
      .join(Tables.load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    println(s"asiaSuppliers count=${asiaSuppliersArm.count()}")
    val asiaNationKeys = asiaSuppliersArm.select(col("s_nationkey").as("an")).distinct()
    val custAsia = custProj.join(broadcast(asiaNationKeys), col("c_nationkey") === col("an"))
      .select(col("c_custkey"), col("c_nationkey"))
    println(s"custAsia stats=${custAsia.queryExecution.optimizedPlan.stats.sizeInBytes}")
    println(s"custAsia count=${custAsia.count()}")
    val t0 = System.nanoTime()
    val loc = graft.Dims.localizeSmall(custAsia, "probe#custAsia", 16)
    println(s"localize=${loc.isDefined} in ${(System.nanoTime()-t0)/1e9}s")
    s.stop()
  }
}
