package graft.scale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.VectorOps
object BandProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    VectorOps.registerFns(s)
    val dims = args(1).toInt
    val e = Tables.load(s, args(0), "embeddings").select(col("vec_id"), col("embedding"))
    // replicate bandKeys: 8 bands x bpb bits, planes via AnnOps.plane is private;
    // approximate with same-shape typedLit planes
    def plane(i: Int, dims: Int): Seq[Double] = {
      (0 until dims).map { d =>
        var z = i.toLong * 0x9E3779B97F4A7C15L + d * 0xC2B2AE3D27D4EB4FL
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
      }
    }
    val bands = 8; val bpb = 9
    val keys = (0 until bands).map { b =>
      (0 until bpb).map { i =>
        when(call_function("dot_product", col("embedding"),
          typedLit(plane(b * bpb + i, dims))) > 0d, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label n=$n t=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    time("scan        ")(e.count())
    time("bandkeys    ")(e.select(col("vec_id"), posexplode(array(keys: _*))).count())
    val banded = e.select(col("vec_id"), posexplode(array(keys: _*)))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("bucket"))
    val stats = banded.groupBy("band", "bucket").agg(count(lit(1)).as("bk_n"), min("vec_id").as("bk_rep"))
    val withStats = banded.join(stats, Seq("band", "bucket"))
    val small = withStats.filter(col("bk_n") <= 256)
    val allPairs = small.select(col("band"), col("bucket"), col("vec_id").as("a_id"))
      .join(small.select(col("band"), col("bucket"), col("vec_id").as("b_id")), Seq("band", "bucket"))
    val starPairs = withStats.filter(col("bk_n") > 256)
      .select(col("band"), col("bucket"), col("bk_rep").as("a_id"), col("vec_id").as("b_id"))
    val cands = allPairs.unionByName(starPairs)
      .filter(col("a_id") < col("b_id")).select("a_id", "b_id").distinct()
    time("candidates  ")(cands.count())
    val ea = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val eb = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    time("verify      ")(cands.join(ea, "a_id").join(eb, "b_id")
      .withColumn("sim", call_function("cosine_sim", col("ea"), col("eb")))
      .filter(col("sim") > -2).count())
    s.stop()
  }
}
