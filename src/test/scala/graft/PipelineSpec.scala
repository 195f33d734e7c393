package graft

import graft.operators.DocAssembly
import graft.pipeline.{Migration, Pipeline}
import graft.sources.{ParquetSink, ParquetSource}
import graft.streaming.Streams
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The trireme end-to-end shape: source → document transform → bulk sink,
  * batch and micro-batch, over the exercisable parquet endpoints. */
class PipelineSpec extends SparkSpec {

  test("batch migration: customer table -> search documents -> sink") {
    val out = Files.createTempDirectory("graft_migr").toString + "/docs"
    val m = Migration(
      source = ParquetSource,
      sourceConf = Map("dir" -> sfDir, "table" -> "customer"),
      transform = df => df.select(
        col("c_custkey").as("id"),
        upper(col("c_name")).as("name_s"),
        col("c_mktsegment").as("segment_s"),
        col("c_acctbal").cast("decimal(12,2)").cast("string").as("acctbal_d")),
      sink = ParquetSink,
      sinkConf = Map("path" -> out))
    val n = Pipeline.run(spark, m)
    assert(n == 150) // sf0.001 customers
    val readback = spark.read.parquet(out)
    assert(readback.count() == 150)
    assert(readback.columns.toSet == Set("id", "name_s", "segment_s", "acctbal_d"))
  }

  test("dead-letter channel: malformed CSV rows divert, load completes") {
    val base = Files.createTempDirectory("graft_dlq").toString
    // 3 valid rows, 2 malformed (non-numeric id / truncated line).
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/in.csv"),
      ("id,name,score\n1,alpha,10.5\nnot_a_number,beta,2.0\n" +
        "2,gamma,7.25\n3,delta\n4,epsilon,1.0\n").getBytes("UTF-8"))
    val m = Migration(
      source = graft.sources.CsvSource,
      sourceConf = Map(
        "path" -> s"$base/in.csv",
        "schema" -> "id BIGINT, name STRING, score DOUBLE, _corrupt_record STRING"),
      transform = df => df.select(col("id"), upper(col("name")).as("name_s"),
        col("score").as("score_d")),
      sink = ParquetSink,
      sinkConf = Map("path" -> s"$base/docs"))
    val (good, bad) = Pipeline.runWithDeadLetter(spark, m,
      isValid = col("_corrupt_record").isNull, s"$base/dead")
    assert(good == 3 && bad == 2, s"good=$good bad=$bad")
    val docs = spark.read.parquet(s"$base/docs")
    assert(docs.count() == 3 &&
      docs.columns.toSet == Set("id", "name_s", "score_d"))
    // Diverted rows keep their RAW line for replay after repair.
    val dead = spark.read.parquet(s"$base/dead")
      .select("_corrupt_record").collect().map(_.getString(0)).toSet
    assert(dead == Set("not_a_number,beta,2.0", "3,delta"))
  }

  test("declared solr_doc_assembly output feeds the sink unchanged") {
    val out = Files.createTempDirectory("graft_migr2").toString + "/docs"
    val docs = DocAssembly.solrDocAssembly.fn(spark, sfDir)
    ParquetSink.save(docs, Map("path" -> out))
    assert(spark.read.parquet(out).count() == docs.count())
  }

  test("streaming migration: events stream -> transform -> per-batch sink") {
    val feed = Files.createTempDirectory("graft_migr_feed").toString
    Tables.load(spark, sfDir, "events")
      .limit(500).coalesce(1).write.parquet(s"$feed/f0")
    val d = new java.io.File(feed)
    d.listFiles().filter(_.isDirectory).foreach { sub =>
      sub.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath, new java.io.File(d, "p0.parquet").toPath)
      }
      sub.listFiles().foreach(_.delete()); sub.delete()
    }
    val outDir = Files.createTempDirectory("graft_migr_out").toString
    var batches = 0
    val sunk = scala.collection.mutable.ArrayBuffer.empty[Long]
    val m = Migration(
      source = ParquetSource, sourceConf = Map.empty, // stream-side source
      transform = df => df.select(col("event_id").as("id"),
        col("event_type").as("type_s"), col("value").as("value_d")),
      sink = new graft.sources.DocumentSink {
        def save(df: org.apache.spark.sql.DataFrame,
            conf: Map[String, String]): Unit = {
          batches += 1; sunk += df.count()
        }
      },
      sinkConf = Map.empty)
    val q = Pipeline.runStreaming(
      Streams.eventsStream(spark, feed),
      m, Files.createTempDirectory("graft_ckpt_migr").toString)
    q.awaitTermination()
    assert(batches >= 1 && sunk.sum == 500, s"batches=$batches rows=${sunk.sum}")
  }
}
