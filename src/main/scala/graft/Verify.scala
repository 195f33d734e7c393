package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Usage: Verify <sfDir> <outDir> [queryName...] — trailing names
    // restrict the dump for fast local iteration; the driver passes two
    // args and gets every declared query.
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query...]")
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // CBO from session start — see GraftSession.builder (order-
      // independence; only ANALYZEd graft_cbo_* tables carry stats).
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      // The sf dirs are single-file tables; 8 MB splits restore scan
      // parallelism for per-row HOF-heavy operators (simhash/rolling-hash
      // folds ran on ONE task otherwise). At cluster scale inputs are
      // many files and the 128 MB default is right.
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      // Bucketed-layout co-location (round-10, see GraftSession.builder).
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Layout contract (round-6 post-mortem): the loader's ts-unit handling
    // must land events inside the corpus's documented era. A testdata
    // regeneration that changes the physical layout now fails HERE with a
    // named error instead of as 12 silent wrong-answer oracle rows (the
    // round-5 failure mode: int64-ns assumption applied to timestamp[us]
    // collapsed the 30-day corpus to ~43 minutes of 1970).
    locally {
      val maxTs = Tables.load(spark, sfDir, "events")
        .agg(org.apache.spark.sql.functions.max("ts")).head.getTimestamp(0)
      val yr = maxTs.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
      require(yr >= 2020 && yr <= 2035,
        s"events ts-unit contract violated: max(ts)=$maxTs (year $yr) is " +
          s"outside 2020..2035 — the parquet layout of $sfDir/events.parquet " +
          "and Tables.loadEvents' sniff disagree")
    }
    new java.io.File(outDir).mkdirs()
    // Full-surface timing trip-wire (VERDICT r6 item 4): BENCH times only
    // the 20 headline keys; the other 238 had no per-query timing record,
    // so a perf regression there only showed up as total Verify
    // wall-clock (the round-5 text_tokenize_tf regression was caught by
    // bench luck). Every key's construct+execute+write seconds land in
    // outDir/times.json; tools/time_delta.py diffs two rounds' files and
    // reports the top deltas (fail-soft — report, not gate: absolute
    // times at sf0.01 carry ±30% environment noise).
    val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val dt = (System.nanoTime() - t0) / 1e9
        times += name -> dt
        // Stdout timing line per query (driver ignores stdout; the scale
        // runs read these to find the slow tail).
        println(f"[verify-time] $name $dt%.2f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/times.json"),
      times.sortBy(_._1)
        .map { case (k, v) => f""""$k": $v%.3f""" }
        .mkString("{", ", ", "}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-reported evidence for the no-oracle approximate rows (round-6,
    // extended round-10 per VERDICT r9 item 5): every no-oracle key with an
    // exact in-engine twin compares against that twin and the measured
    // error/recall lands in the round artifact, machine-readable — the
    // "spec by design" rows carry numbers, not just a label. Each check is
    // individually fail-soft (an error line instead of a silent omission).
    locally {
      import org.apache.spark.sql.functions._
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      def check(key: String)(body: => String): Unit =
        try {
          val l = body
          lines += s"""${q(key)}: $l"""
          println(s"[verify-selfcheck] $key $l")
        } catch { case e: Throwable =>
          lines += s"""${q(key)}: {"error": ${q(String.valueOf(e.getMessage))}, "pass": false}"""
          System.err.println(s"[verify] selfcheck $key failed: ${e.getMessage}")
        }
      // Raw Double interpolation would emit NaN/Infinity — unparseable
      // JSON, and `NaN >= floor` is silently false — so non-finite values
      // become an explicit thrown error (check() turns it into a parseable
      // {"error": ..., "pass": false} line) instead of a corrupt artifact
      // (advice round-11).
      def finite(label: String, v: Double): Double = {
        require(!v.isNaN && !v.isInfinite, s"non-finite $label: $v")
        v
      }
      def relLine(err: Double, tol: Double) = {
        val e = finite("rel_err", err)
        s"""{"max_rel_err": $e, "tolerance": $tol, "pass": ${e <= tol}}"""
      }
      def recallLine(r: Double, floor: Double, extra: String = "") = {
        val rr = finite("recall", r)
        s"""{"recall": $rr, "floor": $floor$extra, "pass": ${rr >= floor}}"""
      }

      // Sketch aggregates vs exact twins (tolerance = 3× configured rsd,
      // the VectorSpec convention).
      check("agg_approx_distinct") {
        val orders = Tables.load(spark, sfDir, "orders")
        val exactD = orders.groupBy("o_orderstatus")
          .agg(countDistinct(col("o_custkey")).as("exact"))
        val relD = SparkEntry.queries("agg_approx_distinct")(spark, sfDir)
          .join(exactD, "o_orderstatus")
          .agg(max(abs(col("approx_cust") - col("exact")) / col("exact")))
          .head.getDouble(0)
        relLine(relD, 3 * 0.02)
      }
      check("agg_approx_percentile") {
        val orders = Tables.load(spark, sfDir, "orders")
        val exactP = orders.groupBy("o_orderstatus")
          .agg(expr("percentile(o_totalprice, array(0.5, 0.9))").as("ex"))
        val relP = SparkEntry.queries("agg_approx_percentile")(spark, sfDir)
          .select(col("o_orderstatus"),
            expr("transform(split(approx_p, ','), x -> cast(x as double))")
              .as("ap"))
          .join(exactP, "o_orderstatus")
          .agg(max(expr(
            "aggregate(zip_with(ap, ex, (a, e) -> abs(a - e) / e), 0d, " +
              "(acc, x) -> greatest(acc, x))")))
          .head.getDouble(0)
        relLine(relP, 0.10)
      }

      // ANN retrieval recall vs the exact cosine kernel (floors match the
      // AnnSpec convention: this synthetic corpus is near-orthogonal, so
      // 48-bit SRP is a weak-signal regime by construction — the check
      // guards the MECHANICS regressing to zero, the measured number is
      // the dashboard value).
      lazy val exactTop100: Set[(Long, Long)] = {
        val emb = Tables.load(spark, sfDir, "embeddings")
        graft.operators.VectorOps.similarityTopKPairs(spark, emb, k = 100,
            maxBroadcastBytes = Long.MaxValue, maxExactRows = Long.MaxValue)
          .select("a_id", "b_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      check("ann_lsh_topk") {
        val approx = SparkEntry.queries("ann_lsh_topk")(spark, sfDir)
          .select("a_id", "b_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // Empty truth = vacuous recall 1.0 (the dedup convention), never
        // a 0/0 NaN.
        val rec = if (exactTop100.isEmpty) 1.0
          else approx.intersect(exactTop100).size.toDouble / exactTop100.size
        recallLine(rec, 0.3)
      }
      check("ann_recall_report") {
        // The declared query IS a recall report — surface its k=100 row.
        val r = SparkEntry.queries("ann_recall_report")(spark, sfDir)
          .filter(col("k") === 100).head.getAs[Double]("recall")
        recallLine(r, 0.3)
      }

      // MinHash-LSH dedup recall vs the exact n-gram Jaccard pass (forced
      // exact; every minhash pair is already exact-Jaccard-verified, so
      // precision is 1.0 by construction and recall is the open number).
      check("dedup_near_minhash") {
        val docs = Tables.load(spark, sfDir, "documents")
        val truth = graft.operators.TextOps
          .ngramJaccardPairs(docs, 0.4, maxExactRows = Long.MaxValue)
          .select("a_id", "b_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = SparkEntry.queries("dedup_near_minhash")(spark, sfDir)
          .select("a_id", "b_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = if (truth.isEmpty) 1.0
          else got.intersect(truth).size.toDouble / truth.size
        recallLine(rec, 0.5, s""", "n_truth": ${truth.size}""")
      }

      // SimHash exact-twin property: identical texts MUST fingerprint
      // identically (the deterministic-content-hash contract; near-dup
      // sensitivity is DedupSpec's planted-pair territory).
      check("dedup_simhash") {
        val docs = Tables.load(spark, sfDir, "documents")
        val viol = SparkEntry.queries("dedup_simhash")(spark, sfDir)
          .join(docs.select("doc_id", "text"), "doc_id")
          .groupBy("text").agg(countDistinct("simhash").as("nd"))
          .filter(col("nd") > 1).count()
        s"""{"identical_text_fingerprint_violations": $viol, "pass": ${viol == 0L}}"""
      }

      Files.writeString(Paths.get(s"$outDir/selfcheck.json"),
        lines.mkString("{", ", ", "}"))
    }
    spark.stop()
  }
}
