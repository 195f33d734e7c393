package graft.scale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** exact_dedup cost decomposition at the replica tier (round 14): the key
  * stayed >2× vs DuckDB after the layout and cache levers, so attribute
  * its wall-clock to scan vs hash vs shuffle+agg before deciding whether
  * a floor or a fix remains. Best-of-3 per stage, same session.
  * Usage: DedupFloorProbe [unique] [declared-only] [sfDir]
  *   unique        — synthesize a 5 M mostly-unique corpus instead of sfDir
  *   declared-only — run just the declared key, best-of-3
  *   sfDir         — data directory (default /tmp/sfx1000); flags are
  *                   parsed separately so `DedupFloorProbe unique` does not
  *                   read tables from a directory named "unique" (ADVICE
  *                   r17).
  */
object DedupFloorProbe {
  private val Flags = Set("unique", "declared-only")
  def main(args: Array[String]): Unit = {
    val sfDir = args.filterNot(Flags).headOption.getOrElse("/tmp/sfx1000")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `unique` arg (round-17): the sfx replicas are CLONE-HEAVY by
    // construction (~1000 copies/text), where the partial aggregate
    // collapses 1000× and both agg-exec classes are digest-bound. The
    // 100 TB dedup contract is the MOSTLY-UNIQUE corpus (TextOps
    // scaladoc) — synthesize one (5 M distinct ~120-char texts) so the
    // SortAggregate-vs-HashAggregate A/B measures the near-unique shape
    // where per-partition sorts of the full corpus actually bite.
    val docs =
      if (args.contains("unique"))
        spark.range(5000000L).select(col("id").as("doc_id"),
          concat(lit("synthetic document body with a distinct suffix "),
            md5(col("id").cast("string")),
            lit(" padding padding padding padding padding padding "),
            md5((col("id") + 7L).cast("string"))).as("text"))
      else graft.Tables.load(spark, sfDir, "documents")

    def best3(label: String)(f: => Long): Unit = {
      f
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[dedupfloor] $label%-28s best3=$t%.3f s")
    }
    // `declared-only` arg: skip the decomposition stages (same-boot A/B
    // driver runs just the declared key, best-of-3).
    if (args.contains("declared-only")) {
      best3("declared exact_dedup")(
        graft.SparkEntry.queries("exact_dedup")(spark, sfDir).count())
      spark.stop()
      return
    }
    best3("scan text count")(docs.select("text").count())
    best3("scan text length-sum")(
      docs.select(sum(length(col("text")))).count())
    best3("xxhash64(text) agg")(
      docs.groupBy(xxhash64(col("text")).as("fp"))
        .agg(min("doc_id")).count())
    best3("md5(text) count only")(
      docs.select(md5(col("text")).as("fp")).filter(col("fp").isNotNull)
        .count())
    best3("md5 group no sort")(
      docs.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("s"), count(lit(1)).as("n")).count())
    // Round-15 lever (VERDICT r14 #1): on near-unique keys the partial
    // aggregate reduces nothing — it is a full 5 M-entry hash build paid
    // before the exchange. Single-phase = repartition on the fp, then ONE
    // per-partition aggregation. Two candidates:
    //  (a) repart+groupBy — exchange satisfied, but Spark still plans
    //      partial+final back-to-back (no skip-partial in OSS), so this
    //      isolates the exchange-position cost;
    //  (b) repart+mapPartitions — a genuine single hash build (typed
    //      path, pays row⇄tuple ser/de instead of the second build).
    best3("repart(fp)+groupBy")(
      docs.select(md5(col("text")).as("fp"), col("doc_id"))
        .repartition(col("fp"))
        .groupBy("fp")
        .agg(min(col("doc_id")).as("s"), count(lit(1)).as("n")).count())
    best3("1phase repart+mapPart") {
      import spark.implicits._
      docs.select(md5(col("text")).as("fp"), col("doc_id"))
        .as[(String, Long)]
        .repartition(col("fp"))
        .mapPartitions { it =>
          val m = new java.util.HashMap[String, Array[Long]](1 << 16)
          while (it.hasNext) {
            val (fp, id) = it.next()
            val cur = m.get(fp)
            if (cur == null) m.put(fp, Array(id, 1L))
            else { if (id < cur(0)) cur(0) = id; cur(1) += 1L }
          }
          import scala.jdk.CollectionConverters._
          m.entrySet().iterator().asScala
            .map(e => (e.getKey, e.getValue()(0), e.getValue()(1)))
        }.toDF("fp", "survivor_id", "n_copies").count()
    }
    // Round-15: thread-local-digest md5 (graft.functions.FastMd5) vs
    // Spark's per-row DigestUtils.md5Hex — same output bytes.
    graft.operators.VectorOps.registerFns(spark)
    best3("fast_md5 count only")(
      docs.select(call_function("fast_md5", col("text")).as("fp"))
        .filter(col("fp").isNotNull).count())
    // Round-18 memo isolation (VERDICT r17 missing #2): the hi+lo PAIR
    // per row. With the thread-local digest memo this arm pays ONE digest
    // per row (≈ the single-hash arm above); without it, two.
    best3("fast_md5 hi+lo pair count")(
      docs.select(call_function("fast_md5_hi", col("text")).as("h"),
          call_function("fast_md5_lo", col("text")).as("l"))
        .filter(col("h").isNotNull && col("l").isNotNull).count())
    best3("fast_md5 group no sort")(
      docs.groupBy(call_function("fast_md5", col("text")).as("fp"))
        .agg(min(col("doc_id")).as("s"), count(lit(1)).as("n")).count())
    best3("fast_md5 full (w/ sort)")(
      docs.groupBy(call_function("fast_md5", col("text")).as("fp"))
        .agg(min(col("doc_id")).as("survivor_id"),
          count(lit(1)).as("n_copies"))
        .orderBy("survivor_id").count())
    // Round-15: group by TEXT first — the partial agg dedups 5 M → ~5 k
    // rows/task via cheap hash-table probes (xxhash over the bytes, no
    // digest), so md5 runs only on the ~5 k DISTINCT texts post-shuffle;
    // the fp re-aggregation keeps output bit-identical to
    // GROUP BY md5(text) even under an md5 collision.
    best3("group text first (w/ sort)")(
      docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("sid"), count(lit(1)).as("n"))
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("sid")).as("survivor_id"), sum(col("n")).as("n_copies"))
        .orderBy("survivor_id").count())
    best3("declared exact_dedup")(
      graft.SparkEntry.queries("exact_dedup")(spark, sfDir).count())
    // Round-17 lever: the declared shape's first(fast_md5(text)) carries a
    // STRING aggregate buffer, which disqualifies HashAggregateExec
    // (UnsafeRow buffers must be fixed-width) — the executed plan is a
    // SortAggregate with a full per-partition sort on BOTH sides of the
    // exchange. This arm keeps the identical output (md5 carried as two
    // long halves, hex-rendered after the aggregate) with an all-long
    // buffer, restoring the two-phase hash aggregate.
    // The r16 declared shape (string-buffer first() → SortAggregate),
    // kept as the control arm for the round-17 A/B.
    best3("sortagg first(md5-string) r16")(
      docs.groupBy(xxhash64(col("text")).as("xh1"),
          hash(col("text")).as("mh2"), crc32(col("text")).as("ch3"))
        .agg(first(call_function("fast_md5", col("text"))).as("fp"),
          min(col("doc_id")).as("survivor_id"),
          count(lit(1)).as("n_copies"))
        .select("fp", "survivor_id", "n_copies")
        .orderBy("survivor_id").count())
    best3("hashagg first(md5-longs)")(
      docs.groupBy(xxhash64(col("text")).as("xh1"),
          hash(col("text")).as("mh2"), crc32(col("text")).as("ch3"))
        .agg(first(call_function("fast_md5_hi", col("text"))).as("hi"),
          first(call_function("fast_md5_lo", col("text"))).as("lo"),
          min(col("doc_id")).as("survivor_id"),
          count(lit(1)).as("n_copies"))
        .select(concat(lpad(lower(hex(col("hi"))), 16, "0"),
            lpad(lower(hex(col("lo"))), 16, "0")).as("fp"),
          col("survivor_id"), col("n_copies"))
        .orderBy("survivor_id").count())
    spark.stop()
  }
}
