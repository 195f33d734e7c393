package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** SURVEY §2-I: Structured Streaming runtime for the events schema.
  *
  * The declared batch forms (operators.StreamingBatch) and these streaming
  * plans are the SAME logical plans — `window`/`session_window`/
  * `dropDuplicates` are incremental-safe, so correctness is proven once by
  * the DuckDB oracle and re-proven incrementally by StreamingSpec feeding
  * files one micro-batch at a time.
  *
  * Scale: stateful operators keep per-key state in the executor StateStore
  * (RocksDB-backed on a real cluster) partitioned by the grouping key, and
  * the watermark bounds state size — the standard 1000-executor deployment
  * shape. Checkpointing goes to the sink-provided checkpoint dir (HDFS/S3
  * in production).
  */
object Streams {

  /** File-source stream over an events-schema directory, normalized to the
    * TimestampType `ts` the batch loader produces. The physical layout is
    * sniffed once at stream definition (same footer check as
    * [[Tables.loadEvents]]): timestamp-typed feeds read natively, legacy
    * ns-Long feeds get the floor ns→µs conversion. Feed files must share
    * one layout — the file source applies a single schema to the dir. */
  def eventsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    Tables.eventsTsType(spark, dir) match {
      case t @ (TimestampType | TimestampNTZType) =>
        spark.readStream
          .schema(Tables.eventsReadSchema(t))
          .option("maxFilesPerTrigger", maxFilesPerTrigger)
          .parquet(dir)
          .withColumn("ts", col("ts").cast(TimestampType))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case _ =>
        spark.readStream
          .schema(Tables.eventsRaw)
          .option("maxFilesPerTrigger", maxFilesPerTrigger)
          .parquet(dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
    }
  }

  /** I1 — tumbling windows, incremental. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** I3 — session windows, incremental (requires watermark in append mode). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** I4 — watermarked tumbling aggregation: rows later than `delay` behind
    * the max event time are dropped and window state is evicted. */
  def watermarkedCounts(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("n"))

  /** I5 — streaming dedup bounded by watermark. */
  def dedupWithinWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Running per-user state maintained by I6. */
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** I6 — custom stateful processing: per-user running totals via
    * mapGroupsWithState (KeyValueGroupedDataset surface). */
  def userRunningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .selectExpr("user_id", "CAST(value AS DOUBLE) AS value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserRunning(user, n, total)
          state.update(next)
          next
      }
      .toDF()
  }

  /** I6 (Spark 4 API) — the same per-user running totals on
    * `transformWithState` (StatefulProcessor + typed ValueState), the
    * successor to mapGroupsWithState with explicit state handles, TTL, and
    * timer support. Requires the RocksDB state-store provider (the 100 TB
    * deployment default anyway). */
  def userRunningTotalsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    class RunningTotals extends StatefulProcessor[Long, (Long, Double), UserRunning] {
      @transient private var state: ValueState[UserRunning] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getValueState[UserRunning]("running",
          Encoders.product[UserRunning], TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
          timerValues: TimerValues): Iterator[UserRunning] = {
        val prev = Option(state.get()).getOrElse(UserRunning(key, 0L, 0.0))
        var n = prev.n_events
        var total = prev.total_value
        rows.foreach { case (_, v) => n += 1; total += v }
        val next = UserRunning(key, n, total)
        state.update(next)
        Iterator.single(next)
      }
    }
    events
      .selectExpr("user_id", "CAST(value AS DOUBLE) AS value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotals, TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Closed-session record emitted by the timer-driven sessionizer. */
  final case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)

  /** I6 (timer API) — timer-driven sessionization on `transformWithState`:
    * per-user PENDING sessions (start, end, count intervals) in ListState
    * plus an EVENT-TIME timer at each session's end + gap; a session emits
    * exactly once, from the timer handler, only after the watermark passes
    * its end + gap — the timeout-emission pattern `session_window` can't
    * express (emit on inactivity, not on next-batch arrival). Until then a
    * late row (within the watermark delay, any later micro-batch) can still
    * extend a pending session or bridge two of them, so emitted sessions
    * are always a subset of the batch gap-split. State is a handful of
    * interval rows + timers per ACTIVE user, watermark-bounded — the
    * 1000-executor shape. StreamingSpec proves emitted ⊆ batch-split and
    * closure for every session whose timeout precedes the final watermark,
    * on both chronological and DISORDERED feeds. */
  def timedSessionsTws(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    class Sessionizer extends StatefulProcessor[Long, (Long, Long), ClosedSession] {
      // ALL un-emitted sessions (open or gap-closed) stay in state until a
      // timer confirms the watermark has passed end+gap. Nothing is emitted
      // from handleInputRows: a session that looks closed inside a batch
      // can still be extended — or BRIDGED to its neighbor — by a
      // legitimately-late row (within the watermark delay) arriving in a
      // later micro-batch, and an inline emit would have made that session
      // a phantom the batch gap-split doesn't contain.
      @transient private var state: ListState[ClosedSession] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getListState[ClosedSession]("sessions",
          Encoders.product[ClosedSession], TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
          timerValues: TimerValues): Iterator[ClosedSession] = {
        // Interval-merge the pending sessions with the batch rows (as
        // 1-event intervals): sort by start, fold, merge when the next
        // interval starts within gap of the current end. This is exactly
        // the batch gap-split over the union of all rows seen so far that
        // the watermark has not yet finalized — per-key pending state is
        // a handful of intervals, not the corpus.
        val all = (state.get().toSeq ++
          rows.map { case (_, ts) => ClosedSession(key, ts, ts, 1L) })
          .sortBy(s => (s.start_ms, s.end_ms))
        val merged = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        all.foreach { s =>
          merged.lastOption match {
            case Some(p) if s.start_ms <= p.end_ms + gapMs =>
              merged(merged.length - 1) = ClosedSession(key,
                math.min(p.start_ms, s.start_ms),
                math.max(p.end_ms, s.end_ms), p.n_events + s.n_events)
            case _ => merged += s
          }
        }
        state.put(merged.toArray)
        // One timer per pending session, at end+gap+1: the merge above is
        // INCLUSIVE (a row with ts == end+gap still merges) while a timer
        // at end+gap would fire once the watermark merely REACHES that
        // instant — when such a row is not yet late (ts >= watermark is
        // admissible). +1 ms makes emission strictly postdate every
        // mergeable timestamp (round-5 ADVICE fix). Stale timers (from
        // sessions later extended or bridged) fire harmlessly: the expiry
        // guard below only emits sessions whose CURRENT end+gap the
        // watermark strictly passed.
        merged.foreach(s => getHandle.registerTimer(s.end_ms + gapMs + 1))
        Iterator.empty
      }
      override def handleExpiredTimer(key: Long, timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
        val expiry = expiredTimerInfo.getExpiryTimeInMs()
        val (closed, open) = state.get().toSeq
          .partition(s => s.end_ms + gapMs < expiry)
        if (open.isEmpty) state.clear() else state.put(open.toArray)
        closed.sortBy(_.start_ms).iterator
      }
    }
    events
      // The delay is the caller's disorder tolerance: rows later than it
      // are dropped BEFORE the sessionizer (standard watermark contract);
      // within it, disorder is fully absorbed — ACROSS micro-batches too —
      // because sessions stay in state until the watermark passes end+gap
      // and only the timer handler emits.
      .withWatermark("ts", watermarkDelay)
      .selectExpr("user_id", "unix_millis(ts) AS ts_ms")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new Sessionizer, TimeMode.EventTime(),
        OutputMode.Append())
      .toDF()
  }

  /** I8 — stream-stream interval join: purchases attributed to a same-user
    * view within [v_ts, v_ts + 30 min). Both sides carry watermarks and the
    * range condition bounds buffered state: a view is evicted once the
    * watermark passes v_ts + 30 min, a purchase once it passes p_ts — the
    * canonical bounded-state stream-stream join. Shuffle key on both sides
    * is user_id (high-cardinality), so state partitions evenly at scale.
    * The join itself is the SAME condition the batch twin
    * (operators.EventsOps.eventsAttribution) verifies against DuckDB. */
  def attributionJoin(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    v.join(p, col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("v_ts"), col("p_ts"), col("value"))
  }

  /** I8b — LEFT OUTER stream-stream interval join: every view row emits —
    * matched purchases inline, UNMATCHED views with NULL purchase columns
    * once the watermark passes v_ts + 30 min (outer emission is
    * state-expiry-driven: Structured Streaming can only declare a view
    * permanently unmatched when no qualifying purchase can still arrive).
    * Same keys, watermarks, and state bounds as [[attributionJoin]]; on a
    * batch frame the watermark is a no-op and this is a plain left join —
    * the equivalence StreamingSpec pins with a sentinel-flushed feed. */
  def attributionJoinLeftOuter(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    v.join(p, col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("v_ts"), col("p_ts"), col("value"))
  }

  /** I9 — stream-static broadcast enrich: every micro-batch hash-joins the
    * static customer dimension (re-planned per batch, so a slowly-changing
    * dim picks up updates between batches — Spark's documented
    * stream-static semantics). LEFT join keeps dimension misses as a NULL
    * segment; the per-segment rollup is the deterministic declared shape.
    * The batch twin is operators.StreamingBatch.staticEnrich (DuckDB
    * oracle). */
  def staticEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(org.apache.spark.sql.functions.broadcast(dim),
        col("user_id") === col("c_custkey"), "left_outer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))

  /** I10 — streaming percolator: stored AND-semantics term queries
    * evaluated against a DOCUMENT STREAM (the alerting/saved-search
    * shape; operators.IndexOps.searchPercolate is the batch twin). Each
    * query compiles to a STATELESS scan-side predicate — "tokens contain
    * every term" — so the whole operator is select/filter/union with no
    * aggregation state, runs in append mode, and needs no watermark: a
    * matched (query_id, doc_id) emits in the micro-batch the doc arrives
    * in. The stored-query set is bounded by nature (it parameterizes the
    * PLAN, the way a percolator compiles queries into its match network);
    * query-set changes redeploy the stream, which is how saved-search
    * topologies actually roll out. */
  def percolateStream(docs: DataFrame,
      queries: Seq[(String, Seq[String])]): DataFrame = {
    val toks = split(col("text"), " ")
    queries.map { case (qid, terms) =>
      docs.filter(terms.map(tm => array_contains(toks, tm))
          .reduce(_ && _))
        .select(lit(qid).as("query_id"), col("doc_id"))
    }.reduce(_ unionByName _)
  }

  /** One stored (doc_id, signature) entry of a streaming LSH bucket. */
  final case class BucketEntry(doc_id: Long, sig: Seq[Long])

  /** Emitted streaming near-dup candidate (minhash-estimated jaccard). */
  final case class NearDupPair(a_id: Long, b_id: Long, est_jaccard: Double)

  /** I6×K2 — STREAMING minhash near-duplicate detection: the
    * continuous-ingest twin of the batch banded-LSH dedup, built on
    * `transformWithState` with TTL-BOUNDED bucket state (round 8).
    *
    * Each arriving doc computes its one-pass native minhash signature
    * (the MinHashSig kernel over whitespace tokens), splits it into
    * `bands` band keys, and is routed to the matching bucket's
    * StatefulProcessor. The bucket holds the (doc_id, sig) entries seen
    * within the TTL window in ListState — new docs compare lane-by-lane
    * against the stored entries (estimated jaccard = matching lanes / k,
    * the standard minhash estimator) and emit every pair clearing
    * `threshold`.
    *
    * The two state bounds are what make this the 100 TB-ingest shape:
    *  - TTL (processing-time) expires bucket entries, so state size is
    *    (ingest rate × TTL), not corpus size — the dedup window a
    *    continuous pipeline actually wants (exact-history dedup is the
    *    stored-index batch path, minhash_index_build + incremental join);
    *  - `bucketCap` stops appending to degenerate hot buckets (the
    *    batch star-collapse precedent): clone floods keep matching the
    *    capped representatives but cannot grow state quadratically.
    *
    * A pair colliding in several bands may emit more than once (same as
    * batch candidate generation before its distinct); the consumer
    * dedups — one `dropDuplicates` in the sink batch.
    *
    * Operational note: ProcessingTime TimeMode interacts with
    * `Trigger.AvailableNow` — no-data micro-batches keep firing to
    * advance the TTL clock and a drain-style run never terminates; a
    * bounded backfill/drain should set
    * `spark.sql.streaming.noDataMicroBatches.enabled=false` (continuous
    * production triggers want the default). StreamingSpec pins this. */
  def nearDupStreamTws(spark: SparkSession, docs: DataFrame,
      numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      stateTtl: java.time.Duration = java.time.Duration.ofHours(1),
      bucketCap: Int = 64): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{ListState, StatefulProcessor, TimeMode, TTLConfig, TimerValues}
    import org.apache.spark.sql.Encoders
    require(numHashes % bands == 0, "bands must divide numHashes")
    val lanes = numHashes / bands
    graft.operators.VectorOps.registerFns(spark)
    val sigged = docs.select(col("doc_id"),
      call_function("minhash_sig", split(col("text"), " "), lit(numHashes))
        .as("sig"))
    val banded = sigged.select(col("doc_id"), col("sig"),
        explode(expr(
          s"""transform(sequence(0, ${bands - 1}),
             |  b -> concat(b, ':', md5(concat_ws(',',
             |    slice(sig, b * $lanes + 1, $lanes)))))""".stripMargin))
          .as("bucket"))
      .select(col("bucket"), col("doc_id"), col("sig"))
      .as[(String, Long, Seq[Long])]
    class BucketDedup
        extends StatefulProcessor[String, (String, Long, Seq[Long]), NearDupPair] {
      @transient private var seen: ListState[BucketEntry] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        seen = getHandle.getListState[BucketEntry]("seen",
          Encoders.product[BucketEntry], TTLConfig(stateTtl))
      override def handleInputRows(key: String,
          rows: Iterator[(String, Long, Seq[Long])],
          timerValues: TimerValues): Iterator[NearDupPair] = {
        val stored = scala.collection.mutable.ArrayBuffer.empty[BucketEntry]
        seen.get().foreach(e => stored += e)
        val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
        // Deterministic within-batch order (micro-batch row order is not
        // guaranteed): process ascending doc_id.
        rows.toSeq.sortBy(_._2).foreach { case (_, id, sig) =>
          if (!stored.exists(_.doc_id == id)) {
            stored.foreach { e =>
              var eq = 0
              var i = 0
              while (i < numHashes) {
                if (e.sig(i) == sig(i)) eq += 1
                i += 1
              }
              val est = eq.toDouble / numHashes
              if (est >= threshold && e.doc_id != id)
                out += NearDupPair(math.min(e.doc_id, id),
                  math.max(e.doc_id, id),
                  math.rint(est * 1e6) / 1e6)
            }
            if (stored.length < bucketCap) {
              val entry = BucketEntry(id, sig)
              stored += entry
              seen.appendValue(entry)
            }
          }
        }
        out.iterator
      }
    }
    banded
      .groupByKey(_._1)
      .transformWithState(new BucketDedup, TimeMode.ProcessingTime(),
        OutputMode.Append())
      .toDF()
  }

  /** I7 — micro-batch sink: per-batch bulk write through a DocumentSink
    * (the Solr-indexing shape: one bulk commit per micro-batch). */
  def foreachBatchSink(df: DataFrame, checkpointDir: String)(
      save: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => save(batch, id) }
      .start()

  /** I7 at production shape — exactly-once lakehouse sink: each micro-batch
    * appends to a GraftLog table via the idempotent (appId, batchId) txn
    * commit, so a restart that replays delivered batches leaves the table
    * contents unchanged — (at-least-once delivery) × (idempotent commit) =
    * exactly-once, the streaming→Delta pattern without the Delta jar.
    * TxLogSpec pins both the happy path and the replay no-op. */
  def txLogSink(spark: SparkSession, df: DataFrame, table: String,
      checkpointDir: String, appId: String): StreamingQuery =
    foreachBatchSink(df, checkpointDir) { (batch, id) =>
      graft.sources.TxLog.appendBatch(spark, table, batch, appId, id)
      ()
    }

  /** Exactly-once streaming UPSERT into a GraftLog table (round-13): each
    * micro-batch MERGEs by `key` under the (appId, batchId) idempotency
    * mark — at-least-once foreachBatch delivery × idempotent
    * [[graft.sources.TxLog.mergeBatch]] = exactly-once table contents,
    * even though MERGE itself is not replay-safe (a re-applied update
    * would double). The streaming CDC-apply shape. Batches must carry
    * unique non-null keys ([[graft.sources.TxLog.merge]]'s Delta
    * multiple-match contract — callers collapse multi-update batches to
    * last-per-key upstream, where the event-order column lives; a silent
    * arbitrary-winner dedup here would be nondeterministic). */
  def txLogMergeSink(spark: SparkSession, df: DataFrame, table: String,
      key: String, checkpointDir: String, appId: String): StreamingQuery =
    foreachBatchSink(df, checkpointDir) { (batch, id) =>
      graft.sources.TxLog.mergeBatch(spark, table, batch, key, appId, id)
      ()
    }

  /** Exactly-once streaming append with a DEAD-LETTER channel for CHECK
    * constraint violations (round-13 — the streaming counterpart of
    * `Pipeline.runWithDeadLetter`): a poison row must not kill the
    * ingest query (the bare [[txLogSink]] surfaces the rejected commit as
    * a stream failure — correct for strict pipelines, fatal for 24/7
    * ones), and it must not silently vanish either. Each micro-batch
    * splits on the table's CURRENT constraints — clean rows append under
    * the (appId, batchId) idempotency mark; violating rows land in
    * `deadLetterDir/batch_id=<id>` with OVERWRITE semantics, so a
    * replayed batch REPLACES that partition's contents (no duplication;
    * part-file names differ run to run). A replayed batch with ZERO
    * violations — e.g. after a constraint drop — deletes its stale
    * partition, so dead letters never outlive the constraint change
    * (ADVICE round-13). SQL CHECK semantics: a row diverts only when
    * some constraint evaluates to FALSE (nulls pass). */
  def txLogSinkWithDeadLetter(spark: SparkSession, df: DataFrame,
      table: String, checkpointDir: String, appId: String,
      deadLetterDir: String): StreamingQuery =
    foreachBatchSink(df, checkpointDir)(
      deadLetterSplit(spark, table, deadLetterDir, appId,
        graft.sources.TxLog.appendBatch(spark, table, _, appId, _)))

  /** The MERGE twin of [[txLogSinkWithDeadLetter]] (round-14 — the soak
    * pipeline's sink): clean rows UPSERT by `key` under the idempotency
    * mark, violating rows divert. Same dead-letter partition semantics;
    * same [[txLogMergeSink]] unique-key contract for the clean side. */
  def txLogMergeSinkWithDeadLetter(spark: SparkSession, df: DataFrame,
      table: String, key: String, checkpointDir: String, appId: String,
      deadLetterDir: String): StreamingQuery =
    foreachBatchSink(df, checkpointDir)(
      deadLetterSplit(spark, table, deadLetterDir, appId,
        graft.sources.TxLog.mergeBatch(spark, table, _, key, appId, _)))

  /** Streaming near-dedup ingest (round 15, VERDICT r14 next-item 6):
    * the batch `dedup_incremental_minhash` operator composed with the
    * exactly-once lakehouse sinks into one 24/7 pipeline. Per micro-batch
    * of documents (doc_id, text):
    *
    *  1. POISON rows (null / un-shinglable <3-token text) divert to
    *     `deadLetterDir/batch_id=<id>` with overwrite-on-replay semantics
    *     ([[txLogSinkWithDeadLetter]]'s partition contract) — at 100 TB
    *     un-processable rows must be visible, not silently dropped by the
    *     index builder's eligibility filter.
    *  2. The batch minhash index builds ONCE (the ingest-time index
    *     shape); near-dups are dropped against (a) the STORED survivor
    *     index — [[graft.operators.VectorOps.minhashIncrementalDups]],
    *     cross-set banded LSH, never re-pairing history — and (b) within
    *     the batch (banded self-pairs; the greedy min-id survivor rule).
    *  3. Survivors MERGE into `survivorsTable` by doc_id and their index
    *     rows APPEND to `indexTable`, each under the (appId, batchId)
    *     idempotency mark.
    *
    * Exactly-once across kill/restart: the gate is the LAST link
    * (`indexTable`'s txn mark) — a fully-applied batch skips whole; a
    * batch that crashed mid-chain recomputes DETERMINISTICALLY (the drop
    * set depends only on the stored index, which the crashed run did not
    * yet advance — merge-before-append ORDER is load-bearing for this),
    * re-merges as a no-op where already applied, and completes the
    * missing append. NearDupIngestSpec pins convergence and the no-dup-
    * survivors invariant; SCALE.md carries the 10 M-event-tier rows/s.
    *
    * Contract: ingested doc_ids are unique across the stream (the ingest
    * shape); a replayed identical (doc_id, text) is idempotent — it drops
    * as a dup of its own stored index row. */
  def nearDupIngestSink(spark: SparkSession, docs: DataFrame,
      survivorsTable: String, indexTable: String, deadLetterDir: String,
      checkpointDir: String, appId: String, numHashes: Int = 32,
      bands: Int = 8, jaccardThreshold: Double = 0.4): StreamingQuery = {
    import org.apache.spark.sql.types.StructType
    val TxLog = graft.sources.TxLog
    if (TxLog.latestVersion(survivorsTable) < 0)
      TxLog.create(spark, survivorsTable,
        StructType.fromDDL("doc_id BIGINT, text STRING"),
        statsCol = Some("doc_id"))
    if (TxLog.latestVersion(indexTable) < 0)
      TxLog.create(spark, indexTable,
        StructType.fromDDL(
          "doc_id BIGINT, sig ARRAY<BIGINT>, shh ARRAY<BIGINT>"),
        statsCol = Some("doc_id"))
    foreachBatchSink(docs, checkpointDir) { (batch, id) =>
      import org.apache.spark.sql.functions.{col, size, split}
      // Fully-applied batches skip whole (the deadLetterSplit gate,
      // anchored on the LAST commit in the chain).
      if (TxLog.txnVersion(indexTable, appId) < id) {
        val partDir = s"$deadLetterDir/batch_id=$id"
        val cached = batch.persist()
        try {
          val poison =
            col("text").isNull || size(split(col("text"), " ")) < 3
          // Dead-letter gate WITHOUT a separate count job (round-16,
          // VERDICT r15 item 8): the row count rides the write itself as
          // an observed metric — one job per micro-batch where the
          // count-then-write shape paid two. A zero-poison batch writes
          // an empty partition and immediately drops it, preserving the
          // no-stale-partition replay contract.
          val obs = org.apache.spark.sql.Observation()
          cached.filter(poison).observe(obs, count(lit(1)).as("n"))
            .write.mode("overwrite").parquet(partDir)
          if (obs.get("n").asInstanceOf[Long] == 0L) {
            val p = new org.apache.hadoop.fs.Path(partDir)
            val fs =
              p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (fs.exists(p)) fs.delete(p, true)
          }
          val valid = cached.filter(!poison).select("doc_id", "text")
          // Built once, consumed by three frames (history probe,
          // self-pairs, survivor index rows) — the minhashIncrementalDups
          // materialization discipline.
          val batchIdx = graft.operators.VectorOps
            .minhashIndex(valid, numHashes)
            .localCheckpoint(true)
          val histIdx = TxLog.snapshot(spark, indexTable)
          val dupOfHist = graft.operators.VectorOps
            .minhashIncrementalDups(batchIdx, histIdx, numHashes, bands,
              jaccardThreshold)
            .select(col("doc_id"))
          // Within-batch dedup in TWO stages (code review round-15: the
          // banded self-pairs star-collapse hot buckets to rep pairs, so
          // a flat b_id drop list would let >bucketCap merely-similar
          // variants survive together). Stage 1 collapses EXACT shingle
          // sets — every non-min member of a distinct-text group drops
          // as a dup of its rep (handles the clone-heavy mass outright,
          // jaccard 1.0). Stage 2 runs the banded pairs over the ~unique
          // REPS only, where the greedy min-id rule is pair-complete up
          // to the documented bucketCap boundary on >256 near-identical
          // DISTINCT variants (the dedup_near_minhash approximation
          // boundary, SURVEY K2).
          import org.apache.spark.sql.functions.{min => fmin, xxhash64}
          val grouped = batchIdx
            .withColumn("vh", xxhash64(col("shh")))
            .localCheckpoint(true)
          val reps = grouped.groupBy("vh")
            .agg(fmin(col("doc_id")).as("rep_id"))
          val dupExact = grouped
            .join(reps, Seq("vh"))
            .filter(col("doc_id") =!= col("rep_id"))
            .select(col("doc_id"))
          val repIdx = grouped.join(
            reps.select(col("rep_id").as("doc_id")), Seq("doc_id"),
            "left_semi")
          val dupRepPairs = graft.operators.VectorOps
            .minhashPairsFromIndex(
              repIdx.select("doc_id", "sig", "shh"), numHashes, bands,
              jaccardThreshold)
            .select(col("b_id").as("doc_id"))
          val dropIds = dupOfHist.union(dupExact).union(dupRepPairs)
            .distinct()
            .localCheckpoint(true)
          val survivors = valid
            .join(dropIds, Seq("doc_id"), "left_anti")
          // ORDER MATTERS: survivors first, index last (the gate). A
          // crash between the two replays against the UNCHANGED stored
          // index → identical drop set → no-op merge + the completing
          // append.
          TxLog.mergeBatch(spark, survivorsTable, survivors, "doc_id",
            appId, id)
          TxLog.appendBatch(spark, indexTable,
            batchIdx.join(dropIds, Seq("doc_id"), "left_anti"),
            appId, id)
        } finally cached.unpersist()
      }
      ()
    }
  }

  /** Shared dead-letter micro-batch splitter: rows violating the table's
    * CURRENT CHECK constraints land in `deadLetterDir/batch_id=<id>` with
    * OVERWRITE semantics (a replay REPLACES the partition; a replay with
    * zero violations DELETES the stale one — ADVICE round-13); clean rows
    * go to `applyClean` (an idempotent appendBatch/mergeBatch). ONE
    * source computation per micro-batch via the persisted split (code
    * review round-13). SQL CHECK semantics: a row diverts only when some
    * constraint evaluates to FALSE (nulls pass).
    *
    * The (appId, batchId) idempotency mark covers BOTH channels
    * (round-14): a batch the mark shows already applied is skipped
    * entirely — clean side AND dead-letter side. Without the shared
    * gate, a FRESH-checkpoint crash-replay re-frames the source into
    * different batch ids (Spark's batchId is only stable within one
    * checkpoint), and the re-framed dead-letter writes land in other
    * partitions instead of overwriting — measured as duplicated dead
    * letters in the soak spec. One carve-out keeps the ADVICE-r13
    * contract: a replayed APPLIED batch under now-EMPTY constraints
    * still drops its stale partition (dead letters must not outlive a
    * constraint drop). */
  private def deadLetterSplit(spark: SparkSession, table: String,
      deadLetterDir: String, appId: String,
      applyClean: (DataFrame, Long) => Any)(
      batch: DataFrame, id: Long): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val cons = graft.sources.TxLog.state(table)._2.constraints
    val partDir = s"$deadLetterDir/batch_id=$id"
    def dropStalePartition(): Unit = {
      val p = new org.apache.hadoop.fs.Path(partDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      ()
    }
    if (graft.sources.TxLog.txnVersion(table, appId) >= id) {
      if (cons.isEmpty) dropStalePartition()
      return
    }
    if (cons.isEmpty) {
      dropStalePartition()
      applyClean(batch, id)
    } else {
      val viol = coalesce(
        cons.map(c => expr(c._2) === lit(false)).reduce(_ || _),
        lit(false))
      val cached = batch.persist()
      try {
        // Observed-metric gate (round-16, the nearDupIngestSink fix
        // applied to the shared splitter): count rides the write, no
        // separate count job; an empty write is dropped right after.
        val obs = org.apache.spark.sql.Observation()
        cached.filter(viol)
          .observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(partDir)
        if (obs.get("n").asInstanceOf[Long] == 0L) dropStalePartition()
        applyClean(cached.filter(!viol), id)
      } finally cached.unpersist()
    }
    ()
  }
}
