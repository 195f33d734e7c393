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

  /** File-source stream over an events-schema directory (ns-Long ts →
    * timestamp, same conversion as the batch loader). */
  def eventsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val raw = Tables.eventsRaw
    spark.readStream
      .schema(raw)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
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
    * per-user session state (start, last-seen, count) plus an EVENT-TIME
    * timer re-registered at last_ts + gap on every row; when the watermark
    * passes the timer the session CLOSES and emits exactly once — the
    * timeout-emission pattern `session_window` can't express (emit on
    * inactivity, not on next-batch arrival). State is one small row + one
    * timer per ACTIVE user, watermark-bounded — the 1000-executor shape.
    * StreamingSpec proves emitted sessions equal the batch gap-split
    * sessionization for every session whose timeout precedes the final
    * watermark. */
  def timedSessionsTws(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    class Sessionizer extends StatefulProcessor[Long, (Long, Long), ClosedSession] {
      @transient private var state: ValueState[ClosedSession] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getValueState[ClosedSession]("session",
          Encoders.product[ClosedSession], TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
          timerValues: TimerValues): Iterator[ClosedSession] = {
        // Rows within a batch arrive unordered; sort by event time so the
        // gap-split fold sees the true sequence (per-key per-batch rows
        // are small — this is not a corpus sort).
        val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        var cur = Option(state.get())
        rows.toSeq.sortBy(_._2).foreach { case (_, ts) =>
          cur match {
            case Some(s) if ts <= s.end_ms + gapMs =>
              cur = Some(ClosedSession(key, math.min(s.start_ms, ts),
                math.max(s.end_ms, ts), s.n_events + 1))
            case Some(s) => // gap exceeded inside the batch: close inline
              out += s
              cur = Some(ClosedSession(key, ts, ts, 1L))
            case None =>
              cur = Some(ClosedSession(key, ts, ts, 1L))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // Earlier batches may have left stale timers (at old end+gap);
          // handleExpiredTimer's expiry >= end+gap guard absorbs them, so
          // no delete bookkeeping is needed — just register the current
          // timeout.
          getHandle.registerTimer(s.end_ms + gapMs)
        }
        out.iterator
      }
      override def handleExpiredTimer(key: Long, timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
        val s = state.get()
        if (s != null && expiredTimerInfo.getExpiryTimeInMs() >= s.end_ms + gapMs) {
          state.clear()
          Iterator.single(s)
        } else Iterator.empty
      }
    }
    events
      // The delay is the caller's disorder tolerance: rows later than it
      // are dropped BEFORE the sessionizer (standard watermark contract);
      // the in-batch sort + expiry guard absorb disorder within bounds.
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
}
