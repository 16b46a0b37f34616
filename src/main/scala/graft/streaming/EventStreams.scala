package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface.
  *
  * The reference is batch-only — its "incremental" is batch-over-delta,
  * not streaming (SURVEY §2 note) — but the Spark build gets streams
  * first-class: the same event schema processed with watermarks,
  * windowed aggregation, and custom keyed state
  * (`mapGroupsWithState`), which is the streaming twin of the
  * preserve-store machinery (F9/F27: per-key state carried across
  * input arrivals).
  *
  * `events.ts` arrives in whatever encoding the writer chose —
  * epoch-nanos BIGINT or a native timestamp column (see
  * [[graft.queries.Q.events]] / [[graft.functions.TimeEncodings]]);
  * [[withEventTime]] adapts either to a proper timestamp for
  * watermarking.
  */
object EventStreams {

  /** Attach an `event_time` TIMESTAMP column derived from `ts` in any
    * of the encodings the test data has shipped (epoch-nanos BIGINT,
    * timestamp[µs]/TIMESTAMP_NTZ, TIMESTAMP — see
    * [[graft.functions.TimeEncodings]]); watermarking needs a true
    * TimestampType column regardless of how the file spells time. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time",
      timestamp_micros(graft.functions.TimeEncodings.epochMicros(events, "ts")))

  /** Tumbling-window counts/sums per event type with a watermark —
    * late data beyond `lateness` is dropped; state is bounded. */
  def windowedStats(events: DataFrame, window_ : String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  final case class UserEvent(user_id: Long, ts: Long, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state: running per-user totals maintained across
    * micro-batches (the streaming analog of the preserved per-key
    * state, F9). Works identically under batch execution for tests. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n; var total = prev.total
          rows.foreach { r => n += 1; total += r.value }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
  }

  /** Watermark-bounded streaming exact dedup: keeps the first row per
    * key within the watermark horizon (at-least-once ingestion →
    * exactly-once downstream). Per-key state is dropped once the
    * watermark passes its event time, so state size is bounded by the
    * lateness window and the arrival rate — never the stream history.
    * The streaming twin of [[graft.operators.Dedup.exact]]; pair with a
    * digest column (e.g. [[graft.operators.Dedup.simhashDigests]], pure
    * per-row projections that run unchanged under streaming) for
    * streaming near-dup drops. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      lateness: String = "30 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  final case class SessionEvent(user_id: Long, ts: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  /** Gap-based sessionization with custom keyed state — the streaming
    * twin of [[graft.operators.Relational.sessionize]] (same gap rule:
    * a new session starts when the time since the key's previous event
    * exceeds `gapNanos`; `ts` is epoch-nanos like the events table).
    *
    * A session is EMITTED when it closes: a later event arrives beyond
    * the gap (any mode), or — under `EventTimeTimeout`, the streaming
    * default — the watermark passes `last + gap`, which also drops the
    * key's state, so state size is bounded by the number of concurrently
    * open sessions, never the stream history. Callers must put a
    * watermark on `event_time` upstream for the timeout to fire; batch
    * execution (specs, backfills) passes `NoTimeout` and gets every
    * CLOSED session (each key's final open session stays unemitted,
    * exactly as a stream would hold it pending more data).
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapNanos: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.EventTimeTimeout())
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val eventTimeTimeout = timeout == GroupStateTimeout.EventTimeTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: close and forget the session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start, s.last, s.n))
          } else {
            // within a micro-batch (or in batch execution) the iterator
            // is unordered — sort by event time before walking gaps
            val sorted = rows.toArray.sortBy(_.ts)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            for (e <- sorted) cur match {
              case Some(s) if e.ts - s.last <= gapNanos =>
                cur = Some(SessionState(s.start, e.ts, s.n + 1))
              case Some(s) =>
                closed ::= SessionOut(uid, s.start, s.last, s.n)
                cur = Some(SessionState(e.ts, e.ts, 1))
              case None =>
                cur = Some(SessionState(e.ts, e.ts, 1))
            }
            cur.foreach { s =>
              state.update(s)
              // ceiling of (last+gap) in ms: truncating each term
              // separately can fire the timeout up to ~2 ms EARLY, so a
              // boundary event at exactly ts = last+gap (which the
              // inline path merges) could find the session already
              // closed — diverging from the batch sessionize twin
              if (eventTimeTimeout)
                state.setTimeoutTimestamp((s.last + gapNanos + 999999L) / 1000000L)
            }
            closed.reverse.iterator
          }
      }
  }

  /** Read the events table as a file stream (driver for tests/demos).
    * The file source requires a directory, so the sf dir is used with a
    * glob filter selecting only the events table. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
  }
}
