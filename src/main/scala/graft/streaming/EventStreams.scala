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
  * `events.ts` arrives as epoch-nanoseconds BIGINT (see
  * [[graft.queries.Q.events]]); [[withEventTime]] converts to a proper
  * timestamp for watermarking.
  */
object EventStreams {

  /** Attach an `event_time` timestamp column derived from the
    * epoch-nano `ts`. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time",
      timestamp_micros(expr("ts div 1000")))

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
