package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when
  * SQL-expressible) the DuckDB oracle producing identical columns.
  * Column names and value rounding MUST match between the two — the
  * driver sorts columns by name and hashes values. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Load a testdata table from the given scale-factor dir. Also
    * registers graft's native functions on the session (idempotent) so
    * every query can use them without per-call ceremony. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Load `events` tolerating every `ts` encoding the test-data
    * generator has shipped: Parquet TIMESTAMP(NANOS) (unreadable as a
    * Spark timestamp — surfaced as a BIGINT of epoch-nanos via the
    * legacy conf) or a native timestamp[µs] column (read as
    * TIMESTAMP_NTZ). Callers that touch `ts` must go through
    * [[eventsUs]], which normalizes both to epoch-µs; schema-less
    * inputs whose encoding may drift are core parity behavior for the
    * reference (parse-and-skip, IterKmeans_Lastfm.java:182-201). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
  }

  /** Normalize a `ts` column to epoch-MICROseconds BIGINT, adaptive to
    * the loaded dtype — see [[graft.functions.TimeEncodings]] for the
    * encoding matrix and why the NTZ branch must avoid session-tz
    * coercion. The oracle side is `epoch_us(ts)` in DuckDB, which
    * reads every encoding at µs precision. */
  def tsToMicros(df: DataFrame, tsCol: String = "ts"): DataFrame =
    graft.functions.TimeEncodings.toEpochMicros(df, tsCol)

  /** `events` with `ts` as epoch-MICROseconds BIGINT regardless of the
    * file's encoding ([[tsToMicros]]). DuckDB's timestamp type is
    * µs-precision, so any query exposing raw ts arithmetic works in µs
    * on both sides (`epoch_us(ts)` in the oracle). */
  def eventsUs(s: SparkSession, dir: String): DataFrame =
    tsToMicros(events(s, dir))

  /** Oracle-side expression for `events.ts` as epoch-micros BIGINT. */
  val tsUs = "epoch_us(ts)"
}
