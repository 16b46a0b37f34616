package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Adaptive timestamp-encoding normalization.
  *
  * The reference engine is schema-less (Text/SequenceFile, SURVEY §1.2)
  * and tolerates whatever encoding each input ships — parse-and-skip,
  * `IterKmeans_Lastfm.java:182-201`. The Spark build meets the same
  * contract at the type level: every time operator works on epoch-µs
  * BIGINT internally, and this helper projects any of the encodings a
  * parquet writer may produce onto that representation:
  *
  *  - BIGINT epoch-nanos (Parquet TIMESTAMP(NANOS) read under
  *    `spark.sql.legacy.parquet.nanosAsLong`) — integer `div 1000`,
  *    never `/`: epoch-nanos exceed 2^53, double division corrupts
  *    the low digits.
  *  - TIMESTAMP_NTZ (parquet timestamp[µs], isAdjustedToUTC=false) —
  *    µs offset from the NTZ epoch via `timestampdiff`. NOT
  *    `unix_micros(to_utc_timestamp(...))` or a cast: any NTZ→TZ
  *    coercion routes through the SESSION timezone and shifts the
  *    value; the timestampdiff form is pure wall-clock arithmetic,
  *    timezone-independent, and matches DuckDB's `epoch_us` exactly.
  *  - TIMESTAMP (tz-adjusted) — `unix_micros` directly.
  *
  * All three forms stay inside whole-stage codegen (built-in datetime
  * expressions, no UDF).
  */
object TimeEncodings {

  /** Expression projecting `df(tsCol)` as epoch-MICROseconds BIGINT,
    * chosen by the column's loaded dtype. */
  def epochMicros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      // backticked: the column name is user input and may not be a
      // bare SQL identifier
      case LongType => expr(s"`$tsCol` div 1000")
      case TimestampNTZType => expr(
        s"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', `$tsCol`)")
      case TimestampType => expr(s"unix_micros(`$tsCol`)")
      case other => throw new IllegalArgumentException(
        s"unsupported time encoding for column '$tsCol': $other (expected " +
          "BIGINT epoch-nanos, TIMESTAMP or TIMESTAMP_NTZ)")
    }

  /** True when `tsCol` is one of the encodings [[epochMicros]] adapts. */
  def isTimeEncoded(df: DataFrame, tsCol: String): Boolean =
    df.schema(tsCol).dataType match {
      case LongType | TimestampNTZType | TimestampType => true
      case _ => false
    }

  /** `df` with `tsCol` replaced by its epoch-µs BIGINT projection.
    * A LongType column is treated as epoch-NANOS (the only long
    * encoding the test data has ever shipped) and divided down —
    * callers holding a column already in µs must not route it through
    * here twice ([[acceptTimestamp]] is the pass-through variant). */
  def toEpochMicros(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn(tsCol, epochMicros(df, tsCol))

  /** `df` with `tsCol` normalized to epoch-µs ONLY when it is a
    * timestamp type; BIGINT columns pass through untouched (assumed
    * already in the caller's working unit). This is the entry-point
    * guard for operators whose public contract is "integer time in any
    * unit, or a native timestamp column": timestamp inputs become µs,
    * integer inputs keep their caller-chosen unit. */
  def acceptTimestamp(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case TimestampNTZType | TimestampType => toEpochMicros(df, tsCol)
      case _ => df
    }
}
