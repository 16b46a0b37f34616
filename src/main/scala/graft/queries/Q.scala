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

  /** Load `events`, whose `ts` column is Parquet TIMESTAMP(NANOS):
    * Spark can't read nanos as a timestamp, so it is surfaced as a
    * BIGINT of epoch-nanoseconds (oracle side: `epoch_ns(ts)`). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
  }

  /** Oracle-side expression for `events.ts` as epoch-nanos BIGINT.
    * CAUTION: DuckDB reads the parquet TIMESTAMP(NANOS) column at µs
    * precision, so the low three digits come back ZERO — any oracle
    * needing real sub-µs values must work in µs ([[tsUs]]) instead.
    * Kept only for row-identity uses where truncation cancels out. */
  val tsNs = "epoch_ns(ts)"

  /** `events` with `ts` truncated to epoch-MICROseconds. DuckDB's
    * timestamp type is µs-precision, so any query exposing raw ts
    * arithmetic must work in µs on both sides (`epoch_us(ts)` in the
    * oracle) — the ns tail exists only on the Spark side. Integer
    * `div`, not `/`: epoch-nanos exceed 2^53 and double division
    * corrupts the low digits. */
  def eventsUs(s: SparkSession, dir: String): DataFrame =
    events(s, dir).withColumn("ts",
      org.apache.spark.sql.functions.expr("ts div 1000"))

  /** Oracle-side expression for `events.ts` as epoch-micros BIGINT. */
  val tsUs = "epoch_us(ts)"
}
