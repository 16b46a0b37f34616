package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

import graft.functions.TimeEncodings

/** Pins the adaptive time-encoding contract: every encoding the test
  * data has shipped (epoch-nanos BIGINT, native timestamp[µs] parquet
  * read as TIMESTAMP_NTZ, tz-adjusted TIMESTAMP) projects to the SAME
  * epoch-µs integers, independent of the session timezone. The parquet
  * round-trip test writes its own file so the suite keeps covering the
  * µs encoding even if the driver's generator changes again. */
class TimeEncodingsSpec extends SparkSpec {
  import spark.implicits._

  private val usExpect = Seq(1704067798778549L, 1704068166738090L)

  private def ntzFrame = usExpect.toDF("us")
    .select(expr(
      "timestampadd(MICROSECOND, us, timestamp_ntz'1970-01-01 00:00:00')")
      .as("ts"))

  test("epoch-nanos BIGINT divides down to µs with integer arithmetic") {
    // values near 2^60: double division would corrupt the low digits
    val df = Seq(1704067798778549123L, 1704068166738090456L).toDF("ts")
    assert(TimeEncodings.toEpochMicros(df, "ts").as[Long].collect().toSeq ==
      usExpect)
  }

  test("spec-written timestamp[µs] parquet reads as NTZ and projects exact µs") {
    val dir = java.nio.file.Files.createTempDirectory("ts_us_pin").toString
    ntzFrame.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType == TimestampNTZType)
    val got = TimeEncodings.toEpochMicros(back, "ts")
    assert(got.schema("ts").dataType == LongType)
    assert(got.select("ts").as[Long].collect().toSeq.sorted == usExpect)
  }

  test("NTZ projection is session-timezone independent") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      assert(TimeEncodings.toEpochMicros(ntzFrame, "ts")
        .as[Long].collect().toSeq.sorted == usExpect)
    } finally spark.conf.set(tzKey, saved)
  }

  test("tz-adjusted TIMESTAMP projects via unix_micros") {
    val df = usExpect.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(TimeEncodings.toEpochMicros(df, "ts")
      .as[Long].collect().toSeq.sorted == usExpect)
  }

  test("acceptTimestamp converts timestamp columns and passes integers through") {
    val tsd = ntzFrame
    assert(TimeEncodings.acceptTimestamp(tsd, "ts").schema("ts").dataType ==
      LongType)
    // BIGINT passes through UNTOUCHED (caller-chosen unit, here µs):
    // values must not be divided down as the nanos branch would
    val already = usExpect.toDF("ts")
    assert(TimeEncodings.acceptTimestamp(already, "ts")
      .as[Long].collect().toSeq == usExpect)
  }

  test("unsupported encodings are rejected up front") {
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException] {
      TimeEncodings.toEpochMicros(df, "ts")
    }
    assert(e.getMessage.contains("unsupported time encoding"))
  }
}
