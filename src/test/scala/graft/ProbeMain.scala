package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").appName("probe")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.select(col("event_id"), col("ts"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("s")).show(3, false)
    } catch { case e: Throwable => println("EVENTS_FAIL " + e.getMessage.take(300)) }
    // split empty-string behavior
    spark.sql("SELECT split('abc','') AS cs, ascii('a') AS o").show(false)
    // tokens edge
    spark.sql("SELECT filter(split('a b  c ',' +'), t -> t <> '') AS toks").show(false)
    spark.sql("SELECT aggregate(transform(split('abc',''), c -> cast(ascii(c) as bigint)), 0L, (a,b) -> (a*31+b) % 1000000007) AS code").show()
    spark.stop()
  }
}
