package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input formats of the reference, re-expressed as thin readers over
  * Spark's sources (SURVEY §2.1 F1-F7):
  *
  *  - F1 text lines → `spark.read.text`
  *  - F2 KV text (`KeyValueTextInputFormat`, separator-split lines,
  *    `key.value.separator.in.input.line`) → [[kvText]]
  *  - F3 typed KV text (`IntTextKVInputFormat` + 8 siblings) →
  *    [[kvText]] + cast, see [[typedKvText]]
  *  - F4 SequenceFile → Parquet is this engine's binary format
  *    (columnar replaces row-KV; `spark.read.parquet` everywhere)
  *  - F5 global data files → [[graft.core.GlobalValue]]
  *  - F6 delta triples → CDC DataFrames
  *    ([[graft.operators.Relational.applyDelta]])
  *  - F7 JDBC (`DBInputFormat`, `examples/.../DBCountPageView.java`) →
  *    [[jdbc]]
  */
object Sources {

  /** KV text lines: `key<sep>value` per line; lines without the
    * separator yield (line, null) like the reference's
    * `KeyValueLineRecordReader`. */
  def kvText(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    spark.read.text(path).select(
      substring_index(col("value"), sep, 1).as("key"),
      when(col("value").contains(sep),
        expr(s"substring(value, instr(value, '$sep') + ${sep.length})"))
        .otherwise(lit(null)).as("value"))

  /** Typed KV text: cast the key/value of [[kvText]] to the requested
    * types ("int"/"long"/"float"/"double"/"string") — the reference's
    * `Int{Text,Float,Double}KVInputFormat` family collapsed to one
    * parameterized reader. `try_cast`, not `cast`: one malformed line
    * in a 100 TB ingest must yield a NULL (callers filter or quarantine)
    * rather than abort the job under ANSI mode (Spark 4's default). */
  def typedKvText(spark: SparkSession, path: String, keyType: String,
      valueType: String, sep: String = "\t"): DataFrame =
    kvText(spark, path, sep).select(
      expr(s"try_cast(key AS $keyType)").as("key"),
      expr(s"try_cast(value AS $valueType)").as("value"))

  /** Last.fm-style play-count triples (A3, reference
    * `IterKmeans_Lastfm.java:182-201`): `userid<sep>artistid<sep>
    * artistname<sep>plays` text lines → (user, artist, plays); lines
    * with missing fields or unparsable numbers are dropped, like the
    * reference's parse-and-skip loop (`try_cast`: a plain cast would
    * ABORT on the first malformed number under ANSI mode — the opposite
    * of parse-and-skip). */
  def lastfmPlays(spark: SparkSession, path: String, sep: String = "\t"): DataFrame = {
    val parts = split(col("value"), java.util.regex.Pattern.quote(sep))
    spark.read.text(path)
      .select(parts.as("p"))
      .filter(size(col("p")) >= 4)
      .select(expr("try_cast(p[0] AS LONG)").as("user"),
        expr("try_cast(p[1] AS LONG)").as("artist"),
        expr("try_cast(p[3] AS DOUBLE)").as("plays"))
      .filter(col("user").isNotNull && col("artist").isNotNull &&
        col("plays").isNotNull)
  }

  /** JDBC scan (F7). Pass-through to Spark's JDBC source, which pushes
    * filters and supports `partitionColumn` ranged parallel reads. */
  def jdbc(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }

  /** Bucketed, bucket-sorted table write — the 100 TB co-location
    * primitive (the Spark-native analog of the reference's sticky
    * scheduling + partitioned preserve files, SURVEY §2 F33: state and
    * static split co-located across runs). Tables bucketed the same way
    * on the same key join with NO exchange and NO sort: the scan's
    * output partitioning/ordering already satisfies the join
    * (spec-verified plan shape). The pre-write repartition uses the
    * same hash as the bucket spec, so each task owns exactly one
    * bucket → one file per bucket, which is what lets the scan report
    * its sort order. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
