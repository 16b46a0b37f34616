package graft.core

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's "global unique value" — a single cluster-wide map
  * aggregated each iteration and re-broadcast (F5/F8/F25:
  * `GlobalUniqKeyWritable`/`GlobalUniqValueWritable`, the
  * `GlobalDataInputFormat.java:16-130` `k:v#k:v#…` codec, JobTracker
  * merge `JobTracker.java:5604-5656`).
  *
  * Spark-first: the value lives as an O(k) driver map + `Broadcast`;
  * persistence is a 2-column Parquet table instead of the `#`-delimited
  * text file. The disjoint-union merge (`GlobalUniqValueWritable
  * .aggregate`, which rejects duplicate keys) is preserved.
  */
object GlobalValue {

  /** Aggregate a 2-column DataFrame (key, value) into the driver-side
    * global map — duplicate keys are an error, like the reference's
    * duplicate-global-key check (`GlobalUniqValueWritable.java:36-38`). */
  def collect[K, V](df: DataFrame): Map[K, V] = {
    val rows = df.collect()
    val m = rows.toSeq.map(r => r.get(0).asInstanceOf[K] -> r.get(1).asInstanceOf[V])
    require(m.map(_._1).distinct.length == m.length,
      "duplicate global key (GlobalUniqValueWritable.aggregate contract)")
    m.toMap
  }

  /** Broadcast the global map for executor-side lookup. */
  def broadcast[K, V](spark: SparkSession, m: Map[K, V]): Broadcast[Map[K, V]] =
    spark.sparkContext.broadcast(m)

  /** Persist per-iteration global data (the reference writes
    * `<globalPath>/iteration-i`; `JobTracker.java:5636-5655`). */
  def write(spark: SparkSession, m: Map[String, Double], path: String,
      iteration: Int): Unit = {
    import spark.implicits._
    m.toSeq.toDF("key", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/iteration-$iteration")
  }

  def read(spark: SparkSession, path: String, iteration: Int): Map[String, Double] =
    collect[String, Double](spark.read.parquet(s"$path/iteration-$iteration"))
}
