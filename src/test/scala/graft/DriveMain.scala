package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for manual verification runs (see .claude/skills/verify). */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.filter(col("doc_id") % 10 =!= 3)
    val state = graft.operators.IncrementalDedup.preserveClusters(
      base, "doc_id", "text")
    val added = docs.filter(col("doc_id") % 10 === 3)
    val removed = base.filter(col("doc_id") % 10 === 7).select("doc_id")
    val incr = graft.operators.IncrementalDedup.incrementalClusters(
      state, added, removed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    state.release()
    val full = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.simhashNearDups(
        docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"incr=${incr.size} full=${full.size}")
    println(s"only-incr: ${(incr.toSet -- full.toSet).toSeq.sorted.mkString(", ")}")
    println(s"only-full: ${(full.toSet -- incr.toSet).toSeq.sorted.mkString(", ")}")
    spark.stop()
  }
}
