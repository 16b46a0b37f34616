package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for manual verification runs (see .claude/skills/verify). */
object DriveMain {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.timing", "1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    SparkEntry.queries("q_incr_dedup_clusters")(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache(); System.gc()
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q_incr_dedup_clusters")(spark, "/root/testdata/sf0.1").count()
      println(f"round $round: q_incr_dedup_clusters ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
