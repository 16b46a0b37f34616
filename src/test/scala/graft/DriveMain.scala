package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for manual verification runs (see .claude/skills/verify).
  * Current drive (round 9): prove the store-mode loop's touched-bucket
  * filters reach the parquet scan as PARTITION pruning — the plan's
  * scan node must list `_b` partition filters and the scanned file set
  * must exclude untouched buckets. */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.core.SegmentedStateStore

    val edges = (for (i <- 0L until 200L; j <- Seq((i * 7 + 1) % 200, (i * 3 + 2) % 200)
      if i != j) yield (i, j)).distinct.toDF("src", "dst")
    val store = java.nio.file.Files
      .createTempDirectory("graft_prune_probe").toString
    graft.algorithms.IncrementalPageRank.preserveTo(spark, store, edges,
      0.8, iterations = 3, nBuckets = 64)

    // a pruned read the loop would issue: out rows of 3 buckets
    val st = SegmentedStateStore.openForRead(spark, store)
    val probe = st.out.filter(col("_b").isin(1, 2, 3))
    probe.collect()
    println("=== explain ===")
    println(probe.queryExecution.executedPlan.toString.take(2000))
    val scanned = probe
      .select(input_file_name()).distinct().as[String].collect()
    println(s"=== scanned ${scanned.length} files ===")
    scanned.foreach(f => println(f.split("/").takeRight(2).mkString("/")))
    spark.stop()
  }
}
