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
    SparkEntry.queries("q_incr_pipeline_clean")(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache(); System.gc()
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val base = docs.filter(col("doc_id") % 10 =!= 3)
      val st = graft.operators.IncrementalPipeline.preserveClean(base, "doc_id", "text", 0.3, "en")
      val t1 = System.nanoTime()
      val corpusAfter = docs.filter(col("doc_id") % 10 =!= 7)
      val next = graft.operators.IncrementalPipeline.continueClean(st, corpusAfter,
        docs.filter(col("doc_id") % 10 === 3),
        base.filter(col("doc_id") % 10 === 7).select("doc_id"),
        "doc_id", "text")
      val t2 = System.nanoTime()
      val n = graft.operators.IncrementalPipeline.cleanedDocs(next, corpusAfter, "doc_id").count()
      val t3 = System.nanoTime()
      println(f"round $round: preserve=${(t1-t0)/1e9}%.2f continue=${(t2-t1)/1e9}%.2f cleaned=${(t3-t2)/1e9}%.2f rows=$n")
      st.release(); next.release(); spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
