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
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = graft.operators.Pipeline.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 97 === 0), "text", w = 3)
    out.count()
    println(out.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Broadcast"))
      .mkString("\n"))
    spark.stop()
  }
}
