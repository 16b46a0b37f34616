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
    import spark.implicits._
    // replicate one loop iteration's plan shape exactly as IterativeJob builds it
    val edges = (1 to 500).map(i => (i.toLong % 50, (i * 7).toLong % 50)).distinct.toDF("src", "dst")
    val e = edges.distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val s = e.join(deg, "src").repartition(4, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
      .distinct().repartition(4, col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count(); s.count()
    val (dyn, _, _) = org.apache.spark.sql.graft.GraftSqlShim
      .checkpointedLeafWithHandle(base.withColumn("rank", lit(1.0)).repartition(4, col("node")))
    val contribs = s.join(dyn, s("src") === dyn("node"))
      .select(s("dst"), (dyn("rank") / s("deg") * 0.8).as("c"))
      .groupBy("dst").agg(sum("c").as("c"))
    val next = base.join(contribs, base("node") === contribs("dst"), "left")
      .select(base("node"), (lit(0.2) + coalesce(col("c"), lit(0.0))).as("rank"))
      .repartition(4, col("node"))
    next.count()
    val plan = next.queryExecution.executedPlan.toString
    println("exchanges: " + plan.linesIterator.count(_.contains("Exchange")))
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan"))
      .mkString("\n"))
    spark.stop()
  }
}
