package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for manual verification runs (see .claude/skills/verify).
  * Current drive (round 9): chained segmented-preserved-state debug —
  * compare the store path against the in-memory loop per continuation. */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.algorithms.IncrementalPageRank
    import graft.core.SegmentedStateStore

    val chain = (0L until 6L).map(i => (100L + i, 101L + i))
    val blob = (for (i <- 0L until 40L; j <- Seq((i * 7 + 1) % 40, (i * 3 + 2) % 40)
      if i != j) yield (i, j)).distinct
    val edges1 = (chain ++ blob).toDF("src", "dst")
    val store = java.nio.file.Files
      .createTempDirectory("graft_pr_seg_dbg").toString
    IncrementalPageRank.preserveTo(spark, store, edges1, 0.8,
      iterations = 4, nBuckets = 64)

    val edges2 = edges1.filter(col("src") =!= 100L)
      .unionByName(Seq((100L, 103L)).toDF("src", "dst"))
    val chg = Seq(100L).toDF("src")
    val seg1 = IncrementalPageRank.incrementalSeg(spark, store,
      edges2, chg, 0.8, iterations = 2).as[(Long, Double)].collect().toMap

    // snapshot post-run-1 store
    val s1 = SegmentedStateStore.openForRead(spark, store).preserved
    val st1 = graft.core.PreservedState(
      s1.kvs.localCheckpoint(true), s1.out.localCheckpoint(true))
    println("snapshot out 105 = " +
      st1.out.filter(col("node").isin(102L, 103L, 104L, 105L, 106L))
        .orderBy("node").collect().mkString(" "))
    println("snapshot kvs 105/106 = " +
      st1.kvs.filter(col("node").isin(105L, 106L))
        .orderBy("node", "src").collect().mkString(" "))

    val edges3 = edges2.filter(col("src") =!= 102L)
      .unionByName(Seq((102L, 105L)).toDF("src", "dst"))
    val chg2 = Seq(102L).toDF("src")
    val seg2 = IncrementalPageRank.incrementalSeg(spark, store,
      edges3, chg2, 0.8, iterations = 2).as[(Long, Double)].collect().toMap
    val mem2 = IncrementalPageRank.incremental(edges3, st1, chg2, 0.8,
      iterations = 2).as[(Long, Double)].collect().toMap
    val s2 = SegmentedStateStore.openForRead(spark, store).preserved
    println("post-run-2 store kvs 106 = " +
      s2.kvs.filter(col("node") === 106L).collect().mkString(" "))
    for (k <- Seq(102L, 103L, 104L, 105L, 106L))
      println(s"node $k run1=${seg1.get(k)} seg2=${seg2.get(k)} mem2=${mem2.get(k)}")
    spark.stop()
  }
}
