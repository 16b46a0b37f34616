package graft

import org.apache.spark.sql.SparkSession

/** Scratch driver for manual verification runs (see .claude/skills/verify).
  * Current drive (round 10): run the new segmented-store gates
  * end-to-end at sf0.001 the way the correctness driver will — each
  * must produce rows and finish without error. */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.LogQuiet()
    val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_incr_tfidf_seg", "q_incr_decontaminate_seg",
        "q_incr_line_dedup_seg", "q_incr_semantic_dedup_seg",
        "q_incr_pagerank_stream")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(f"$n: $c rows, ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
