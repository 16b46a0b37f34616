package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for manual verification runs (see .claude/skills/verify).
  * Latest drive (round 8): incremental dup-span crossover — preserve vs
  * continuation at 10%/1% deltas on the 100x ScaleBench corpus; numbers
  * recorded in PERF_NOTES round-8 tail. */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val scale = "/tmp/graft_scale_r8/x100/documents.parquet"
    if (new java.io.File("/tmp/graft_scale_r8/x100").isDirectory) {
      val docs = spark.read.parquet(scale)
      import graft.operators.{IncrementalDupSpans => I}
      for (mod <- Seq(10L, 100L)) {
        val st0 = timed(s"preserve (mod $mod)")(I.preserveDupSpans(
          docs.filter(col("doc_id") % mod =!= 3), "doc_id", "text",
          w = 8, maxFrac = 0.5))
        val st1 = timed(s"continue (${100 / mod}% delta)")(
          I.continueDupSpans(st0,
            docs.filter(col("doc_id") % mod === 3),
            docs.filter(col("doc_id") % mod === 7).select("doc_id"),
            "doc_id", "text"))
        println("out rows: " + st1.out.count())
        st0.release(); st1.release()
        spark.catalog.clearCache(); System.gc()
      }
    } else println(s"generate $scale first (graft.ScaleBench)")
    spark.stop()
  }
}
