package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // iterative driver loops emit fresh codegen classes every
      // iteration; the default 100-entry codegen cache thrashes and
      // recompilation dominates wall time (measured 5-8x slowdown)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup at the smallest scale factor: the first heavy query
    // otherwise absorbs all JIT + whole-stage-codegen compilation (tens
    // of seconds that say nothing about data-proportional throughput).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      Seq("q1_agg", "q_pagerank", "q_incr_pagerank", "q_minhash").foreach { n =>
        SparkEntry.queries.get(n).foreach { fn =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
      }
      spark.catalog.clearCache()
      System.gc()
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop every frame the query persisted — queries are independent;
      // leftover cached state just evicts the next query's working set.
      // The explicit GC drives ContextCleaner so shuffle files and
      // broadcasts from the previous query are actually released
      // (with a large heap, GC may otherwise never run and cleanup
      // state accumulates across the whole run).
      spark.catalog.clearCache()
      System.gc()
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v else -1.0)
    }.mkString("{", ",", "}")
    // A crashed query's time-to-failure must not pollute the total; its
    // -1 marker plus the "failed" list make the breakage visible instead.
    val total = results.collect { case (_, v, true) => v }.sum
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
