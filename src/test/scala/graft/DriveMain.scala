package graft
// Scratch end-to-end driver for manual verification (not a test).
import org.apache.spark.sql.SparkSession

object DriveMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("drive")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (a.nonEmpty) a.toSeq else Seq("q_minhash", "q_lsh_neardup",
      "q_simhash", "q_ngram_jaccard", "q_fingerprint", "q_matvec")
    // SPARK_GRAFT_EXPLAIN=1: print each query's formatted physical plan
    // instead of timing it (plan audits).
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
      names.foreach { n =>
        SparkEntry.queries.get(n) match {
          case Some(fn) =>
            println(s"==== $n ===="); fn(spark, dir).explain("formatted")
          case None => println(s"$n: no such query")
        }
      }
      println("DRIVE_DONE"); spark.stop(); return
    }
    // warmup
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try fn(spark, "/root/testdata/sf0.001").count()
        catch { case e: Throwable => println(s"WARMUP $n FAILED: $e") }
      }
    }
    spark.catalog.clearCache(); System.gc()
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val t0 = System.nanoTime()
          val rows = try fn(spark, dir).count() catch {
            case e: Throwable => println(s"$n FAILED: $e"); -1L
          }
          println(f"TIMING $n%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
          spark.catalog.clearCache(); System.gc()
        case None => println(s"$n: no such query")
      }
    }
    println("DRIVE_DONE")
    spark.stop()
  }
}
