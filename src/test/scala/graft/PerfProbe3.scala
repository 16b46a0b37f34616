package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PerfProbe3 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    timeIt("matvec standalone") {
      graft.queries.IterativeQueries.all.find(_.name == "q_matvec").get.fn(spark, dir).count()
    }
    timeIt("matvec again") {
      graft.queries.IterativeQueries.all.find(_.name == "q_matvec").get.fn(spark, dir).count()
    }
    timeIt("lsh standalone") {
      graft.queries.PipelineQueries.all.find(_.name == "q_lsh_neardup").get.fn(spark, dir).count()
    }
    timeIt("ngram standalone") {
      graft.queries.PipelineQueries.all.find(_.name == "q_ngram_jaccard").get.fn(spark, dir).count()
    }
    timeIt("incr standalone") {
      graft.queries.IterativeQueries.all.find(_.name == "q_incr_pagerank").get.fn(spark, dir).count()
    }
    spark.stop()
  }
}
