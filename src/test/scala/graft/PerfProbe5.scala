package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PerfProbe5 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val q = graft.queries.IterativeQueries.all.find(_.name == "q_incr_pagerank").get
    for (i <- 1 to 3) {
      timeIt(s"q_incr run $i")(q.fn(spark, dir).count())
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
