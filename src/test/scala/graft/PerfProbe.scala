package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PerfProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val edges = li.select((col("l_partkey") % 100).as("src"), col("l_suppkey").as("dst"))
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    timeIt("warmup count")(edges.count())
    timeIt("pagerank 5 iters (run1)")(graft.algorithms.PageRank.run(edges, 0.8, 5))
    timeIt("pagerank 5 iters (run2)")(graft.algorithms.PageRank.run(edges, 0.8, 5))
    timeIt("pagerank 10 iters")(graft.algorithms.PageRank.run(edges, 0.8, 10))
    timeIt("naive 5 iters")(graft.algorithms.PageRank.runNaive(edges, 0.8, 5).count())
    spark.stop()
  }
}
