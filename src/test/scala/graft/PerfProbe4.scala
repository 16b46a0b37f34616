package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PerfProbe4 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val ncust = spark.read.parquet(s"$dir/customer.parquet").count()
    val edges = spark.read.parquet(s"$dir/orders.parquet").select(col("o_custkey").as("src"),
      (lit(1L) + (col("o_custkey")*7 + col("o_orderkey")*3) % lit(ncust)).as("dst")).distinct()
    timeIt("PageRank.run cold")(graft.algorithms.PageRank.run(edges, 0.8, 5).dynamic.count())
    spark.catalog.clearCache()
    timeIt("PageRank.run warm")(graft.algorithms.PageRank.run(edges, 0.8, 5).dynamic.count())
    spark.stop()
  }
}
