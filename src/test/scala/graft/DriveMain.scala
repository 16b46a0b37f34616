package graft
// Scratch end-to-end driver for manual verification (not a test).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DriveMain {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val edges = li.select((col("l_partkey") % 100).as("src"), col("l_suppkey").as("dst"))
    val res = graft.algorithms.PageRank.run(edges, 0.8, maxIterations = 5)
    println("PR iterations=" + res.iterations + " rows=" + res.dynamic.count())
    res.dynamic.orderBy(desc("rank")).show(5)
    val res2 = graft.algorithms.PageRank.run(edges, 0.8, maxIterations = 50, threshold = 1e-6)
    println("PR converged at iter=" + res2.iterations + " dist=" + res2.lastDistance)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val km = graft.algorithms.KMeans.run(emb, k = 8, metric = "cosine", maxIterations = 5, threshold = 1e-4)
    println("KM iters=" + km.iterations + " centers=" + km.centers.length + " shift=" + km.shift)
    try {
      val e = spark.range(0).select(col("id").as("src"), col("id").as("dst"))
      val r3 = graft.algorithms.PageRank.run(e, 0.8, maxIterations = 2)
      println("empty-graph rows=" + r3.dynamic.count())
    } catch { case ex: Throwable => println("empty-graph EXC: " + ex.getClass.getSimpleName + " " + String.valueOf(ex.getMessage).take(120)) }
    println("DRIVE_DONE")
    spark.stop()
  }
}
