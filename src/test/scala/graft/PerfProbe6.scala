package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PerfProbe6 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.codegen.cache.maxEntries","5000").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val ncust = spark.read.parquet(s"$dir/customer.parquet").count()
    val edges1 = spark.read.parquet(s"$dir/orders.parquet").select(col("o_custkey").as("src"),
      (lit(1L) + (col("o_custkey")*7 + col("o_orderkey")*3) % lit(ncust)).as("dst")).distinct()
      .persist()
    println("edges=" + edges1.count())
    // warm codegen
    graft.algorithms.PageRank.run(edges1, 0.8, 2)
    val preserved = timeIt("preserve (6 iters + kvs)") {
      val p = graft.algorithms.IncrementalPageRank.preserve(edges1, 0.8, 6)
      p.kvs.count(); p.out.count(); p
    }
    val chg = edges1.filter(col("src") % 10 === 3).select("src").distinct()
    val added = chg.select(col("src"), (lit(1L) + (col("src")*11 + 5) % lit(ncust)).as("dst"))
    val edges2 = edges1.filter(col("src") % 10 =!= 3).unionByName(added)
    timeIt("incremental (4 iters)") {
      graft.algorithms.IncrementalPageRank.incremental(edges2, preserved, chg, 0.8, 4, 0.0).count()
    }
    timeIt("incremental again") {
      graft.algorithms.IncrementalPageRank.incremental(edges2, preserved, chg, 0.8, 4, 0.0).count()
    }
    spark.catalog.clearCache(); System.gc()
    val q = graft.queries.IterativeQueries.all.find(_.name == "q_incr_pagerank").get
    timeIt("full q_incr query fn")(q.fn(spark, dir).count())
    spark.catalog.clearCache(); System.gc()
    timeIt("full q_incr query fn again")(q.fn(spark, dir).count())
    spark.stop()
  }
}
