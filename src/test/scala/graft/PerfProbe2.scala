package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object PerfProbe2 {
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
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val edges = orders.select(col("o_custkey").as("src"),
      (lit(1L) + (col("o_custkey")*7 + col("o_orderkey")*3) % lit(ncust)).as("dst")).distinct()
    // manual replication of IterativeJob loop with timers
    val static = timeIt("prepare+repartition+persist+count") {
      val s = graft.algorithms.PageRank.prepare(edges).repartition(32, col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val base = timeIt("nodes persist") {
      val b = graft.algorithms.PageRank.nodes(edges).repartition(32, col("node")).persist(StorageLevel.MEMORY_AND_DISK)
      b.count(); b
    }
    var dyn = base.withColumn("rank", lit(1.0)).repartition(32, col("node")).persist(StorageLevel.MEMORY_AND_DISK)
    dyn.count()
    for (i <- 1 to 5) {
      val next = timeIt(s"iter $i") {
        val contribs = static.join(dyn, static("src") === dyn("node"))
          .select(static("dst"), (dyn("rank") / static("deg") * 0.8).as("c"))
          .groupBy("dst").agg(sum("c").as("c"))
        val nx = base.join(contribs, base("node") === contribs("dst"), "left")
          .select(base("node"), (lit(0.2) + coalesce(col("c"), lit(0.0))).as("rank"))
          .repartition(32, col("node")).persist(StorageLevel.MEMORY_AND_DISK)
        nx.count(); nx
      }
      dyn.unpersist(false); dyn = next
    }
    println("=== now with explain on one iteration ===")
    val contribs = static.join(dyn, static("src") === dyn("node"))
      .select(static("dst"), (dyn("rank") / static("deg") * 0.8).as("c"))
      .groupBy("dst").agg(sum("c").as("c"))
    base.join(contribs, base("node") === contribs("dst"), "left")
      .select(base("node"), (lit(0.2) + coalesce(col("c"), lit(0.0))).as("rank"))
      .explain("formatted")
    spark.stop()
  }
}
