package graft
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("q_filter_scan", "q_broadcast_join", "q1_agg", "q_semi_anti")) {
      println(s"########## $n")
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // distill: scans w/ pushed filters + read schema, join types, codegen spans
      plan.split("\n").filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Join") || l.contains("WholeStageCodegen") || l.contains("Scan parquet"))
        .take(14).foreach(println)
    }
    spark.stop()
  }
}
