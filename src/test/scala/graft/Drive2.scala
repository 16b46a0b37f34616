package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
object Drive2 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // generators + delta + naive-vs-engine differential via DiffStats
    val g = graft.util.Generators.graph(spark, 200, 6)
    println("GEN_EDGES=" + g.count())
    val engine = graft.algorithms.PageRank.run(g, 0.8, 6).dynamic
    val naive = graft.algorithms.PageRank.runNaive(g, 0.8, 6)
    val st = graft.util.DiffStats.compare(engine, naive, "node", "rank")
    println(s"DIFF engine-vs-naive: max=${st.max} only=${st.onlyLeft}/${st.onlyRight} within=${st.within(1e-9)}")
    val (g2, chg, delta) = graft.util.Generators.graphDelta(g, 10, 200)
    println("DELTA changed=" + chg.count() + " triples=" + delta.count() + " updated=" + g2.count())
    // incremental continuation vs naive continuation on updated graph
    val pres = graft.algorithms.IncrementalPageRank.preserve(g, 0.5, 20)
    val incr = graft.algorithms.IncrementalPageRank.incremental(g2, pres, chg, 0.5, 20, 0.0)
    val full = graft.algorithms.PageRank.run(g2, 0.5, 40).dynamic
    val st2 = graft.util.DiffStats.compare(incr, full, "node", "rank")
    println(s"DIFF incr-vs-full: max=${st2.max} within1e6=${st2.within(1e-6)}")
    // probe: empty delta → zero incremental iterations
    val incr0 = graft.algorithms.IncrementalPageRank.incremental(
      g, pres, chg.limit(0), 0.5, 20, 0.0)
    println("EMPTY_DELTA rows=" + incr0.count())
    // global value round trip
    val gv = Map("a" -> 1.5, "b" -> 2.5)
    graft.core.GlobalValue.write(spark, gv, "/tmp/gv_test", 3)
    println("GV=" + graft.core.GlobalValue.read(spark, "/tmp/gv_test", 3).toSeq.sorted)
    // streaming over real events
    val q = graft.streaming.EventStreams.windowedStats(
      graft.streaming.EventStreams.readEventStream(spark, "/root/testdata/sf0.001"))
      .writeStream.outputMode("append").format("memory").queryName("w")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    println("STREAM_ROWS=" + spark.table("w").count())
    println("DRIVE2_DONE")
    spark.stop()
  }
}
