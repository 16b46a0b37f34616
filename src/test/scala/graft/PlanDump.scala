package graft

/** Scratch tool (test scope, like DriveMain): dump
  * `.explain("formatted")` of named SparkEntry queries to
  * `plans/r15/<query>_<tag>.txt` — the optimization round's
  * before/after plan evidence.
  *
  * Usage: Test/runMain graft.PlanDump <sfDir> <tag> <query>[,<query>...]
  *
  * NOTE: for the procedural gates (stores, loops, streams) the
  * returned frame's plan covers only the FINAL read; the loop-internal
  * plan evidence for those is the `graft.timing` phase log, which this
  * tool leaves on stderr. Building `fn(spark, dir)` runs that
  * machinery eagerly, so point this at the sf dir you can afford.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.LogQuiet()
    val outDir = java.nio.file.Paths.get("plans/r15")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"plandump: $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"),
        s"-- $n @ $sfDir (${new java.util.Date})\n$txt")
      System.err.println(s"[plandump] wrote plans/r15/${n}_$tag.txt")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
