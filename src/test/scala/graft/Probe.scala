package graft
// Parameterized scratch probe (not a test): ad-hoc plan inspection and
// stage timing during development.
//   sbt "Test/runMain graft.Probe explain <query> [sfdir]"   — formatted plan
//   sbt "Test/runMain graft.Probe time <expr-label> [sfdir]" — custom blocks below
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = a.headOption.getOrElse("explain")
    val dir = a.drop(2).headOption.getOrElse("/root/testdata/sf0.1")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    mode match {
      case "explain" =>
        val q = a(1)
        SparkEntry.queries(q)(spark, dir).explain("formatted")

      case "ngram-stages" =>
        import graft.functions.TextFunctions._
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 5 === 0)
        val sh = docs.select(col("doc_id"),
          array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        timed("shingles")(sh.count())
        val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
        val rare = inv.withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("s")))
          .filter(col("df") <= 128).select("doc_id", "s")
        timed("inverted+dfcap")(rare.count())
        val cands = rare.alias("x").join(rare.alias("y"), "s")
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        timed("cand-selfjoin")(cands.count())
        val sa = sh.select(col("doc_id").as("a"), col("sh").as("sa"))
        val sb = sh.select(col("doc_id").as("b"), col("sh").as("sb"))
        val out = cands.join(sa, "a").join(sb, "b")
          .select(col("a"), col("b"),
            (size(array_intersect(col("sa"), col("sb"))).cast("double") /
              size(array_union(col("sa"), col("sb"))).cast("double")).as("j"))
          .filter(col("j") >= 0.2)
        timed("jaccard-confirm")(out.count())

      case "incr-stages" =>
        import graft.algorithms.IncrementalPageRank
        val d2 = a.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
        val ncust = spark.read.parquet(s"$d2/customer.parquet").count()
        val edges1 = spark.read.parquet(s"$d2/orders.parquet")
          .select(col("o_custkey").as("src"),
            (lit(1L) + (col("o_custkey") * 7 + col("o_orderkey") * 3) % lit(ncust)).as("dst"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val preserved = timed("preserve(base run)")(
          { val p = IncrementalPageRank.preserve(edges1, 0.8, iterations = 4)
            p.out.count(); p })
        val chg = edges1.filter(col("src") % 10 === 3).select("src").distinct()
        val added = chg.select(col("src"),
          (lit(1L) + (col("src") * 11 + 5) % lit(ncust)).as("dst"))
        val edges2 = edges1.filter(col("src") % 10 =!= 3).unionByName(added)
        val res = timed("incremental(3 rounds)")(
          IncrementalPageRank.incremental(edges2, preserved, chg, 0.8,
            iterations = 3, filterThreshold = 0.0))
        timed("result count")(res.count())
        timed("result count again")(res.count())

      case "forget-stages" =>
        import graft.operators.{Forget, LineDedupStore, LmCountsStore, TfidfStore}
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .selectExpr("doc_id", "text")
        val tp = java.nio.file.Files.createTempDirectory("pf_tfidf").toString
        val ep = java.nio.file.Files.createTempDirectory("pf_line").toString
        val lp = java.nio.file.Files.createTempDirectory("pf_lm").toString
        val txn = java.nio.file.Files.createTempDirectory("pf_txn").toString
        timed("tfidf init")(TfidfStore.init(spark, tp, docs, "doc_id",
          "text", nBuckets = 16))
        timed("linededup init")(LineDedupStore.init(spark, ep, docs,
          "doc_id", "text", maxDocs = 64L, sep = " ", nBuckets = 16))
        timed("lm init")(LmCountsStore.init(spark, lp, docs, "doc_id",
          "text", nBuckets = 16))
        val purge = docs.filter(col("doc_id") % 100 === 2).select("doc_id")
        timed("sweep tfidf-only")(Forget.sweep(spark, txn, purge,
          "doc_id", "text", Seq("tfidf" -> tp), scrubHistory = false))
        timed("sweep line-only")(Forget.sweep(spark, txn, purge,
          "doc_id", "text", Seq("linededup" -> ep), scrubHistory = false))
        timed("sweep lm-only")(Forget.sweep(spark, txn, purge,
          "doc_id", "text", Seq("lmcounts" -> lp), scrubHistory = false))
        timed("scrub all")(Seq(tp, ep, lp).foreach(Forget.scrub(spark, _)))
        timed("tfidf read")(TfidfStore.tfidf(spark, tp).count())

      case other => println(s"unknown probe mode: $other")
    }
    spark.stop()
  }
}
