package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch driver for manual verification runs (see .claude/skills/verify). */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val queries = embs.filter(col("id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(embs, queries, k = 5))
    for (k <- Seq(8, 16, 32); nprobe <- Seq(1, 2, 4); iters <- Seq(5, 10)) {
      val model = graft.algorithms.KMeans.run(embs, k = k, metric = "cosine", maxIterations = iters)
      val centDf = model.centers.toSeq.map { case (cid, v) => (cid.toLong, v.toSeq) }.toDF("id", "vec")
      val trained = pairs(Similarity.ivfTopK(embs, queries, k = 5, nlist = k, nprobe = nprobe, centroids = Some(centDf)))
      val baseline = pairs(Similarity.ivfTopK(embs, queries, k = 5, nlist = k, nprobe = nprobe))
      def recall(got: Set[(Long, Long)]) = (exact & got).size.toDouble / exact.size
      println(f"k=$k%2d nprobe=$nprobe iters=$iters%2d trained=${recall(trained)}%.3f baseline=${recall(baseline)}%.3f")
    }
    spark.stop()
  }
}
