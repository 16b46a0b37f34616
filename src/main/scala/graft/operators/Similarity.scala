package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float|double>).
  *
  * Two paths, same results contract (query_id, neighbor_id, cosine):
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set against
  *    every vector; one map-side pass + a top-k per query. The baseline,
  *    and the right plan whenever |queries| is small.
  *  - [[lshBucketTopK]] — scale path: random-hyperplane LSH buckets both
  *    sides; only same-bucket pairs are scored, so the cross product
  *    never materializes. Approximate (recall < 1), tested against the
  *    brute-force oracle.
  *
  * Cosine is computed with the native codegen'd [[graft.functions.DotProduct]]
  * expression — no UDF, no interpreted HOF fallback on the scoring path.
  */
object Similarity {

  /** dot(a,b) via the native codegen'd expression
    * [[graft.functions.DotProduct]] (index-order fold — bit-identical to
    * the zip_with+aggregate HOF formulation and the SQL oracle, but it
    * stays inside whole-stage codegen instead of falling back to
    * interpreted lambdas). Callers must register it on the session. */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.dot_product(a, b)

  private def norm(a: org.apache.spark.sql.Column) = sqrt(dot(a, a))

  /** Exact top-k cosine neighbors of each query vector.
    *
    * @param vectors (id, vec) all vectors
    * @param queries (id, vec) query subset — must be broadcast-sized
    */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val v = vectors.select(col("id").as("nid"), col("vec").cast("array<double>").as("nvec"))
    val q = queries.select(col("id").as("qid"), col("vec").cast("array<double>").as("qvec"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / (norm(col("qvec")) * norm(col("nvec"))))
          .as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("qid", "nid", "cosine", "rk")
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d component =
    * sin(p·10007 + d·97) — reproducible everywhere, no RNG state. */
  private def planeComponent(p: Int, d: org.apache.spark.sql.Column) =
    sin(lit(p * 10007).cast("double") + d.cast("double") * 97.0)

  /** Sign-random-projection bucket id from `planes` hyperplanes. */
  def srpBucket(vec: org.apache.spark.sql.Column, planes: Int): org.apache.spark.sql.Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * planeComponent(p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: score only same-bucket pairs (optionally with a
    * few rotated bucketings to boost recall). */
  def lshBucketTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val v = vectors.select(col("id").as("nid"), col("vec").cast("array<double>").as("nvec"))
    val q = queries.select(col("id").as("qid"), col("vec").cast("array<double>").as("qvec"))
    def withBuckets(df: DataFrame, vecCol: String, out: String) =
      df.select(col("*"), explode(array((0 until tables).map { t =>
        // table t uses planes [t*planes, (t+1)*planes)
        (0 until planes).map { p =>
          val proj = aggregate(
            zip_with(col(vecCol), sequence(lit(0), size(col(vecCol)) - 1),
              (x, d) => x * planeComponent(t * planes + p, d)),
            lit(0.0), (acc, v2) => acc + v2)
          when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
        }.reduce(_ + _) + lit(t.toLong << 32)
      }: _*)).as(out))
    val vb = withBuckets(v, "nvec", "bucket")
    val qb = withBuckets(q, "qvec", "bucket")
    val scored = vb.join(broadcast(qb), "bucket")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / (norm(col("qvec")) * norm(col("nvec"))))
          .as("cosine"))
      .distinct()
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("qid", "nid", "cosine", "rk")
  }

  /** Embedding-cosine near-dup pairs within a blocking column: pairs in
    * the same block with cosine ≥ threshold. */
  def embeddingNearDups(vectors: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val a = vectors.select(col(blockCol).as("blk"), col("id").as("a"),
      col("vec").cast("array<double>").as("va"))
    val b = vectors.select(col(blockCol).as("blk"), col("id").as("b"),
      col("vec").cast("array<double>").as("vb"))
    a.join(b, "blk").filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb")))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
