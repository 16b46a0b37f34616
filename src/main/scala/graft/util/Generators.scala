package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture generators mirroring the reference's data
  * tooling (A6/A7/A12: `utils/genGraph.java:28-102`,
  * `genGraphReduce.java:35-372` graph types, `UpdatePageRankGraph.java`
  * / `UpdateKmeansData.java` delta generators).
  *
  * All generation is distributed (`spark.range` + column arithmetic —
  * no driver-side collections) and seedless-deterministic: the same
  * (n, fanout) always produces the same data, which is what the
  * differential tests need. The reference's lognormal degree
  * distribution is approximated with a power-ish fanout spread.
  */
object Generators {

  /** Directed graph: `n` nodes, per-node out-degree varying 1..maxDeg
    * deterministically (heavier hubs at low ids, like the reference's
    * power-law type `genGraphReduce.java:81-336`). Columns (src, dst). */
  def graph(spark: SparkSession, n: Long, maxDeg: Int = 8): DataFrame = {
    val nodes = spark.range(n).select(col("id").as("src"))
    nodes
      .withColumn("deg", (pmod(col("src") * 7 + 3, lit(maxDeg.toLong)) + 1).cast("int"))
      .select(col("src"), explode(sequence(lit(1), col("deg"))).as("k"))
      .select(col("src"),
        pmod(col("src") * 131 + col("k") * 1009 + 17, lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Sparse points for KMeans: `n` points of dimension `dim`, clustered
    * around `k` deterministic centers (mirrors `gendata km` type).
    * Columns (id, vec: array<double>). */
  def points(spark: SparkSession, n: Long, dim: Int, k: Int): DataFrame =
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (pmod(col("id"), lit(k.toLong)) * 10).cast("double") +
          sin(col("id") * 37 + d * 101) // in-cluster jitter
      ).as("vec"))

  /** Points delta à la `genkmupdate` (A7, reference
    * `UpdateKmeansData.java:32-284`: rewrites a deterministic subset of
    * points in place): every point with `id % everyNth == 0` moves to a
    * deterministically shifted position. Returns (updatedPoints,
    * changedIds, deltaTriples) with the same (key, value, change) triple
    * encoding as [[graphDelta]]. */
  def pointsDelta(points: DataFrame, everyNth: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val changed = points.filter(pmod(col("id"), lit(everyNth.toLong)) === 0)
      .select("id").distinct()
    val moved = points.join(changed, "id")
      .select(col("id"),
        transform(col("vec"), (x, d) => x + sin(col("id") * 13 + d * 7) * 5.0)
          .as("vec"))
    val removed = points.join(changed, "id")
      .select(col("id"), col("vec"), lit("-").as("change"))
    val added = moved.select(col("id"), col("vec"), lit("+").as("change"))
    val updated = points.join(changed, Seq("id"), "left_anti")
      .unionByName(moved)
    (updated, changed, removed.unionByName(added))
  }

  /** Graph delta à la `genprupdate`: flips the out-edges of every source
    * with `src % everyNth == 0`. Returns (updatedEdges, changedSources,
    * deltaTriples) where deltaTriples carries the reference's
    * (key, value, change ∈ {"+","-"}) encoding (`IFile.TrippleWriter`,
    * `IFile.java:255-430`). */
  def graphDelta(edges: DataFrame, everyNth: Int, n: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    val changed = edges.filter(pmod(col("src"), lit(everyNth.toLong)) === 0)
      .select("src").distinct()
    val removed = edges.join(changed, "src")
      .select(col("src"), col("dst"), lit("-").as("change"))
    val added = changed
      .select(col("src"), pmod(col("src") * 11 + 5, lit(n)).as("dst"),
        lit("+").as("change"))
      .filter(col("src") =!= col("dst"))
    val updated = edges.join(changed, Seq("src"), "left_anti")
      .unionByName(added.drop("change"))
      .distinct()
    (updated, changed, removed.unionByName(added))
  }
}
