package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Deterministic standard-normal-ish value from a long id and salt:
    * the mean of four uniform hashes (Irwin–Hall), rescaled. Good
    * enough for degree-distribution realism; fully reproducible. */
  private def zApprox(id: Column, salt: Int): Column = {
    val us = (1 to 4).map { k =>
      (pmod(xxhash64(id * lit(salt + k) + lit(k * 7919)), lit(1000000007L))
        .cast("double") / 1000000007.0)
    }
    (us.reduce(_ + _) - 2.0) * math.sqrt(3.0)
  }

  /** Typed graph generator mirroring the reference's `gengraph` family
    * (A12, `genGraphReduce.java:81-336`): per-node out-degree is
    * ceil(lognormal(μ, σ)) with the reference's per-type constants —
    *  - "pg" (PageRank): μ=-1, σ=2.3 — heavy-tailed, many degree-1
    *    nodes, rare huge hubs; columns (src, dst).
    *  - "sp" (shortest path): degree μ=1.5, σ=1.0, plus a lognormal
    *    edge weight (μ=0.4, σ=1.2); columns (src, dst, weight).
    *  - "nmf" (matrix factorization): bipartite — dst ids live in
    *    their own `m`-sized space, lognormal degree μ=1, σ=1; columns
    *    (src, dst, weight≈rating).
    * Degrees are capped at n/2 like the reference's resample loop. The
    * randomness is hash-derived, so the same (kind, n) is always the
    * same graph (what differential tests need). */
  def graphTyped(spark: SparkSession, n: Long, kind: String = "pg",
      m: Long = 0L): DataFrame = {
    val (mu, sigma) = kind match {
      case "pg"  => (-1.0, 2.3)
      case "sp"  => (1.5, 1.0)
      case "nmf" => (1.0, 1.0)
      case other => throw new IllegalArgumentException(
        s"unknown graph kind '$other' (pg|sp|nmf)")
    }
    val dstSpace = if (kind == "nmf") (if (m > 0) m else n) else n
    val nodes = spark.range(n).select(col("id").as("src"))
    val withDeg = nodes.withColumn("deg",
      least(ceil(exp(lit(mu) + lit(sigma) * zApprox(col("src"), 13))),
        lit(n / 2)).cast("int"))
      .filter(col("deg") >= 1)
    val raw = withDeg
      .select(col("src"), explode(sequence(lit(1), col("deg"))).as("k"))
      .select(col("src"),
        pmod(xxhash64(col("src") * 131 + col("k") * 1009 + 17), lit(dstSpace)).as("dst"))
    // self-loops are meaningless except in the bipartite kind, where
    // src and dst are different id spaces
    val edges = (if (kind == "nmf") raw else raw.filter(col("src") =!= col("dst")))
      .distinct()
    kind match {
      case "pg" => edges
      case _ =>
        edges.withColumn("weight",
          exp(lit(if (kind == "sp") 0.4 else 0.0) +
            lit(if (kind == "sp") 1.2 else 1.0) *
              zApprox(col("src") * 100003 + col("dst"), 29)))
    }
  }

  /** Power-method sparse matrix à la the reference's "power" kind
    * (A12, `genGraphReduce.java:336-372`): for each row i of an m×m
    * matrix, `dim` uniform draws of a column index (duplicates
    * collapse, so rows carry ≤ dim distinct cells) with a uniform
    * [0,1) value per surviving cell — the fixture the reference feeds
    * its power-iteration / matrix-vector jobs. Hash-derived
    * randomness: the same (m, dim) is always the same matrix.
    * Columns (i, j, v). */
  def matrixPower(spark: SparkSession, m: Long, dim: Int): DataFrame =
    spark.range(m).select(col("id").as("i"))
      .select(col("i"), explode(sequence(lit(1), lit(dim))).as("k"))
      .select(col("i"),
        pmod(xxhash64(col("i") * 7919 + col("k") * 104729 + 23), lit(m)).as("j"))
      .distinct()
      .withColumn("v",
        pmod(xxhash64(col("i") * 65537 + col("j") + 11), lit(1000000007L))
          .cast("double") / 1000000007.0)

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
