package graft.algorithms

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{IterConfig, IterResult, IterativeJob, ProjectKind}

/** Iterative PageRank, the reference's flagship workload (A1,
  * `ExampleDriver.java:96`; map `IterPageRank.java:137-169`, reduce
  * `:171-202`, ONE2ONE projector `:204-232`).
  *
  * Semantics replicated exactly: every node starts at rank 1.0; each
  * iteration a node keeps `1-damping` (reference hard-codes damping 0.8,
  * so each keeps 0.2) and spreads `damping·rank/outDegree` along its
  * out-edges; nodes without in-links sit at `1-damping`; dangling mass is
  * dropped (the reference spreads only along existing edges).
  *
  * Spark plan shape (scale-minded): the static side `(src, dst, deg)` is
  * hash-partitioned by `src` once and cached; ranks are partitioned by
  * `node`, so the static⨝ranks join shuffles nothing; the only per-
  * iteration shuffle is the `groupBy(dst)` contribution sum — exactly the
  * shuffle the reference pays per iteration too. The post-aggregation
  * hash partitioning on `dst` is then reused by the node-base left join.
  */
object PageRank {

  /** Build the co-partitioned static relation from an edge list.
    * Reference: the "data distribution" job (F34, `IterPageRank.java:304-343`). */
  def prepare(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    e.join(deg, "src") // (src, dst, deg)
  }

  /** All node ids appearing as source or destination. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("node"))
      .union(edges.select(col("dst").cast("long").as("node")))
      .distinct()

  /** Run PageRank. Returns (node: long, rank: double).
    *
    * @param threshold stop when Σ|Δrank| < threshold (checked from
    *                  iteration 2, like the reference); negative = run
    *                  exactly `maxIterations`.
    */
  def run(
      edges: DataFrame,
      damping: Double = 0.8,
      maxIterations: Int = 10,
      threshold: Double = -1.0,
      numPartitions: Int = 32): IterResult = {
    val (res, _, release) = runKeepStatic(edges, damping, maxIterations,
      threshold, numPartitions)
    release()
    res
  }

  /** [[run]] plus the co-partitioned static relation (src, dst, deg) it
    * used — backed by the run's cached distinct-edge frame — and a
    * release callback for that cache. For callers deriving more state
    * from the same graph (the preserve pass joins edges against the
    * final ranks): reusing the cached frame skips a second
    * scan+distinct+degree chain. Call `release()` (or let the session's
    * per-query cache clear handle it) once derived state is
    * materialized. */
  def runKeepStatic(
      edges: DataFrame,
      damping: Double = 0.8,
      maxIterations: Int = 10,
      threshold: Double = -1.0,
      numPartitions: Int = 32): (IterResult, DataFrame, () => Unit) = {

    // distinct edge list computed ONCE — static, degrees, and the node
    // base all derive from this cached frame (otherwise the upstream
    // scan+distinct runs three times).
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val static = e.join(deg, "src")
    // node base sized by the edge relation, numPartitions as ceiling
    // (guide §2 — see graft.core.Adaptive)
    val nAdapt = graft.core.Adaptive.partitionsFor(e, numPartitions)
    val base = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().repartition(nAdapt, col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val init = base.withColumn("rank", lit(1.0))

    val step: (DataFrame, DataFrame, Int) => DataFrame = (s, dyn, _) => {
      val contribs = s.join(dyn, s("src") === dyn("node"))
        .select(s("dst"), (dyn("rank") / s("deg") * damping).as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      base.join(contribs, base("node") === contribs("dst"), "left")
        .select(base("node"),
          (lit(1.0 - damping) + coalesce(col("c"), lit(0.0))).as("rank"))
    }

    val job = new IterativeJob(
      static, "src", init, "node", ProjectKind.One2One, step,
      IterativeJob.sumAbsDiff("node", "rank"),
      IterConfig(maxIterations, threshold, numPartitions = numPartitions))
    val res = job.run()
    base.unpersist(blocking = false)
    (res, static, () => e.unpersist(blocking = false))
  }

  /** Naive loop-of-jobs baseline (A10, `NaivePageRank.java:34-323`): the
    * same math but each iteration re-derives static data and re-plans
    * from scratch — no cached co-partitioned static side, no reused
    * partitioning, lineage truncated by materializing to a fresh
    * DataFrame via localCheckpoint only. Exists as the perf/semantics
    * oracle for [[run]] (the reference ships `naivepagerank` for exactly
    * this purpose). */
  def runNaive(edges: DataFrame, damping: Double, iterations: Int): DataFrame = {
    val shim = org.apache.spark.sql.graft.GraftSqlShim
    val releases = scala.collection.mutable.ListBuffer.empty[() => Unit]
    var ranks = nodes(edges).withColumn("rank", lit(1.0))
    for (_ <- 1 to iterations) {
      val static = prepare(edges) // recomputed every iteration, like re-running the MR job chain
      val base = nodes(edges)
      val contribs = static.join(ranks, static("src") === ranks("node"))
        .select(static("dst"), (ranks("rank") / static("deg") * damping).as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      val (leaf, _, rel) = shim.checkpointedLeafWithHandle(
        base.join(contribs, base("node") === contribs("dst"), "left")
          .select(base("node"),
            (lit(1.0 - damping) + coalesce(col("c"), lit(0.0))).as("rank")))
      releases += rel
      ranks = leaf
    }
    // final ranks into a catalog-visible cache; per-iteration checkpoint
    // leaves (invisible to clearCache) are then freed on the spot
    val out = ranks.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    releases.foreach(_.apply())
    out
  }
}
