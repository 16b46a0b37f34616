package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{IncrementalJob, IterConfig, IterResult, IterativeJob, PreservedState, ProjectKind}

/** Incremental Jacobi-style matrix-vector iteration x ← b + M·x — the
  * second instantiation of [[graft.core.IncrementalJob]] (A7/F28-F31;
  * the reference's generic claim is that incremental recomputation works
  * for ANY GIM-V-shaped workload, `ReduceTask.java:3504-3691`, not just
  * PageRank — this proves the abstraction isn't PageRank-shaped).
  *
  * The iteration converges to the fixpoint (I − M)⁻¹·b whenever
  * ρ(M) < 1 (callers scale M accordingly, e.g. damped row-normalized
  * weights). PageRank is the special case v = damping/deg, b = 1−d.
  *
  * Key spaces: contributions flow column→row, so the source key (sk) is
  * the column index `j` and the output key (k2) the row index `idx`;
  * a cell delta's changed columns seed the frontier and propagate
  * through the matrix's sparsity pattern exactly like PageRank's
  * out-edges. All arithmetic is kept in the exact operation order of
  * the oracle: per-cell contribution `v * x`, reduce `b + Σ`.
  */
object IncrementalMatVec {

  /** Node universe: every row or column index of M, with its constant
    * term. Columns (idx, bv). */
  def universe(m: DataFrame, b0: Double): DataFrame =
    m.select(col("i").as("idx")).union(m.select(col("j").as("idx")))
      .distinct().withColumn("bv", lit(b0))

  /** Full engine run: `iterations` rounds of x ← b + M·x from x0 = b.
    * `m`: (i, j, v); returns (idx, x). One co-partitioned static side,
    * one shuffle per iteration (the row-sum reduce) — same plan family
    * as [[PageRank.run]]. */
  def run(m: DataFrame, b: DataFrame, iterations: Int,
      threshold: Double = -1.0, numPartitions: Int = 32): IterResult = {
    val static = m.select(col("i").cast("long"), col("j").cast("long"),
      col("v").cast("double"))
    val base = b.select(col("idx").cast("long"), col("bv").cast("double"))
      .repartition(numPartitions, col("idx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val init = base.select(col("idx"), col("bv").as("x"))

    val step: (DataFrame, DataFrame, Int) => DataFrame = (s, dyn, _) => {
      val contribs = s.join(dyn, s("j") === dyn("idx"))
        .select(s("i"), (col("v") * col("x")).as("c"))
        .groupBy("i").agg(sum("c").as("s"))
      base.join(contribs, base("idx") === contribs("i"), "left")
        .select(base("idx"), (col("bv") + coalesce(col("s"), lit(0.0))).as("x"))
    }

    val res = new IterativeJob(
      static, "j", init, "idx", ProjectKind.One2One, step,
      IterativeJob.sumAbsDiff("idx", "x"),
      IterConfig(iterations, threshold, numPartitions = numPartitions)).run()
    base.unpersist(blocking = false)
    res
  }

  /** Base run + preserved state: kvs holds each cell's contribution
    * computed from the FINAL x (see [[PreservedState]]'s consistency
    * contract), out the final per-index values. */
  def preserve(m: DataFrame, b: DataFrame, iterations: Int,
      numPartitions: Int = 32): PreservedState = {
    val x = run(m, b, iterations, numPartitions = numPartitions).dynamic
    val kvs = m.join(x, m("j") === x("idx"))
      .select(m("i").as("idx"), m("j"), (col("v") * col("x")).as("contrib"))
    PreservedState(kvs, x)
  }

  /** Continue over the updated matrix.
    *
    * @param updatedM       cells AFTER the delta (i, j, v)
    * @param b              constant term (idx, bv) over the node universe
    * @param changedColumns columns whose cells changed (single column j)
    */
  def incremental(
      updatedM: DataFrame,
      b: DataFrame,
      preserved: PreservedState,
      changedColumns: DataFrame,
      iterations: Int,
      filterThreshold: Double = 0.0,
      numPartitions: Int = 32,
      durableStatePath: Option[String] = None): DataFrame = {

    val static = updatedM.select(col("i").cast("long"), col("j").cast("long"),
      col("v").cast("double"))
    val bKeyed = b.select(col("idx").cast("long"), col("bv").cast("double"))

    val job = new IncrementalJob(
      updatedStatic = static,
      skCol = "j",
      k2Col = "idx",
      preserved = preserved,
      initialFrontier = changedColumns.select(col("j")),
      // name-based refs only (see IncrementalJob's expression-id note);
      // join output names are disjoint: (i, j, v) ⨯ (idx, x).
      mapContribs = (staticF, dynF) =>
        staticF.join(dynF, col("j") === col("idx"))
          .select(col("i").as("_k2"), col("j"), (col("v") * col("x")).as("contrib"))
          .withColumnRenamed("_k2", "idx"),
      reduce = (affected, kvsAffected) => {
        val sums = kvsAffected.groupBy("idx").agg(sum("contrib").as("s"))
        affected.join(sums, Seq("idx"), "left")
          .join(bKeyed, Seq("idx"))
          .select(col("idx"), (col("bv") + coalesce(col("s"), lit(0.0))).as("x"))
      },
      outToDyn = identity,
      distance = (o, n) => abs(o("x") - n("x")),
      filterThreshold = filterThreshold,
      maxIterations = iterations,
      numPartitions = numPartitions,
      durableStatePath = durableStatePath)

    job.run()._1
  }
}
