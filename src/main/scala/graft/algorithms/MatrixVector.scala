package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{IterConfig, IterResult, IterativeJob, ProjectKind}

/** Iterative (blocked) matrix–vector multiplication, GIM-V style (A4,
  * reference `MatrixVector.java`: blocking job `:93-147`, multiply map
  * `:152-230`, sum reduce `:231-313`, ONE2MUL projector `:315-340`).
  *
  * Each iteration computes y = M·x, optionally L1-normalizes y (the
  * global scalar is the reference's global-value cycle, F25 — a single
  * Double collected at the driver), and feeds y back as x. Distance is
  * Σ|Δ| between consecutive vectors (reference reduce distance,
  * `MatrixVector.java:231-313`).
  *
  * Plan shape: M is partitioned by column `j` once and cached (ONE2MUL —
  * one vector entry joins the whole matrix column); x is partitioned by
  * `j`; the join is then shuffle-free and the per-iteration shuffle is
  * the `groupBy(i)` partial-sum — identical to the reference's shuffle.
  *
  * The blocked variant ([[blocked]]) groups cells into b×b tiles so the
  * join/shuffle move O(nnz/b²) rows of dense tiles instead of O(nnz)
  * scalar cells — the reference's blocking job re-expressed columnarly.
  */
object MatrixVector {

  /** One multiply step: (i,j,v) ⨝ (j,x) → Σ_j v·x per i. */
  def multiply(m: DataFrame, x: DataFrame): DataFrame =
    m.join(x, "j")
      .groupBy("i")
      .agg(sum(col("v") * col("x")).as("y"))
      .select(col("i").as("j"), col("y").as("x")) // re-keyed for the next round

  /** Run `iterations` rounds of x ← M·x (optionally normalized), starting
    * from x0. `m` columns: (i: long, j: long, v: double); `x0`: (j: long,
    * x: double). Returns (j, x). */
  def run(
      m: DataFrame,
      x0: DataFrame,
      maxIterations: Int = 10,
      threshold: Double = -1.0,
      normalize: Boolean = true,
      numPartitions: Int = 32): IterResult = {

    val static = m.select(col("i").cast("long"), col("j").cast("long"),
      col("v").cast("double"))
    val init = x0.select(col("j").cast("long"), col("x").cast("double"))

    val step: (DataFrame, DataFrame, Int) => DataFrame = (s, dyn, _) => {
      if (normalize) {
        // Global value (F25): one scalar at the driver, like the
        // JobTracker-aggregated global data. The norm is an action on y,
        // so y must be persisted first or the join+groupBy runs twice per
        // iteration (once for the norm, once for the next round's plan).
        val y = multiply(s, dyn).persist(StorageLevel.MEMORY_AND_DISK)
        val norm = y.agg(sum(abs(col("x")))).collect()(0).getDouble(0)
        val out = y.select(col("j"), (col("x") / lit(norm)).as("x"))
          .localCheckpoint(eager = true)
        y.unpersist(blocking = false)
        out
      } else multiply(s, dyn)
    }

    new IterativeJob(
      static, "j", init, "j", ProjectKind.One2Mul, step,
      IterativeJob.sumAbsDiff("j", "x"),
      IterConfig(maxIterations, threshold, numPartitions = numPartitions)
    ).run()
  }

  /** Naive loop-of-jobs baseline (A11, reference
    * `naive/NaiveMatrixVectorMultiplication.java`): each iteration is an
    * independent job — the matrix is re-projected from scratch (no
    * cached co-partitioned static side), the L1 norm enters the plan as
    * a crossJoin of a 1-row aggregate instead of a driver-collected
    * global value, and each round's vector is materialized like the
    * reference's per-job HDFS write. Differential oracle for [[run]]. */
  def runNaive(m: DataFrame, x0: DataFrame, iterations: Int,
      normalize: Boolean = true): DataFrame = {
    var x = x0.select(col("j").cast("long"), col("x").cast("double"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val mm = m.select(col("i").cast("long"), col("j").cast("long"),
        col("v").cast("double")) // re-derived every round, like re-running the job chain
      val y = multiply(mm, x)
      x = (if (normalize) {
        val norm = y.agg(sum(abs(col("x"))).as("_nrm"))
        y.crossJoin(broadcast(norm))
          .select(col("j"), (col("x") / col("_nrm")).as("x"))
      } else y).localCheckpoint(true)
    }
    x
  }

  /** Blocked y = M·x: tiles of size b (reference blocking job keys cells
    * by (rowBlk, colBlk), `MatrixVector.java:93-147`). Cells are packed
    * into per-tile arrays, the join happens per (colBlk), and partial
    * dense products are summed per rowBlk. Returns (j, x) identical to
    * [[multiply]]. */
  def multiplyBlocked(m: DataFrame, x: DataFrame, b: Int): DataFrame = {
    val tiles = m
      .withColumn("ib", (col("i") / b).cast("long"))
      .withColumn("jb", (col("j") / b).cast("long"))
      .groupBy("ib", "jb")
      .agg(collect_list(struct(
        (col("i") % b).cast("int").as("io"),
        (col("j") % b).cast("int").as("jo"),
        col("v"))).as("cells"))
    val xb = x
      .withColumn("jb", (col("j") / b).cast("long"))
      .groupBy("jb")
      .agg(map_from_entries(collect_list(
        struct((col("j") % b).cast("int").as("jo"), col("x")))).as("xmap"))
    // The join moves O(nnz/b²) tile rows instead of O(nnz) cells; the
    // per-cell product is a codegen'd map lookup (no UDF), and the final
    // groupBy(j) pre-aggregates map-side like the reference's combiner.
    val partial = tiles.join(xb, "jb")
      .select(col("ib"), explode(col("cells")).as("c"), col("xmap"))
      .withColumn("xv", col("xmap")(col("c.jo")))
      .filter(col("xv").isNotNull)
      .select((col("ib") * b + col("c.io")).as("j"), (col("c.v") * col("xv")).as("p"))
    partial.groupBy("j").agg(sum("p").as("x"))
  }
}
