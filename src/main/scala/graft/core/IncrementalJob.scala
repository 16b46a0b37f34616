package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Preserved state of a converged iterative run (the paper's "MRBGraph";
  * reference `IFile.PreserveFile`, `IFile.java:478-800`, written by
  * `runPreserveReducer`, `ReduceTask.java:3155-3207`).
  *
  * Two Parquet-friendly tables instead of a hash-indexed random-access
  * file (SURVEY §4: set-oriented joins replace point lookups; columnar
  * immutable snapshots replace in-place updates — the design that holds
  * at 100 TB where the preserve store must be bucketed, compacted
  * columnar data, not a single random-access file):
  *
  *  - `kvs(k2, sk, …payload)` — per output key `k2`, the bag of
  *    contributions with their *source* static key `sk` (the reference's
  *    4-tuple shuffle provenance, F17).
  *  - `out(k2, …out)` — the run's final per-key outputs.
  *
  * Consistency contract: `kvs` is derived from the final dynamic state,
  * so for every source `s` its stored contribution equals what `s`
  * would emit given its current output value. (The reference instead
  * stores the literal last reduce inputs, which matches this only at
  * convergence — deriving from the final state makes incremental runs
  * exact even when the base run stopped early.)
  */
final case class PreservedState(kvs: DataFrame, out: DataFrame) {
  /** Materialize both tables as Parquet "state tables" (F27). */
  def write(path: String): Unit = {
    kvs.write.mode("overwrite").parquet(s"$path/kvs")
    out.write.mode("overwrite").parquet(s"$path/out")
  }
}

object PreservedState {
  def read(spark: org.apache.spark.sql.SparkSession, path: String): PreservedState =
    PreservedState(
      spark.read.parquet(s"$path/kvs"),
      spark.read.parquet(s"$path/out"))
}

/** Incremental (delta) recomputation over a preserved run — the
  * reference's F28-F31 (`runIncrementalMapper` `MapTask.java:1157-1287`,
  * MRBGraph merge loop `ReduceTask.java:1021-1217`, incremental
  * iterative drivers `ReduceTask.java:3504-3691`) as a driver loop over
  * set-oriented DataFrame ops:
  *
  * per iteration, with `frontier` = the source keys whose static rows or
  * dynamic values changed:
  *   1. re-map only the frontier's static rows against current dynamic
  *      values → fresh contributions (F28);
  *   2. merge into `kvs`: drop every stored contribution of a frontier
  *      source, insert the fresh ones (replace-on-equal + delete —
  *      the MRBGraph merge, F29);
  *   3. affected keys = outputs that lost or gained a contribution;
  *      re-reduce ONLY those groups from the merged bag;
  *   4. change-propagation filter (F30): affected keys whose output
  *      moved ≥ `filterThreshold` become the next frontier
  *      (`setFilterThreshold`, `JobConf.java:423-428`); θ=0 propagates
  *      every affected key (exact mode).
  *
  * @param updatedStatic static relation AFTER applying the delta,
  *                      carrying source-key column `sk`
  * @param mapContribs   (frontierStatic, frontierDynamic) → fresh
  *                      contribution rows (k2, sk, …payload)
  * @param reduce        (affectedKeys(k2), kvsOfAffected) → (k2, …out);
  *                      must emit a row for EVERY affected key (an
  *                      affected key may have an empty bag)
  * @param outToDyn      project an out row to the dynamic-value row the
  *                      mapper consumes (often identity/rename)
  * @param distance      per-key distance between old and new out rows,
  *                      given columns (old, new) — used by the F30 filter
  */
final class IncrementalJob(
    updatedStatic: DataFrame,
    skCol: String,
    k2Col: String,
    preserved: PreservedState,
    initialFrontier: DataFrame, // single column: sk
    mapContribs: (DataFrame, DataFrame) => DataFrame,
    reduce: (DataFrame, DataFrame) => DataFrame,
    outToDyn: DataFrame => DataFrame,
    distance: (Column, Column) => Column,
    filterThreshold: Double = 0.0,
    maxIterations: Int = 10,
    numPartitions: Int = 32) {

  /** Returns (finalOut, updatedKvs, iterationsRun). Stops early when the
    * frontier empties (all change absorbed — the reference's
    * non-converged-items counter hitting 0, `ReduceTask.java:3493`). */
  def run(): (DataFrame, DataFrame, Int) = {
    val n = numPartitions
    val spark = updatedStatic.sparkSession
    // The loop re-joins frames derived from each other across iterations;
    // Spark's DetectAmbiguousSelfJoin false-positives on those (all our
    // joins use explicit per-frame column references or USING columns,
    // so resolution is unambiguous). Disable for the loop, restore after.
    val ambiguityKey = "spark.sql.analyzer.failAmbiguousSelfJoin"
    val prevAmbiguity = spark.conf.getOption(ambiguityKey)
    spark.conf.set(ambiguityKey, "false")
    try runLoop(n) finally {
      prevAmbiguity match {
        case Some(v) => spark.conf.set(ambiguityKey, v)
        case None    => spark.conf.unset(ambiguityKey)
      }
    }
  }

  private val debugTiming = sys.env.contains("GRAFT_TIMING")
  private def timed[T](label: String)(f: => T): T =
    if (!debugTiming) f else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[incr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

  private def runLoop(n: Int): (DataFrame, DataFrame, Int) = {
    val static = updatedStatic.repartition(n, col(skCol))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var kvs = timed("init kvs ckpt")(
      preserved.kvs.repartition(n, col(k2Col)).localCheckpoint(true))
    var out = timed("init out ckpt")(
      preserved.out.repartition(n, col(k2Col)).localCheckpoint(true))
    var frontier = initialFrontier.select(col(skCol)).distinct()
      .localCheckpoint(true)
    var i = 0
    var frontierSize = frontier.count()

    // NOTE on column references: the loop re-joins frames derived from
    // one another (frontier ← affected ← kvs/out of earlier iterations),
    // and Catalyst rewrites expression ids when deduplicating such
    // self-joins — `df("col")` references then dangle. Every join below
    // therefore uses DISJOINT output names ("_fk"/"_aff" for the key
    // sets) and name-based resolution, which survives the rewrite.
    while (i < maxIterations && frontierSize > 0) {
      i += 1
      // frontier/affected key sets are small relative to the preserved
      // state (that is the point of incremental recomputation), so they
      // are broadcast: kvs/static/out are probed in place and never
      // shuffle inside the loop.
      val fk = broadcast(frontier.withColumnRenamed(skCol, "_fk"))
      val staticF = static.join(fk, col(skCol) === col("_fk")).drop("_fk")
      // dynamic values of the frontier keys (k2-space == sk-space)
      val dynF = outToDyn(out.join(fk, col(k2Col) === col("_fk")).drop("_fk"))
      val fresh = mapContribs(staticF, dynF)
        .persist(StorageLevel.MEMORY_AND_DISK)

      // affected = keys that lose an old contribution or gain a fresh one
      val affected = kvs.join(fk, col(skCol) === col("_fk"), "left_semi")
        .select(col(k2Col))
        .union(fresh.select(col(k2Col)))
        .distinct()
        .withColumnRenamed(k2Col, "_aff")
        .persist(StorageLevel.MEMORY_AND_DISK)

      // MRBGraph merge: replace every frontier source's contributions.
      // Loop-carried state is eagerly checkpointed — one job, after which
      // everything upstream (fresh, affected, the old kvs) is released.
      // no repartition: every probe of kvs below is a broadcast join,
      // so rows never need to move — the merge is map-side only.
      kvs = timed(s"iter $i kvs merge")(
        kvs.join(fk, col(skCol) === col("_fk"), "left_anti")
          .unionByName(fresh)
          .localCheckpoint(true))

      val kvsAffected = kvs.join(broadcast(affected),
        col(k2Col) === col("_aff"), "left_semi")
      val newOut = reduce(affected.withColumnRenamed("_aff", k2Col), kvsAffected)

      // F30 change-propagation filter
      val nextFrontier =
        if (filterThreshold <= 0.0) affected.withColumnRenamed("_aff", skCol)
        else {
          val old = out.select(col(k2Col).as("_ok"), struct(col("*")).as("_old"))
          val neu = newOut.select(col(k2Col), struct(col("*")).as("_new"))
          old.join(neu, col("_ok") === col(k2Col))
            .filter(distance(col("_old"), col("_new")) >= filterThreshold)
            .select(col(k2Col).as(skCol))
        }

      out = timed(s"iter $i out update")(
        out.join(broadcast(affected), col(k2Col) === col("_aff"), "left_anti")
          .unionByName(newOut)
          .localCheckpoint(true))

      // frontier feeds four places next iteration — truncate its lineage
      // too, or the plan tree doubles every round (exponential growth).
      frontier = timed(s"iter $i frontier")(nextFrontier.distinct().localCheckpoint(true))
      frontierSize = frontier.count()
      fresh.unpersist(blocking = false)
      affected.unpersist(blocking = false)
    }
    static.unpersist(blocking = false)
    (out, kvs, i)
  }
}
