package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Narrow bridge into Spark's `private[sql]` surface (this file lives
  * under `org.apache.spark.sql` for access; the technique is the same
  * one spark-packages use for lineage-free leaves).
  *
  * Why it exists: `Dataset.localCheckpoint` bakes the OPTIMIZED PLAN's
  * size estimate into the leaf it returns (`originStats`). In a driver
  * loop whose frames feed each other, those estimates compound
  * geometrically until Catalyst's stats arithmetic dominates wall time
  * (see `IncrementalJob.materialize`). The previous workaround routed
  * every checkpoint through the block cache first (persist + count +
  * localCheckpoint) so the leaf saw real cached-size stats — correct,
  * but it wrote every byte of state twice and cost two jobs per
  * materialization.
  *
  * [[checkpointedLeaf]] does the single-write version: take the plan's
  * InternalRow RDD, local-checkpoint THAT (one cached copy, lineage
  * truncated), and wrap it in a [[LogicalRDD]] carrying EXPLICIT
  * statistics — constant-size numbers, immune to estimate compounding.
  * `sizeInBytes` is read from the block manager's storage info for the
  * just-cached RDD (the REAL cached bytes), falling back to a row-count
  * × schema estimate only if the blocks aren't visible yet. The
  * schema-only estimate understates variable-width data badly —
  * `ArrayType.defaultSize` assumes one element, so a 64-dim-vector
  * state would look 64× smaller than it is and could be auto-broadcast
  * at sizes that OOM an executor; real block sizes make the planner's
  * broadcast decisions honest. The physical plan's partitioning and
  * ordering are preserved exactly like `Dataset.localCheckpoint`
  * preserves them, so co-partitioned loop joins stay shuffle-free.
  *
  * Freeing the blocks: `Dataset.unpersist`/`spark.catalog.clearCache()`
  * go through the `CacheManager` and CANNOT see a raw RDD cached by
  * `localCheckpoint` — the blocks would otherwise live until the
  * ContextCleaner happens to GC the RDD reference. Callers that
  * materialize a bounded-lifetime frame must therefore use
  * [[checkpointedLeafWithHandle]] and invoke the returned release thunk
  * when the frame is superseded (see `IncrementalJob`'s segment
  * lifecycle). After release the leaf CANNOT be recomputed (lineage was
  * truncated) — release only when nothing references the frame.
  */
object GraftSqlShim {

  /** Materialize `df` as a local-checkpointed, lineage-free leaf with
    * explicit statistics. Returns (leaf, rowCount). One job, one cached
    * copy of the data. The cached blocks are NOT visible to
    * `spark.catalog.clearCache()` — use [[checkpointedLeafWithHandle]]
    * when the caller must free them deterministically. */
  def checkpointedLeaf(df: DataFrame): (DataFrame, Long) = {
    val (leaf, rows, _) = checkpointedLeafWithHandle(df)
    (leaf, rows)
  }

  /** [[checkpointedLeaf]] plus a release thunk that unpersists the
    * checkpointed RDD's blocks (non-blocking). Call it exactly once,
    * after every frame derived from the leaf is itself materialized —
    * the leaf has no lineage, so a released leaf cannot be re-read. */
  def checkpointedLeafWithHandle(df: DataFrame): (DataFrame, Long, () => Unit) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = cds.sparkSession
    val qe = cds.queryExecution
    // InternalRow buffers are reused per partition — copy before caching.
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val rows = rdd.count()
    if (sys.env.contains("GRAFT_TIMING"))
      System.err.println(s"[shim] post-count lineage depth: " +
        s"${rdd.toDebugString.linesIterator.length} checkpointed=${rdd.isCheckpointed}")
    // After the count, an adaptive plan is finalized, so its
    // partitioning is the real one (same trick as Dataset.checkpoint:
    // a PartitioningCollection collapses to its first leaf).
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case pc: PartitioningCollection => firstLeaf(pc.partitionings.head)
      case other                      => other
    }
    val part = firstLeaf(qe.executedPlan.outputPartitioning)
    val ord = qe.executedPlan.outputOrdering
    // Real cached bytes from the block manager (the count above forced
    // every block in, so the storage info is complete). Fallback: schema
    // estimate — only used if the storage listing is racing.
    val realBytes = spark.sparkContext.getRDDStorageInfo
      .find(_.id == rdd.id)
      .map(i => i.memSize + i.diskSize)
      .filter(_ > 0L)
    val estBytes = rows * math.max(qe.analyzed.schema.defaultSize, 1)
    val sizeInBytes = math.max(realBytes.getOrElse(estBytes), 16L)
    val plan = LogicalRDD(qe.analyzed.output, rdd, part, ord, isStreaming = false)(
      spark, Some(Statistics(BigInt(sizeInBytes), Some(BigInt(rows)))), None)
    (classic.Dataset.ofRows(spark, plan), rows, () => { rdd.unpersist(blocking = false); () })
  }

  /** Run `f` with `overrides` applied to a THREAD-LOCAL clone of the
    * session's SQLConf — nothing session-visible is mutated, so
    * concurrent work sharing the SparkSession on other threads never
    * sees the overrides.
    *
    * Why this is sound for analyzer toggles: Datasets analyze EAGERLY
    * at construction (the `Dataset` constructor asserts analysis), and
    * analyzer rules read their conf through `SQLConf.get`, which
    * consults the thread-local override first
    * (`SQLConf.withExistingConf`). A driver loop that builds all its
    * frames inside `f` therefore gets the override for exactly the
    * analysis passes it needs, on exactly this thread, for exactly the
    * dynamic extent of `f` — optimizer/execution phases that run later
    * (first action on a returned frame) use the session's normal conf,
    * the same state the old set-then-restore pattern left behind. */
  def withConfOverrides[T](spark: org.apache.spark.sql.SparkSession,
      overrides: Map[String, String])(f: => T): T = {
    val patched =
      spark.asInstanceOf[classic.SparkSession].sessionState.conf.clone()
    overrides.foreach { case (k, v) => patched.setConfString(k, v) }
    org.apache.spark.sql.internal.SQLConf.withExistingConf(patched)(f)
  }
}
