package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
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
  * statistics derived from the counted rows — constant-size numbers,
  * immune to estimate compounding, and still honest enough for the
  * planner's broadcast decisions. The physical plan's partitioning and
  * ordering are preserved exactly like `Dataset.localCheckpoint`
  * preserves them, so co-partitioned loop joins stay shuffle-free.
  */
object GraftSqlShim {

  /** Materialize `df` as a local-checkpointed, lineage-free leaf with
    * explicit statistics. Returns (leaf, rowCount). One job, one cached
    * copy of the data. */
  def checkpointedLeaf(df: DataFrame): (DataFrame, Long) = {
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
    val sizeInBytes = math.max(rows * math.max(qe.analyzed.schema.defaultSize, 1), 16L)
    val plan = LogicalRDD(qe.analyzed.output, rdd, part, ord, isStreaming = false)(
      spark, Some(Statistics(BigInt(sizeInBytes), Some(BigInt(rows)))), None)
    (classic.Dataset.ofRows(spark, plan), rows)
  }
}
