package graft.core

import org.apache.spark.sql.DataFrame

/** DATA-derived shuffle partition counts (optimization guide §2:
  * "make partitioning scale-adaptive … rather than a constant tuned
  * for either local mode or the cluster").
  *
  * The engine's loops co-partition their frames with explicit
  * `repartition(n, key)` calls — explicit `n` DISABLES AQE partition
  * coalescing, so the historical constant (32) meant 32 near-empty
  * tasks per exchange and 32-partition cached leaves at gate scale
  * (every downstream job over such a leaf pays 32 task launches to
  * scan a few thousand rows: the bench diag read 2.8-3.7k tasks per
  * rep on the incremental gates, nearly all fixed launch overhead),
  * while simultaneously being far too SMALL for a 100 TB run.
  *
  * [[partitionsFor]] keeps the explicit-n co-partitioning (the
  * iterative base runs rely on both sides sharing one partitioning so
  * per-iteration joins reuse it — AQE-coalesced exchanges on the two
  * sides would not be guaranteed to match) but derives `n` from the
  * relation's OWN size at AQE's advisory partition granularity:
  * `ceil(bytes / advisoryPartitionSizeInBytes)` clamped to
  * `[1, cap]`, where `cap` is the caller's provisioned `numPartitions`
  * — the parameter stops being "the partition count" and becomes "the
  * parallelism ceiling", with the data deciding below it. Stats come
  * from the optimized plan: real file sizes for scans, real cached
  * bytes for the engine's materialized leaves (GraftSqlShim attaches
  * explicit statistics), estimates only for derived plans — and a
  * wild over-estimate degrades to exactly the old fixed-cap behavior,
  * never past it. */
private[graft] object Adaptive {

  def partitionsFor(df: DataFrame, cap: Int): Int = {
    val conf = df.sparkSession.sessionState.conf
    val advisory = math.max(1L << 20,
      conf.getConf(
        org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val bytes =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => BigInt(Long.MaxValue) }
    val want = (bytes / advisory) + 1
    if (want >= BigInt(cap)) math.max(1, cap)
    else math.max(1, want.toInt)
  }
}
