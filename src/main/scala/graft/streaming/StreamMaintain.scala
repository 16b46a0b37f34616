package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algorithms.IncrementalPageRank
import graft.operators.KeyedUpsertStore

/** RESTART-SAFE stream-of-deltas maintenance — the foreachBatch body
  * that makes a 24/7 stream maintaining a segmented durable store
  * EXACTLY-ONCE across crashes and checkpoint restarts.
  *
  * The problem: a foreachBatch continuation is not idempotent (re-
  * applying an already-applied delta propagates it further), and the
  * evolving INPUT relation (the graph the deltas patch) must not live
  * in a driver variable (a restart rebuilds it from scratch, silently
  * dropping every earlier batch). The shape that fixes both:
  *
  *  - the input relation lives in a [[KeyedUpsertStore]] (key-bucketed
  *    journaled parquet, batch-id fence riding its params);
  *  - the derived store (here [[graft.core.SegmentedStateStore]] ranks)
  *    carries its OWN batch-id fence, recorded atomically with the
  *    continuation's swap;
  *  - a batch applies in a FIXED ORDER — derived continuation first,
  *    input upsert second. Each store applies the batch at most once;
  *    on any crash+replay the un-applied suffix completes. Whenever
  *    the derived side (re)runs, the input store still holds the exact
  *    PRE-batch relation, so `pre ⊕ batch` is reconstructed
  *    identically — exactly-once end to end with NO cross-store
  *    atomic commit.
  *
  * Spec-pinned (`StreamingSpec`): kill-between-batches + checkpoint
  * restart, and a forced duplicate delivery, both land on the exact
  * batch-chained reference state.
  */
object StreamMaintain {

  /** Apply one micro-batch of edge deltas (`src, dst` rows REPLACING
    * the out-edge sets of their `src` keys) to the rank store at
    * `rankStore` and the edge table at `edgeStore`. Idempotent per
    * `batchId` (Structured Streaming's foreachBatch id). */
  def pageRankBatch(spark: SparkSession, rankStore: String,
      edgeStore: String, batch: DataFrame, batchId: Long,
      damping: Double, iterations: Int): Unit = {
    val chg = batch.select("src").distinct().localCheckpoint(true)
    // the PRE-batch graph from the durable edge table (never a driver
    // variable): correct on first delivery AND on replay, because the
    // edge upsert below runs after the rank continuation
    val next = KeyedUpsertStore.rows(spark, edgeStore)
      .join(chg, Seq("src"), "left_anti")
      .unionByName(batch.select("src", "dst"))
      .localCheckpoint(true)
    IncrementalPageRank.incrementalSeg(spark, rankStore, next, chg,
      damping, iterations, filterThreshold = 0.0,
      batchId = Some(batchId)).unpersist(blocking = false)
    KeyedUpsertStore.upsertBatch(spark, edgeStore,
      batch.select("src", "dst"), spark.range(0).toDF("src"), batchId)
    chg.unpersist(blocking = false)
    next.unpersist(blocking = false)
  }
}
