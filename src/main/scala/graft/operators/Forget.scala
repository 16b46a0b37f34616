package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** DELETION PROPAGATION across the derived-store family — the
  * right-to-be-forgotten sweep a production corpus needs: given a set
  * of document ids, remove every trace of those documents from every
  * derived store, atomically, and (optionally) from the stores'
  * time-travel history too.
  *
  * Three properties make this more than a loop of removals:
  *
  *  1. ATOMIC across stores: the family's continuations are
  *     individually crash-safe but a sweep that dies mid-family leaves
  *     the purged docs present in some stores and gone from others —
  *     and a blind re-run would double-decrement corpus-level stats
  *     (document counts, df) in the stores that already committed.
  *     The sweep runs as one [[StoreTxn]]: a crash rolls every
  *     advanced store back to its pre-sweep epoch, and re-running the
  *     sweep starts from a consistent family.
  *  2. DELTA-PROPORTIONAL: each store's removal is its ordinary
  *     incremental continuation with an empty added side — contribution
  *     bags make removals exact, and only the purged ids' buckets (plus
  *     the touched aggregate buckets, e.g. their tokens' df buckets)
  *     restage. No store is rebuilt; the corpus is never rescanned.
  *  3. HISTORY IS SCRUBBED, not just the live view: a plain removal
  *     continuation RETIRES the purged rows' old bucket files — the
  *     snapshot layer would keep the "forgotten" bytes readable (and
  *     rollback-able!) for `retention` more commits. After the txn
  *     commits, [[SegSwap.truncateHistory]] deletes every retired
  *     epoch and raises the store's history floor, so as-of reads,
  *     rollbacks, and pins below the sweep fail loudly and the purged
  *     bytes are GONE from disk (verified file-by-file in ForgetSpec).
  *
  * The scrub is deliberately OUTSIDE the txn: inside it would destroy
  * the txn's own compensation points. The resulting crash window is
  * benign — a crash between commit and scrub leaves the live view
  * correct and only history over-retained; re-running [[scrub]] (or
  * the whole sweep with the same ids) finishes the job.
  *
  * Reference analog: the reference's preserve files have no deletion
  * story at all — a forgotten input means a from-scratch rerun of
  * every job (`incr-hadoop-0.1/src/mapred/.../ReduceTask.java`
  * preserve rewrite keeps all prior windows). This sweep is
  * O(purged-docs' buckets) instead.
  */
object Forget {

  /** Store kinds [[sweep]] knows how to purge by doc id. All are
    * (kind, path) participants of [[StoreTxn.kinds]]; each purge is the
    * store's own `continueAt` with an empty added side. */
  val kinds: Set[String] = Set(
    "tfidf", "lmcounts", "linededup", "dupspans", "dedupclusters",
    "decontam", "semdedup", "ivf", "ivfpq")

  private def purgeOne(spark: SparkSession, kind: String, path: String,
      ids: DataFrame, idCol: String, textCol: String): Unit = {
    // empty added side carrying the purge frame's own id dtype (each
    // store then pins it to its init dtype, as for any delta)
    val none = ids.limit(0).select(col(ids.columns.head).as(idCol))
      .withColumn(textCol, lit(""))
    kind match {
      case "tfidf" =>
        TfidfStore.continueAt(spark, path, none, ids, idCol, textCol)
      case "lmcounts" =>
        LmCountsStore.continueAt(spark, path, none, ids, idCol, textCol)
      case "linededup" =>
        LineDedupStore.continueAt(spark, path, none, ids, idCol, textCol)
      case "dupspans" =>
        DupSpansStore.continueAt(spark, path, none, ids, idCol, textCol)
      case "dedupclusters" =>
        DedupClusterStore.continueAt(spark, path, none, ids, idCol, textCol)
      case "decontam" =>
        // docs-side purge; the eval side is untouched here — a
        // benchmark-item retraction is [[sweepEval]]
        DecontamStore.continueAt(spark, path, none, ids,
          none, ids.limit(0), idCol, textCol, idCol, textCol)
      case "semdedup" =>
        val noneVecs = ids.limit(0).select(col(ids.columns.head).as("id"))
          .withColumn("vec", lit(null).cast("array<double>"))
        SemanticDedupStore.continueAt(spark, path, noneVecs, ids)
      case "ivf" =>
        val noneVecs = ids.limit(0).select(col(ids.columns.head).as("id"))
          .withColumn("vec", lit(null).cast("array<double>"))
        Similarity.updateIvfIndex(spark, path, noneVecs, ids)
      case "ivfpq" =>
        // the PQ index holds BOTH representations (codes + colocated
        // raw vector) in one lists table: one removal continuation
        // purges them together
        val noneVecs = ids.limit(0).select(col(ids.columns.head).as("id"))
          .withColumn("vec", lit(null).cast("array<double>"))
        Pq.updateIvfPqIndex(spark, path, noneVecs, ids)
      case other =>
        sys.error(s"forget: no purge recipe for store kind '$other' " +
          s"(known: ${kinds.toSeq.sorted.mkString(", ")})")
    }
    ()
  }

  /** Scrub one store's time-travel history (see [[SegSwap
    * .truncateHistory]]); exposed so a sweep interrupted between the
    * txn commit and the scrub can be finished without re-purging. */
  def scrub(spark: SparkSession, path: String): Unit =
    SegSwap.truncateHistory(spark, path)

  /** Purge `purgeIds` from every `(kind, path)` store as ONE atomic
    * group, then (unless `scrubHistory = false`) truncate each store's
    * history so the purged bytes are unrecoverable. `purgeIds`' first
    * column is the id; duplicates are tolerated (each store's removal
    * set is distinct-ed). */
  def sweep(spark: SparkSession, txnDir: String, purgeIds: DataFrame,
      idCol: String, textCol: String, stores: Seq[(String, String)],
      scrubHistory: Boolean = true): Unit = {
    stores.foreach { case (kind, _) =>
      require(kinds.contains(kind),
        s"forget: no purge recipe for store kind '$kind' " +
          s"(known: ${kinds.toSeq.sorted.mkString(", ")})")
    }
    // one deduplicated, materialized purge frame feeds every store —
    // the sweep must not recompute a non-deterministic source per store
    val ids = purgeIds.select(col(purgeIds.columns.head)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      StoreTxn.run(spark, txnDir, stores) {
        stores.foreach { case (kind, path) =>
          purgeOne(spark, kind, path, ids, idCol, textCol)
        }
      }
      if (scrubHistory)
        stores.foreach { case (_, path) => scrub(spark, path) }
    } finally ids.unpersist()
  }

  /** Purge benchmark/eval ITEMS from decontamination stores — the
    * OTHER side of [[DecontamStore]]'s two-sided delta: a retracted
    * benchmark (licensing takedown, contamination-list revision) must
    * stop flagging docs AND have its own shingle bytes gone from disk.
    *
    * Contamination flags are DERIVED at read time (contaminatedIds
    * probes the doc shingles against the eval table), so removing the
    * items' `evalsh` rows flips every affected doc's flag with NO
    * doc-side rewrite at all — the purge touches only the items' eval
    * buckets. Atomicity and history-scrub contracts are [[sweep]]'s
    * (one [[StoreTxn]], then [[scrub]] outside it). */
  def sweepEval(spark: SparkSession, txnDir: String,
      purgeEvalIds: DataFrame, evalIdCol: String, evalTextCol: String,
      decontamPaths: Seq[String], scrubHistory: Boolean = true): Unit = {
    val ids = purgeEvalIds.select(col(purgeEvalIds.columns.head))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val noneT = ids.limit(0)
        .select(col(ids.columns.head).as(evalIdCol))
        .withColumn(evalTextCol, lit(""))
      StoreTxn.run(spark, txnDir, decontamPaths.map("decontam" -> _)) {
        decontamPaths.foreach { path =>
          DecontamStore.continueAt(spark, path,
            noneT, ids.limit(0),  // docs side: empty delta
            noneT, ids,           // eval side: the retraction
            evalIdCol, evalTextCol, evalIdCol, evalTextCol)
          ()
        }
      }
      if (scrubHistory) decontamPaths.foreach(scrub(spark, _))
    } finally ids.unpersist()
  }
}
