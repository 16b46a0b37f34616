package graft.operators

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Store-lifecycle POLICY for the segmented-store family — the round-9
  * verdict's missing-#2: `rebucket`/`compact` are mechanism, this
  * decides WHEN.
  *
  *  - [[autoCompactIfNeeded]] — every continuation appends one file
  *    per touched bucket per commit; unbounded, the file count
  *    degrades every later scan (open/seek overhead per file) until a
  *    compact. The trigger is files-per-bucket (the quantity that
  *    actually degrades), checked after a continuation's commit from
  *    a driver-side FS listing (O(buckets) stats). Reference analog:
  *    the preserve file's append-then-merge-on-close is AUTOMATIC
  *    (`incr-hadoop-0.1/src/mapred/.../IFile.java:548-553,629-647`);
  *    this is the same merge, triggered by the measurable symptom.
  *  - [[advise]] — rebuild-vs-continue: the round-9 1000× envelope
  *    probe measured a continuation costing more than a rebuild once
  *    a delta's touched-bucket fraction reaches ~10% (scattered
  *    deltas; `ScaleBench` seg_pagerank / envelope points). A
  *    continuation ABOVE the crossover still runs — it is correct,
  *    and a range-bucketed append can touch many buckets cheaply —
  *    but the advisor surfaces the economics so an operator notices
  *    systematic overshoot. The default crossover is deliberately the
  *    measured single-JVM number; a deployment re-measures its own.
  */
object StorePolicy {

  /** Advice surfaced by a continuation: how much of the store the
    * delta touched, against the rebuild crossover. */
  final case class ContinueAdvice(tag: String, touchedBuckets: Int,
      totalBuckets: Int, crossover: Double) {
    def touchedFraction: Double =
      if (totalBuckets <= 0) 0.0 else touchedBuckets.toDouble / totalBuckets
    /** True when the delta's footprint is past the measured
      * continue-vs-rebuild crossover — re-running init would likely
      * be cheaper than this class of continuation. */
    def rebuildRecommended: Boolean = touchedFraction >= crossover
  }

  /** Build the advice and, when rebuild is recommended, say so on
    * stderr (the channel the family's phase timings already use). */
  def advise(tag: String, touchedBuckets: Int, totalBuckets: Int,
      crossover: Double = 0.10): ContinueAdvice = {
    val a = ContinueAdvice(tag, touchedBuckets, totalBuckets, crossover)
    if (a.rebuildRecommended)
      System.err.println(f"[$tag] continuation touched " +
        f"$touchedBuckets/$totalBuckets buckets " +
        f"(${a.touchedFraction * 100}%.1f%% >= crossover " +
        f"${crossover * 100}%.0f%%): a REBUILD (re-init) is likely " +
        "cheaper than continuations of this footprint")
    a
  }

  /** Max parquet-file count over every live `_b=` dir of `tables` —
    * the symptom auto-compaction bounds. Driver-side listing,
    * O(buckets) stats. */
  def maxFilesPerBucket(spark: SparkSession, path: String,
      tables: Seq[String]): Int = {
    val fs = SegSwap.fsOf(spark, path)
    tables.flatMap { t =>
      val dir = new HPath(s"$path/$t")
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq
        .filter(_.getPath.getName.startsWith("_b="))
        .map(b => fs.listStatus(b.getPath)
          .count(_.getPath.getName.endsWith(".parquet")))
    }.maxOption.getOrElse(0)
  }

  /** Fire `compactFn` when any bucket of `tables` holds ≥ `threshold`
    * files. Called AFTER a continuation releases its writer lease (the
    * compact takes its own — the ops serialize through the lease, they
    * never nest). Returns whether a compact ran. `threshold <= 0`
    * disables. */
  def autoCompactIfNeeded(spark: SparkSession, path: String,
      tables: Seq[String], threshold: Int)(compactFn: => Unit): Boolean = {
    if (threshold <= 0) return false
    val worst = maxFilesPerBucket(spark, path, tables)
    if (worst < threshold) false
    else {
      System.err.println(s"[segstore] auto-compact at $path: a bucket " +
        s"reached $worst files (threshold $threshold)")
      compactFn
      true
    }
  }
}
