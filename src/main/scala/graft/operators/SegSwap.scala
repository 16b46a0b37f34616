package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The journaled touched-bucket swap shared by every segmented durable
  * store ([[DupSpansStore]], [[LmCountsStore]]): state tables live as
  * Parquet partitioned by a bucket column `_b`, a continuation stages
  * replacement content for ONLY the touched buckets, and one
  * atomically-renamed journal is the commit point for the multi-table
  * install. Contract (single concurrent writer, any number of readers):
  *
  *  - [[commit]] stages every table's touched buckets under
  *    `seg_staging/`, writes the journal (tmp + rename — a torn write
  *    can never masquerade as a commit), then rolls forward;
  *  - [[recover]] finishes an interrupted swap: a committed journal
  *    rolls FORWARD (staged dirs renamed in, "empty" buckets deleted;
  *    idempotent — a missing staged dir means its rename already
  *    happened), no journal rolls BACK (live state untouched, staging
  *    discarded). Readers pass `cleanupOrphans = false` so a writer's
  *    pre-journal staging survives a concurrent read
  *    ([[Similarity.updateIvfIndex]]'s reader/writer lesson);
  *  - a malformed journal line aborts with the store untouched.
  */
private[operators] object SegSwap {

  private val Staging = "seg_staging"
  private val Journal = "seg_swap_journal"
  // bucket ids may be negative (range bucketing of negative ids)
  private val JournalLine = """^([A-Za-z0-9_]+) (-?\d+) (staged|empty)$""".r

  def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stage, journal, and install `touched` = (table, replacement rows
    * for the touched buckets, touched bucket set). Replacement frames
    * MUST be materialized (lineage-free leaves) before the call — the
    * swap retires the very files a lazy plan would re-read. No-op when
    * nothing is touched. */
  def commit(fs: FileSystem, path: String,
      touched: Seq[(String, DataFrame, Set[Int])]): Unit = {
    if (!touched.exists(_._3.nonEmpty)) return
    fs.delete(new HPath(s"$path/$Staging"), true)
    touched.foreach { case (n, df, bs) =>
      // repartition on the bucket key first: without it every shuffle
      // task opens a writer per bucket it sees (tasks × buckets small
      // files); with it each bucket is one contiguous file — the
      // file-count hygiene a large store needs
      if (bs.nonEmpty)
        df.repartition(col("_b")).write.mode("overwrite")
          .partitionBy("_b").parquet(s"$path/$Staging/$n")
    }
    // journal AFTER staging succeeds; its appearance is the atomic
    // commit point
    val lines = touched.flatMap { case (n, _, bs) =>
      bs.toSeq.sorted.map { b =>
        val staged = fs.exists(new HPath(s"$path/$Staging/$n/_b=$b"))
        s"$n $b ${if (staged) "staged" else "empty"}"
      }
    }
    val jTmp = new HPath(s"$path/$Journal.tmp")
    val jDst = new HPath(s"$path/$Journal")
    val out = fs.create(jTmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(jTmp, jDst),
      s"segswap: could not commit swap journal $jDst")
    recover(fs, path) // the journaled roll-forward IS the swap
  }

  def recover(fs: FileSystem, path: String,
      cleanupOrphans: Boolean = true): Unit = {
    val jDst = new HPath(s"$path/$Journal")
    if (fs.exists(jDst)) {
      val in = fs.open(jDst)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val entries = text.linesIterator.filter(_.nonEmpty).map {
        case JournalLine(n, b, st) => (n, b.toInt, st == "staged")
        case bad => throw new IllegalStateException(
          s"segswap: corrupt swap journal line '$bad' in $jDst")
      }.toSeq
      entries.foreach { case (n, b, staged) =>
        val live = new HPath(s"$path/$n/_b=$b")
        val stage = new HPath(s"$path/$Staging/$n/_b=$b")
        if (staged && fs.exists(stage)) {
          fs.delete(live, true)
          require(fs.rename(stage, live),
            s"segswap: could not install $stage")
        } else if (!staged) fs.delete(live, true)
        // staged && !exists(stage): rename already happened — idempotent
      }
      fs.delete(jDst, false)
      fs.delete(new HPath(s"$path/$Staging"), true)
    } else if (cleanupOrphans)
      fs.delete(new HPath(s"$path/$Staging"), true)
  }
}
