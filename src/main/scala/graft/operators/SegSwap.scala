package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

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
  *  - [[recover]] (WRITER-only) finishes an interrupted swap: a
  *    committed journal rolls FORWARD (staged dirs renamed in, "empty"
  *    buckets deleted; idempotent — a missing staged dir means its
  *    rename already happened), no journal rolls BACK (live state
  *    untouched, staging discarded);
  *  - READERS resolve the journal non-destructively via
  *    [[resolvedTable]] (staged dirs read in place, nothing renamed or
  *    deleted) — so concurrent readers can never race each other's
  *    roll-forward or discard a writer's pre-journal staging
  *    ([[Similarity.updateIvfIndex]]'s reader/writer lesson);
  *  - a malformed journal line aborts with the store untouched.
  */
private[graft] object SegSwap {

  private val Staging = "seg_staging"
  private val Journal = "seg_swap_journal"
  // bucket ids may be negative (range bucketing of negative ids);
  // state "dir" swaps a whole un-bucketed directory (bucket field
  // ignored — params migration during a rebucket)
  private val JournalLine = """^([A-Za-z0-9_]+) (-?\d+) (staged|empty|dir)$""".r

  def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Cast an id column to the store's PINNED type before hashing.
    * Bucket functions hash the id's physical representation
    * (`xxhash64(int 5)` ≠ `xxhash64(long 5)`), so a continuation whose
    * delta carries a different id dtype than the init corpus would
    * compute different buckets and silently strand stale rows in
    * buckets that are never read or evicted. Pinning the DDL at init
    * and casting every incoming id to it makes bucket placement
    * dtype-independent; an uncastable dtype fails loudly. */
  private[graft] def castToPinned(df: DataFrame, c: String,
      pinnedDdl: String, what: String): DataFrame = {
    val t = StructType.fromDDL(s"x $pinnedDdl").head.dataType
    val in = df.schema(c).dataType
    require(org.apache.spark.sql.catalyst.expressions.Cast.canCast(in, t),
      s"segswap: $what id column '$c' has dtype ${in.sql}, which cannot " +
        s"cast to the store's pinned id dtype $pinnedDdl")
    if (in == t) df else df.withColumn(c, col(c).cast(t))
  }

  /** Reset a store directory for a fresh [[init]]: remove the params
    * marker FIRST (its absence marks the store incomplete — a crash
    * mid-init can then never read as a complete-but-inconsistent
    * store), plus any stale journal/staging from a previous life. */
  private[graft] def resetForInit(fs: FileSystem, path: String,
      paramsDir: String = "params"): Unit = {
    fs.delete(new HPath(s"$path/$paramsDir"), true)
    fs.delete(new HPath(s"$path/$Journal"), false)
    fs.delete(new HPath(s"$path/$Staging"), true)
  }

  /** Stage, journal, and install `touched` = (table, replacement rows
    * for the touched buckets, touched bucket set). Replacement frames
    * MUST be materialized (lineage-free leaves) before the call — the
    * swap retires the very files a lazy plan would re-read. No-op when
    * nothing is touched.
    *
    * Ends with `refreshByPath`: a swap REPLACES files under `path`, and
    * Spark's CacheManager matches new reads against still-cached plans
    * by canonicalized equality — a caller that cached the store's
    * content before the swap (e.g. a chained continuation's finish())
    * would silently get the PRE-swap rows back on its next
    * identically-shaped read (found by the chained-continuation spec:
    * "Asked to cache already cached data", stale ranks). Refreshing the
    * path invalidates and recaches every plan that reads it. */
  def commit(spark: SparkSession, path: String,
      touched: Seq[(String, DataFrame, Set[Int])],
      dirSwaps: Seq[(String, String => Unit)] = Nil): Unit = {
    if (!touched.exists(_._3.nonEmpty) && dirSwaps.isEmpty) return
    val fs = fsOf(spark, path)
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
    // whole-dir swaps (e.g. the params table during a rebucket — its
    // new bucket count must install ATOMICALLY with the re-bucketed
    // data or a crash would leave readers deriving buckets with the
    // wrong B): the caller's writer stages the dir's new content, and
    // a `dir` journal line carries it through the same roll-forward
    dirSwaps.foreach { case (n, write) => write(s"$path/$Staging/$n") }
    // journal AFTER staging succeeds; its appearance is the atomic
    // commit point
    val lines = touched.flatMap { case (n, _, bs) =>
      bs.toSeq.sorted.map { b =>
        val staged = fs.exists(new HPath(s"$path/$Staging/$n/_b=$b"))
        s"$n $b ${if (staged) "staged" else "empty"}"
      }
    } ++ dirSwaps.map { case (n, _) => s"$n 0 dir" }
    val jTmp = new HPath(s"$path/$Journal.tmp")
    val jDst = new HPath(s"$path/$Journal")
    val out = fs.create(jTmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(jTmp, jDst),
      s"segswap: could not commit swap journal $jDst")
    recover(fs, path) // the journaled roll-forward IS the swap
    spark.catalog.refreshByPath(path)
  }

  /** Writer-entry recovery with the same cache hygiene as [[commit]]:
    * a roll-forward can replace files, so cached plans over `path`
    * must be refreshed here too. */
  def recover(spark: SparkSession, path: String): Unit = {
    recover(fsOf(spark, path), path)
    spark.catalog.refreshByPath(path)
  }

  private def journalEntries(fs: FileSystem,
      path: String): Seq[(String, Int, String)] = {
    val jDst = new HPath(s"$path/$Journal")
    if (!fs.exists(jDst)) return Nil
    val in = fs.open(jDst)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map {
      case JournalLine(n, b, st) => (n, b.toInt, st)
      case bad => throw new IllegalStateException(
        s"segswap: corrupt swap journal line '$bad' in $jDst")
    }.toSeq
  }

  /** WRITER-side roll-forward/rollback of an interrupted swap. Only
    * the single writer may call this — it renames/deletes live
    * directories. Readers use [[resolvedTable]], which resolves the
    * same journal WITHOUT mutating anything (two concurrent readers,
    * or a reader racing the writer's commit-time recover, previously
    * raced each other's delete/rename and could observe a bucket
    * missing between the two). */
  def recover(fs: FileSystem, path: String): Unit = {
    val entries = journalEntries(fs, path)
    if (entries.nonEmpty) {
      entries.foreach { case (n, b, st) =>
        val live = new HPath(
          if (st == "dir") s"$path/$n" else s"$path/$n/_b=$b")
        val stage = new HPath(
          if (st == "dir") s"$path/$Staging/$n" else s"$path/$Staging/$n/_b=$b")
        if (st != "empty" && fs.exists(stage)) {
          fs.delete(live, true)
          require(fs.rename(stage, live),
            s"segswap: could not install $stage")
        } else if (st == "empty") fs.delete(live, true)
        // staged/dir && !exists(stage): rename already happened — idempotent
      }
      fs.delete(new HPath(s"$path/$Journal"), false)
    }
    // writer-only orphan cleanup: un-journaled staging is a crashed
    // writer's pre-commit scratch, superseded by this writer's run
    fs.delete(new HPath(s"$path/$Staging"), true)
  }

  /** READ-ONLY view of a table under the journal: a committed-but-not-
    * yet-installed swap is resolved by reading staged bucket dirs in
    * place of their live counterparts (and skipping journaled "empty"
    * buckets), without renaming or deleting anything — so any number
    * of readers can run concurrently, and a reader can never destroy a
    * writer's staging or race another reader's roll-forward. With no
    * journal this is a plain live read. The residual visibility caveat
    * is inherent to rename-based swaps: a reader OVERLAPPING the
    * writer's install may see staged files vanish mid-scan (the store
    * contract is single writer, readers between — not during —
    * commits). */
  def resolvedTable(spark: SparkSession, path: String, name: String,
      schema: StructType): DataFrame = {
    val fs = fsOf(spark, path)
    val mine = journalEntries(fs, path).filter(_._1 == name)
    // a whole-dir swap replaces the table root itself
    if (mine.exists(_._3 == "dir"))
      return spark.read.schema(schema)
        .parquet(resolvedDirPath(fs, path, name))
    val live = spark.read.schema(schema).parquet(s"$path/$name")
    if (mine.isEmpty) return live
    // staged buckets whose rename already happened (a writer crashed
    // mid-install) are correct in the LIVE dir; the rest read staged
    val (installed, pending) = mine.partition { case (_, b, st) =>
      st == "staged" && !fs.exists(new HPath(s"$path/$Staging/$name/_b=$b"))
    }
    val excluded = pending.map(_._2)
    val liveSide =
      if (excluded.isEmpty) live
      else live.filter(!col("_b").isin(excluded.map(Integer.valueOf): _*))
    val stagedDirs = pending.collect { case (_, b, "staged") =>
      s"$path/$Staging/$name/_b=$b" }
    val _ = installed // live-side rows already current for these
    if (stagedDirs.isEmpty) liveSide
    else liveSide.unionByName(spark.read.schema(schema)
      .option("basePath", s"$path/$Staging/$name")
      .parquet(stagedDirs: _*))
  }

  /** Live `_b=` bucket ids of a table from the FS listing — valid for
    * a WRITER after [[recover]] (live dirs are then the truth; a
    * reader under a pending journal must go through [[resolvedTable]]
    * instead). Shared by every store's rebucket/compact. */
  private[graft] def liveBuckets(fs: FileSystem, path: String,
      table: String): Set[Int] = {
    val dir = new HPath(s"$path/$table")
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_b=") =>
        n.stripPrefix("_b=").toInt }.toSet
  }

  /** Journal-aware path of a WHOLE-DIR table (e.g. `params`): the
    * staged dir when an uninstalled `dir` swap references it and the
    * staged content still exists, the live dir otherwise. Readers use
    * this so a committed-but-uninstalled rebucket is visible to them
    * without mutating anything. */
  def resolvedDirPath(fs: FileSystem, path: String, name: String): String = {
    val pendingDir = journalEntries(fs, path)
      .exists(e => e._1 == name && e._3 == "dir" &&
        fs.exists(new HPath(s"$path/$Staging/$name")))
    if (pendingDir) s"$path/$Staging/$name" else s"$path/$name"
  }
}
