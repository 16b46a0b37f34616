package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SEGMENTED durable form of [[Similarity.SemanticDedupState]] — the
  * round-9 verdict's missing-#1 ("SemDeDup assignments live in session
  * caches") closed with the family's journaled touched-bucket layout
  * ([[SegSwap]]; siblings [[DupSpansStore]], [[LmCountsStore]],
  * [[DedupClusterStore]], [[graft.core.SegmentedStateStore]]):
  *
  *  - `cents/` — the FROZEN coarse quantizer (cid, cvec), written at
  *    init and never rewritten: the quantizer is part of the store's
  *    identity (re-training is a rebuild, not a continuation — the
  *    [[Similarity.updateIvfIndex]] contract);
  *  - `assign(cid, nid, nvec, _b)` — the assignment table, bucketed by
  *    `_b = pmod(xxhash64(cid), B)`. CLUSTER-bucketed, not doc-
  *    bucketed, because the continuation's unit of recomputation is
  *    the cluster: a keep decision depends only on within-cluster
  *    pairs, so a ±vector delta re-decides exactly the clusters that
  *    gained or lost a member — and with cid bucketing those clusters'
  *    rows (the rows the rewrite must read AND the rows keepFor must
  *    scan) live in exactly the touched buckets, a pruned read;
  *  - `out(id, cid, keep, _b)` — the decision table, same bucketing
  *    (an id's out row lives with its cluster, so evictions and
  *    re-decides stay inside the touched buckets too).
  *
  * Locating a REMOVED id's cluster scans the live assign table's
  * (cid, nid) columns only — parquet column pruning never reads the
  * vectors for the corpus-wide membership probe (the updateIvfIndex
  * locate shape). Everything else is delta-proportional:
  * Σ|affected cluster|² dominance work, touched-bucket rewrites,
  * untouched bucket files keep their exact bytes and mtimes
  * (spec-asserted).
  *
  * Semantics are [[Similarity.continueSemanticDedup]]'s verbatim — the
  * dominance rule is the ONE shared [[Similarity.keepFor]] and the
  * assignment path the shared [[Similarity.assignToLists]], so
  * store ≡ in-memory ≡ batch cannot drift. Crash contract and writer
  * lease are [[SegSwap]]'s (single fenced writer, non-destructive
  * readers, roll-forward after the atomically-renamed journal).
  *
  * EXACT: after [[continueAt]], [[keeps]] equals
  * [[Similarity.semanticDedup]] over the post-delta vectors under the
  * stored quantizer (gate `q_incr_semantic_dedup_seg` under the same
  * full-recompute oracle as `q_incr_semantic_dedup`, plus the
  * store-vs-in-memory twin spec).
  */
object SemanticDedupStore {

  private def cidBucket(c: Column, b: Int): Column =
    pmod(xxhash64(c), lit(b.toLong)).cast("int")

  private case class Params(tau: Double, foldLimit: Int, b: Int,
      idDdl: String, ddl: Map[String, String])

  // params plumbing via the family-shared codec ([[SegSwap.writeParamsTo]]
  // / [[SegSwap.readParamsRow]]: journal-aware, NAME-based, loud on an
  // older layout)
  private def writeParamsTo(spark: SparkSession, dst: String,
      p: Params): Unit =
    SegSwap.writeParamsTo(spark, dst, Seq(
      "tau" -> p.tau, "foldLimit" -> p.foldLimit, "b" -> p.b,
      "idDdl" -> p.idDdl,
      "assignDdl" -> p.ddl("assign"), "outDdl" -> p.ddl("out")))

  private def readParams(spark: SparkSession, path: String): Params = {
    val r = SegSwap.readParamsRow(spark, path,
      Seq("tau", "foldLimit", "b", "idDdl", "assignDdl", "outDdl"),
      "semdedup")
    Params(r.getDouble(0), r.getInt(1), r.getInt(2), r.getString(3),
      Map("assign" -> r.getString(4), "out" -> r.getString(5)))
  }

  private def readTable(spark: SparkSession, path: String, p: Params,
      name: String): DataFrame =
    SegSwap.resolvedTable(spark, path, name,
      StructType.fromDDL(p.ddl(name)))

  /** The store's current commit epoch (0 = as-inited). */
  def currentEpoch(spark: SparkSession, path: String): Long =
    SegSwap.currentEpoch(SegSwap.fsOf(spark, path), path)

  /** Roll every table of the store (and params) back to `epoch` as one
    * journaled revert — [[SegSwap.rollbackTo]] with this store's table
    * set (see [[DupSpansStore.rollbackTo]], the family exemplar, for
    * the contract: history-preserving, redo-able, delta-proportional,
    * loud past the retention horizon). */
  def rollbackTo(spark: SparkSession, path: String, epoch: Long): Unit = {
    val p = readParams(spark, path)
    SegSwap.rollbackTo(spark, path, epoch,
      p.ddl.toSeq.map { case (n, d) => n -> StructType.fromDDL(d) },
      dirTables = Seq("params"))
  }

  /** Publish the store AS OF `epoch` to `dst` as a fresh standalone
    * store (see [[SegSwap.exportSnapshot]]; family contract on
    * [[TfidfStore.exportAt]]). */
  def exportAt(spark: SparkSession, path: String, epoch: Long,
      dst: String): Unit = {
    val p = readParams(spark, path)
    SegSwap.exportSnapshot(spark, path, epoch, dst,
      p.ddl.keys.toSeq, dirTables = Seq("params", "cents"))
  }

  private def inBuckets(bs: Set[Int]): Column =
    if (bs.isEmpty) lit(false)
    else col("_b").isin(bs.toSeq.map(Integer.valueOf): _*)

  /** Base pass: freeze the quantizer, assign, decide, lay both tables
    * out bucket-partitioned (params last — the completeness marker).
    * `nBuckets` trades rewrite granularity against file count; at
    * corpus scale nlist grows with n (the SemDeDup paper's k = O(√n)),
    * so B should sit well below nlist to keep real bytes per bucket. */
  def init(spark: SparkSession, path: String, vectors: DataFrame,
      nlist: Int, tau: Double, centroids: Option[DataFrame] = None,
      centroidFoldLimit: Int = 64, nBuckets: Int = 32): Unit = {
    graft.functions.GraftFunctions.register(spark)
    SegSwap.resetForInit(SegSwap.fsOf(spark, path), path)
    val v = vectors.select(col("id").as("nid"),
      col("vec").cast("array<double>").as("nvec"))
    val intern = new IncrMat.Tracker
    val cents = intern.mat(
      Similarity.normalizedCentroids(v, centroids, nlist))
    cents.write.mode("overwrite").parquet(s"$path/cents")
    // assign feeds its own write, both sides of keepFor's self-join and
    // the keep join — one materialization
    val assign = intern.mat(
      Similarity.assignToLists(v, cents, centroidFoldLimit)
        .withColumn("_b", cidBucket(col("cid"), nBuckets)))
    val out = Similarity.keepFor(assign.drop("_b"), tau)
      .withColumn("_b", cidBucket(col("cid"), nBuckets))
    var ddl = Map.empty[String, String]
    Seq("assign" -> assign, "out" -> out).foreach { case (n, df) =>
      ddl += n -> df.schema.toDDL
      df.repartition(col("_b")).write.mode("overwrite")
        .partitionBy("_b").parquet(s"$path/$n")
    }
    writeParamsTo(spark, s"$path/params", Params(tau, centroidFoldLimit,
      nBuckets, v.schema("nid").dataType.sql, ddl))
    intern.releaseAll()
  }

  /** The post-delta decisions (`id, cid, keep` —
    * [[Similarity.semanticDedup]]'s contract). Journal-resolved,
    * never mutating; consume before the next writer commit. */
  def keeps(spark: SparkSession, path: String): DataFrame = {
    val p = readParams(spark, path)
    readTable(spark, path, p, "out").drop("_b")
  }

  /** The stored frozen quantizer (cid, cvec). */
  def centroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/cents")

  /** Roll the store forward over a ±vector delta (upsert contract: an
    * incoming id evicts its existing row) under the FROZEN quantizer.
    * Only the affected clusters' buckets rewrite; only their pairs
    * re-score. Single fenced writer; crash-safe via the shared
    * journal. */
  def continueAt(spark: SparkSession, path: String, addedVecs: DataFrame,
      removedIds: DataFrame): StorePolicy.ContinueAdvice = {
   val advice = SegSwap.withWriterLease(spark, path) { lease =>
    graft.functions.GraftFunctions.register(spark)
    SegSwap.recover(spark, path)
    val p = readParams(spark, path)
    val B = p.b
    val intern = new IncrMat.Tracker
    val cents = intern.mat(spark.read.parquet(s"$path/cents"))
    val added = SegSwap.castToPinned(
      addedVecs.select(col("id").as("nid"),
        col("vec").cast("array<double>").as("nvec")),
      "nid", p.idDdl, "semdedup continueAt addedVecs")
    // replace semantics: an incoming id evicts its existing row
    val rem = intern.mat(SegSwap.castToPinned(
        removedIds.select(col(removedIds.columns.head).as("_rid")),
        "_rid", p.idDdl, "semdedup continueAt removedIds")
      .unionByName(added.select(col("nid").as("_rid"))).distinct())
    val addAssign = intern.mat(
      Similarity.assignToLists(added, cents, p.foldLimit))

    // affected clusters: those losing a member (located via a
    // column-pruned (cid, nid) scan — the vectors are never read for
    // the membership probe) or gaining one. O(delta) cids.
    val assignLive = readTable(spark, path, p, "assign")
    val affCids = intern.mat(assignLive.select("cid", "nid")
      .join(rem, col("nid") === col("_rid"), "left_semi").select("cid")
      .unionByName(addAssign.select("cid")).distinct())
    // touched buckets — O(delta) driver ints; every evicted row and
    // every fresh row lives in an affected cluster's bucket
    val tb = affCids.select(cidBucket(col("cid"), B).as("_b"))
      .distinct().collect().map(_.getInt(0)).toSet
    if (tb.nonEmpty) {
      val assignNextT = intern.mat(assignLive.filter(inBuckets(tb))
        .join(rem, col("nid") === col("_rid"), "left_anti")
        .unionByName(addAssign.withColumn("_b",
          cidBucket(col("cid"), B))))
      // re-decide ONLY the affected clusters (Σ|affected|² pairs): all
      // their post-delta rows live in the staged leaf by construction
      val recomputed = Similarity.keepFor(
        assignNextT.join(affCids, Seq("cid"), "left_semi").drop("_b"),
        p.tau)
      // out rewrite: unaffected clusters sharing a touched bucket pass
      // through; affected clusters' old decisions (removed ids'
      // included — their cluster is affected by definition) are
      // replaced wholesale by the re-decide
      val outNextT = intern.mat(readTable(spark, path, p, "out")
        .filter(inBuckets(tb))
        .join(affCids, Seq("cid"), "left_anti")
        .unionByName(recomputed.withColumn("_b",
          cidBucket(col("cid"), B))))
      SegSwap.commit(spark, path, Seq(
        ("assign", assignNextT, tb), ("out", outNextT, tb)),
        fence = Some(lease))
    }
    val liveB = math.max(1,
      SegSwap.liveBuckets(SegSwap.fsOf(spark, path), path, "out").size)
    intern.releaseAll()
    StorePolicy.advise("semdedup", tb.size, liveB)
   }
   advice
  }

  /** Journaled RE-BUCKETING / COMPACTION — the shared store-lifecycle
    * ops: lazy staged frames streamed straight to seg_staging (safe:
    * live files retire only after the journal lands), destination
    * buckets discovered from the staged dirs, NEW params installed
    * atomically through the journal's whole-dir entry. The frozen
    * quantizer is untouched (it has no bucket axis). */
  def rebucket(spark: SparkSession, path: String, nBuckets: Int): Unit =
    SegSwap.withWriterLease(spark, path) { lease =>
      val fs = SegSwap.fsOf(spark, path)
      SegSwap.recover(spark, path)
      val p = readParams(spark, path)
      val p2 = p.copy(b = nBuckets)
      val staged = Seq("assign", "out").map { t =>
        (t, readTable(spark, path, p, t)
          .withColumn("_b", cidBucket(col("cid"), nBuckets)),
          SegSwap.liveBuckets(fs, path, t))
      }
      SegSwap.commit(spark, path, staged, dirSwaps = Seq(
        "params" -> ((dst: String) => writeParamsTo(spark, dst, p2))),
        fence = Some(lease), augmentFromStaging = true)
    }

  def compact(spark: SparkSession, path: String): Unit =
    rebucket(spark, path, readParams(spark, path).b)
}
