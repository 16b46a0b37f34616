package graft

import org.apache.spark.sql.functions._

import graft.algorithms.IncrementalPageRank
import graft.core.SegmentedStateStore
import graft.operators.DupSpansStore

/** The snapshot layer ([[graft.operators.SegSwap]] retired epochs):
  * every commit retires the files it replaces under
  * `seg_retired/e=<epoch>/` instead of deleting them, so any epoch
  * inside the retention horizon stays re-resolvable as a consistent
  * as-of view — the mechanical answer to "a commit destroys the
  * pre-commit view". These specs pin: exact time travel across chained
  * continuations, bucket create/empty edge cases, the GC bound and its
  * loud past-horizon failure, and crash-mid-install consistency. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def chainEdges = {
    val chain = (0L until 6L).map(i => (100L + i, 101L + i))
    val blob = (for (i <- 0L until 40L; j <- Seq((i * 7 + 1) % 40, (i * 3 + 2) % 40)
      if i != j) yield (i, j)).distinct
    (chain ++ blob).toDF("src", "dst")
  }

  private def ranks(st: graft.core.PreservedState): Map[Long, Double] =
    st.out.select("node", "rank").as[(Long, Double)].collect().toMap

  test("writeTextAtomic overwrites in place and migrates legacy crc sidecars") {
    import graft.operators.SegSwap
    import org.apache.hadoop.fs.{Path => HPath}
    val dir = java.nio.file.Files.createTempDirectory("graft_wta").toString
    val fs = SegSwap.fsOf(spark, dir)
    val marker = s"$dir/seg_epoch"
    // plain write → read round-trip, then overwrite
    SegSwap.writeTextAtomic(fs, marker, "1")
    assert(SegSwap.readText(fs, new HPath(marker)).contains("1"))
    SegSwap.writeTextAtomic(fs, marker, "2")
    assert(SegSwap.readText(fs, new HPath(marker)).contains("2"))
    // legacy store: the marker was written through the checksum layer
    // (crc sidecar on disk); the nio overwrite must drop the sidecar so
    // fs.open never verifies the NEW bytes against the STALE crc
    val legacy = s"$dir/seg_floor"
    val out = fs.create(new HPath(legacy), true)
    out.write("7".getBytes("UTF-8")); out.close()
    assert(new java.io.File(s"$dir/.seg_floor.crc").exists,
      "precondition: the checksum layer writes a sidecar")
    SegSwap.writeTextAtomic(fs, legacy, "8")
    assert(!new java.io.File(s"$dir/.seg_floor.crc").exists,
      "the stale sidecar must be dropped with the overwrite")
    assert(SegSwap.readText(fs, new HPath(legacy)).contains("8"))
  }

  test("snapshotAt reproduces each epoch exactly across chained continuations") {
    val edges1 = chainEdges
    val store = java.nio.file.Files
      .createTempDirectory("graft_snap_chain").toString
    IncrementalPageRank.preserveTo(spark, store, edges1, 0.8,
      iterations = 4, nBuckets = 16)
    val rd = SegmentedStateStore.openForRead(spark, store)
    assert(rd.currentEpoch == 0L, "a fresh store is epoch 0")
    val at0 = ranks(rd.preserved)

    val edges2 = edges1.filter(col("src") =!= 100L)
      .unionByName(Seq((100L, 103L)).toDF("src", "dst"))
    IncrementalPageRank.incrementalSeg(spark, store, edges2,
      Seq(100L).toDF("src"), 0.8, iterations = 2, filterThreshold = 0.0)
      .unpersist()
    val e1 = SegmentedStateStore.openForRead(spark, store).currentEpoch
    assert(e1 >= 1L)
    val at1 = ranks(SegmentedStateStore.openForRead(spark, store).preserved)

    val edges3 = edges2.filter(col("src") =!= 102L)
      .unionByName(Seq((102L, 105L)).toDF("src", "dst"))
    IncrementalPageRank.incrementalSeg(spark, store, edges3,
      Seq(102L).toDF("src"), 0.8, iterations = 2, filterThreshold = 0.0)
      .unpersist()
    val st = SegmentedStateStore.openForRead(spark, store)
    val e2 = st.currentEpoch
    assert(e2 > e1, "each installed continuation advances the epoch")

    // time travel: every recorded epoch re-resolves exactly, live = now
    assert(ranks(st.snapshotAt(0L)) == at0,
      "epoch-0 snapshot must equal the as-inited state")
    assert(ranks(st.snapshotAt(e1)) == at1,
      "epoch-e1 snapshot must equal the post-delta-1 state")
    assert(ranks(st.snapshotAt(e2)) == ranks(st.preserved),
      "current-epoch snapshot must equal the live view")
    // the deltas really moved ranks (the assertions above are not vacuous)
    assert(at0 != at1 && at1 != ranks(st.preserved))
    // kvs travels too, and re-resolving twice is stable
    assert(st.snapshotAt(e1).kvs.count() == st.snapshotAt(e1).kvs.count())

    // the engine state publishes like the rest of the family: the
    // e1 export is a standalone store reading exactly the e1 view
    val pub = java.nio.file.Files
      .createTempDirectory("graft_snap_chain_pub").toString
    st.exportAt(e1, pub)
    val pubSt = SegmentedStateStore.openForRead(spark, pub)
    assert(pubSt.currentEpoch == 0L && ranks(pubSt.preserved) == at1,
      "the exported engine state must equal the as-of view, fresh life")
  }

  test("snapshot/rollback gates == the in-memory incremental on the same inputs") {
    // the gates run the store-backed chain on the SLICED gate graph
    // (2 base + 2 incremental iterations — see IterativeQueries'
    // slimming note) and then time-travel back to the single-delta
    // epoch; their rows must equal the PLAIN in-memory single-delta
    // continuation on identical inputs — the store machinery, epoch
    // retirement, and the journaled revert must all be
    // result-invisible (they also share the sliced unrolled-SQL
    // oracle driver-side)
    val ncust = spark.read.parquet(s"$sf/customer.parquet").count()
    // the gates' own slice builder — ONE definition of the load-bearing
    // slice formula (a retuned slice must not desync this spec)
    val edges1 = graft.queries.IterativeQueries.sparkEdgesSlice(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val preserved = IncrementalPageRank.preserve(edges1, 0.8, iterations = 2)
    val chg1 = edges1.filter(col("src") % 10 === 3).select("src").distinct()
    val delta1 = chg1.select(col("src"),
      (lit(1L) + (col("src") * 11 + 5) % lit(ncust)).as("dst"))
    val edges2 = edges1.filter(col("src") % 10 =!= 3).unionByName(delta1)
    val direct = IncrementalPageRank.incremental(edges2, preserved, chg1,
      0.8, iterations = 2, filterThreshold = 0.0)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val viaSnapshot = SparkEntry.queries("q_incr_pagerank_snapshot")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaSnapshot == direct,
      s"snapshot gate diverged: ${viaSnapshot.toSet.diff(direct.toSet).take(5)}")
    // the rollback gate reverts the LIVE store to the same epoch — same
    // truth, entirely different mechanism (journaled install vs read)
    val viaRollback = SparkEntry.queries("q_incr_pagerank_rollback")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaRollback == direct,
      s"rollback gate diverged: ${viaRollback.toSet.diff(direct.toSet).take(5)}")
    edges1.unpersist(blocking = false)
    spark.catalog.clearCache()
  }

  test("diffOut: pruned epoch diff == brute-force snapshot diff; self-diff empty") {
    val edges1 = chainEdges
    val store = java.nio.file.Files
      .createTempDirectory("graft_snap_diff").toString
    IncrementalPageRank.preserveTo(spark, store, edges1, 0.8,
      iterations = 4, nBuckets = 16)

    // delta: rewire one chain node AND add brand-new nodes (300-304) so
    // the diff must surface both changed ranks and appear-only rows
    val edges2 = edges1.filter(col("src") =!= 100L)
      .unionByName(Seq((100L, 103L)).toDF("src", "dst"))
      .unionByName((300L to 304L).map(n => (101L, n)).toDF("src", "dst"))
    IncrementalPageRank.incrementalSeg(spark, store, edges2,
      Seq(100L, 101L).toDF("src"), 0.8, iterations = 2,
      filterThreshold = 0.0).unpersist()
    val st = SegmentedStateStore.openForRead(spark, store)
    val e1 = st.currentEpoch

    val got = st.diffOut(0L, e1)
      .select("node", "rank_before", "rank_after")
      .as[(Long, Option[Double], Option[Double])].collect().toSet
    // brute force: full-outer join the UNPRUNED snapshot views
    val before = ranks(st.snapshotAt(0L))
    val after = ranks(st.snapshotAt(e1))
    val want = (before.keySet ++ after.keySet).flatMap { n =>
      val (b, a) = (before.get(n), after.get(n))
      if (b == a) None else Some((n, b, a))
    }
    assert(got == want, s"diffOut diverged from brute force: " +
      s"${got.diff(want).take(3)} / ${want.diff(got).take(3)}")
    assert(got.nonEmpty && got.exists(_._2.isEmpty),
      "the cohort must exercise both changed and appear-only rows")
    // self-diff is empty, and asking it costs no scan (changed = ∅)
    assert(st.diffOut(e1, e1).isEmpty)
    assert(st.diffOut(0L, 0L).isEmpty)
  }

  test("rollbackTo is a journaled revert: exact, history-preserving, re-rollbackable") {
    val edges1 = chainEdges
    val store = java.nio.file.Files
      .createTempDirectory("graft_snap_rollback").toString
    IncrementalPageRank.preserveTo(spark, store, edges1, 0.8,
      iterations = 4, nBuckets = 16)
    // retention 3: the test walks 4 epochs of history
    SegmentedStateStore.openForRead(spark, store).setRetention(3)

    val edges2 = edges1.filter(col("src") =!= 100L)
      .unionByName(Seq((100L, 103L)).toDF("src", "dst"))
    IncrementalPageRank.incrementalSeg(spark, store, edges2,
      Seq(100L).toDF("src"), 0.8, iterations = 2, filterThreshold = 0.0)
      .unpersist()
    val e1 = SegmentedStateStore.openForRead(spark, store).currentEpoch
    val at1 = ranks(SegmentedStateStore.openForRead(spark, store).preserved)
    val kvs1 = SegmentedStateStore.openForRead(spark, store)
      .preserved.kvs.collect().toSet

    // delta 2 ADDS brand-new nodes (200-209): their out rows land in
    // buckets epoch e1 never had, so the rollback must also DROP
    // created buckets (the journal-"empty" path), not just restore
    // replaced ones
    val edges3 = edges2.unionByName(
      (200L to 209L).map(n => (102L, n)).toDF("src", "dst"))
    IncrementalPageRank.incrementalSeg(spark, store, edges3,
      Seq(102L).toDF("src"), 0.8, iterations = 2, filterThreshold = 0.0)
      .unpersist()
    val e2 = SegmentedStateStore.openForRead(spark, store).currentEpoch
    val at2 = ranks(SegmentedStateStore.openForRead(spark, store).preserved)
    assert(at2.keySet.exists(_ >= 200L), "delta 2 must introduce new nodes")

    // revert to e1: BOTH tables restored exactly (kvs too — a
    // continuation off a half-rolled-back store would corrupt)
    SegmentedStateStore.openForRead(spark, store).rollbackTo(e1)
    val st = SegmentedStateStore.openForRead(spark, store)
    assert(st.currentEpoch > e2, "a rollback is a new commit, not a reset")
    assert(ranks(st.preserved) == at1,
      "rollback must reproduce epoch e1's out exactly")
    assert(st.preserved.kvs.collect().toSet == kvs1,
      "rollback must reproduce epoch e1's kvs exactly")
    assert(!ranks(st.preserved).keySet.exists(_ >= 200L),
      "buckets created after e1 must be dropped by the revert")
    // history preserved: the rolled-away epoch still resolves…
    assert(ranks(st.snapshotAt(e2)) == at2,
      "the rolled-away epoch must stay resolvable (revert, not reset)")
    // …and the rollback can itself be undone
    st.rollbackTo(e2)
    val back = SegmentedStateStore.openForRead(spark, store)
    assert(ranks(back.preserved) == at2, "rollback of the rollback = redo")

    // a continuation off the re-rolled state behaves like any other
    val edges4 = edges3.filter(col("src") =!= 104L)
      .unionByName(Seq((104L, 101L)).toDF("src", "dst"))
    // detach the expected-state snapshot BEFORE the seg continuation
    // replaces the very files back.preserved reads
    val wantSt = graft.core.PreservedState(
      back.preserved.kvs.localCheckpoint(true),
      back.preserved.out.localCheckpoint(true))
    val got = IncrementalPageRank.incrementalSeg(spark, store, edges4,
      Seq(104L).toDF("src"), 0.8, iterations = 2, filterThreshold = 0.0)
    val want = IncrementalPageRank.incremental(edges4, wantSt,
      Seq(104L).toDF("src"), 0.8, iterations = 2, filterThreshold = 0.0)
    assert(got.as[(Long, Double)].collect().toMap ==
      want.as[(Long, Double)].collect().toMap,
      "continuations after a rollback must equal in-memory continuations")
    got.unpersist(); wantSt.release()
  }

  test("snapshot GC: retired bytes bounded by the horizon; past it fails loudly") {
    val edges = (0L until 30L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 30), (i, (i * 3 + 2) % 30)))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
    val store = java.nio.file.Files
      .createTempDirectory("graft_snap_gc").toString
    IncrementalPageRank.preserveTo(spark, store, edges, 0.8,
      iterations = 3, nBuckets = 8)
    // retention 1: only the previous epoch stays readable
    SegmentedStateStore.openForRead(spark, store).setRetention(1)
    var cur = edges
    val epochAfter = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rankAfter = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Double]]
    (0 until 3).foreach { k =>
      val src = k.toLong
      cur = cur.filter(col("src") =!= src)
        .unionByName(Seq((src, (src + 17) % 30)).toDF("src", "dst"))
      IncrementalPageRank.incrementalSeg(spark, store, cur,
        Seq(src).toDF("src"), 0.8, iterations = 2, filterThreshold = 0.0)
        .unpersist()
      val st = SegmentedStateStore.openForRead(spark, store)
      epochAfter += st.currentEpoch
      rankAfter += ranks(st.preserved)
    }
    val st = SegmentedStateStore.openForRead(spark, store)
    // inside the horizon: previous epoch re-resolves exactly
    assert(ranks(st.snapshotAt(epochAfter(1))) == rankAfter(1))
    // past it: loud failure naming the horizon, never a silent mix
    val err = intercept[IllegalArgumentException] {
      st.snapshotAt(0L).out.collect()
    }
    assert(err.getMessage.contains("retention horizon"), err.getMessage)
    // the GC bound: retired epochs on disk never exceed the horizon
    val retained = {
      val root = java.nio.file.Paths.get(store, "seg_retired")
      if (!java.nio.file.Files.isDirectory(root)) Array.empty[String]
      else {
        val s = java.nio.file.Files.list(root)
        try s.toArray.map(_.toString) finally s.close()
      }
    }
    assert(retained.length <= 1,
      s"retention 1 must keep at most one retired epoch: ${retained.toSeq}")
  }

  test("operator-store rollback: DupSpansStore reverts a poisoned shard exactly") {
    val base = (1L to 12L).map(i => (i, s"roll u$i v$i w$i x$i"))
      .toDF("doc_id", "text")
    def freshStore(tag: String): String = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft_snap_dsroll$tag").toString
      DupSpansStore.init(spark, p, base, "doc_id", "text",
        w = 3, maxFrac = 0.5, nBuckets = 4)
      p
    }
    val store = freshStore("a")
    val scores0 = DupSpansStore.scores(spark, store).collect().toSet

    // the poisoned shard: six exact copies of doc 1's text flip keep
    // bits across the corpus (dfreq moves, not just the new docs' out)
    DupSpansStore.continueAt(spark, store,
      (50L to 55L).map(i => (i, "roll u1 v1 w1 x1")).toDF("doc_id", "text"),
      Seq(3L).toDF("doc_id"), "doc_id", "text")
    val e1 = DupSpansStore.currentEpoch(spark, store)
    val scores1 = DupSpansStore.scores(spark, store).collect().toSet
    assert(scores1 != scores0, "the shard must actually move scores")

    DupSpansStore.rollbackTo(spark, store, 0L)
    assert(DupSpansStore.scores(spark, store).collect().toSet == scores0,
      "rollback must restore the pre-shard scores exactly")
    // the rolled-away epoch stays resolvable (revert, not reset)
    assert(DupSpansStore.scoresAt(spark, store, e1).collect().toSet
      == scores1)

    // the INTERNAL state (dfreq, spans, ntoks) reverted too: a
    // continuation off the rolled-back store must equal the same
    // continuation on a store that never saw the poisoned shard
    val control = freshStore("b")
    val add = Seq((90L, "roll u2 v2 w2 x2")).toDF("doc_id", "text")
    val none = Seq.empty[Long].toDF("doc_id")
    DupSpansStore.continueAt(spark, store, add, none, "doc_id", "text")
    DupSpansStore.continueAt(spark, control, add, none, "doc_id", "text")
    assert(DupSpansStore.scores(spark, store).collect().toSet ==
      DupSpansStore.scores(spark, control).collect().toSet,
      "post-rollback continuations must be indistinguishable from a " +
        "never-poisoned store's")
  }

  test("family sweep: LmCountsStore rollbackTo reverts counts, vocab, and a continuation") {
    import graft.operators.{LmCountsStore, Pipeline}
    val audit = Seq((900L, "the cat sat on the mat"),
      (901L, "mat the on sat cat the")).toDF("doc_id", "text")
    def sc(store: String) = LmCountsStore.scoreAgainst(spark, store,
      audit, "doc_id", "text").as[(Long, Long, Double, Int)].collect().toSet
    val base = ((1L to 6L).map(i => (i, "the cat sat on the mat")) ++
      (7L to 12L).map(i => (i, s"pad p$i q$i r$i"))).toDF("doc_id", "text")
    def freshStore(tag: String): String = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft_snap_lmroll$tag").toString
      LmCountsStore.init(spark, p, base, "doc_id", "text", nBuckets = 8)
      p
    }
    val store = freshStore("a")
    val score0 = sc(store)
    // the bad shard: shuffled transitions move every audit score, and
    // removing doc 1 moves the dominant pattern's counts
    LmCountsStore.continueAt(spark, store,
      Seq((20L, "mat the on sat cat the"),
        (21L, "mat the on sat cat the")).toDF("doc_id", "text"),
      Seq(1L).toDF("doc_id"), "doc_id", "text")
    assert(sc(store) != score0, "the shard must move scores")

    LmCountsStore.rollbackTo(spark, store, 0L)
    assert(sc(store) == score0,
      "rollback must restore the pre-shard LM scores exactly")
    // all four tables (contributions AND aggregates) reverted: a
    // continuation off the rolled-back store equals one on a store
    // that never saw the shard
    val control = freshStore("b")
    val add = Seq((30L, "pad fresh s30 t30")).toDF("doc_id", "text")
    val none = Seq.empty[Long].toDF("doc_id")
    LmCountsStore.continueAt(spark, store, add, none, "doc_id", "text")
    LmCountsStore.continueAt(spark, control, add, none, "doc_id", "text")
    assert(sc(store) == sc(control),
      "post-rollback continuations must equal a never-poisoned store's")
  }

  test("as-of derived reads reproduce the pre-delta outputs across the family") {
    import graft.operators.{DedupClusterStore, LmCountsStore}
    val base = ((1L to 6L).map(i => (i, "the cat sat on the mat")) ++
      (7L to 12L).map(i => (i, s"pad p$i q$i r$i"))).toDF("doc_id", "text")
    val delta = Seq((20L, "mat the on sat cat the"),
      (21L, "the cat sat on the mat")).toDF("doc_id", "text")
    val none = Seq.empty[Long].toDF("doc_id")
    val audit = Seq((900L, "the cat sat on the mat")).toDF("doc_id", "text")

    // model versioning: scoreAgainstAt(0) must reproduce the pre-delta
    // scores exactly while the live model is post-delta
    val lm = java.nio.file.Files
      .createTempDirectory("graft_snap_lmat").toString
    LmCountsStore.init(spark, lm, base, "doc_id", "text", nBuckets = 8)
    def sc(f: => org.apache.spark.sql.DataFrame) =
      f.as[(Long, Long, Double, Int)].collect().toSet
    val pre = sc(LmCountsStore.scoreAgainst(spark, lm, audit,
      "doc_id", "text"))
    LmCountsStore.continueAt(spark, lm, delta, none, "doc_id", "text")
    val post = sc(LmCountsStore.scoreAgainst(spark, lm, audit,
      "doc_id", "text"))
    assert(post != pre, "the delta must move the audit scores")
    assert(sc(LmCountsStore.scoreAgainstAt(spark, lm, audit,
      "doc_id", "text", epoch = 0L)) == pre,
      "scoring against the epoch-0 model must reproduce pre-delta scores")
    assert(sc(LmCountsStore.scoreAgainstAt(spark, lm, audit,
      "doc_id", "text", epoch = 1L)) == post)

    // label audit: clustersAt(0) is the pre-delta clustering
    val cl = java.nio.file.Files
      .createTempDirectory("graft_snap_clat").toString
    DedupClusterStore.init(spark, cl, base, "doc_id", "text", nBuckets = 8)
    def labels(f: => org.apache.spark.sql.DataFrame) =
      f.as[(Long, Long)].collect().toSet
    val l0 = labels(DedupClusterStore.clusters(spark, cl))
    DedupClusterStore.continueAt(spark, cl, delta, none, "doc_id", "text")
    assert(labels(DedupClusterStore.clusters(spark, cl)) != l0)
    assert(labels(DedupClusterStore.clustersAt(spark, cl, 0L)) == l0,
      "the as-of clustering must equal the pre-delta labels exactly")

    // shipped-text audit: cutsAt(0) is the exact pre-delta cut output
    import graft.operators.DupSpansStore
    val ds = java.nio.file.Files
      .createTempDirectory("graft_snap_dsat").toString
    val spanBase = ((1L to 4L).map(i =>
        (i, "alpha beta gamma delta epsilon zeta eta theta")) ++
      (5L to 8L).map(i => (i, s"solo s$i t$i u$i v$i w$i x$i y$i z$i")))
      .toDF("doc_id", "text")
    DupSpansStore.init(spark, ds, spanBase, "doc_id", "text",
      w = 4, nBuckets = 8, withCut = true)
    def cutset(f: => org.apache.spark.sql.DataFrame) =
      f.selectExpr("doc_id", "clean").as[(Long, String)].collect().toSet
    val c0 = cutset(DupSpansStore.cuts(spark, ds))
    DupSpansStore.continueAt(spark, ds,
      Seq((20L, "solo s5 t5 u5 v5 w5 x5 y5 z5")).toDF("doc_id", "text"),
      none, "doc_id", "text")
    assert(cutset(DupSpansStore.cuts(spark, ds)) != c0,
      "the duplicate-making delta must change some cut text")
    assert(cutset(DupSpansStore.cutsAt(spark, ds, 0L)) == c0,
      "the as-of cut output must equal the pre-delta shipped text")
  }

  test("exportAt publishes a standalone as-of store: exact, continuable, fenced") {
    import graft.operators.{Forget, SegSwap, TfidfStore}
    val src = java.nio.file.Files
      .createTempDirectory("graft_snap_export_src").toString
    val docs = (1L to 20L).map(i => (i, s"alpha a$i beta b$i gamma"))
      .toDF("doc_id", "text")
    TfidfStore.init(spark, src, docs, "doc_id", "text", nBuckets = 8)
    def rows(f: => org.apache.spark.sql.DataFrame) =
      f.selectExpr("doc_id", "token", "tf", "df", "round(tfidf, 9)")
        .collect().map(_.toString).toSet
    val at0 = rows(TfidfStore.tfidf(spark, src))
    TfidfStore.continueAt(spark, src,
      Seq((30L, "fresh delta words")).toDF("doc_id", "text"),
      Seq(7L).toDF("doc_id"), "doc_id", "text")
    val at1 = rows(TfidfStore.tfidf(spark, src))

    // publish epoch 0: the export equals the as-of read, file-for-file
    val dst = java.nio.file.Files
      .createTempDirectory("graft_snap_export_dst").toString
    TfidfStore.exportAt(spark, src, 0L, dst)
    assert(rows(TfidfStore.tfidf(spark, dst)) == at0,
      "the exported store must read exactly the as-of content")
    assert(TfidfStore.currentEpoch(spark, dst) == 0L,
      "an export is a fresh store life")

    // standalone: a continuation on the export never touches the source
    TfidfStore.continueAt(spark, dst,
      Seq((40L, "export side only")).toDF("doc_id", "text"),
      Seq.empty[Long].toDF("doc_id"), "doc_id", "text")
    assert(rows(TfidfStore.tfidf(spark, src)) == at1,
      "continuing the export must leave the source untouched")
    assert(TfidfStore.currentEpoch(spark, src) == 1L)

    // guards: non-empty destination; scrubbed epoch
    val e1 = intercept[Exception] { TfidfStore.exportAt(spark, src, 0L, dst) }
    assert(e1.getMessage.contains("not empty"), e1.getMessage)
    Forget.scrub(spark, src)
    val d2 = java.nio.file.Files
      .createTempDirectory("graft_snap_export_d2").toString
    val e2 = intercept[Exception] { TfidfStore.exportAt(spark, src, 0L, d2) }
    assert(e2.getMessage.contains("history floor"), e2.getMessage)
    // the current (floor) epoch still exports
    TfidfStore.exportAt(spark, src, 1L, d2)
    assert(rows(TfidfStore.tfidf(spark, d2)) == at1)
  }

  test("family sweep: exportAt publishes each store's pre-delta content") {
    import graft.operators.{DedupClusterStore, KeyedUpsertStore,
      LineDedupStore, SemanticDedupStore}
    def dir(t: String) = java.nio.file.Files
      .createTempDirectory(s"graft_snap_exp_$t").toString
    val docs = ((1L to 4L).map(i => (i, "same shared body text x y z")) ++
      (5L to 12L).map(i => (i, s"solo s$i t$i u$i v$i"))).toDF("doc_id", "text")
    val delta = Seq((30L, "same shared body text x y z")).toDF("doc_id", "text")
    val none = Seq.empty[Long].toDF("doc_id")
    def set(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toString).toSet

    val lp = dir("line"); val le = dir("line_exp")
    LineDedupStore.init(spark, lp, docs, "doc_id", "text",
      maxDocs = 3L, sep = " ", nBuckets = 8)
    val l0 = set(LineDedupStore.cleaned(spark, lp))
    LineDedupStore.continueAt(spark, lp, delta, none, "doc_id", "text")
    assert(set(LineDedupStore.cleaned(spark, lp)) != l0,
      "the delta must flip some line over maxDocs")
    LineDedupStore.exportAt(spark, lp, 0L, le)
    assert(set(LineDedupStore.cleaned(spark, le)) == l0)

    val cp = dir("clus"); val ce = dir("clus_exp")
    DedupClusterStore.init(spark, cp, docs, "doc_id", "text", nBuckets = 8)
    val c0 = set(DedupClusterStore.clusters(spark, cp))
    DedupClusterStore.continueAt(spark, cp, delta, none, "doc_id", "text")
    DedupClusterStore.exportAt(spark, cp, 0L, ce)
    assert(set(DedupClusterStore.clusters(spark, ce)) == c0)

    val sp = dir("sem"); val se = dir("sem_exp")
    val vecs = (1L to 12L).map(i => (i,
      Array.tabulate(4)(d => ((i * 3 + d) % 7).toFloat))).toDF("id", "vec")
    SemanticDedupStore.init(spark, sp, vecs, nlist = 2, tau = 0.95,
      nBuckets = 4)
    val s0 = set(SemanticDedupStore.keeps(spark, sp))
    SemanticDedupStore.continueAt(spark, sp,
      Seq((40L, Array(1f, 2f, 3f, 4f))).toDF("id", "vec"), none)
    SemanticDedupStore.exportAt(spark, sp, 0L, se)
    assert(set(SemanticDedupStore.keeps(spark, se)) == s0,
      "the export must carry the cents dir so decisions resolve")

    val up = dir("ups"); val ue = dir("ups_exp")
    KeyedUpsertStore.init(spark, up,
      docs.selectExpr("doc_id as k", "text as v"), "k", nBuckets = 8)
    val u0 = set(KeyedUpsertStore.rows(spark, up))
    KeyedUpsertStore.upsertBatch(spark, up,
      delta.selectExpr("doc_id as k", "text as v"),
      Seq.empty[Long].toDF("k"), batchId = 0L)
    KeyedUpsertStore.exportAt(spark, up, 0L, ue)
    assert(set(KeyedUpsertStore.rows(spark, ue)) == u0)
    assert(KeyedUpsertStore.lastBatch(spark, ue) == -1L,
      "the exported fence is the epoch-0 fence: no batch applied yet")
  }

  test("KeyedUpsertStore rollback reverts the batch fence WITH the rows") {
    import graft.operators.KeyedUpsertStore
    val p = java.nio.file.Files
      .createTempDirectory("graft_snap_upsroll").toString
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    KeyedUpsertStore.init(spark, p, base, "k", nBuckets = 4)
    def rows(): Set[(Long, String)] =
      KeyedUpsertStore.rows(spark, p).as[(Long, String)].collect().toSet
    val r0 = rows()
    assert(KeyedUpsertStore.upsertBatch(spark, p,
      Seq((2L, "B2"), (9L, "i9")).toDF("k", "v"),
      Seq(3L).toDF("k"), batchId = 0L))
    assert(rows() == Set((1L, "a"), (2L, "B2"), (9L, "i9")))
    assert(KeyedUpsertStore.lastBatch(spark, p) == 0L)

    KeyedUpsertStore.rollbackTo(spark, p, 0L)
    assert(rows() == r0, "rollback restores the pre-batch relation")
    assert(KeyedUpsertStore.lastBatch(spark, p) == -1L,
      "the exactly-once fence must revert WITH the rows")
    // the revert makes batch 0 re-appliable — the restartable-stream
    // property the fence+rows co-revert exists for
    assert(KeyedUpsertStore.upsertBatch(spark, p,
      Seq((2L, "B2"), (9L, "i9")).toDF("k", "v"),
      Seq(3L).toDF("k"), batchId = 0L),
      "a batch after the revert point must re-apply, not be skipped")
    assert(rows() == Set((1L, "a"), (2L, "B2"), (9L, "i9")))
  }

  test("reader pins hold GC past the horizon, expire by TTL, and fail when late") {
    import graft.operators.{KeyedUpsertStore, SegSwap}
    def fresh(): String = {
      val p = java.nio.file.Files
        .createTempDirectory("graft_snap_pin").toString
      KeyedUpsertStore.init(spark, p,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "k",
        nBuckets = 4)
      p
    }
    def commitN(p: String, n: Int): Unit = (1 to n).foreach { i =>
      KeyedUpsertStore.upsertBatch(spark, p,
        Seq((1L, s"a$i")).toDF("k", "v"), Seq.empty[Long].toDF("k"),
        batchId = i.toLong)
    }
    def rowsAt0(p: String): Set[(Long, String)] =
      KeyedUpsertStore.rowsAt(spark, p, 0L)
        .as[(Long, String)].collect().toSet
    val init = Set((1L, "a"), (2L, "b"), (3L, "c"))

    // pinned: epoch 0 outlives retention-many commits (default 2)
    val p1 = fresh()
    val fs1 = SegSwap.fsOf(spark, p1)
    val token = SegSwap.pinEpoch(fs1, p1, 0L)
    commitN(p1, 4) // without the pin, epoch 0 would be GC'd at epoch 3
    assert(rowsAt0(p1) == init,
      "a pinned epoch must stay exactly readable across any number of commits")
    // ...and the pin extends ROLLBACK reach the same way (rollback
    // reads through snapshotTable)
    KeyedUpsertStore.rollbackTo(spark, p1, 0L)
    assert(KeyedUpsertStore.rows(spark, p1)
      .as[(Long, String)].collect().toSet == init)
    SegSwap.releasePin(fs1, p1, token)
    commitN(p1, 7) // re-apply + push far past the horizon; GC runs
    intercept[IllegalArgumentException] { rowsAt0(p1) }

    // unpinned control: the same commits collect epoch 0
    val p2 = fresh()
    commitN(p2, 4)
    val e = intercept[IllegalArgumentException] { rowsAt0(p2) }
    assert(e.getMessage.contains("no pin covers it"))

    // an EXPIRED pin is no claim: GC ignores it and a later read fails
    val p3 = fresh()
    val fs3 = SegSwap.fsOf(spark, p3)
    SegSwap.pinEpoch(fs3, p3, 0L, ttlMs = -1L)
    commitN(p3, 4)
    intercept[IllegalArgumentException] { rowsAt0(p3) }
    // pinning after the horizon passed fails loudly instead of
    // claiming already-collected files
    intercept[RuntimeException] { SegSwap.pinEpoch(fs3, p3, 0L) }
  }

  test("snapshots survive bucket creation, emptying, and a crashed install") {
    import graft.operators.SegSwap
    // DupSpansStore exercises the generic layer through an operator
    // store: removing every doc in a bucket EMPTIES it (journal
    // "empty" lines must retire, not delete), and adding docs with new
    // hashes CREATES buckets (absent from older manifests)
    val base = (1L to 12L).map(i => (i, s"snap u$i v$i w$i x$i"))
      .toDF("doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("graft_snap_ops").toString
    DupSpansStore.init(spark, store, base, "doc_id", "text",
      w = 3, maxFrac = 0.5, nBuckets = 4)
    // raw table content, collected EAGERLY (the live files these frames
    // read are exactly what later continuations retire)
    def spanRows(df: org.apache.spark.sql.DataFrame) =
      df.drop("_b").collect().toSet
    val at0 = spanRows(spark.read.parquet(s"$store/spans"))
    val fs = SegSwap.fsOf(spark, store)

    // continuation: drop a third of the docs, add two near-dup docs
    DupSpansStore.continueAt(spark, store,
      Seq((50L, "snap u1 v1 w1 x1"), (51L, "snap u1 v1 w1 x1"))
        .toDF("doc_id", "text"),
      (1L to 12L).filter(_ % 3 == 0).toDF("doc_id"),
      "doc_id", "text")
    val at1 = spanRows(spark.read.parquet(s"$store/spans"))
    assert(at1 != at0)

    // the pre-continuation view is still exactly re-resolvable
    val schema = spark.read.parquet(s"$store/spans").schema
    val snap0 = SegSwap.snapshotTable(spark, store, "spans", schema, 0L)
    assert(spanRows(snap0.drop("_b")) == at0,
      "epoch-0 snapshot must reproduce the pre-continuation spans")
    val e1 = SegSwap.currentEpoch(fs, store)
    assert(spanRows(SegSwap.snapshotTable(spark, store, "spans", schema, e1)
      .drop("_b")) == at1)

    // crashed install: journal committed, roll-forward not run — the
    // snapshot of the PREVIOUS epoch still resolves (live dirs are the
    // previous epoch until install), and after writer-entry recovery
    // both epochs resolve
    val someB = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(store, "ntoks"))
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .filter(_.startsWith("_b=")).sorted.head.stripPrefix("_b=")
      finally s.close()
    }
    val stage = java.nio.file.Paths.get(store, "seg_staging", "ntoks", s"_b=$someB")
    java.nio.file.Files.createDirectories(stage.getParent)
    val live0 = java.nio.file.Paths.get(store, "ntoks", s"_b=$someB")
    java.nio.file.Files.walk(live0).forEach { p =>
      val dst = stage.resolve(live0.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(store, "seg_swap_journal"),
      s"epoch ${e1 + 1}\nntoks $someB staged".getBytes)
    assert(spanRows(SegSwap.snapshotTable(spark, store, "spans", schema, e1)
      .drop("_b")) == at1,
      "a pending journal must not break the installed epoch's snapshot")
    SegSwap.recover(spark, store)
    assert(SegSwap.currentEpoch(fs, store) == e1 + 1)
    assert(spanRows(SegSwap.snapshotTable(spark, store, "spans", schema, e1)
      .drop("_b")) == at1,
      "after roll-forward the previous epoch must still resolve")
  }
}
