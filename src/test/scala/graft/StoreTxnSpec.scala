package graft

import graft.operators.{LmCountsStore, SegSwap, StoreTxn, TfidfStore}

/** Cross-store atomic continuations ([[graft.operators.StoreTxn]]):
  * one corpus delta applied to several derived stores must be
  * all-or-nothing — a mid-pipeline failure (or coordinator crash) must
  * leave every participant at its pre-txn content, compensated through
  * the family's journaled rollback. These specs pin the abort path,
  * fresh-JVM crash recovery off the manifest alone, by-content
  * recovery idempotence, the success commit point, and the loud
  * unknown-kind guard. */
class StoreTxnSpec extends SparkSpec {
  import spark.implicits._

  private def baseDocs = ((1L to 6L).map(i => (i, "the cat sat on the mat")) ++
    (7L to 12L).map(i => (i, s"pad p$i q$i r$i"))).toDF("doc_id", "text")
  private def deltaDocs = Seq((20L, "mat the on sat cat the"),
    (21L, "fresh delta words w21")).toDF("doc_id", "text")
  private def noIds = Seq.empty[Long].toDF("doc_id")

  private def tfidfRows(p: String): Set[(Long, String, Long, Long)] =
    TfidfStore.tfidf(spark, p).selectExpr("doc_id", "token", "tf", "df")
      .as[(Long, String, Long, Long)].collect().toSet

  private def lmScores(p: String): Set[(Long, Long, Double, Int)] =
    LmCountsStore.scoreAgainst(spark, p,
      Seq((900L, "the cat sat on the mat")).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, Long, Double, Int)].collect().toSet

  private def freshPair(tag: String): (String, String) = {
    val tp = java.nio.file.Files
      .createTempDirectory(s"graft_txn_tfidf$tag").toString
    val lp = java.nio.file.Files
      .createTempDirectory(s"graft_txn_lm$tag").toString
    TfidfStore.init(spark, tp, baseDocs, "doc_id", "text", nBuckets = 8)
    LmCountsStore.init(spark, lp, baseDocs, "doc_id", "text", nBuckets = 8)
    (tp, lp)
  }

  private def txnDirOf(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_txn_dir$tag").toString

  test("body failure rolls every advanced store back to its pre-txn content") {
    val (tp, lp) = freshPair("abort")
    val txn = txnDirOf("abort")
    val tf0 = tfidfRows(tp)
    val lm0 = lmScores(lp)
    val boom = intercept[RuntimeException] {
      StoreTxn.run(spark, txn, Seq("tfidf" -> tp, "lmcounts" -> lp)) {
        TfidfStore.continueAt(spark, tp, deltaDocs, noIds, "doc_id", "text")
        assert(tfidfRows(tp) != tf0, "the first continuation must land")
        sys.error("mid-pipeline failure before the lm continuation")
      }
    }
    assert(boom.getMessage.contains("mid-pipeline failure"),
      "the body's own exception must surface, not a compensation error")
    assert(tfidfRows(tp) == tf0,
      "the advanced store must revert to its pre-txn content")
    assert(lmScores(lp) == lm0, "the untouched store must be unchanged")
    assert(LmCountsStore.currentEpoch(spark, lp) == 0L,
      "an untouched participant costs no commit")
    val fs = SegSwap.fsOf(spark, txn)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$txn/txn_manifest")),
      "the abort path must clear the manifest")
    // the dir is reusable: a follow-up txn commits both stores
    StoreTxn.run(spark, txn, Seq("tfidf" -> tp, "lmcounts" -> lp)) {
      TfidfStore.continueAt(spark, tp, deltaDocs, noIds, "doc_id", "text")
      LmCountsStore.continueAt(spark, lp, deltaDocs, noIds, "doc_id", "text")
    }
    assert(tfidfRows(tp) != tf0 && lmScores(lp) != lm0,
      "the follow-up txn must commit both stores")
  }

  test("tiledmat participant: abort reverts all three keyings AND the batch fence") {
    // round-14 verdict #3: TiledMatrixStore joins the txn family. The
    // critical invariant is the FENCE reverting with the rows — if the
    // rollback restored cells but left lastBatch advanced, the re-run
    // of the same batch id after the abort would silently skip and the
    // "re-applied" store would still hold pre-delta content.
    import graft.operators.TiledMatrixStore
    import org.apache.spark.sql.functions._
    val m1 = (for (i <- 0L until 16L; j <- Seq((i * 5 + 1) % 16, (i * 3 + 2) % 16)
      if i != j) yield (i, j, 1.0 + (i * 7 + j * 3) % 4))
      .distinct.toDF("i", "j", "v")
    val tm = java.nio.file.Files
      .createTempDirectory("graft_txn_tiled_spec").toString
    TiledMatrixStore.init(spark, tm, m1, blockSize = 8, cellBuckets = 4,
      tileBuckets = 4, idxBuckets = 2)
    val patch = m1.filter(col("j") % 10 === 3)
      .select(col("i"), col("j"), (col("v") * 0.5).as("v"))
      .localCheckpoint(true)
    def applyBatch(): Unit = {
      val d = TiledMatrixStore.prepareDelta(spark, tm, patch,
        Seq(7L).toDF("j"))
      TiledMatrixStore.applyDelta(spark, tm, patch, d, 0L)
      d.release()
    }
    def cells() = TiledMatrixStore.open(spark, tm).cells
      .as[(Long, Long, Double)].collect().toSet
    val pre = cells()
    val txn = txnDirOf("tiled")
    intercept[RuntimeException] {
      StoreTxn.run(spark, txn, Seq("tiledmat" -> tm)) {
        applyBatch()
        assert(cells() != pre, "the tiled apply must land before the crash")
        sys.error("mid-pipeline failure after the tiled apply")
      }
    }
    assert(cells() == pre, "abort must revert the tiled store's cells")
    assert(TiledMatrixStore.lastBatch(spark, tm) == -1L,
      "abort must revert the batch fence WITH the rows")
    // the same batch id re-applies for real in the follow-up txn
    StoreTxn.run(spark, txn, Seq("tiledmat" -> tm))(applyBatch())
    assert(TiledMatrixStore.lastBatch(spark, tm) == 0L)
    val want = m1.filter(col("j") =!= 7)
      .select(col("i"), col("j"),
        when(col("j") % 10 === 3, col("v") * 0.5).otherwise(col("v")))
      .as[(Long, Long, Double)].collect().toSet
    assert(cells() == want, "the re-applied batch must produce the post-delta cells")
  }

  test("a fresh coordinator recovers a crashed txn from the manifest alone") {
    val (tp, lp) = freshPair("crash")
    val txn = txnDirOf("crash")
    val tf0 = tfidfRows(tp)
    // simulate the crash window: manifest landed, one store committed,
    // the coordinator died before the others (and before any cleanup)
    StoreTxn.writeManifest(spark, txn,
      Seq(("tfidf", tp, 0L, "-"), ("lmcounts", lp, 0L, "-")))
    TfidfStore.continueAt(spark, tp, deltaDocs, noIds, "doc_id", "text")
    assert(tfidfRows(tp) != tf0)

    assert(StoreTxn.recover(spark, txn), "recovery must find the manifest")
    assert(tfidfRows(tp) == tf0,
      "recovery must revert the advanced store by content")
    assert(LmCountsStore.currentEpoch(spark, lp) == 0L)
    assert(!StoreTxn.recover(spark, txn),
      "a second recovery is a no-op — the manifest delete is the fence")
    // post-recovery, continuations behave exactly like a never-crashed
    // store's (the rollback is a normal journaled commit)
    val control = freshPair("ctrl")
    TfidfStore.continueAt(spark, tp, deltaDocs, noIds, "doc_id", "text")
    TfidfStore.continueAt(spark, control._1, deltaDocs, noIds,
      "doc_id", "text")
    assert(tfidfRows(tp) == tfidfRows(control._1),
      "post-recovery continuations must equal a never-crashed store's")
  }

  test("recovery crashed mid-compensation is idempotent by content") {
    val (tp, lp) = freshPair("idem")
    val txn = txnDirOf("idem")
    val tf0 = tfidfRows(tp)
    val lm0 = lmScores(lp)
    StoreTxn.writeManifest(spark, txn,
      Seq(("tfidf", tp, 0L, "-"), ("lmcounts", lp, 0L, "-")))
    TfidfStore.continueAt(spark, tp, deltaDocs, noIds, "doc_id", "text")
    LmCountsStore.continueAt(spark, lp, deltaDocs, noIds, "doc_id", "text")
    // first recovery attempt died after reverting lmcounts (reverse
    // declaration order) but before tfidf — simulated by hand
    LmCountsStore.rollbackTo(spark, lp, 0L)
    assert(lmScores(lp) == lm0)
    // the re-run reverts the remaining store and re-reverting the
    // already-reverted one changes nothing
    assert(StoreTxn.recover(spark, txn))
    assert(tfidfRows(tp) == tf0 && lmScores(lp) == lm0,
      "both stores must end at pre-txn content")
  }

  test("success path: the manifest delete is the commit point") {
    val (tp, lp) = freshPair("ok")
    val txn = txnDirOf("ok")
    val out = StoreTxn.run(spark, txn,
      Seq("tfidf" -> tp, "lmcounts" -> lp)) {
      TfidfStore.continueAt(spark, tp, deltaDocs, noIds, "doc_id", "text")
      LmCountsStore.continueAt(spark, lp, deltaDocs, noIds, "doc_id", "text")
      "done"
    }
    assert(out == "done", "run returns the body's value")
    // contents equal a plain (txn-less) twin's — the txn layer is
    // result-invisible on success
    val (tc, lc) = freshPair("oktwin")
    TfidfStore.continueAt(spark, tc, deltaDocs, noIds, "doc_id", "text")
    LmCountsStore.continueAt(spark, lc, deltaDocs, noIds, "doc_id", "text")
    assert(tfidfRows(tp) == tfidfRows(tc))
    assert(lmScores(lp) == lmScores(lc))
    assert(!StoreTxn.recover(spark, txn),
      "a committed txn leaves nothing to recover")
  }

  test("the txn's pins keep a long body's revert target alive past the horizon") {
    val (tp, lp) = freshPair("long")
    val txn = txnDirOf("long")
    val tf0 = tfidfRows(tp)
    // the body chains MORE commits to one store than its snapshot
    // retention (default 2) — without run()'s pin on epoch 0, the
    // third commit's GC would collect the revert target and the abort
    // would fail past the horizon instead of compensating
    val boom = intercept[RuntimeException] {
      StoreTxn.run(spark, txn, Seq("tfidf" -> tp, "lmcounts" -> lp)) {
        (1 to 3).foreach { i =>
          TfidfStore.continueAt(spark, tp,
            Seq((100L + i, s"chain doc c$i d$i")).toDF("doc_id", "text"),
            noIds, "doc_id", "text")
        }
        assert(TfidfStore.currentEpoch(spark, tp) == 3L)
        sys.error("failure after three chained commits")
      }
    }
    assert(boom.getMessage.contains("after three chained commits"),
      "the abort must compensate cleanly, not die past the horizon")
    assert(boom.getSuppressed.isEmpty,
      "no suppressed compensation failure expected")
    assert(tfidfRows(tp) == tf0,
      "all three chained commits must revert")
    // the pins released with the abort: the next writer's GC is free
    // to collect normally again
    (1 to 3).foreach { i =>
      TfidfStore.continueAt(spark, tp,
        Seq((200L + i, s"post px$i")).toDF("doc_id", "text"),
        noIds, "doc_id", "text")
    }
    intercept[RuntimeException] { TfidfStore.rollbackTo(spark, tp, 0L) }
  }

  test("a second concurrent coordinator on the same txn dir fails loudly") {
    val (tp, lp) = freshPair("lease")
    val txn = txnDirOf("lease")
    // first coordinator is mid-txn: its lease is on the dir
    val fs = SegSwap.fsOf(spark, txn)
    val held = SegSwap.acquireLease(fs, txn)
    val e = intercept[IllegalStateException] {
      StoreTxn.run(spark, txn, Seq("tfidf" -> tp, "lmcounts" -> lp)) {
        fail("the body must never run under a contended lease")
      }
    }
    assert(e.getMessage.contains("another writer holds the lease"),
      "the second coordinator must fail at entry, not revert in-flight work")
    SegSwap.releaseLease(fs, txn, held)
    // released: the dir is usable again
    StoreTxn.run(spark, txn, Seq("tfidf" -> tp, "lmcounts" -> lp)) { () }
  }

  test("overlapping participants across concurrent txn dirs are fenced") {
    val (tp, lp) = freshPair("fence")
    val dirA = txnDirOf("fenceA")
    val dirB = txnDirOf("fenceB")
    val tf0 = tfidfRows(tp)
    StoreTxn.run(spark, dirA, Seq("tfidf" -> tp)) {
      TfidfStore.continueAt(spark, tp, deltaDocs, noIds, "doc_id", "text")
      // a SECOND coordinator through a DIFFERENT dir sharing tp: must
      // refuse at enroll — if it ran and either side crashed, recovery
      // would revert the other's committed continuation
      val e = intercept[IllegalStateException] {
        StoreTxn.run(spark, dirB, Seq("tfidf" -> tp, "lmcounts" -> lp)) {
          sys.error("body must never run")
        }
      }
      assert(e.getMessage.contains("enrolled in the in-flight txn"))
    }
    // after A commits, the same store enrolls into a different dir
    StoreTxn.run(spark, dirB, Seq("tfidf" -> tp)) {
      TfidfStore.continueAt(spark, tp,
        Seq((40L, "after the fence lifted")).toDF("doc_id", "text"),
        noIds, "doc_id", "text")
    }
    assert(tfidfRows(tp) != tf0)
    // a STALE marker (owner crashed before its manifest landed, lease
    // expired — nothing to compensate) is cleaned up and re-claimed
    SegSwap.writeTextAtomic(SegSwap.fsOf(spark, tp), s"$tp/txn_owner",
      txnDirOf("fenceDead"))
    StoreTxn.run(spark, dirA, Seq("tfidf" -> tp)) { () }
  }

  test("compensation under a live concurrent reader pin keeps the pinned epoch readable") {
    // the StoreTxn/pin matrix corner: txn 2 fails AFTER its first store
    // committed, while a concurrent reader's PRE-txn-1 pin is live —
    // the compensation rollback must revert exactly to txn 2's entry
    // epoch and must not disturb (or GC) the reader's pinned epoch
    val (tp, lp) = freshPair("pinmx")
    val txn1 = txnDirOf("pinmxA")
    val txn2 = txnDirOf("pinmxB")
    val tf0 = tfidfRows(tp)
    val sfs = SegSwap.fsOf(spark, tp)
    val token = SegSwap.pinEpoch(sfs, tp, 0L) // concurrent reader, e0
    try {
      StoreTxn.run(spark, txn1, Seq("tfidf" -> tp)) {
        TfidfStore.continueAt(spark, tp, deltaDocs, noIds, "doc_id", "text")
      }
      val tf1 = tfidfRows(tp)
      assert(tf1 != tf0)
      val delta2 = Seq((30L, "second wave tokens zz")).toDF("doc_id", "text")
      val boom = intercept[RuntimeException] {
        StoreTxn.run(spark, txn2, Seq("tfidf" -> tp, "lmcounts" -> lp)) {
          TfidfStore.continueAt(spark, tp, delta2, noIds, "doc_id", "text")
          assert(tfidfRows(tp) != tf1, "txn 2's first commit must land")
          sys.error("fail after the first store committed")
        }
      }
      assert(boom.getMessage.contains("fail after the first store"))
      // compensated to txn 2's ENTRY state (post-txn-1), not further
      assert(tfidfRows(tp) == tf1,
        "compensation must revert to txn 2's entry epoch exactly")
      // and the concurrent reader's pinned pre-txn-1 epoch still reads
      // the exact original content (tfidfAt resolves data AND params
      // as of e0 — N included)
      val asOf0 = TfidfStore.tfidfAt(spark, tp, 0L)
        .selectExpr("doc_id", "token", "tf", "df")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(asOf0 == tf0,
        "the reader's pinned epoch must survive the compensation")
    } finally SegSwap.releasePin(sfs, tp, token)
  }

  test("unknown store kinds fail loudly at manifest time, before any commit") {
    val txn = txnDirOf("kind")
    val e = intercept[IllegalArgumentException] {
      StoreTxn.run(spark, txn, Seq("nosuchkind" -> "/tmp/nowhere")) { () }
    }
    assert(e.getMessage.contains("unknown store kind"))
  }
}
