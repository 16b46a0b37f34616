package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{DupSpansStore, Forget, LineDedupStore, LmCountsStore,
  SegSwap, TfidfStore}

/** Deletion propagation ([[graft.operators.Forget]]): purging a doc
  * set must (1) leave every derived store EXACTLY as if it had been
  * built without those docs, (2) be all-or-nothing across the family,
  * and (3) after the scrub, leave no purged byte anywhere under the
  * store dirs — including the retired/snapshot history a plain removal
  * continuation would keep readable — with time travel below the
  * sweep failing loudly rather than reading resurrected content. */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  // purged docs carry a sentinel token that appears NOWHERE else, so a
  // file-by-file disk audit can prove the bytes are gone
  private val Sentinel = "zebraqux"
  private def corpus = (
    (1L to 6L).map(i => (i, s"the cat sat on the mat m$i")) ++
    (7L to 9L).map(i => (i, s"$Sentinel secret s$i draft d$i line l$i")) ++
    (10L to 14L).map(i => (i, s"pad p$i q$i r$i t$i u$i v$i"))
  ).toDF("doc_id", "text")
  private def purged = corpus.filter("doc_id BETWEEN 7 AND 9")
  private def kept = corpus.filter("doc_id NOT BETWEEN 7 AND 9")
  private def purgeIds = purged.select("doc_id")

  private def dir(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_forget_$tag").toString

  /** Init the four text stores on `docs`, returning (kind, path). */
  private def family(tag: String, docs: DataFrame): Seq[(String, String)] = {
    val tp = dir(s"${tag}_tfidf"); val lp = dir(s"${tag}_lm")
    val ep = dir(s"${tag}_line"); val sp = dir(s"${tag}_spans")
    TfidfStore.init(spark, tp, docs, "doc_id", "text", nBuckets = 8)
    LmCountsStore.init(spark, lp, docs, "doc_id", "text", nBuckets = 8)
    LineDedupStore.init(spark, ep, docs, "doc_id", "text",
      maxDocs = 2L, sep = " ", nBuckets = 8)
    DupSpansStore.init(spark, sp, docs, "doc_id", "text",
      w = 4, nBuckets = 8, withCut = true)
    Seq("tfidf" -> tp, "lmcounts" -> lp, "linededup" -> ep,
      "dupspans" -> sp)
  }

  private def probe = Seq((900L, "the cat sat on the mat"),
    (901L, s"$Sentinel secret")).toDF("doc_id", "text")

  /** Content fingerprint of each store — the full derived output. */
  private def readings(stores: Seq[(String, String)]): Map[String, Set[String]] =
    stores.map { case (kind, p) =>
      val df = kind match {
        case "tfidf" => TfidfStore.tfidf(spark, p)
          .selectExpr("doc_id", "token", "tf", "df")
        case "lmcounts" => LmCountsStore.scoreAgainst(spark, p, probe,
          "doc_id", "text").selectExpr("doc_id", "nb", "avg_nll", "keep")
        case "linededup" => LineDedupStore.cleaned(spark, p)
          .selectExpr("doc_id", "clean", "n_kept", "n_removed")
        case "dupspans" => DupSpansStore.cuts(spark, p)
          .selectExpr("doc_id", "clean")
      }
      kind -> df.collect().map(_.toString).toSet
    }.toMap

  /** Every parquet data file under `root`, read one by one. */
  private def parquetFiles(root: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(d: java.io.File): Unit = {
      val fs = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      fs.foreach { f =>
        if (f.isDirectory) walk(f)
        else if (f.getName.endsWith(".parquet")) out += f.getAbsolutePath
      }
    }
    walk(new java.io.File(root))
    out.toSeq
  }

  /** Files under `root` holding any purged trace: a string cell
    * containing the sentinel, or a doc_id/nid-like long id in 7..9. */
  private def taintedFiles(root: String): Seq[String] =
    parquetFiles(root).filter { f =>
      val df = spark.read.parquet(f)
      val strCols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType)
        .map(_.name)
      val idCols = df.schema.fields
        .filter(f0 => Set("doc_id", "nid", "_rid").contains(f0.name) &&
          f0.dataType == org.apache.spark.sql.types.LongType)
        .map(_.name)
      val hit = strCols.map(c =>
          org.apache.spark.sql.functions.col(c).contains(Sentinel)) ++
        idCols.map(c => org.apache.spark.sql.functions.col(c)
          .isin(7L, 8L, 9L))
      hit.nonEmpty &&
        df.filter(hit.reduce(_ || _)).limit(1).count() > 0
    }

  test("sweep leaves every store exactly as built-without-the-docs, " +
      "and the scrub removes the purged bytes from disk file-by-file") {
    val swept = family("swept", corpus)
    val fresh = family("fresh", kept)
    // before the sweep the sentinel is live on disk (sanity: the audit
    // has teeth)
    assert(swept.exists { case (_, p) => taintedFiles(p).nonEmpty },
      "the sentinel must be present before the sweep")

    // scrub-less sweep first: the LIVE view forgets, but history keeps
    // the bytes — exactly the gap truncateHistory closes
    Forget.sweep(spark, dir("txn1"), purgeIds, "doc_id", "text", swept,
      scrubHistory = false)
    assert(readings(swept) == readings(fresh),
      "each store must equal its built-without-the-purged-docs twin")
    val retained = swept.filter { case (_, p) => taintedFiles(p).nonEmpty }
    assert(retained.nonEmpty,
      "without the scrub, retired history must still hold purged bytes " +
        "(otherwise the scrub is dead weight)")

    // the scrub: purged bytes gone from EVERY file under EVERY store
    swept.foreach { case (_, p) => Forget.scrub(spark, p) }
    swept.foreach { case (kind, p) =>
      val bad = taintedFiles(p)
      assert(bad.isEmpty,
        s"$kind still holds purged bytes after the scrub in:\n  " +
          bad.mkString("\n  "))
    }
    assert(readings(swept) == readings(fresh),
      "the scrub must not change any live reading")

    // idempotence: the documented crash recovery is "re-run the sweep
    // with the same ids" — a re-sent deletion list must change NOTHING
    // (in particular TfidfStore's N must not decrement again, which
    // would silently skew every tfidf weight)
    Forget.sweep(spark, dir("txn1b"), purgeIds, "doc_id", "text", swept)
    assert(readings(swept) == readings(fresh),
      "re-running the sweep with the same ids must be a no-op")
  }

  test("post-scrub time travel below the floor fails loudly; " +
      "new commits above it time-travel normally") {
    val stores = family("floor", corpus)
    val (_, tp) = stores.head // tfidf
    Forget.sweep(spark, dir("txn2"), purgeIds, "doc_id", "text", stores)
    val floor = TfidfStore.currentEpoch(spark, tp)
    assert(floor > 0L, "the sweep must have committed an epoch")
    val fs = SegSwap.fsOf(spark, tp)
    assert(SegSwap.historyFloorOf(fs, tp) == floor)
    // reads/rollbacks/pins below the floor: loud, named failures
    val e1 = intercept[Exception] { TfidfStore.tfidfAt(spark, tp, 0L).count() }
    assert(e1.getMessage.contains("history floor"), e1.getMessage)
    val e2 = intercept[Exception] { TfidfStore.rollbackTo(spark, tp, 0L) }
    assert(e2.getMessage.contains("history floor"), e2.getMessage)
    val e3 = intercept[Exception] { SegSwap.pinEpoch(fs, tp, 0L) }
    assert(e3.getMessage.contains("history floor"), e3.getMessage)
    // life above the floor is normal: commit a delta, read the floor
    // epoch as-of, roll back to it
    val before = TfidfStore.tfidf(spark, tp)
      .selectExpr("doc_id", "token", "tf", "df")
      .collect().map(_.toString).toSet
    TfidfStore.continueAt(spark, tp,
      Seq((30L, "fresh words after the scrub")).toDF("doc_id", "text"),
      Seq.empty[Long].toDF("doc_id"), "doc_id", "text")
    assert(TfidfStore.tfidfAt(spark, tp, floor)
      .selectExpr("doc_id", "token", "tf", "df")
      .collect().map(_.toString).toSet == before,
      "the floor epoch itself must stay as-of readable")
    TfidfStore.rollbackTo(spark, tp, floor)
    assert(TfidfStore.tfidf(spark, tp)
      .selectExpr("doc_id", "token", "tf", "df")
      .collect().map(_.toString).toSet == before,
      "rolling back TO the floor must restore its exact content")
  }

  test("eval-item purge flips affected docs' flags and scrubs the item's bytes") {
    import graft.operators.DecontamStore
    // doc 3 is contaminated ONLY by eval item 101 (the sentinel
    // passage); doc 5 by eval item 102 — retracting 101 must flip
    // doc 3 to clean, leave doc 5 flagged, and leave no sentinel byte
    // anywhere under the store after the scrub
    val docs = Seq(
      (1L, "plain corpus alpha beta gamma"),
      (3L, s"contains the $Sentinel secret passage verbatim"),
      (5L, "holdout question two riddle text here"),
      (7L, "more ordinary filler words pad pad")).toDF("doc_id", "text")
    val eval0 = Seq(
      (101L, s"the $Sentinel secret passage verbatim appears"),
      (102L, "holdout question two riddle text")).toDF("eid", "etext")
    val p = dir("evalforget")
    DecontamStore.init(spark, p, docs, "doc_id", "text",
      eval0, "eid", "etext", w = 3, nBuckets = 8)
    assert(DecontamStore.contaminatedIds(spark, p)
      .as[Long].collect().toSet == Set(3L, 5L))
    Forget.sweepEval(spark, dir("evalforget_txn"),
      Seq(101L).toDF("eid"), "eid", "etext", Seq(p))
    // flags: derived from the remaining eval set — doc 3 now clean,
    // and the result equals a from-scratch build on eval minus 101
    assert(DecontamStore.contaminatedIds(spark, p)
      .as[Long].collect().toSet == Set(5L))
    val rebuilt = dir("evalforget_rebuild")
    DecontamStore.init(spark, rebuilt, docs, "doc_id", "text",
      eval0.filter($"eid" =!= 101L), "eid", "etext", w = 3, nBuckets = 8)
    assert(DecontamStore.contaminatedIds(spark, rebuilt)
      .as[Long].collect().toSet ==
      DecontamStore.contaminatedIds(spark, p).as[Long].collect().toSet)
    // bytes: the retracted item's shingles are gone from every file —
    // but ONLY from the eval side: doc 3 legitimately still carries
    // the sentinel text in the corpus-side shingles
    val evalTainted = parquetFiles(p).filter { f =>
      val df = spark.read.parquet(f)
      df.columns.contains("eid") && df.filter(
        org.apache.spark.sql.functions.col("eid") === 101L ||
          df.schema.fields.filter(_.dataType ==
            org.apache.spark.sql.types.StringType).map(c =>
            org.apache.spark.sql.functions.col(c.name).contains(Sentinel))
            .foldLeft(org.apache.spark.sql.functions.lit(false))(_ || _))
        .limit(1).count() > 0
    }
    assert(evalTainted.isEmpty,
      s"retracted eval item's bytes survive in:\n  ${evalTainted.mkString("\n  ")}")
  }

  test("a mid-family failure compensates: no store keeps the purge") {
    val stores = family("abort", corpus)
    val r0 = readings(stores)
    // second participant's path is a fresh dir with NO store in it —
    // its continuation throws after the first store already committed
    val broken = stores.take(1) ++ Seq("lmcounts" -> dir("abort_hole")) ++
      stores.drop(1)
    intercept[Exception] {
      Forget.sweep(spark, dir("txn3"), purgeIds, "doc_id", "text", broken)
    }
    assert(readings(stores) == r0,
      "compensation must revert the advanced store; none may keep the purge")
    // the same sweep over the intact family then succeeds
    Forget.sweep(spark, dir("txn3"), purgeIds, "doc_id", "text", stores)
    assert(readings(stores) == readings(family("abortfresh", kept)),
      "the re-run sweep must land the purge on every store")
  }

  test("truncateHistory refuses under a live pin and keeps a prior floor") {
    val stores = family("pin", corpus).take(1)
    val (_, tp) = stores.head
    val fs = SegSwap.fsOf(spark, tp)
    Forget.sweep(spark, dir("txn4"), purgeIds, "doc_id", "text", stores)
    val floor1 = SegSwap.historyFloorOf(fs, tp)
    // advance the store, pin the floor epoch, then try to scrub again
    TfidfStore.continueAt(spark, tp,
      Seq((31L, "more words")).toDF("doc_id", "text"),
      Seq.empty[Long].toDF("doc_id"), "doc_id", "text")
    val token = SegSwap.pinEpoch(fs, tp, floor1)
    val e = intercept[Exception] { Forget.scrub(spark, tp) }
    assert(e.getMessage.contains("reader pin"), e.getMessage)
    assert(SegSwap.historyFloorOf(fs, tp) == floor1,
      "an aborted truncation must restore the PRIOR floor, not erase it")
    SegSwap.releasePin(fs, tp, token)
    Forget.scrub(spark, tp)
    assert(SegSwap.historyFloorOf(fs, tp) ==
      TfidfStore.currentEpoch(spark, tp),
      "after release the scrub must land and raise the floor")
  }
}
