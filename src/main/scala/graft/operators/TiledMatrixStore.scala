package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The MAINTAINED TILING — the durable static side of a 24/7 ONE2MUL
  * (blocked GIM-V) stream maintainer, closing the one member round 13
  * deferred with a design analysis (PLANS round-13 note): the blocked
  * continuation's pruning key is the TILE, but the natural stream-delta
  * key is the COLUMN (a producer replaces a column's cell set — the
  * scalar maintainer's contract), and ONE bucketing cannot serve both.
  * This store holds BOTH keyings of the same matrix, maintained
  * together in one journaled commit:
  *
  *  - `cells`  (i, j, v)        bucketed by hash(j)  — the delta
  *    contract's table: a micro-batch's changed columns locate their
  *    OLD cells through a j-bucket-pruned read, O(delta), exactly the
  *    ANN locator's role ([[Similarity]]'s `loc`: nid→cid there,
  *    column→tiles here);
  *  - `tiles`  (tid, jb, cells) bucketed by hash(tid) — the compressed
  *    ONE2MUL static the incremental loop reads tile-pruned
  *    ([[graft.core.StaticSource]]); `cells` is the tile's bag, the
  *    reference's blocked GIM-V form (blocking job
  *    `incr-hadoop-0.1/src/examples/.../MatrixVector.java:93-147`,
  *    grouped zip-join consumption `MapTask.java:800-815`);
  *  - `tidx`   (jb, tid)        bucketed by hash(jb) — the tile index:
  *    the loop's `backProject` (a moved x[idx] re-dirties the tiles
  *    whose column block contains idx) discovers tile ids from a
  *    jb-bucket-pruned read instead of a corpus-wide tile scan.
  *
  * Per batch, every read and every rewrite is delta-proportional: the
  * changed columns' old cells (pruned by j), the touched tiles' bags
  * (pruned by tid), the changed blocks' index rows (pruned by jb), and
  * the commit rewrites exactly those buckets of each table. A batch's
  * surgery is REPLAY-IDEMPOTENT by algebra (a bag rewrite replaces the
  * changed columns' cells; applying it to an already-patched bag is a
  * no-op), and the `lastBatch` fence rides the params dir through the
  * same journal as the three tables — the family's exactly-once
  * contract ([[KeyedUpsertStore]], [[SegSwap]]).
  *
  * Reference analog: the one-off static distribution re-run with a
  * scale-factor partition count (`JobClient.java:912-957`,
  * `StaticDataPartitioner.java:30-54`) — here the "distribution job"
  * is incremental and keeps two derived keyings of the static current
  * instead of re-partitioning the world.
  */
object TiledMatrixStore {

  private val cellsSchema = StructType.fromDDL(
    "i BIGINT, j BIGINT, v DOUBLE, _b INT")
  private val tilesSchema = StructType.fromDDL(
    "tid BIGINT, jb BIGINT, cells ARRAY<STRUCT<i: BIGINT, j: BIGINT, " +
      "v: DOUBLE>>, _b INT")
  private val tidxSchema = StructType.fromDDL(
    "jb BIGINT, tid BIGINT, _b INT")

  /** Tile id packing — DELEGATES to
    * [[graft.algorithms.IncrementalMatVec.tileId]] (the preserved kvs'
    * provenance key is computed there; the store's frontier tids here —
    * one definition, no desync channel: a packing change that reached
    * only one side would make the frontier-to-kvs tid join silently
    * match nothing). */
  private def tidOf(i: Column, j: Column, blockSize: Int): Column =
    graft.algorithms.IncrementalMatVec.tileId(i, j, blockSize)

  private def jbOf(j: Column, blockSize: Int): Column =
    (j / blockSize).cast("long")

  /** The family's pin-before-hash rule: xxhash64 is type-sensitive. */
  private def keyBucket(c: Column, b: Int): Column =
    pmod(xxhash64(c.cast("long")), lit(b.toLong)).cast("int")

  private def inB(bs: Set[Int]): Column =
    if (bs.isEmpty) lit(false)
    else col("_b").isin(bs.toSeq.map(Integer.valueOf): _*)

  private case class Params(blockSize: Int, bc: Int, bt: Int, bi: Int,
      lastBatch: Long)

  private def writeParamsTo(spark: SparkSession, dst: String,
      p: Params): Unit =
    SegSwap.writeParamsTo(spark, dst, Seq(
      "blockSize" -> p.blockSize, "bc" -> p.bc, "bt" -> p.bt,
      "bi" -> p.bi, "lastBatch" -> p.lastBatch))

  private def readParams(spark: SparkSession, path: String): Params = {
    val r = SegSwap.readParamsRow(spark, path,
      Seq("blockSize", "bc", "bt", "bi", "lastBatch"), "tiledmat")
    Params(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
  }

  /** Lay the matrix out as the three keyings (params — carrying the
    * batch fence, initialized to −1 — last). Bucket counts by DATA
    * (the family rule): `tidx` rows are two longs, so it defaults far
    * thinner than the cell tables. */
  def init(spark: SparkSession, path: String, m: DataFrame,
      blockSize: Int, cellBuckets: Int = 32, tileBuckets: Int = 32,
      idxBuckets: Int = 8): Unit = {
    SegSwap.resetForInit(SegSwap.fsOf(spark, path), path)
    val cells = m.select(col("i").cast("long"), col("j").cast("long"),
      col("v").cast("double"))
    val stagedCells = cells.withColumn("_b", keyBucket(col("j"), cellBuckets))
      .repartition(col("_b"))
    val stagedTiles = cells
      .groupBy(tidOf(col("i"), col("j"), blockSize).as("tid"),
        jbOf(col("j"), blockSize).as("jb"))
      .agg(collect_list(struct(col("i"), col("j"), col("v"))).as("cells"))
      .withColumn("_b", keyBucket(col("tid"), tileBuckets))
      .repartition(col("_b"))
    // cells and tiles derive independently from the source — overlap
    // their writes (§2.6); tidx projects the just-written tiles, so it
    // stays after
    graft.util.Par.foreach(Seq(
      () => stagedCells.write.mode("overwrite")
        .partitionBy("_b").parquet(s"$path/cells"),
      () => stagedTiles.write.mode("overwrite")
        .partitionBy("_b").parquet(s"$path/tiles")))
    // the index projects the JUST-WRITTEN tiles (two thin columns,
    // column-pruned) — re-deriving it from `cells` would re-run the
    // blocking groupBy as a second full corpus scan+shuffle
    spark.read.parquet(s"$path/tiles").select(col("jb"), col("tid"))
      .withColumn("_b", keyBucket(col("jb"), idxBuckets))
      .repartition(col("_b")).write.mode("overwrite")
      .partitionBy("_b").parquet(s"$path/tidx")
    writeParamsTo(spark, s"$path/params",
      Params(blockSize, cellBuckets, tileBuckets, idxBuckets, -1L))
  }

  /** Read-side handle: the tile-keyed and block-keyed views as
    * [[graft.core.StaticSource]]s (partition-pruned, journal-resolved),
    * params snapshotted at [[open]] — the [[KeyedUpsertStore
    * .ReadHandle]] contract (single fenced writer; layout fields never
    * change after init). */
  final class Handle private[TiledMatrixStore] (spark: SparkSession,
      path: String, p: Params,
      resolve: (String, StructType) => DataFrame) {
    def blockSize: Int = p.blockSize
    def lastBatch: Long = p.lastBatch

    private def table(name: String, schema: StructType): DataFrame =
      resolve(name, schema)

    /** The ONE2MUL static: (tid, jb, cells) pruned by tid bucket. */
    val tilesSource: graft.core.StaticSource = new graft.core.StaticSource {
      def nBuckets: Int = p.bt
      def bucketOf(c: Column): Column = keyBucket(c, p.bt)
      def pruned(bs: Set[Int]): DataFrame =
        table("tiles", tilesSchema).filter(inB(bs)).drop("_b")
      def all: DataFrame = table("tiles", tilesSchema).drop("_b")
    }

    /** The tile index: (jb, tid) pruned by jb bucket — backProject's
      * discovery read. */
    val idxSource: graft.core.StaticSource = new graft.core.StaticSource {
      def nBuckets: Int = p.bi
      def bucketOf(c: Column): Column = keyBucket(c, p.bi)
      def pruned(bs: Set[Int]): DataFrame =
        table("tidx", tidxSchema).filter(inB(bs)).drop("_b")
      def all: DataFrame = table("tidx", tidxSchema).drop("_b")
    }

    private[TiledMatrixStore] def cellsTable: DataFrame =
      table("cells", cellsSchema)
    private[TiledMatrixStore] def params: Params = p

    /** The current cell relation (journal-resolved). */
    def cells: DataFrame = cellsTable.drop("_b")
  }

  def open(spark: SparkSession, path: String): Handle =
    new Handle(spark, path, readParams(spark, path),
      (n, s) => SegSwap.resolvedTable(spark, path, n, s))

  /** EPOCH-PINNED read handle — the tiling AS OF `epoch`
    * ([[graft.operators.Pq.probeIvfPqIndexAt]]'s family pattern):
    * every table resolves through the snapshot layer
    * ([[SegSwap.snapshotTable]] — retired buckets of later commits +
    * still-live untouched dirs), and the params (blockSize, bucket
    * counts, the `lastBatch` fence) come from the SAME epoch's commit,
    * so a layout migration (rebucket) after `epoch` cannot desync the
    * handle's bucket hashing from the files it reads. Yesterday's
    * tiling under yesterday's fence — the as-of read the state store
    * already had ([[graft.core.SegmentedStateStore.snapshotAt]]) and
    * the tiling lacked (round-14 verdict missing #2). */
  def openAt(spark: SparkSession, path: String, epoch: Long): Handle = {
    val r = SegSwap.readParamsRowAt(spark, path,
      Seq("blockSize", "bc", "bt", "bi", "lastBatch"), "tiledmat", epoch)
    val p = Params(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
      r.getLong(4))
    new Handle(spark, path, p,
      (n, s) => SegSwap.snapshotTable(spark, path, n, s, epoch))
  }

  /** The last applied batch id (−1 = none). */
  def lastBatch(spark: SparkSession, path: String): Long =
    readParams(spark, path).lastBatch

  /** The store's current commit epoch (0 = as-inited). */
  def currentEpoch(spark: SparkSession, path: String): Long =
    SegSwap.currentEpoch(SegSwap.fsOf(spark, path), path)

  /** Roll all three keyings AND the batch fence back to `epoch` as one
    * journaled revert — the family contract ([[KeyedUpsertStore
    * .rollbackTo]]): the fence reverting WITH the rows is what makes a
    * rolled-back stream restartable. */
  def rollbackTo(spark: SparkSession, path: String, epoch: Long): Unit =
    SegSwap.rollbackTo(spark, path, epoch,
      Seq("cells" -> cellsSchema, "tiles" -> tilesSchema,
        "tidx" -> tidxSchema),
      dirTables = Seq("params"))

  /** Publish the store AS OF `epoch` to `dst` as a fresh standalone
    * store ([[SegSwap.exportSnapshot]]). */
  def exportAt(spark: SparkSession, path: String, epoch: Long,
      dst: String): Unit =
    SegSwap.exportSnapshot(spark, path, epoch, dst,
      Seq("cells", "tiles", "tidx"), dirTables = Seq("params"))

  /** Journaled RE-BUCKETING of any subset of the three keyings (pass 0
    * to keep a table's current count) — the lifecycle op a 24/7
    * maintainer needs as the corpus outgrows the init-time counts.
    * One crash-safe swap; the `lastBatch` stream fence survives the
    * migration ([[KeyedUpsertStore.rebucket]]'s contract). */
  def rebucket(spark: SparkSession, path: String, cellBuckets: Int = 0,
      tileBuckets: Int = 0, idxBuckets: Int = 0): Unit =
    SegSwap.withWriterLease(spark, path) { lease =>
      val fs = SegSwap.fsOf(spark, path)
      SegSwap.recover(spark, path) // writer entry: live dirs are truth
      val p = readParams(spark, path)
      val nbc = if (cellBuckets > 0) cellBuckets else p.bc
      val nbt = if (tileBuckets > 0) tileBuckets else p.bt
      val nbi = if (idxBuckets > 0) idxBuckets else p.bi
      def staged(name: String, schema: StructType, key: String,
          b: Int): (String, DataFrame, Set[Int]) =
        (name, SegSwap.resolvedTable(spark, path, name, schema)
          .drop("_b").withColumn("_b", keyBucket(col(key), b)),
          SegSwap.liveBuckets(fs, path, name))
      SegSwap.commit(spark, path,
        Seq(staged("cells", cellsSchema, "j", nbc),
          staged("tiles", tilesSchema, "tid", nbt),
          staged("tidx", tidxSchema, "jb", nbi)),
        dirSwaps = Seq("params" -> ((dst: String) =>
          writeParamsTo(spark, dst, p.copy(bc = nbc, bt = nbt, bi = nbi)))),
        fence = Some(lease), augmentFromStaging = true)
    }

  /** Journaled COMPACTION: rewrite every bucket under the current
    * layout (content-invariant [[rebucket]] with the store's own
    * counts). */
  def compact(spark: SparkSession, path: String): Unit =
    rebucket(spark, path)

  /** One micro-batch's SURGERY, computed once (materialized leaves) and
    * consumed twice — by the state continuation's overlays (the fixed
    * apply order shows the loop the post-delta tiling while the store
    * still holds pre-batch rows) and by [[applyDelta]]'s commit.
    *
    *  - `chgCols`  the replaced columns (patch ∪ removed)
    *  - `chgJbs`   their column blocks
    *  - `touched`  tile ids whose bags change (old cells' tiles ∪
    *    patch cells' tiles — the continuation's initial frontier)
    *  - `newBags`  the touched tiles' post-delta bags (empty tiles
    *    absent — a removal that empties a tile deletes it)
    *  - `newIdx`   the changed blocks' post-delta (jb, tid) rows
    */
  final case class Delta(chgCols: DataFrame, chgJbs: DataFrame,
      touched: DataFrame, newBags: DataFrame, newIdx: DataFrame) {
    def release(): Unit =
      Seq(chgCols, chgJbs, touched, newBags, newIdx)
        .foreach(_.unpersist(blocking = false))
  }

  /** Compute a batch's [[Delta]] from the PRE-batch store: every read
    * is bucket-pruned (j buckets for the old cells, tid buckets for
    * the old bags, jb buckets for the old index rows) — O(delta), never
    * O(corpus). `patch` carries the replaced columns' ENTIRE new cell
    * sets (i, j, v); `removedCols` the columns deleted outright. */
  def prepareDelta(spark: SparkSession, path: String, patch: DataFrame,
      removedCols: DataFrame): Delta = {
    // single-column REQUIRED (the StaticSource.Overlay guard, round-11
    // advice): a caller handing the raw D rows (i, j, v, op) would
    // silently bind the all-NULL `i` as the removal key — deletions
    // become a no-op while the fence still advances
    require(removedCols.columns.length == 1,
      "TiledMatrixStore.prepareDelta: removedCols must carry exactly " +
        s"the column key, got (${removedCols.columns.mkString(", ")}) — " +
        "select the 'j' column before calling")
    val h = open(spark, path)
    val p = h.params
    val bs = p.blockSize
    val pc = patch.select(col("i").cast("long"), col("j").cast("long"),
      col("v").cast("double"))
    val chg = pc.select(col("j"))
      .unionByName(removedCols
        .select(col(removedCols.columns.head).cast("long").as("j")))
      .distinct().localCheckpoint(true)
    val chgJbs = chg.select(jbOf(col("j"), bs).as("jb")).distinct()
      .localCheckpoint(true)
    // the locator read: the changed columns' OLD cells, pruned by j
    val cb = chg.select(keyBucket(col("j"), p.bc).as("_b")).distinct()
      .collect().map(_.getInt(0)).toSet
    val oldCells = h.cellsTable.filter(inB(cb))
      .join(chg.select(col("j").as("_cj")), col("j") === col("_cj"),
        "left_semi")
    val touched = oldCells.select(tidOf(col("i"), col("j"), bs).as("tid"))
      .unionByName(pc.select(tidOf(col("i"), col("j"), bs).as("tid")))
      .distinct().localCheckpoint(true)
    // bag surgery: replace the changed columns' cells inside the
    // touched tiles' bags (idempotent — re-applying to an already
    // patched bag replaces the same cells with the same cells)
    val tb = touched.select(keyBucket(col("tid"), p.bt).as("_b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val oldBags = h.tilesSource.pruned(tb)
      .join(touched.select(col("tid").as("_ct")), col("tid") === col("_ct"),
        "left_semi")
    val keep = oldBags
      .select(col("tid"), col("jb"), explode(col("cells")).as("_c"))
      .select(col("tid"), col("jb"), col("_c.i").as("i"),
        col("_c.j").as("j"), col("_c.v").as("v"))
      .join(chg.select(col("j").as("_cj")), col("j") === col("_cj"),
        "left_anti")
    val add = pc.select(tidOf(col("i"), col("j"), bs).as("tid"),
      jbOf(col("j"), bs).as("jb"), col("i"), col("j"), col("v"))
    val newBags = keep.unionByName(add)
      .groupBy(col("tid"), col("jb"))
      .agg(collect_list(struct(col("i"), col("j"), col("v"))).as("cells"))
      .localCheckpoint(true)
    // index surgery: the changed blocks' post-delta tile sets — kept
    // untouched tiles of those blocks plus the touched tiles that
    // remain non-empty (disjoint by construction, no distinct needed)
    val ib = chgJbs.select(keyBucket(col("jb"), p.bi).as("_b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val keepIdx = h.idxSource.pruned(ib)
      .join(chgJbs.select(col("jb").as("_cb")), col("jb") === col("_cb"),
        "left_semi")
      .join(touched.select(col("tid").as("_ct")), col("tid") === col("_ct"),
        "left_anti")
    val newIdx = keepIdx.select(col("jb"), col("tid"))
      .unionByName(newBags.select(col("jb"), col("tid")))
      .localCheckpoint(true)
    Delta(chg, chgJbs, touched, newBags, newIdx)
  }

  /** Apply batch `batchId` AT MOST ONCE: the three tables' touched
    * buckets and the fence install through ONE journaled swap (the
    * [[Similarity.applyListsDelta]] shape — lists+loc there, three
    * keyings here). `delta` must be [[prepareDelta]]'s output for this
    * exact (patch, removedCols) against the pre-batch store. */
  def applyDelta(spark: SparkSession, path: String, patch: DataFrame,
      delta: Delta, batchId: Long): Option[StorePolicy.ContinueAdvice] =
    SegSwap.withWriterLease(spark, path) { lease =>
      SegSwap.recover(spark, path)
      val p = readParams(spark, path)
      if (batchId <= p.lastBatch) None
      else {
        val pc = patch.select(col("i").cast("long"), col("j").cast("long"),
          col("v").cast("double"))
        val cbs = delta.chgCols.select(keyBucket(col("j"), p.bc).as("_b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val tbs = delta.touched.select(keyBucket(col("tid"), p.bt).as("_b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val ibs = delta.chgJbs.select(keyBucket(col("jb"), p.bi).as("_b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val fenceSwap = Seq("params" -> ((dst: String) =>
          writeParamsTo(spark, dst, p.copy(lastBatch = batchId))))
        if (cbs.isEmpty) {
          // an effectively-empty batch still records its fence
          SegSwap.commit(spark, path, Nil, dirSwaps = fenceSwap,
            fence = Some(lease))
          None
        } else {
          val cellsNext = SegSwap.resolvedTable(spark, path, "cells",
              cellsSchema).filter(inB(cbs))
            .join(delta.chgCols.select(col("j").as("_cj")),
              col("j") === col("_cj"), "left_anti")
            .unionByName(pc.withColumn("_b", keyBucket(col("j"), p.bc)))
          val tilesNext = SegSwap.resolvedTable(spark, path, "tiles",
              tilesSchema).filter(inB(tbs))
            .join(delta.touched.select(col("tid").as("_ct")),
              col("tid") === col("_ct"), "left_anti")
            .unionByName(delta.newBags
              .withColumn("_b", keyBucket(col("tid"), p.bt)))
          val idxNext = SegSwap.resolvedTable(spark, path, "tidx",
              tidxSchema).filter(inB(ibs))
            .join(delta.chgJbs.select(col("jb").as("_cb")),
              col("jb") === col("_cb"), "left_anti")
            .unionByName(delta.newIdx
              .withColumn("_b", keyBucket(col("jb"), p.bi)))
          SegSwap.commit(spark, path,
            Seq(("cells", cellsNext, cbs), ("tiles", tilesNext, tbs),
              ("tidx", idxNext, ibs)),
            dirSwaps = fenceSwap, fence = Some(lease))
          Some(StorePolicy.advise("tiledmat", tbs.size,
            SegSwap.liveBuckets(SegSwap.fsOf(spark, path), path,
              "tiles").size))
        }
      }
    }
}
