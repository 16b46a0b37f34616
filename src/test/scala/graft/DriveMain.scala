package graft

import org.apache.spark.sql.SparkSession

/** Scratch driver for manual verification runs (see .claude/skills/verify).
  * Current drive (round 10): exercise the family-wide store time-travel
  * API end-to-end on real sf0.001 documents — init a TfidfStore and a
  * DedupClusterStore, run a continuation, read currentEpoch, roll back
  * to epoch 0, and check the rolled-back scores equal the pre-shard
  * ones while a redo (rollback forward) restores the post-shard view. */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.LogQuiet()
    import spark.implicits._
    import graft.operators.{TfidfStore, DedupClusterStore}
    val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if (args.nonEmpty) { // gate mode: run the named SparkEntry queries
      args.foreach { n =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        val c = sys.env.get("GRAFT_OUT") match {
          case Some(out) =>
            df.write.mode("overwrite").parquet(s"$out/$n")
            spark.read.parquet(s"$out/$n").count()
          case None => df.count()
        }
        println(f"$n: $c rows, ${(System.nanoTime() - t0) / 1e9}%.1f s")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text")

    // --- TfidfStore: epoch + rollback + redo over real documents ---
    val tp = java.nio.file.Files.createTempDirectory("drive_tfidf").toString
    val base = docs.filter("doc_id % 10 < 8")
    val delta = docs.filter("doc_id % 10 >= 8")
    TfidfStore.init(spark, tp, base, "doc_id", "text", nBuckets = 16)
    require(TfidfStore.currentEpoch(spark, tp) == 0L, "fresh store at epoch 0")
    def tfidfTop(p: String): Seq[(Long, String, Double)] =
      TfidfStore.tfidf(spark, p)
        .orderBy(org.apache.spark.sql.functions.desc("tfidf"), $"doc_id", $"token")
        .limit(20).selectExpr("doc_id", "token", "tfidf")
        .as[(Long, String, Double)].collect().toSeq
    val pre = tfidfTop(tp)
    TfidfStore.continueAt(spark, tp, delta,
      Seq.empty[Long].toDF("doc_id"), "doc_id", "text")
    val e1 = TfidfStore.currentEpoch(spark, tp)
    require(e1 == 1L, s"continuation bumps epoch to 1, got $e1")
    val post = tfidfTop(tp)
    require(post != pre, "delta must move the top TF-IDF list")
    TfidfStore.rollbackTo(spark, tp, 0L)
    require(tfidfTop(tp) == pre, "rollback to 0 restores pre-delta scores")
    TfidfStore.rollbackTo(spark, tp, 1L) // redo
    require(tfidfTop(tp) == post, "redo to 1 restores post-delta scores")
    println(s"tfidf store drive OK: ${pre.size} top rows, epochs 0->1->0->1")

    // --- DedupClusterStore: rollback undoes a clustering shard ---
    val cp = java.nio.file.Files.createTempDirectory("drive_clus").toString
    DedupClusterStore.init(spark, cp, base, "doc_id", "text",
      nBuckets = 16)
    def clusters(p: String): Map[Long, Long] =
      DedupClusterStore.clusters(spark, p)
        .as[(Long, Long)].collect().toMap
    val c0 = clusters(cp)
    DedupClusterStore.continueAt(spark, cp, delta,
      Seq.empty[Long].toDF("doc_id"), "doc_id", "text")
    require(DedupClusterStore.currentEpoch(spark, cp) == 1L)
    require(clusters(cp).size > c0.size, "delta docs join the clustering")
    require(DedupClusterStore.clustersAt(spark, cp, 0L)
      .as[(Long, Long)].collect().toMap == c0,
      "the as-of read must equal the pre-delta clustering")
    DedupClusterStore.rollbackTo(spark, cp, 0L)
    require(clusters(cp) == c0, "rollback restores the pre-delta clustering")
    println(s"dedup-cluster store drive OK: ${c0.size} base assignments")

    // --- LmCountsStore: score against yesterday's model ---
    val lp = java.nio.file.Files.createTempDirectory("drive_lm").toString
    import graft.operators.LmCountsStore
    LmCountsStore.init(spark, lp, base, "doc_id", "text", nBuckets = 16)
    val audit = docs.limit(50)
    def lmset(f: => org.apache.spark.sql.DataFrame) =
      f.as[(Long, Long, Double, Int)].collect().toSet
    val s0 = lmset(LmCountsStore.scoreAgainst(spark, lp, audit,
      "doc_id", "text"))
    LmCountsStore.continueAt(spark, lp, delta,
      Seq.empty[Long].toDF("doc_id"), "doc_id", "text")
    require(lmset(LmCountsStore.scoreAgainstAt(spark, lp, audit,
      "doc_id", "text", epoch = 0L)) == s0,
      "the epoch-0 model must reproduce pre-delta scores exactly")
    println(s"lm model-versioning drive OK: ${s0.size} audit scores")

    // --- KeyedUpsertStore: rollback reverts fence with rows ---
    val up = java.nio.file.Files.createTempDirectory("drive_ups").toString
    import graft.operators.KeyedUpsertStore
    KeyedUpsertStore.init(spark, up,
      docs.filter("doc_id % 10 < 8").selectExpr("doc_id as k", "text as v"),
      "k", nBuckets = 16)
    val r0 = KeyedUpsertStore.rows(spark, up).count()
    require(KeyedUpsertStore.upsertBatch(spark, up,
      docs.filter("doc_id % 10 >= 8").selectExpr("doc_id as k", "text as v"),
      Seq.empty[Long].toDF("k"), batchId = 0L))
    require(KeyedUpsertStore.rows(spark, up).count() > r0)
    KeyedUpsertStore.rollbackTo(spark, up, 0L)
    require(KeyedUpsertStore.rows(spark, up).count() == r0 &&
      KeyedUpsertStore.lastBatch(spark, up) == -1L,
      "rollback must revert rows and the batch fence together")
    println(s"keyed-upsert store drive OK: $r0 base rows restored")

    // --- GRAW multimodal: pack real bytes, decode them back ---
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    val px = docs.limit(64).select(col("doc_id"),
      transform(sequence(lit(0), lit(8 * 8 * 3 - 1)),
        i => pmod(col("doc_id") * 131 + i * 7 + 13, lit(256)).cast("int"))
        .as("pixels"))
    val packed = Multimodal.packRaw(px, "doc_id", "pixels", 8, 8, 3)
    val stats = Multimodal.rawStats(packed)
      .selectExpr("id", "width", "height", "channels", "channel_means")
      .as[(Long, Int, Int, Int, Array[Double])].collect()
    require(stats.length == 64 && stats.forall { case (_, w, h, c, ms) =>
      w == 8 && h == 8 && c == 3 && ms.length == 3 }, "graw header parse")
    // oracle by formula: mean over pixels of channel ch
    stats.foreach { case (id, _, _, _, ms) =>
      for (ch <- 0 until 3) {
        val exp = (0 until 64).map(p =>
          ((id * 131 + (p * 3 + ch) * 7 + 13) % 256).toDouble).sum / 64
        require(math.abs(ms(ch) - exp) < 1e-9,
          s"graw mean mismatch id=$id ch=$ch got=${ms(ch)} exp=$exp")
      }
    }
    // JVM twin equals the columnar decode
    val one = packed.filter("id = " + stats.head._1)
      .select("media").as[Array[Byte]].head()
    val (jw, jh, jc, jm) = Multimodal.rawBytesToStats(one)
    require(jw == 8 && jh == 8 && jc == 3 &&
      jm.zip(stats.head._5).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      "graw JVM twin mismatch")
    println(s"graw drive OK: ${stats.length} blobs decoded, means match formula")
    spark.stop()
  }
}
