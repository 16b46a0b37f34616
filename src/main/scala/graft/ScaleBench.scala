package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Empirical scale validation: run the heaviest operator surfaces at 1x
  * and Nx row counts from the SAME deterministic generator and report
  * per-phase seconds, so every "would survive 100x" design claim in
  * PLANS.md gets a measured scaling exponent instead of a plan audit.
  *
  * The probes mirror the gate queries' structure (same operators, same
  * delta shapes — `q_incr_pagerank`, `q_incr_dedup_clusters`,
  * `q_incr_pipeline_clean`, `q_incr_matvec*`, `q_dedup_clusters`,
  * `q_tfidf`, `q_ann_ivf_disk`, `q_semantic_dedup`, `q_line_dedup`)
  * but parameterize the input SIZE: the
  * gates pin mod-constants (a 40x40 events matrix) that would hide
  * super-linear behavior behind fixed state. Inputs are written to
  * parquet first so scans are realistic and generation is untimed.
  *
  * Pass criterion (PERF_NOTES): at 10x rows, per-probe time grows
  * <= ~linearly (allowing log factors and fixed driver overhead);
  * residual cached blocks return to 0 after every probe — a
  * super-linear jump is a scale hazard to hunt down, the way round 6's
  * driver re-canonicalization (33 s of pure driver time) was.
  *
  * Usage: runMain graft.ScaleBench <scratchDir> <mult1> [mult2 ...]
  */
object ScaleBench {

  /** ~30-word vocab like the driver's documents table. */
  private val Vocab = Seq("spark", "line", "column", "order", "small",
    "sort", "fast", "value", "scan", "hash", "slow", "group", "batch",
    "query", "agg", "table", "key", "stream", "window", "join", "part",
    "filter", "merge", "big", "the", "a", "data", "customer", "vector",
    "grid")

  /** Documents with the sf tables' shape (avg ~40 tokens) and explicit
    * dedup structure: every id%10==9 doc is a NEAR-dup of id-1 (first
    * token differs), every id%100==50 doc is an EXACT dup of id-7.
    * Deterministic: hash-derived words, no RNG state. */
  def genDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocab = array(Vocab.map(lit): _*)
    val V = Vocab.size
    val gid = when(pmod(col("id"), lit(10L)) === 9, col("id") - 1)
      .when(pmod(col("id"), lit(100L)) === 50, col("id") - 7)
      .otherwise(col("id"))
    val ntok = (pmod(xxhash64(gid * 31 + 7), lit(72L)) + 8).cast("int")
    val mutant = pmod(col("id"), lit(10L)) === 9
    spark.range(n).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), ntok - 1), j =>
        element_at(vocab, (pmod(xxhash64(
          when(j === 0 && mutant, col("id") * 77 + 13)
            .otherwise(gid * 1009 + j.cast("long") * 9176 + 5)),
          lit(V.toLong)) + 1).cast("int"))), " ").as("text"))
  }

  /** 64-dim float vectors in 16 hash-centered clusters (the embeddings
    * table's shape). */
  def genVecs(spark: SparkSession, n: Long): DataFrame = {
    val lbl = pmod(col("id"), lit(16L))
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(63)), d => {
        val dl = d.cast("long")
        val center = pmod(xxhash64(lbl * 64 + dl + 99), lit(997L))
          .cast("double") / 997.0 - 0.5
        val noise = pmod(xxhash64(col("id") * 64 + dl), lit(1000003L))
          .cast("double") / 1000003.0 - 0.5
        center + noise * 0.2
      }).cast("array<float>").as("vec"))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).toSeq.flatten.foreach(deleteRec)
    f.delete(); ()
  }

  /** Run each multiplier in its own child JVM (same java binary, same
    * JVM args, same classpath — sequential, so peak memory is one
    * run's), echo every probe line through, and pair them into
    * exponents matched by (probe, phase). */
  private def isolated(scratch: String, mults: Array[Int]): Unit = {
    import scala.jdk.CollectionConverters._
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    val lineRe = """\{"scale":(\d+),"probe":"([^"]+)","rows":\d+,(.*)\}""".r
    val phaseRe = """"([A-Za-z0-9_]+)":([0-9.]+)""".r
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[(Int, String), Seq[(String, Double)]]
    for (m <- mults) {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", cp, "graft.ScaleBench", scratch, m.toString)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.environment().remove("SCALE_ISOLATE")
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = br.readLine()
      while (line != null) {
        println(line); Console.out.flush()
        line match {
          case lineRe(ms, probe, rest) =>
            acc((ms.toInt, probe)) = phaseRe.findAllMatchIn(rest)
              .map(g => g.group(1) -> g.group(2).toDouble).toSeq
          case _ => ()
        }
        line = br.readLine()
      }
      val ec = proc.waitFor()
      require(ec == 0, s"isolated ScaleBench x$m exited with $ec")
    }
    val mn = mults.min
    for { m <- mults.sorted.toSeq if m != mn
          ((mm, probe), ph) <- acc if mm == m
          (p, s) <- ph } {
      acc.get((mn, probe)).flatMap(_.toMap.get(p)) match {
        case Some(s0) =>
          val ratio = m.toDouble / mn
          val x = s / math.max(s0, 0.01)
          val exp = math.log(x) / math.log(ratio)
          println(f"""{"probe":"$probe","phase":"$p","rows_x":$ratio%.0f,""" +
            f""""time_x":$x%.2f,"exponent":$exp%.2f,"isolated":true}""")
        case None =>
          // a silently-missing exponent is indistinguishable from
          // "nothing to report" — say which pair had no baseline
          System.err.println(
            s"[scale] isolated: no x$mn baseline for $probe.$p — exponent skipped")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val scratch = args.headOption.getOrElse("/tmp/graft_scale")
    val mults = args.drop(1).map(_.toInt) match {
      case Array() => Array(1, 10); case ms => ms
    }
    // SCALE_ISOLATE=1: per-multiplier FRESH-JVM mode — the mechanical
    // form of the single-point protocol (round-13 verdict #6). An
    // in-process multi-multiplier run warms at mults.min and carries
    // JVM state (code cache, GC history, page cache shape) from each
    // corpus into the next: measured 20x inflation on the 100x build
    // phases inside a 1/10/100 composition vs the same code run
    // single-point (r13 PERF_NOTES). Isolation re-execs this main once
    // per multiplier (each child warms at ITS OWN scale) and pairs the
    // streamed probe lines into exponents, so cross-round exponent
    // claims cite isolation points by construction.
    if (sys.env.get("SCALE_ISOLATE").contains("1") && mults.length > 1) {
      isolated(scratch, mults)
      return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("graft.timing", "1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.LogQuiet()
    graft.functions.GraftFunctions.register(spark)

    def consume(df: DataFrame): Long = {
      // force every column of every row (count alone lets Parquet prune);
      // mod before summing — raw xxhash64 sums overflow long under ANSI
      val h = pmod(xxhash64(to_json(struct(df.columns.map(col): _*))),
        lit(1000000007L))
      df.agg(count(lit(1)), sum(h)).collect()(0).getLong(0)
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def resid(): Int =
      spark.sparkContext.getRDDStorageInfo.map(_.numCachedPartitions).sum

    // ---- deterministic inputs, written to parquet per multiplier ----
    def prep(m: Int): String = {
      val dir = s"$scratch/x$m"
      if (!new java.io.File(s"$dir/_DONE").exists) {
        genDocs(spark, 5000L * m).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
        genVecs(spark, 2000L * m).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
        graft.util.Generators.graphTyped(spark, 15000L * m, "pg")
          .write.mode("overwrite").parquet(s"$dir/edges.parquet")
        // ~150k*m cells over a (4000*m)^2 space — the gate's structure
        // (row-normalized damped Jacobi) at a dimension that scales
        graft.util.Generators.matrixPower(spark, 4000L * m, 38)
          .write.mode("overwrite").parquet(s"$dir/matrix.parquet")
        new java.io.File(s"$dir/_DONE").createNewFile()
      }
      dir
    }

    // Each probe returns (phase -> seconds) plus input rows.
    def probes(dir: String, m: Int, quiet: Boolean = false)
        : Seq[(String, Seq[(String, Double)], Long)] = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      val edges0 = spark.read.parquet(s"$dir/edges.parquet")
      val mat0 = spark.read.parquet(s"$dir/matrix.parquet")
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Seq[(String, Double)], Long)]
      // SCALE_PROBES=a,b,c restricts to named probes (targeted re-runs
      // of one surface at big multipliers without paying the full suite)
      val only = sys.env.get("SCALE_PROBES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      def run(name: String, rows: Long)(phases: => Seq[(String, Double)]): Unit = {
        if (only.exists(!_.contains(name))) return
        val ph = phases
        out += ((name, ph, rows))
        // stream each probe's line immediately: a later probe's crash
        // (e.g. an OOM the harness exists to find) must not lose the
        // measurements that already completed
        if (!quiet) {
          val phJson = ph.map { case (p, s) => s""""$p":${f"$s%.2f"}""" }
            .mkString(",")
          println(s"""{"scale":$m,"probe":"$name","rows":$rows,$phJson}""")
          Console.out.flush()
        }
        // same hygiene as Bench.drainStorage: clearCache cannot see
        // RDD-level localCheckpoint blocks (delta pins, store staging
        // leaves) — leaked ones evict later probes' working sets and
        // corrupt the very exponents this harness exists to measure.
        // Safe between probes: each probe is self-contained.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val r = resid()
        if (r != 0) System.err.println(s"[scale] RESIDUAL after $name: $r blocks")
      }

      run("dedup_clusters", 5000L * m) {
        val (_, t) = timed(consume(operators.Dedup.connectedComponents(
          operators.Dedup.simhashNearDups(docs, "doc_id", "text",
            maxHamming = 3))))
        Seq("total" -> t)
      }

      run("incr_dedup_clusters", 5000L * m) {
        val base = docs.filter(col("doc_id") % 10 =!= 3)
        val (state, tp) = timed(operators.IncrementalDedup.preserveClusters(
          base, "doc_id", "text", maxHamming = 3))
        val (_, ti) = timed {
          val outDf = operators.IncrementalDedup.incrementalClusters(state,
            docs.filter(col("doc_id") % 10 === 3),
            base.filter(col("doc_id") % 10 === 7).select("doc_id"),
            "doc_id", "text")
          val n = consume(outDf); state.release(); n
        }
        Seq("preserve" -> tp, "incremental" -> ti)
      }

      run("incr_pipeline_clean", 5000L * m) {
        val base = docs.filter(col("doc_id") % 10 =!= 3)
        val (state, tp) = timed(operators.IncrementalPipeline.preserveClean(
          base, "doc_id", "text", minQuality = 0.3, lang = "en"))
        val (_, ti) = timed {
          val corpusAfter = docs.filter(col("doc_id") % 10 =!= 7)
          val next = operators.IncrementalPipeline.continueClean(state,
            corpusAfter,
            docs.filter(col("doc_id") % 10 === 3),
            base.filter(col("doc_id") % 10 === 7).select("doc_id"),
            "doc_id", "text")
          val n = consume(operators.IncrementalPipeline
            .cleanedDocs(next, corpusAfter, "doc_id"))
          state.release(); next.release(); n
        }
        Seq("preserve" -> tp, "incremental" -> ti)
      }

      run("tfidf", 5000L * m) {
        val (_, t) = timed(consume(
          operators.Pipeline.tfidf(docs, "doc_id", "text")))
        Seq("total" -> t)
      }

      run("dup_spans", 5000L * m) {
        // windowed ExactSubstr: the ×w covered-position fan-out only
        // touches duplicated spans (the generator's id%10==9 /
        // id%100==50 dup structure), so cost must track the corpus,
        // not corpus×w
        val (_, t) = timed {
          val outDf = operators.Pipeline.dupSpanStats(docs, "doc_id",
            "text", w = 8, maxFrac = 0.5)
          val n = consume(outDf); outDf.unpersist(); n
        }
        Seq("total" -> t)
      }

      run("cut_dup_spans", 5000L * m) {
        // the ExactSubstr cut adds a corpus-wide posexplode + per-doc
        // sorted reassembly on top of the audit's coverage union — the
        // reassembly is doc-keyed (no hot key), so the shape must stay
        // ~linear like its audit sibling
        val (_, t) = timed {
          val outDf = operators.Pipeline.cutDupSpans(docs, "doc_id",
            "text", w = 8)
          val n = consume(outDf); outDf.unpersist(); n
        }
        Seq("total" -> t)
      }

      run("incr_dup_spans", 5000L * m) {
        // preserved span/frequency tables continued over a ±10% delta
        // (the generator's dup structure guarantees df-crossing flips)
        val (st0, tp) = timed(operators.IncrementalDupSpans.preserveDupSpans(
          docs.filter(col("doc_id") % 10 =!= 3), "doc_id", "text",
          w = 8, maxFrac = 0.5))
        val (_, ti) = timed {
          val st1 = operators.IncrementalDupSpans.continueDupSpans(st0,
            docs.filter(col("doc_id") % 10 === 3),
            docs.filter(col("doc_id") % 10 === 7).select("doc_id"),
            "doc_id", "text")
          val n = consume(st1.out); st0.release(); st1.release(); n
        }
        Seq("preserve" -> tp, "incremental" -> ti)
      }

      run("seg_dup_spans", 5000L * m) {
        // the SEGMENTED durable store in range-bucket mode under its
        // intended regime — contiguous "new crawl shard" appends whose
        // ids land in fresh buckets: continuation write cost must track
        // the SHARD, not the corpus (cont1pct ≪ cont10pct ≪ init),
        // which is exactly what the in-memory continuation cannot do
        // (its leaf rewrite is corpus-width — the PERF_NOTES round-8
        // named limitation this store retires)
        val n = 5000L * m
        val store = s"$dir/seg_dupspans"
        deleteRec(new java.io.File(store))
        val (_, tb) = timed(operators.DupSpansStore.init(spark, store,
          docs, "doc_id", "text", w = 8, maxFrac = 0.5,
          bucketMode = "range", rangeSpan = math.max(1L, n / 256)))
        val shard10 = genDocs(spark, n + n / 10)
          .filter(col("doc_id") >= n)
        val (_, t10) = timed(operators.DupSpansStore.continueAt(spark,
          store, shard10, spark.range(0).toDF("doc_id"),
          "doc_id", "text"))
        val shard1 = genDocs(spark, n + n / 10 + n / 100)
          .filter(col("doc_id") >= n + n / 10)
        val (_, t1) = timed(operators.DupSpansStore.continueAt(spark,
          store, shard1, spark.range(0).toDF("doc_id"),
          "doc_id", "text"))
        val shard01 = genDocs(spark, n + n / 10 + n / 100 + n / 1000)
          .filter(col("doc_id") >= n + n / 10 + n / 100)
        val (_, t01) = timed(operators.DupSpansStore.continueAt(spark,
          store, shard01, spark.range(0).toDF("doc_id"),
          "doc_id", "text"))
        val (_, tr) = timed(consume(
          operators.DupSpansStore.scores(spark, store)))
        Seq("init" -> tb, "cont10pct" -> t10, "cont1pct" -> t1,
          "cont01pct" -> t01, "read" -> tr)
      }

      run("seg_respan", 5000L * m) {
        // the STREAMED lifecycle op (round-9 "what's wrong #3" retired):
        // rebucket/compact write the lazy store views straight to
        // seg_staging — no whole-store block-manager materialization —
        // so the op's cost tracks the store's BYTES (one read + one
        // shuffled write) and its peak memory does not grow with the
        // corpus. The scenario is the REAL degradation respan exists
        // for: a range store provisioned at ~256 dirs sprawls to ~4x
        // that through contiguous shard appends (probe-verified: swaps
        // REPLACE touched dirs, so files-per-bucket never accretes —
        // dir sprawl is the thing that grows), then one journaled
        // respan collapses it back to the provisioned budget.
        val n = 5000L * m
        val span = math.max(1L, n / 256)
        val store = s"$dir/seg_respan"
        deleteRec(new java.io.File(store))
        val (_, tb) = timed(operators.DupSpansStore.init(spark, store,
          docs, "doc_id", "text", w = 8, maxFrac = 0.5,
          bucketMode = "range", rangeSpan = span))
        // sprawl: three shard appends tripling the id range (untriggered
        // — autoRespanFactor 0 — so the respan is timed on its own)
        var hi = n
        var tchurn = 0.0
        for (_ <- 1 to 3) {
          val shard = genDocs(spark, hi + n).filter(col("doc_id") >= hi)
          val (_, t) = timed(operators.DupSpansStore.continueAt(spark,
            store, shard, spark.range(0).toDF("doc_id"), "doc_id", "text",
            autoRespanFactor = 0))
          tchurn += t
          hi += n
        }
        val fs = operators.SegSwap.fsOf(spark, store)
        val dirsBefore = operators.SegSwap.liveBuckets(fs, store, "out").size
        val (_, tc) = timed(operators.DupSpansStore.rebucket(spark, store,
          nBuckets = 256, bucketMode = "range", rangeSpan = span * 4))
        val dirsAfter = operators.SegSwap.liveBuckets(fs, store, "out").size
        System.err.println(
          s"[scale] seg_respan out dirs $dirsBefore -> $dirsAfter, " +
          "files/bucket " + operators.StorePolicy.maxFilesPerBucket(spark,
            store, Seq("spans", "ntoks", "dfreq", "out")))
        val (_, trd) = timed(consume(
          operators.DupSpansStore.scores(spark, store)))
        Seq("init" -> tb, "churn3shards" -> tchurn, "respan" -> tc,
          "read" -> trd)
      }

      run("seg_tfidf", 5000L * m) {
        // the round-10 TfidfStore: durable init, a ±1% continuation
        // (upsert-shaped: fresh ids in, old ids out), and a full
        // derived-weight read. Continuation cost must track the delta's
        // token volume (touched doc buckets + touched vocabulary
        // buckets), not the corpus's.
        val n = 5000L * m
        val store = s"$dir/seg_tfidf"
        deleteRec(new java.io.File(store))
        val (_, tb) = timed(operators.TfidfStore.init(spark, store,
          docs, "doc_id", "text"))
        val fresh = genDocs(spark, n + n / 100).filter(col("doc_id") >= n)
        val (_, ti) = timed(operators.TfidfStore.continueAt(spark, store,
          fresh, docs.filter(col("doc_id") % 100 === 55).select("doc_id"),
          "doc_id", "text"))
        val (_, trd) = timed(consume(operators.TfidfStore.tfidf(spark, store)))
        Seq("init" -> tb, "cont1pct" -> ti, "read" -> trd)
      }

      run("semantic_dedup", 2000L * m) {
        // nlist scales WITH the corpus (SemDeDup's k = O(corpus size)
        // posture keeps clusters ~constant), so the pair scan's
        // Σ|cluster|² stays linear; above foldLimit=64 (m >= 5) this
        // also exercises the broadcast+max_by assignment — the
        // trained-index-scale path
        val v = vecs.select(col("id"), col("vec"))
        val (_, t) = timed {
          val outDf = operators.Similarity.semanticDedup(v,
            nlist = 16 * m, tau = 0.9)
          val n = consume(outDf); outDf.unpersist(); n
        }
        Seq("total" -> t)
      }

      run("seg_lm", 5000L * m) {
        // the incrementally-maintained LM model: init on the corpus,
        // roll ±1% deltas forward (one scattered-upsert, one
        // removal-heavy), score a fixed probe set. Continuation cost
        // must track the delta's token volume, not the corpus's
        val store = s"$dir/seg_lm"
        deleteRec(new java.io.File(store))
        val (_, tb) = timed(operators.LmCountsStore.init(spark, store,
          docs, "doc_id", "text"))
        val (_, tu) = timed(operators.LmCountsStore.continueAt(spark,
          store, docs.filter(col("doc_id") % 100 === 44),
          spark.range(0).toDF("doc_id"), "doc_id", "text"))
        val (_, tr) = timed(operators.LmCountsStore.continueAt(spark,
          store, spark.range(0).selectExpr("id as doc_id", "'' as text"),
          docs.filter(col("doc_id") % 100 === 55).select("doc_id"),
          "doc_id", "text"))
        val (_, tq) = timed(consume(operators.LmCountsStore.scoreAgainst(
          spark, store, docs.filter(col("doc_id") < 100),
          "doc_id", "text")))
        // the shard-append point: a contiguous crawl shard against a
        // HASH-mode store scatters across every contribution bucket,
        // against a RANGE-mode store it lands in fresh buckets only —
        // shard_range must beat shard_hash and the gap must widen with
        // the corpus (the contribution tables' width). BOTH stores are
        // freshly inited on the pristine corpus so the comparison
        // isolates bucket-mode scatter (timing the hash append against
        // the churned store above would bias it with accreted files
        // and a ±2% different doc set)
        val n = 5000L * m
        val shard = genDocs(spark, n + n / 100).filter(col("doc_id") >= n)
        val storeH = s"$dir/seg_lm_hash2"
        deleteRec(new java.io.File(storeH))
        operators.LmCountsStore.init(spark, storeH, docs, "doc_id", "text")
        val (_, tsh) = timed(operators.LmCountsStore.continueAt(spark,
          storeH, shard, spark.range(0).toDF("doc_id"), "doc_id", "text"))
        val storeR = s"$dir/seg_lm_range"
        deleteRec(new java.io.File(storeR))
        operators.LmCountsStore.init(spark, storeR, docs, "doc_id",
          "text", bucketMode = "range",
          rangeSpan = math.max(1L, n / 256))
        val (_, tsr) = timed(operators.LmCountsStore.continueAt(spark,
          storeR, shard, spark.range(0).toDF("doc_id"), "doc_id", "text"))
        Seq("init" -> tb, "upsert1pct" -> tu, "remove1pct" -> tr,
          "score" -> tq, "shard_hash" -> tsh, "shard_range" -> tsr)
      }

      run("seg_timetravel", 5000L * m) {
        // the round-10 snapshot/rollback layer, measured in its two
        // production shapes. (a) RANGE-mode LM store + contiguous
        // crawl-shard append — the poisoned-shard scenario: the shard
        // lands in FRESH buckets, so the revert journals them "empty"
        // and restages almost nothing; rb_range must stay near-flat in
        // m (the revert is delta-proportional, and a created-only
        // delta is near O(1)). (b) HASH-mode TfidfStore + scattered
        // ±1% delta: the delta hashes across every bucket, so both the
        // as-of read (snapread — pre-delta weights while the store is
        // post-delta) and the revert pay touched-bucket width — the
        // same economics as the continuation itself, stated honestly.
        val n = 5000L * m
        val shard = genDocs(spark, n + n / 100).filter(col("doc_id") >= n)
        val storeR = s"$dir/seg_tt_lm"
        deleteRec(new java.io.File(storeR))
        operators.LmCountsStore.init(spark, storeR, docs, "doc_id",
          "text", bucketMode = "range", rangeSpan = math.max(1L, n / 256))
        operators.LmCountsStore.continueAt(spark, storeR, shard,
          spark.range(0).toDF("doc_id"), "doc_id", "text")
        val (_, trr) = timed(
          operators.LmCountsStore.rollbackTo(spark, storeR, 0L))

        val storeT = s"$dir/seg_tt_tfidf"
        deleteRec(new java.io.File(storeT))
        operators.TfidfStore.init(spark, storeT, docs, "doc_id", "text")
        operators.TfidfStore.continueAt(spark, storeT, shard,
          docs.filter(col("doc_id") % 100 === 55).select("doc_id"),
          "doc_id", "text")
        val (_, tsr) = timed(consume(
          operators.TfidfStore.tfidfAt(spark, storeT, 0L)))
        val (_, trh) = timed(
          operators.TfidfStore.rollbackTo(spark, storeT, 0L))
        val (_, trd) = timed(
          operators.TfidfStore.rollbackTo(spark, storeT, 1L))
        Seq("rb_range" -> trr, "snapread" -> tsr, "rb_hash" -> trh,
          "redo_hash" -> trd)
      }

      run("forget", 5000L * m) {
        // deletion propagation at scale: the sweep is ordinary removal
        // continuations under one txn (cost = the purged cohort's
        // touched buckets per store + O(#stores) manifest/pin
        // bookkeeping), and the scrub is pure metadata (deleting the
        // sweep's own retired buckets + the floor write). For a
        // fixed-FRACTION purge both must scale like the continuations
        // they are made of — ~linear in the purged bytes, never in
        // history depth.
        val tp = s"$dir/forget_tfidf"; val lp = s"$dir/forget_lm"
        deleteRec(new java.io.File(tp)); deleteRec(new java.io.File(lp))
        val (_, tb) = timed {
          operators.TfidfStore.init(spark, tp, docs, "doc_id", "text")
          operators.LmCountsStore.init(spark, lp, docs, "doc_id", "text")
        }
        val purge = docs.filter(col("doc_id") % 100 === 55).select("doc_id")
        val stores = Seq("tfidf" -> tp, "lmcounts" -> lp)
        val (_, ts) = timed(operators.Forget.sweep(spark,
          s"$dir/forget_txn", purge, "doc_id", "text", stores,
          scrubHistory = false))
        val (_, tg) = timed(stores.foreach { case (_, p) =>
          operators.Forget.scrub(spark, p) })
        val (_, trd) = timed(consume(operators.TfidfStore.tfidf(spark, tp)))
        Seq("init" -> tb, "sweep1pct" -> ts, "scrub" -> tg, "read" -> trd)
      }

      run("lm_score", 5000L * m) {
        // bigram-count joins are the heaviest text-stat shape (corpus
        // bigram table ~ corpus token count): cost must stay ~linear
        // and the Zipf-skewed unigram probe must not funnel one task
        val (_, t) = timed(consume(
          operators.Pipeline.lmScore(docs, "doc_id", "text")))
        Seq("total" -> t)
      }

      run("line_dedup", 5000L * m) {
        // the q_line_dedup shape: a footer hot across EVERY doc (the
        // doc-frequency count must combine map-side, not funnel one
        // key) plus a unique line per doc
        val aug = docs.select(col("doc_id"), concat_ws("\n", col("text"),
          lit("common boilerplate footer line"),
          concat(lit("sig "), col("doc_id"))).as("text"))
        val (_, t) = timed {
          val outDf = operators.Pipeline.dedupLines(aug, "doc_id", "text",
            maxDocs = 100)
          val n = consume(outDf); outDf.unpersist(); n
        }
        Seq("total" -> t)
      }

      run("incr_line_dedup", 5000L * m) {
        // the q_incr_line_dedup shape: preserve the augmented corpus's
        // line/doc-frequency tables, then continue over a ±10% delta —
        // continuation cost must track the DELTA, not the corpus
        def aug(df: DataFrame) = df.select(col("doc_id"),
          concat_ws("\n", col("text"),
            lit("common boilerplate footer line"),
            concat(lit("cohort "), col("doc_id") % 35),
            concat(lit("sig "), col("doc_id"))).as("text"))
        val base = aug(docs.filter(col("doc_id") % 10 =!= 3))
        val (st0, tp) = timed(operators.IncrementalLineDedup.preserveLines(
          base, "doc_id", "text", maxDocs = 100))
        val (_, ti) = timed {
          val st1 = operators.IncrementalLineDedup.continueLines(st0,
            aug(docs.filter(col("doc_id") % 10 === 3)),
            docs.filter(col("doc_id") % 10 === 7).select("doc_id"),
            "doc_id", "text")
          val n = consume(st1.out); st0.release(); st1.release(); n
        }
        Seq("preserve" -> tp, "incremental" -> ti)
      }

      run("ann_ivf_disk", 2000L * m) {
        val v = vecs.select(col("id"), col("vec"))
        val idx = s"$dir/ivf_idx"
        deleteRec(new java.io.File(idx))
        val (_, tb) = timed(operators.Similarity.buildIvfIndex(v, idx,
          nlist = 16))
        val (_, tq) = timed(consume(operators.Similarity.probeIvfIndex(
          spark, idx, v.filter(col("id") < 5), k = 5, nprobe = 4)))
        Seq("build" -> tb, "probe" -> tq)
      }

      run("ann_pq", 2000L * m) {
        // the COMPRESSED index at the same corpus/probe shape as
        // ann_ivf_disk: the probe's ADC pass reads code columns only
        // (m ints + 1 double vs 64 doubles per row — the 100 TB claim),
        // raw vectors touched for |q|·rerank candidate rows alone.
        // Comparable phases: build (quantize + encode + lay out) and
        // probe (coarse prune → ADC → exact rerank).
        val v = vecs.select(col("id"), col("vec"))
        val idx = s"$dir/ivfpq_idx"
        deleteRec(new java.io.File(idx))
        val (_, tb) = timed(operators.Pq.buildIvfPqIndex(v, idx,
          nlist = 16, m = 8, ksub = 16))
        val (_, tq) = timed(consume(operators.Pq.probeIvfPqIndex(
          spark, idx, v.filter(col("id") < 5), k = 5, nprobe = 4,
          rerank = 32)))
        // list bytes on disk: the compression the scan side actually
        // sees (codes+norm+colocated raw vs raw-only lists)
        def du(p: String): Long = {
          def sz(f: java.io.File): Long =
            if (f.isDirectory)
              Option(f.listFiles).toSeq.flatten.map(sz).sum
            else f.length
          sz(new java.io.File(p))
        }
        // the RESIDUAL (IVFADC) form at the same shape: per-vector scan
        // cost must match raw (same m lookups + m adds; the qcdot term
        // rides the |q|·nprobe probe frame), build pays the extra
        // centroid join + reconstruction norm
        val idxR = s"$dir/ivfpq_res_idx"
        deleteRec(new java.io.File(idxR))
        val (_, tbr) = timed(operators.Pq.buildIvfPqIndex(v, idxR,
          nlist = 16, m = 8, ksub = 16, residual = true))
        val (_, tqr) = timed(consume(operators.Pq.probeIvfPqIndex(
          spark, idxR, v.filter(col("id") < 5), k = 5, nprobe = 4,
          rerank = 32)))
        Seq("build" -> tb, "probe" -> tq,
          "build_res" -> tbr, "probe_res" -> tqr,
          "lists_mb" -> du(s"$idx/lists").toDouble / (1 << 20))
      }

      run("stream_ivf", 2000L * m) {
        // the 24/7 ANN maintainer at FIXED delta across the corpus
        // decade: per-batch cost must track the touched lists, not the
        // corpus (StreamMaintain.ivfBatch → updateIvfIndex fenced
        // path: locate over (cid, nid) columns, rewrite touched cid
        // partitions only). Batch 1 upserts 50 vectors; batch 2
        // removes 20 of them via op="D".
        val v = vecs.select(col("id"), col("vec"))
        val idx = s"$dir/ivf_stream_idx"
        deleteRec(new java.io.File(idx))
        // nlist scales with the corpus (the SemDeDup k=O(√n) rule) so
        // per-list width stays ~constant and "touched lists" means the
        // same fraction of work at every multiplier
        val nlist = 16 * math.max(1, math.sqrt(m.toDouble).toInt)
        val (_, tb) = timed(operators.Similarity.buildIvfIndex(v, idx,
          nlist = nlist))
        val up = v.filter(col("id") % 40L === 7L).limit(50)
          .select(col("id"), col("vec"), lit("U").as("op"))
          .localCheckpoint(true)
        val (_, t1) = timed(streaming.StreamMaintain.ivfBatch(spark, idx,
          up, 0L))
        val del = up.limit(20)
          .select(col("id"), lit(null).cast("array<double>").as("vec"),
            lit("D").as("op")).localCheckpoint(true)
        val (_, t2) = timed(streaming.StreamMaintain.ivfBatch(spark, idx,
          del, 1L))
        up.unpersist(blocking = false); del.unpersist(blocking = false)
        Seq("build" -> tb, "upsert_batch" -> t1, "delete_batch" -> t2)
      }

      run("stream_kmeans", 2000L * m) {
        // the ONE2ALL maintainer at fixed delta: the first hop is
        // delta-pruned, but any center that moves re-dirties every
        // point — the follow-up iterations are full Lloyd steps BY
        // SEMANTICS (each point's assignment depends on all centers),
        // so the per-batch bound is O(corpus·k), not O(delta). The
        // probe pins that the store machinery adds nothing beyond that
        // semantic bound (exp ~<= 1 on the batch legs, where the
        // One2One twins hold ~0) and that the point-store upsert stays
        // delta-shaped.
        val pts = vecs.select(col("id"),
          col("vec").cast("array<double>").as("vec"))
        val centerStore = s"$dir/km_stream_centers"
        val pointStore = s"$dir/km_stream_points"
        deleteRec(new java.io.File(centerStore))
        deleteRec(new java.io.File(pointStore))
        val (_, tp) = timed {
          algorithms.IncrementalKMeans.preserveToSeg(spark, centerStore,
            pts, k = 8, iterations = 2, nBuckets = 8)
          algorithms.IncrementalKMeans.initPointStore(spark, pointStore,
            pts, nBuckets = 32)
        }
        val up = pts.filter(col("id") % 40L === 7L).limit(50)
          .select(col("id"),
            transform(col("vec"), x => x * 0.5).as("vec"),
            lit("U").as("op"))
          .localCheckpoint(true)
        val (_, t1) = timed(streaming.StreamMaintain.kmeansBatch(spark,
          centerStore, pointStore, up, 0L, iterations = 2))
        val del = up.limit(20)
          .select(col("id"), lit(null).cast("array<double>").as("vec"),
            lit("D").as("op")).localCheckpoint(true)
        val (_, t2) = timed(streaming.StreamMaintain.kmeansBatch(spark,
          centerStore, pointStore, del, 1L, iterations = 2))
        up.unpersist(blocking = false); del.unpersist(blocking = false)
        Seq("init" -> tp, "upsert_batch" -> t1, "delete_batch" -> t2)
      }

      run("seg_pagerank", 15000L * m) {
        // the SEGMENTED generic preserved state (SegmentedStateStore +
        // IncrementalJob store mode) — the crossover table: one durable
        // init, then continuations at 10% / 0.1% / 0.01% / 0.001%
        // source deltas. Continuation cost must be MONOTONE in the
        // delta (lazy base segments + touched-bucket-only commit),
        // where durableStatePath mode re-materialized the whole kvs/out
        // per continuation. PROVISIONING RULE measured by this probe:
        // a scattered delta whose 3-hop affected-key count reaches B
        // touches every bucket — commit degenerates to a full rewrite
        // paying per-bucket-dir file overhead (first run of this probe
        // measured 97 s for a 2560-bucket full rewrite of 630k rows —
        // tiny files, pure writer overhead), so B is provisioned like a
        // production store: big enough to prune typical deltas, small
        // enough that buckets hold real bytes. B=512 here puts the big
        // deltas in the (honest) saturation regime and the small ones
        // in the pruned regime — the curve between them is the win.
        val edges1 = edges0.persist(StorageLevel.MEMORY_AND_DISK)
        val store = s"$dir/seg_pagerank"
        deleteRec(new java.io.File(store))
        val (preserved, tp) = timed(algorithms.IncrementalPageRank.preserve(
          edges1, 0.8, iterations = 4))
        val (_, tinit) = timed {
          core.SegmentedStateStore.init(spark, store, preserved, "node",
            nBuckets = 512)
          preserved.release()
        }
        // the graph EVOLVES across the chain: each delta derives from
        // the previous continuation's graph, so the store's committed
        // state and the passed updatedEdges always describe the same
        // graph (deriving every delta from edges1 would hand the later
        // continuations a static side inconsistent with the state —
        // semantically invalid timings)
        var cur = edges1
        def cont(everyNth: Int): Double = {
          val (edges2raw, chg, _) =
            graft.util.Generators.graphDelta(cur, everyNth, 15000L * m)
          val edges2 = edges2raw.persist(StorageLevel.MEMORY_AND_DISK)
          edges2.count()
          val (_, t) = timed(
            consume(algorithms.IncrementalPageRank.incrementalSeg(spark,
              store, edges2, chg.select(col("src")), 0.8,
              iterations = 3, filterThreshold = 0.0)))
          if (!(cur eq edges1)) cur.unpersist(blocking = false)
          cur = edges2
          t
        }
        val t10 = cont(10); val t01 = cont(1000)
        val t001 = cont(10000); val t0001 = cont(100000)
        // the snapshot layer's scale claims, measured on the chain's
        // store (epoch = 4 continuations deep, retention 2):
        //  - snapRead: re-resolving the PREVIOUS epoch (retired buckets
        //    of the last 0.001% delta + untouched live) must cost ~a
        //    live read — resolution is metadata + the same pruned scan;
        //  - rollback: reverting that delta must be DELTA-proportional
        //    (touched buckets only), nowhere near a preserve/init
        val st = core.SegmentedStateStore.openForRead(spark, store)
        val eNow = st.currentEpoch
        val (_, tLive) = timed(consume(st.preserved.out))
        val (_, tSnap) = timed(consume(st.snapshotAt(eNow - 1).out))
        val (_, tRoll) = timed(st.rollbackTo(eNow - 1))
        if (!(cur eq edges1)) cur.unpersist(blocking = false)
        edges1.unpersist()
        Seq("preserve" -> tp, "init" -> tinit, "cont10pct" -> t10,
          "cont01pct" -> t01, "cont001pct" -> t001,
          "cont0001pct" -> t0001, "liveRead" -> tLive,
          "snapRead" -> tSnap, "rollback0001pct" -> tRoll)
      }

      run("stream_static", 15000L * m) {
        // the round-11 O(delta) stream maintainer: rank store + durable
        // PREPARED edge store, then FIXED-SIZE delta batches through
        // StreamMaintain.pageRankBatch (the foreachBatch body — the
        // unit a 24/7 stream pays per trigger). The batch reads both
        // stores pruned to the frontier's buckets and upserts only the
        // changed keys' buckets, so at fixed delta the per-batch cost
        // must be ~FLAT in corpus size (exponent ~0) — where the
        // round-10 shape (full edge read + full-graph localCheckpoint
        // + corpus-wide degree recompute) scaled with the corpus.
        val edges1 = edges0.persist(StorageLevel.MEMORY_AND_DISK)
        val store = s"$dir/stream_rank"
        val estore = s"$dir/stream_edges"
        deleteRec(new java.io.File(store))
        deleteRec(new java.io.File(estore))
        val (_, tp) = timed {
          algorithms.IncrementalPageRank.preserveTo(spark, store, edges1,
            0.8, iterations = 4, nBuckets = 512)
          algorithms.IncrementalPageRank.initEdgeStore(spark, estore,
            edges1, nBuckets = 512)
        }
        // fixed-size deltas (50 sources rewired) regardless of corpus
        // scale — batch 2 is the steady-state point (batch 1 may absorb
        // store-path codegen)
        val b1 = edges1.filter(col("src") < 50)
          .select(col("src"), (col("dst") + 1).as("dst"))
          .localCheckpoint(true)
        val (_, tb1) = timed(streaming.StreamMaintain.pageRankBatch(
          spark, store, estore, b1, 0L, 0.8, iterations = 3))
        val b2 = edges1.filter(col("src") >= 50 && col("src") < 100)
          .select(col("src"), (col("dst") + 2).as("dst"))
          .localCheckpoint(true)
        val (_, tb2) = timed(streaming.StreamMaintain.pageRankBatch(
          spark, store, estore, b2, 1L, 0.8, iterations = 3))
        edges1.unpersist()
        Seq("init" -> tp, "batch1" -> tb1, "batch2" -> tb2)
      }

      run("upsert_rebucket", 15000L * m) {
        // FROZEN-B erosion and its cure (round-11 verdict missing #2).
        // Two regimes bound a store's bucket provisioning, and this
        // probe pins the one a long-lived maintainer drifts into:
        // per-upsert cost is O(touched buckets x width) DATA plus
        // O(live dirs) METADATA. A B frozen at init (here 4 — the
        // pathological end, so the widths dominate within probe-scale
        // data) makes a FIXED 5-source upsert rewrite ~the whole
        // corpus once the corpus outgrows B (data term ∝ m);
        // KeyedUpsertStore.rebucket to a corpus-proportional B (4·m —
        // constant width) must restore near-flat upsert cost. The
        // inverse regime is real too and was measured by this probe's
        // first draft: rebucketing a ~30 MB corpus to 3200 dirs made
        // upserts SLOWER (7.99 s vs 1.54 s frozen at 100x) — dir-
        // listing metadata swamps tiny widths, the round-9
        // provisioning rule (O(task-sized) bytes per bucket) seen
        // from the other side. Width the store by DATA, not by a
        // fixed dir-count formula.
        val edges1 = edges0.persist(StorageLevel.MEMORY_AND_DISK)
        val estore = s"$dir/rbk_edges"
        deleteRec(new java.io.File(estore))
        algorithms.IncrementalPageRank.initEdgeStore(spark, estore,
          edges1, nBuckets = 4)
        def delta(lo: Long) = algorithms.IncrementalPageRank.prepareBatch(
          edges1.filter(col("src") >= lo && col("src") < lo + 5)
            .select(col("src"), (col("dst") + 1).as("dst")))
          .localCheckpoint(true)
        val none = spark.range(0).toDF("src")
        val d1 = delta(0)
        val (_, tFrozen) = timed(operators.KeyedUpsertStore.upsertBatch(
          spark, estore, d1, none, 0L))
        val (_, tReb) = timed(operators.KeyedUpsertStore.rebucket(
          spark, estore, 4 * m))
        val d2 = delta(5)
        val (_, tAfter) = timed(operators.KeyedUpsertStore.upsertBatch(
          spark, estore, d2, none, 1L))
        edges1.unpersist()
        Seq("upsertFrozenB" -> tFrozen, "rebucket" -> tReb,
          "upsertRebucketed" -> tAfter)
      }

      run("seg_retention", 5000L * m) {
        // snapshot-layer cost attribution (round-10 verdict #6): the
        // SAME ±1% scattered continuation pair under retention 0 / 2 /
        // 8. Every commit retires its touched buckets and, past the
        // horizon, GCs its oldest retired epoch — both O(touched)
        // metadata + renames — so the three times must be ~equal (the
        // horizon bounds retained BYTES, not per-commit work). A ret8
        // time growing past ret0's would falsify the "bookkeeping is
        // O(touched)" claim and mark the snapshot layer as real
        // per-commit data cost.
        val n = 5000L * m
        val fresh1 = genDocs(spark, n + n / 100).filter(col("doc_id") >= n)
        val fresh2 = genDocs(spark, n + 2 * (n / 100))
          .filter(col("doc_id") >= n + n / 100)
        val rem = docs.filter(col("doc_id") % 100 === 55).select("doc_id")
        def contPair(r: Int): Double = {
          val store = s"$dir/seg_ret_$r"
          deleteRec(new java.io.File(store))
          operators.TfidfStore.init(spark, store, docs, "doc_id", "text")
          operators.SegSwap.setRetention(
            operators.SegSwap.fsOf(spark, store), store, r)
          val (_, t1) = timed(operators.TfidfStore.continueAt(spark,
            store, fresh1, rem, "doc_id", "text"))
          // the second commit runs at a full horizon: for ret0 it GCs
          // the first's retired buckets immediately — steady state
          val (_, t2) = timed(operators.TfidfStore.continueAt(spark,
            store, fresh2, spark.range(0).toDF("doc_id"),
            "doc_id", "text"))
          t1 + t2
        }
        Seq("ret0" -> contPair(0), "ret2" -> contPair(2),
          "ret8" -> contPair(8))
      }

      run("incr_pagerank", 15000L * m) {
        val edges1 = edges0
          .persist(StorageLevel.MEMORY_AND_DISK)
        val (preserved, tp) = timed(algorithms.IncrementalPageRank.preserve(
          edges1, 0.8, iterations = 4))
        val (_, ti) = timed {
          val (edges2, chg, _) =
            graft.util.Generators.graphDelta(edges1, 10, 15000L * m)
          consume(algorithms.IncrementalPageRank.incremental(
            edges2, preserved, chg.select(col("src")), 0.8,
            iterations = 3, filterThreshold = 0.0))
        }
        edges1.unpersist()
        Seq("preserve" -> tp, "incremental" -> ti)
      }

      def normMat(): DataFrame = {
        val rs = mat0.groupBy("i").agg(sum(abs(col("v"))).as("rs"))
        mat0.join(rs, "i")
          .select(col("i"), col("j"), (col("v") / col("rs") * 0.8).as("v"))
      }

      run("incr_matvec", 150000L * m) {
        val m1 = normMat().persist(StorageLevel.MEMORY_AND_DISK)
        val b = algorithms.IncrementalMatVec.universe(m1, 0.2)
        val (preserved, tp) = timed(algorithms.IncrementalMatVec.preserve(
          m1, b, iterations = 4))
        val (_, ti) = timed {
          val chg = m1.filter(col("j") % 10 === 3).select("j").distinct()
          val m2 = m1.withColumn("v",
            when(col("j") % 10 === 3, col("v") * 0.5).otherwise(col("v")))
          consume(algorithms.IncrementalMatVec.incremental(m2, b, preserved,
            chg, iterations = 3, filterThreshold = 0.0))
        }
        m1.unpersist()
        Seq("preserve" -> tp, "incremental" -> ti)
      }

      run("stream_static_mv", 150000L * m) {
        // the MATVEC twin of stream_static (round-11 verdict #5): the
        // O(delta) stream-maintenance shape must be algorithm-agnostic
        // in MEASUREMENT, not just in specs — fixed 50-column deltas
        // through StreamMaintain.matvecBatch against the durable
        // state + cell stores; per-batch cost must stay ~flat in
        // corpus size (exponent ~0), like the PageRank probe.
        val m1 = normMat().persist(StorageLevel.MEMORY_AND_DISK)
        val bvec = algorithms.IncrementalMatVec.universe(m1, 0.2)
          .localCheckpoint(true)
        val sp = s"$dir/stream_mv_state"
        val cp = s"$dir/stream_mv_cells"
        deleteRec(new java.io.File(sp))
        deleteRec(new java.io.File(cp))
        val (_, tp) = timed {
          algorithms.IncrementalMatVec.preserveTo(spark, sp, m1, bvec,
            iterations = 4, nBuckets = 512)
          algorithms.IncrementalMatVec.initCellStore(spark, cp, m1,
            nBuckets = 512)
        }
        val b1 = m1.filter(col("j") < 50)
          .select(col("i"), col("j"), (col("v") * 0.5).as("v"))
          .localCheckpoint(true)
        val (_, tb1) = timed(streaming.StreamMaintain.matvecBatch(
          spark, sp, cp, b1, 0L, bvec, iterations = 3))
        val b2 = m1.filter(col("j") >= 50 && col("j") < 100)
          .select(col("i"), col("j"), (col("v") * 0.5).as("v"))
          .localCheckpoint(true)
        val (_, tb2) = timed(streaming.StreamMaintain.matvecBatch(
          spark, sp, cp, b2, 1L, bvec, iterations = 3))
        m1.unpersist()
        Seq("init" -> tp, "batch1" -> tb1, "batch2" -> tb2)
      }

      run("incr_matvec_blocked", 150000L * m) {
        val m1 = normMat().persist(StorageLevel.MEMORY_AND_DISK)
        val b = algorithms.IncrementalMatVec.universe(m1, 0.2)
        // density-aware: a FIXED block size degenerates as the dimension
        // grows at constant row degree (~1 cell/tile at 100x → the tile
        // layer is pure overhead; OOMed an 8g heap before this rule)
        val blockSize = algorithms.IncrementalMatVec
          .tileSizeFor(dim = 4000L * m, nnz = 150000L * m)
        System.err.println(s"[scale] blocked probe blockSize=$blockSize")
        val (preserved, tp) = timed(algorithms.IncrementalMatVec
          .preserveBlocked(m1, b, blockSize, iterations = 4))
        val (_, ti) = timed {
          val chg = m1.filter(col("j") % 10 === 3)
            .select(algorithms.IncrementalMatVec
              .tileId(col("i"), col("j"), blockSize).as("tid")).distinct()
          val m2 = m1.withColumn("v",
            when(col("j") % 10 === 3, col("v") * 0.5).otherwise(col("v")))
          consume(algorithms.IncrementalMatVec.incrementalBlocked(m2, b,
            preserved, chg, blockSize, iterations = 3, filterThreshold = 0.0))
        }
        m1.unpersist()
        Seq("preserve" -> tp, "incremental" -> ti)
      }

      run("multimodal", 5000L * m) {
        // the codec paths are embarrassingly parallel mapPartitions /
        // codegen'd byte math — this pins their decode throughput to
        // exponent ~1 (linear in media count) with zero driver
        // involvement, per format class: raw byte math (GRAW), real
        // DEFLATE (PNG), signed-LE16 audio (WAV)
        val px = docs.select(col("doc_id"),
          transform(sequence(lit(0), lit(8 * 8 * 3 - 1)),
            i => pmod(col("doc_id") * 131 + i * 7 + 13, lit(256))
              .cast("int")).as("pixels"))
        val smp = docs.select(col("doc_id"),
          transform(sequence(lit(0), lit(2 * 64 - 1)),
            i => (pmod(col("doc_id") * 37 + i * 11, lit(20001)) - 10000)
              .cast("int")).as("samples"))
        val (_, tg) = timed(consume(operators.Multimodal.rawStats(
          operators.Multimodal.packRaw(px, "doc_id", "pixels", 8, 8, 3))))
        val (_, tp) = timed(consume(operators.Multimodal.pngStats(
          operators.Multimodal.packPng(px, "doc_id", "pixels", 8, 8))))
        val (_, tw) = timed(consume(operators.Multimodal.wavStats(
          operators.Multimodal.packWav(smp, "doc_id", "samples",
            channels = 2, sampleRate = 16000))))
        Seq("graw" -> tg, "png" -> tp, "wav" -> tw)
      }

      run("stream_blocked_mv", 150000L * m) {
        // the ONE2MUL maintainer's measurement (round-13 verdict #2's
        // "done" criterion): fixed 50-column deltas through
        // StreamMaintain.blockedMatvecBatch against the maintained
        // tiling — the tile index (jb-pruned backProject discovery)
        // and tid-pruned bag reads must keep per-batch cost ~flat in
        // corpus size, like the scalar stream_static_mv twin; a
        // corpus-wide re-tiling anywhere in the batch path would show
        // as exponent ~1 here
        val m1 = normMat().persist(StorageLevel.MEMORY_AND_DISK)
        val bvec = algorithms.IncrementalMatVec.universe(m1, 0.2)
          .localCheckpoint(true)
        val blockSize = algorithms.IncrementalMatVec
          .tileSizeFor(dim = 4000L * m, nnz = 150000L * m)
        val sp = s"$dir/stream_bmv_state"
        val ts = s"$dir/stream_bmv_tiles"
        deleteRec(new java.io.File(sp))
        deleteRec(new java.io.File(ts))
        val (_, tp) = timed {
          algorithms.IncrementalMatVec.preserveBlockedTo(spark, sp, m1,
            bvec, blockSize, iterations = 4, nBuckets = 512)
          operators.TiledMatrixStore.init(spark, ts, m1, blockSize,
            cellBuckets = 512, tileBuckets = 512, idxBuckets = 16)
        }
        val b1 = m1.filter(col("j") < 50)
          .select(col("i"), col("j"), (col("v") * 0.5).as("v"))
          .localCheckpoint(true)
        val (_, tb1) = timed(streaming.StreamMaintain.blockedMatvecBatch(
          spark, sp, ts, b1, 0L, bvec, iterations = 3))
        val b2 = m1.filter(col("j") >= 50 && col("j") < 100)
          .select(col("i"), col("j"), (col("v") * 0.5).as("v"))
          .localCheckpoint(true)
        val (_, tb2) = timed(streaming.StreamMaintain.blockedMatvecBatch(
          spark, sp, ts, b2, 1L, bvec, iterations = 3))
        m1.unpersist()
        Seq("init" -> tp, "batch1" -> tb1, "batch2" -> tb2)
      }

      run("stream_blocked_mv_theta", 150000L * m) {
        // the θ>0 vs θ=0 PAIR (round-14 verdict #1b), designed after
        // two instructive failed drafts. (1) θ batches appended to the
        // θ=0 probe's chain confound the comparison with chain
        // position (epoch-GC width rides later batches). (2) On an
        // UNCONVERGED base (the θ=0 probe's 4-iteration preserve —
        // fine for θ=0, which never reads distances) the filter can
        // never fire: a tile-granular re-reduce advances every
        // sibling row by a Jacobi CONVERGENCE step (~0.8^k of the
        // remaining error, O(0.1) at k=4 — measured: iter-2 frontier
        // 387,938 of 400,000 affected at θ=5e-3), so movement
        // reflects convergence progress, not the delta. The θ lever's
        // contract — like the reference's — is a continuation from a
        // CONVERGED base, where movement IS the delta's.
        // So: both sides here preserve at 40 iterations (residual
        // Jacobi step ~0.8^40 ≈ 1e-4, a decade under θ), then the
        // SAME batch-0 delta runs θ=0 on one fresh store pair and
        // θ=1e-3 on another — θ is the only variable. What the cap
        // buys at the BLOCKED granularity is the frontier EMPTYING:
        // round-1 movers are the ~1900 direct targets (~1e-2 ≥ θ),
        // and at 100x a row's round-2 summed movement is
        // ~38·(1900/400k)·0.02·0.01 ≈ 4e-5 < θ — the frontier dies,
        // round 3 + the corpus-wide exit refresh never run. At 1x the
        // same sum is ~3.6e-3 ≥ θ (the delta is DENSE relative to a
        // 4k-dim corpus) — the cap engages BY SCALE, which is exactly
        // the production claim: fixed delta, growing corpus →
        // θ-capped batch cost goes flat while θ=0 pays structural
        // reach (movers scatter across ~every column block, and
        // tile-granular re-dirty is block-wide by design).
        val theta = 1e-3
        val m1 = normMat().persist(StorageLevel.MEMORY_AND_DISK)
        val bvec = algorithms.IncrementalMatVec.universe(m1, 0.2)
          .localCheckpoint(true)
        val blockSize = algorithms.IncrementalMatVec
          .tileSizeFor(dim = 4000L * m, nnz = 150000L * m)
        def mkStores(tag: String): (String, String) = {
          val sp = s"$dir/stream_bmvth_${tag}_state"
          val ts = s"$dir/stream_bmvth_${tag}_tiles"
          deleteRec(new java.io.File(sp))
          deleteRec(new java.io.File(ts))
          algorithms.IncrementalMatVec.preserveBlockedTo(spark, sp, m1,
            bvec, blockSize, iterations = 40, nBuckets = 512)
          operators.TiledMatrixStore.init(spark, ts, m1, blockSize,
            cellBuckets = 512, tileBuckets = 512, idxBuckets = 16)
          (sp, ts)
        }
        val ((sp0, ts0), tInit0) = timed(mkStores("t0"))
        val ((spT, tsT), tInitT) = timed(mkStores("th"))
        val b1 = m1.filter(col("j") < 50)
          .select(col("i"), col("j"), (col("v") * 0.5).as("v"))
          .localCheckpoint(true)
        val (_, tb0) = timed(streaming.StreamMaintain.blockedMatvecBatch(
          spark, sp0, ts0, b1, 0L, bvec, iterations = 3))
        val (_, tbt) = timed(streaming.StreamMaintain.blockedMatvecBatch(
          spark, spT, tsT, b1, 0L, bvec, iterations = 3,
          filterThreshold = theta))
        m1.unpersist()
        Seq("init" -> (tInit0 + tInitT), "batch_t0" -> tb0,
          "batch_theta" -> tbt)
      }

      run("ann_recall_sweep", 2000L * m) {
        // the deployment-lever table (round-14 verdict #6): recall@5
        // AND probe cost across nprobe × rerank for BOTH PQ layouts —
        // the operating-point sweep q_ann_recall measures one point of
        // (np=4, rr=10). Phases are a mixed namespace: r_* values are
        // recall fractions (NOT seconds — meaningless as scaling
        // exponents; run this probe single-point via
        // SCALE_PROBES=ann_recall_sweep), t_* are probe seconds.
        val v = vecs.select(col("id"), col("vec"))
        val queries = v.filter(col("id") < 8)
        val nq = queries.count().toDouble
        val bf = operators.Similarity.bruteForceTopK(v, queries, k = 5)
          .select(col("qid"), col("nid"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        bf.count()
        val rawIdx = s"$dir/recall_sweep_raw"
        val resIdx = s"$dir/recall_sweep_res"
        deleteRec(new java.io.File(rawIdx))
        deleteRec(new java.io.File(resIdx))
        // nlist = 4x the generator's 16 natural clusters: with
        // nlist=16 the coarse quantizer IS the cluster structure and
        // nprobe saturates at 1 (measured — recall flat across
        // nprobe 1..8); over-partitioned lists make the nprobe lever
        // real, which is the point of a lever table
        operators.Pq.buildIvfPqIndex(v, rawIdx, nlist = 64, m = 8,
          ksub = 16)
        operators.Pq.buildIvfPqIndex(v, resIdx, nlist = 64, m = 8,
          ksub = 16, residual = true)
        val pts = for {
          (layout, idx) <- Seq("raw" -> rawIdx, "res" -> resIdx)
          np <- Seq(1, 2, 4, 8); rr <- Seq(10, 25)
        } yield {
          val (hits, t) = timed(
            operators.Pq.probeIvfPqIndex(spark, idx, queries, k = 5,
              nprobe = np, rerank = rr)
              .select(col("qid"), col("nid"))
              .join(bf, Seq("qid", "nid"), "left_semi").count())
          Seq(s"r_${layout}_np${np}_rr$rr" -> hits / (5.0 * nq),
            s"t_${layout}_np${np}_rr$rr" -> t)
        }
        bf.unpersist(blocking = false)
        pts.flatten
      }

      out.toSeq
    }

    // Untimed warmup at the SMALLEST multiplier: all probes run in one
    // JVM, so without this the first (1x) pass absorbs every JIT +
    // whole-stage-codegen compile and the larger scales run warm —
    // inflating the 1x denominators and flattering every exponent.
    locally {
      val dir = prep(mults.min)
      probes(dir, mults.min, quiet = true)
      spark.catalog.clearCache(); System.gc()
    }

    // per-probe JSON lines stream from inside run() as they complete
    val results = mults.map { m =>
      val dir = prep(m)
      spark.catalog.clearCache(); System.gc()
      m -> probes(dir, m)
    }
    // scaling exponents vs the smallest multiplier
    if (mults.length > 1) {
      val base = results.head
      results.drop(1).foreach { case (m, rs) =>
        val ratio = m.toDouble / base._1
        rs.zip(base._2).foreach { case ((name, ph, _), (_, ph0, _)) =>
          ph.zip(ph0).foreach { case ((p, s), (_, s0)) =>
            val x = s / math.max(s0, 0.01)
            val exp = math.log(x) / math.log(ratio)
            println(f"""{"probe":"$name","phase":"$p","rows_x":$ratio%.0f,"time_x":$x%.2f,"exponent":$exp%.2f}""")
          }
        }
      }
    }
    spark.stop()
  }
}
