package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Product quantization: reconstruction-exactness, rerank-equivalence,
  * trained-codebook mirroring, and the encode contract. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def v(i: Long, d: Int = 8) =
    Array.tabulate(d)(x => ((i * 7 + x * 3) % 11 - 5).toDouble)

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select($"qid", $"nid", round($"cosine", 9).as("c"), $"rk")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("exact reconstruction (ksub == corpus): ADC ranking equals brute force") {
    // every subvector is IN its codebook, so x̂ == x and the ADC score
    // IS the exact cosine — any rerank depth ≥ k reproduces brute force
    val vecs = (0L until 12L).map(i => (i, v(i))).toDF("id", "vec")
    val queries = vecs.filter($"id" < 3)
    val got = key(Pq.pqTopK(vecs, queries, k = 4, m = 2, ksub = 12,
      rerank = 4))
    val want = key(Similarity.bruteForceTopK(vecs, queries, k = 4))
    assert(got == want, s"only-got=${got -- want}\nonly-want=${want -- got}")
  }

  test("rerank >= corpus equals brute force under ANY codebook quality") {
    // even a 2-entry codebook (terrible recall) must reproduce brute
    // force when the candidate set is the whole corpus — the rerank is
    // exact and the ADC stage only ORDERS candidates
    val vecs = (0L until 20L).map(i => (i, v(i))).toDF("id", "vec")
    val queries = vecs.filter($"id" < 2)
    val got = key(Pq.pqTopK(vecs, queries, k = 5, m = 4, ksub = 2,
      rerank = 20))
    val want = key(Similarity.bruteForceTopK(vecs, queries, k = 5))
    assert(got == want)
  }

  test("encode: codes index the codebook, rnorm2 is the chosen entries' norm sum") {
    val vecs = (0L until 10L).map(i => (i, v(i))).toDF("id", "vec")
    val cb = Pq.trainCodebooks(vecs, m = 2, ksub = 4).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getSeq[Double](2).toArray, r.getDouble(3)))).toMap
    assert(cb.size == 8) // m * ksub
    val enc = Pq.encode(vecs, Pq.trainCodebooks(vecs, m = 2, ksub = 4), m = 2)
      .as[(Long, Array[Int], Double)].collect()
    assert(enc.length == 10)
    val raw = vecs.as[(Long, Array[Double])].collect().toMap
    for ((id, codes, rnorm2) <- enc) {
      assert(codes.length == 2)
      // each code is the argmin-L2 entry for that subvector, tie lowest
      val x = raw(id)
      for (s <- 0 until 2) {
        val sub = x.slice(s * 4, s * 4 + 4)
        val best = (0 until 4).minBy { c =>
          val cv = cb((s, c))._1
          (sub.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }
        assert(codes(s) == best, s"id=$id s=$s")
      }
      val want = (0 until 2).map(s => cb((s, codes(s)))._2).sum
      assert(math.abs(rnorm2 - want) < 1e-12)
    }
  }

  test("trained codebooks match a driver-side Lloyd reference (rounded contract)") {
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = 30; val d = 8; val m = 2; val ksub = 3; val dsub = d / m
    val data = (0L until n.toLong).map(i => (i, v(i, d)))
    val vecs = data.toDF("id", "vec")
    // driver reference: same pinned init, same L2 expansion, same
    // per-round 6-digit rounding, empty entry keeps previous (rounded)
    var ref = Array.tabulate(m, ksub)((s, c) =>
      data(c)._2.slice(s * dsub, s * dsub + dsub))
    for (_ <- 1 to 2) {
      val sums = Array.fill(m, ksub)(Array.fill(dsub)(0.0))
      val counts = Array.fill(m, ksub)(0)
      for ((_, x) <- data; s <- 0 until m) {
        val sub = x.slice(s * dsub, s * dsub + dsub)
        def dot(a: Array[Double], b: Array[Double]) =
          a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
        val best = (0 until ksub).minBy { c =>
          (dot(sub, sub) - 2.0 * dot(sub, ref(s)(c)) +
            dot(ref(s)(c), ref(s)(c)), c)
        }
        counts(s)(best) += 1
        for (i <- 0 until dsub) sums(s)(best)(i) += sub(i)
      }
      ref = Array.tabulate(m, ksub)((s, c) =>
        if (counts(s)(c) == 0) ref(s)(c).map(round6)
        else sums(s)(c).map(x => round6(x / counts(s)(c))))
    }
    val got = Pq.trainCodebooks(vecs, m, ksub, rounds = 2).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
      .toMap
    for (s <- 0 until m; c <- 0 until ksub)
      assert(got((s, c)).sameElements(ref(s)(c)),
        s"s=$s c=$c got=${got((s, c)).mkString(",")} want=${ref(s)(c).mkString(",")}")
  }

  test("on-disk IVF-PQ: full probe + full rerank equals brute force; pruning and column pruning hold") {
    val vecs = (0L until 40L).map(i => (i, v(i, 16))).toDF("id", "vec")
    val queries = vecs.filter($"id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    graft.operators.Pq.buildIvfPqIndex(vecs, dir, nlist = 4, m = 4,
      ksub = 40)
    // ksub == corpus → exact reconstruction; nprobe == nlist probes
    // every list; rerank ≥ corpus → brute-force equality end to end
    val got = key(graft.operators.Pq.probeIvfPqIndex(spark, dir, queries,
      k = 5, nprobe = 4, rerank = 40))
    val want = key(Similarity.bruteForceTopK(vecs, queries, k = 5))
    assert(got == want, s"only-got=${got -- want}\nonly-want=${want -- got}")

    // plan shape of the ADC read the probe performs (probePq returns
    // its result eager, so the assertion reconstructs the exact scan
    // expression): the codes projection over the pruned lists must
    // read the code columns — NOT the heavy nvec — and carry the _b
    // partition filter down to the parquet scan
    val lists = graft.operators.SegSwap.resolvedTable(spark, dir, "lists",
      org.apache.spark.sql.types.StructType.fromDDL(
        "nid BIGINT, nvec ARRAY<DOUBLE>, codes ARRAY<INT>, " +
          "rnorm2 DOUBLE, cid BIGINT, _b INT"))
    val adcRead = lists.filter($"_b".isin(0, 1))
      .select("cid", "nid", "codes", "rnorm2")
    val plan = adcRead.queryExecution.executedPlan.toString
    assert(plan.contains("codes") && !plan.contains("nvec"),
      s"ADC read must not touch nvec:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("_b"),
      s"no partition filter on _b in the ADC read plan:\n$plan")
  }

  test("incremental IVF-PQ equals a rebuild under both frozen quantizers") {
    val all = (0L until 40L).map(i => (i, v(i, 16))).toDF("id", "vec")
    val base = all.filter($"id" % 10 =!= 3)
    val queries = all.filter($"id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_incr").toString
    graft.operators.Pq.buildIvfPqIndex(base, dir, nlist = 4, m = 4, ksub = 8)
    val e0 = graft.operators.SegSwap.currentEpoch(
      graft.operators.SegSwap.fsOf(spark, dir), dir)
    val pre = key(graft.operators.Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8))
    // delta: +≡3 ids, −≡7 ids
    graft.operators.Pq.updateIvfPqIndex(spark, dir,
      all.filter($"id" % 10 === 3),
      base.filter($"id" % 10 === 7).select("id"))
    val got = key(graft.operators.Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8))
    // reference: from-scratch build over the post-delta corpus with the
    // SAME frozen centroids and codebooks
    val cents = spark.read.parquet(s"$dir/centroids")
      .select($"cid".as("id"), $"cvec".as("vec"))
    val cb = spark.read.parquet(s"$dir/codebooks")
    val ref = java.nio.file.Files.createTempDirectory("ivfpq_ref").toString
    graft.operators.Pq.buildIvfPqIndex(all.filter($"id" % 10 =!= 7), ref,
      nlist = 4, m = 4, ksub = 8, centroids = Some(cents),
      codebooks = Some(cb))
    val want = key(graft.operators.Pq.probeIvfPqIndex(spark, ref, queries,
      k = 3, nprobe = 2, rerank = 8))
    assert(got == want, s"only-got=${got -- want}\nonly-want=${want -- got}")
    // the LOCATOR table stays consistent with the lists through the
    // update (committed atomically together), and its locate read is
    // partition-pruned on the delta ids' nid-hash buckets
    def table(name: String, ddl: String) =
      graft.operators.SegSwap.resolvedTable(spark, dir, name,
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    val listsPairs = table("lists",
      "nid BIGINT, nvec ARRAY<DOUBLE>, codes ARRAY<INT>, rnorm2 DOUBLE, " +
        "cid BIGINT, _b INT")
      .select("nid", "cid").as[(Long, Long)].collect().toSet
    val locPairs = table("loc", "nid BIGINT, cid BIGINT, _b INT")
      .select("nid", "cid").as[(Long, Long)].collect().toSet
    assert(locPairs == listsPairs, "locator diverged from the lists")
    val locRead = table("loc", "nid BIGINT, cid BIGINT, _b INT")
      .filter($"_b".isin(0, 1))
    val locPlan = locRead.queryExecution.executedPlan.toString
    assert(locPlan.contains("PartitionFilters") && locPlan.contains("_b"),
      s"locate read is not partition-pruned:\n$locPlan")

    // time travel: the as-of probe reproduces the pre-delta answers,
    // and rollback restores them as the current answers
    assert(key(graft.operators.Pq.probeIvfPqIndexAt(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8, epoch = e0)) == pre)
    graft.operators.Pq.ivfPqRollbackTo(spark, dir, e0)
    assert(key(graft.operators.Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8)) == pre)
    // rollback reverts the locator WITH the lists
    assert(table("loc", "nid BIGINT, cid BIGINT, _b INT")
      .select("nid").as[Long].collect().toSet ==
      base.select("id").as[Long].collect().toSet)
  }

  test("ivfPqBatch: stream fence skips a replayed batch; deletion batch applies once") {
    import graft.streaming.StreamMaintain
    val all = (0L until 30L).map(i => (i, v(i, 16))).toDF("id", "vec")
    val base = all.filter($"id" % 10 =!= 3)
    val queries = all.filter($"id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_stream").toString
    graft.operators.Pq.buildIvfPqIndex(base, dir, nlist = 4, m = 4, ksub = 8)
    val b1 = all.filter($"id" % 10 === 3)
      .select($"id", $"vec", lit("U").as("op"))
    val b2 = base.filter($"id" % 10 === 7)
      .select($"id", lit(null).cast("array<double>").as("vec"),
        lit("D").as("op"))
    assert(StreamMaintain.ivfPqBatch(spark, dir, b1, 0L).nonEmpty)
    // MID-STREAM locator rebucket: the new locB installs atomically
    // with the re-hashed rows, and the batch fence survives — batch 0
    // stays replay-skipped, batch 1 still applies
    graft.operators.Pq.ivfPqRebucketLoc(spark, dir, newLocB = 8)
    assert(StreamMaintain.ivfPqBatch(spark, dir, b1, 0L).isEmpty,
      "fence lost across the locator rebucket")
    assert(StreamMaintain.ivfPqBatch(spark, dir, b2, 1L).nonEmpty)
    val got = key(graft.operators.Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8))
    // duplicate deliveries of BOTH batches: fences skip, nothing moves
    assert(StreamMaintain.ivfPqBatch(spark, dir, b1, 0L).isEmpty)
    assert(StreamMaintain.ivfPqBatch(spark, dir, b2, 1L).isEmpty)
    assert(key(graft.operators.Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8)) == got)
    // the removed ids are gone; the added ids are present
    val live = graft.operators.SegSwap.resolvedTable(spark, dir, "lists",
      org.apache.spark.sql.types.StructType.fromDDL(
        "nid BIGINT, nvec ARRAY<DOUBLE>, codes ARRAY<INT>, " +
          "rnorm2 DOUBLE, cid BIGINT, _b INT"))
      .select("nid").as[Long].collect().toSet
    assert(live == all.filter($"id" % 10 =!= 7)
      .select("id").as[Long].collect().toSet)
  }

  test("ivfpq participates in Forget: purge drops the vector; scrub removes its bytes") {
    import graft.operators.{Forget, Pq}
    val all = (0L until 24L).map(i => (i, v(i, 16))).toDF("id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_forget").toString
    Pq.buildIvfPqIndex(all, dir, nlist = 4, m = 4, ksub = 8)
    val txn = java.nio.file.Files.createTempDirectory("ivfpq_forget_txn")
      .toString
    Forget.sweep(spark, txn, Seq(7L, 9L).toDF("id"), "id", "vec",
      Seq("ivfpq" -> dir), scrubHistory = false)
    // live view forgets: equals a rebuild without the purged ids under
    // the SAME frozen quantizers
    val queries = all.filter($"id" < 2)
    val cents = spark.read.parquet(s"$dir/centroids")
      .select($"cid".as("id"), $"cvec".as("vec"))
    val cb = spark.read.parquet(s"$dir/codebooks")
    val ref = java.nio.file.Files.createTempDirectory("ivfpq_forget_ref")
      .toString
    Pq.buildIvfPqIndex(all.filter(!$"id".isin(7L, 9L)), ref, nlist = 4,
      m = 4, ksub = 8, centroids = Some(cents), codebooks = Some(cb))
    assert(key(Pq.probeIvfPqIndex(spark, dir, queries, k = 3, nprobe = 2,
      rerank = 8)) ==
      key(Pq.probeIvfPqIndex(spark, ref, queries, k = 3, nprobe = 2,
        rerank = 8)))
    // without the scrub, retired history still holds the purged nids;
    // after it, no parquet file under the store does
    def tainted(): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(d: java.io.File): Unit =
        Option(d.listFiles()).map(_.toSeq).getOrElse(Nil).foreach { f =>
          if (f.isDirectory) walk(f)
          else if (f.getName.endsWith(".parquet")) {
            val df = spark.read.parquet(f.getAbsolutePath)
            if (df.columns.contains("nid") &&
              df.filter($"nid".isin(7L, 9L)).limit(1).count() > 0)
              out += f.getAbsolutePath
          }
        }
      walk(new java.io.File(dir))
      out.toSeq
    }
    assert(tainted().nonEmpty, "history must hold purged bytes pre-scrub")
    Forget.scrub(spark, dir)
    assert(tainted().isEmpty, s"post-scrub residue in:\n${tainted()}")
  }

  test("recall on clustered embeddings: ADC+rerank recovers most true neighbors") {
    // deterministic 64-dim vectors in 16 hash-centered clusters (the
    // ScaleBench embedding generator's shape): PQ at m=8/ksub=16 with
    // rerank=32 must recover a large fraction of the true top-5 — the
    // approximation has to be USEFUL, not merely oracle-consistent
    def vec(i: Long) = Array.tabulate(64) { d =>
      def h(x: Long) = {
        var z = x * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        (z ^ (z >>> 31)).toDouble / Long.MaxValue
      }
      h((i % 16) * 64 + d) + 0.2 * h(i * 64 + d + 7)
    }
    val vecs = (0L until 400L).map(i => (i, vec(i))).toDF("id", "vec")
    val queries = vecs.filter($"id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(vecs, queries, k = 5))
    val got = pairs(Pq.pqTopK(vecs, queries, k = 5, m = 8, ksub = 16,
      rerank = 32))
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.8, f"recall@5 = $recall%.2f < 0.8 " +
      s"(hit ${(truth & got).size}/${truth.size})")
  }

  test("native graft_pq_adc matches the HOF lookup-sum bit-for-bit; edge cases null") {
    graft.functions.GraftFunctions.register(spark)
    // random-ish codes/luts derived from the embedding data
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".as("id"),
        $"embedding".cast("array<double>").as("v"))
      .select($"id",
        transform(sequence(lit(0), lit(7)),
          s => pmod(xxhash64($"id" * 8 + s), lit(4L)).cast("int")).as("codes"),
        transform(sequence(lit(0), lit(7)),
          s => slice($"v", s * 4 + 1, lit(4))).as("lut"))
    val both = df.select(
      graft.functions.GraftFunctions.pq_adc($"codes", $"lut").as("native"),
      aggregate(zip_with($"codes", $"lut", (c, l) => element_at(l, c + 1)),
        lit(0.0), (a, x) => a + x).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
    assert(both.filter($"native".isNull).count() == 0)
    // length mismatch, null input, out-of-range code → null
    val edge = spark.sql(
      """SELECT
        |  graft_pq_adc(array(0, 1), array(array(1.0d, 2.0d))) AS mismatch,
        |  graft_pq_adc(CAST(null AS ARRAY<INT>),
        |    array(array(1.0d))) AS nullin,
        |  graft_pq_adc(array(5), array(array(1.0d, 2.0d))) AS oob,
        |  graft_pq_adc(array(1, 0),
        |    array(array(1.0d, 2.0d), array(3.0d, 4.0d))) AS ok
        |""".stripMargin).collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
    assert(edge.getDouble(3) == 2.0 + 3.0)
  }

  test("zero-norm vectors neither crash nor displace real neighbors") {
    val vecs = ((0L until 10L).map(i => (i, v(i))) :+
      (10L, Array.fill(8)(0.0))).toDF("id", "vec")
    val queries = vecs.filter($"id" === 0L)
    val got = Pq.pqTopK(vecs, queries, k = 10, m = 2, ksub = 4, rerank = 11)
      .as[(Long, Long, Option[Double], Int)].collect()
    // the zero vector's exact cosine is NULL (try_divide), which sorts
    // LAST under the descending rank window: it never displaces a real
    // neighbor — here k=10 over 10 non-self candidates, so it closes
    // the list with a NULL score
    assert(got.length == 10)
    assert(got.maxBy(_._4)._2 == 10L)
    assert(got.maxBy(_._4)._3.isEmpty)
    assert(got.filter(_._2 != 10L).forall(_._3.nonEmpty))
  }

  // ---- residual (IVFADC) encoding ----------------------------------------

  // Index builds localCheckpoint their driver-small quantizer frames —
  // RDD-level blocks the shared session carries until a lucky GC; these
  // tests drain them on exit ([[SparkSpec.drainStorage]]) so the
  // absolute storage-emptiness assertions downstream stay deterministic.

  /** Clustered corpus: 4 well-separated cluster anchors, points =
    * anchor + deterministic jitter of VARYING magnitude (so a query's
    * true neighbor ranking is decided by jitter scale, not noise ties)
    * — the regime the residual transform exists for (residuals
    * concentrate near the origin, so the same code budget quantizes a
    * much tighter distribution). */
  private def clustered(n: Long, d: Int): Seq[(Long, Array[Double])] = {
    def anchor(c: Int) =
      Array.tabulate(d)(x => (((c * 31 + x * 17) % 19) - 9) * 5.0)
    def jitter(i: Long) = {
      val scale = 0.1 + (i % 7).toDouble * 0.35
      Array.tabulate(d)(x => (((i * 13 + x * 7) % 11) - 5) * 0.1 * scale)
    }
    (0L until n).map { i =>
      val a = anchor((i % 4).toInt); val j = jitter(i)
      (i, Array.tabulate(d)(x => a(x) + j(x)))
    }
  }

  test("residual (IVFADC) recall at fixed rerank >= raw encoding on clustered data") {
    val data = clustered(64, 16)
    val vecs = data.toDF("id", "vec")
    val queries = vecs.filter($"id" < 4) // one query per cluster
    val want = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    def recall(residual: Boolean): Double = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"ivfpq_rec_$residual").toString
      // nprobe == nlist (every list probed) and rerank > k: recall is
      // "did the true top-5 survive into the ADC top-10 candidate
      // pool" — exactly the quantization quality the residual
      // transform buys, isolated from coarse pruning and from exact
      // rerank (identical in both). Both indexes get the same Lloyd
      // budget.
      Pq.buildIvfPqIndex(vecs, dir, nlist = 4, m = 4, ksub = 8,
        pqRounds = 2, residual = residual)
      val got = Pq.probeIvfPqIndex(spark, dir, queries, k = 5,
        nprobe = 4, rerank = 10)
        .select($"qid", $"nid").as[(Long, Long)].collect().toSet
      (got intersect want).size.toDouble / want.size
    }
    val raw = recall(residual = false)
    val res = recall(residual = true)
    info(f"recall@5 (rerank=10): raw=$raw%.3f residual=$res%.3f")
    assert(res >= raw,
      f"residual encoding must not lose recall vs raw: $res%.3f < $raw%.3f")
    drainStorage()
  }

  test("residual index: update equals rebuild, fence skips replay, rollback restores") {
    val all = clustered(40, 16).toDF("id", "vec")
    val base = all.filter($"id" % 10 =!= 3)
    val queries = all.filter($"id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpqres_incr").toString
    Pq.buildIvfPqIndex(base, dir, nlist = 4, m = 4, ksub = 8,
      residual = true)
    val e0 = graft.operators.SegSwap.currentEpoch(
      graft.operators.SegSwap.fsOf(spark, dir), dir)
    val pre = key(Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8))
    Pq.updateIvfPqIndex(spark, dir, all.filter($"id" % 10 === 3),
      base.filter($"id" % 10 === 7).select("id"), batchId = Some(0L))
    // replayed batch: the fence skips (and the residual flag survives
    // the params rewrite the update committed)
    assert(Pq.updateIvfPqIndex(spark, dir, all.filter($"id" % 10 === 3),
      base.filter($"id" % 10 === 7).select("id"),
      batchId = Some(0L)).isEmpty)
    val got = key(Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8))
    // rebuild from scratch over the post-delta corpus under the SAME
    // frozen coarse centroids and residual codebooks
    val cents = spark.read.parquet(s"$dir/centroids")
      .select($"cid".as("id"), $"cvec".as("vec"))
    val cb = spark.read.parquet(s"$dir/codebooks")
    val ref = java.nio.file.Files.createTempDirectory("ivfpqres_ref").toString
    Pq.buildIvfPqIndex(all.filter($"id" % 10 =!= 7), ref,
      nlist = 4, m = 4, ksub = 8, centroids = Some(cents),
      codebooks = Some(cb), residual = true)
    val want = key(Pq.probeIvfPqIndex(spark, ref, queries,
      k = 3, nprobe = 2, rerank = 8))
    assert(got == want, s"only-got=${got -- want}\nonly-want=${want -- got}")
    // time travel keeps working on the residual layout
    assert(key(Pq.probeIvfPqIndexAt(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8, epoch = e0)) == pre)
    Pq.ivfPqRollbackTo(spark, dir, e0)
    assert(key(Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8)) == pre)
    drainStorage()
  }

  test("params schema evolution: a pre-residual index reads with residual defaulted to raw") {
    val all = (0L until 20L).map(i => (i, v(i, 16))).toDF("id", "vec")
    val queries = all.filter($"id" < 3)
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq_oldparams").toString
    Pq.buildIvfPqIndex(all, dir, nlist = 4, m = 4, ksub = 8)
    val want = key(Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8))
    // rewrite the params in the PRE-residual layout (what an index
    // built before the flag existed carries on disk)
    val old = graft.operators.SegSwap.readParamsRow(spark, dir,
      Seq("listsDdl", "m", "lastBatch", "locB"), "spec")
    graft.operators.SegSwap.writeParamsTo(spark, s"$dir/params", Seq(
      "listsDdl" -> old.getString(0), "m" -> old.getInt(1),
      "lastBatch" -> old.getLong(2), "locB" -> old.getInt(3)))
    // probe, as-of machinery, and a fenced update must all still work:
    // absent key == raw encoding, not a forced re-init
    assert(key(Pq.probeIvfPqIndex(spark, dir, queries,
      k = 3, nprobe = 2, rerank = 8)) == want)
    assert(Pq.updateIvfPqIndex(spark, dir,
      all.filter($"id" === 7L).select(($"id" + 100L).as("id"), $"vec"),
      spark.range(0).select($"id"), batchId = Some(0L)).nonEmpty)
    val live = graft.operators.SegSwap.resolvedTable(spark, dir, "lists",
      org.apache.spark.sql.types.StructType.fromDDL(
        "nid BIGINT, nvec ARRAY<DOUBLE>, codes ARRAY<INT>, " +
          "rnorm2 DOUBLE, cid BIGINT, _b INT"))
      .select("nid").as[Long].collect().toSet
    assert(live == (0L until 20L).toSet + 107L)
    drainStorage()
  }
}
