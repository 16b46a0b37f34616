package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Relational, Similarity}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  test("exact dedup groups only identical payloads") {
    val d = Dedup.exact(docs, "doc_id", "text")
    val total = d.agg(sum("n")).collect()(0).getLong(0)
    assert(total == docs.count())
    val distinctTexts = docs.select("text").distinct().count()
    assert(d.count() == distinctTexts)
  }

  test("exact dedup fingerprint path matches the payload-grouping path") {
    // same-length distinct payloads (the digest-only corner) plus real
    // duplicates: the (digest, digest2, length) fingerprint must produce
    // exactly the groups that grouping by payload itself produces.
    val d = (docs.select(col("doc_id"), col("text")) unionByName
      Seq((100001L, "aaaa bbbb"), (100002L, "aaab bbbb"), (100003L, "aaaa bbbb"))
        .toDF("doc_id", "text")).toDF("doc_id", "text")
    val fp = Dedup.exact(d, "doc_id", "text")
      .select("keep_id", "n").as[(Long, Long)].collect().sorted.toSeq
    val vf = Dedup.exact(d, "doc_id", "text", verify = true)
      .select("keep_id", "n").as[(Long, Long)].collect().sorted.toSeq
    assert(fp == vf)
  }

  test("LSH candidates contain every pair with jaccard >= 0.9") {
    val subset = docs.filter(col("doc_id") < 120)
    // ground truth: all-pairs exact jaccard
    val sets = subset.select(col("doc_id"),
      array_distinct(TextFunctions.tokens(col("text"))).as("ts"))
    val a = sets.toDF("a", "ta"); val b = sets.toDF("b", "tb")
    val truth = a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))).cast("double")).as("j"))
      .filter(col("j") >= 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet

    val found = Dedup.minhashNearDups(subset, "doc_id", "text",
      numHashes = 8, bands = 4, threshold = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // LSH with 4 bands of 2 rows: P(miss | j>=0.9) = (1-j²)⁴ ≤ 0.2%/pair —
    // and the candidate set is deterministic here, so require full recall.
    assert(truth.subsetOf(found), s"missed ${truth -- found}")
    // and confirmed pairs are truly >= threshold
    assert(found.subsetOf(truth))
  }

  test("degenerate LSH bucket star-links instead of going quadratic") {
    // 200 identical docs share every band: all-pairs would be ~19900
    // candidates; with maxBucket=10 the bucket star-links to the min id.
    val d = (0 until 200).map(i => (i.toLong, "same text repeated here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", numHashes = 8)
    val pairs = Dedup.lshCandidatePairs(sigs, numHashes = 8, bands = 4,
      maxBucket = 10).as[(Long, Long)].collect().toSet
    assert(pairs.size == 199) // O(m) star, not O(m²)
    assert(pairs.forall(_._1 == 0L)) // all linked to the representative
    // and the full near-dup path still connects the whole cluster
    val dups = Dedup.minhashNearDups(d, "doc_id", "text",
      numHashes = 8, bands = 4, threshold = 0.9)
    assert(dups.count() >= 199)
  }

  test("shingle df cap drops hot-shingle candidates on both sides") {
    // 50 docs all share one boilerplate trigram; only the two real
    // near-dups share rare shingles.
    val boiler = "lorem ipsum dolor"
    val d = ((0 until 48).map(i => (i.toLong, s"$boiler unique$i filler$i pad$i")) ++
      Seq((100L, s"$boiler alpha beta gamma delta"),
          (101L, s"$boiler alpha beta gamma epsilon"))).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", w = 3,
      threshold = 0.2, maxDf = 10).as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((100L, 101L)))
  }

  test("simhash pairing finds every pair within the Hamming bound") {
    val subset = docs.filter(col("doc_id") < 200)
    // ground truth: all-pairs Hamming over the 64-bit (two-half) digests
    val d = Dedup.simhashDigests64(subset, "doc_id", "text")
    val truth = d.toDF("a", "ha1", "ha2")
      .crossJoin(d.toDF("b", "hb1", "hb2"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (bit_count(col("ha1").bitwiseXOR(col("hb1"))) +
          bit_count(col("ha2").bitwiseXOR(col("hb2")))).as("h"))
      .filter(col("h") <= 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val found = Dedup.simhashNearDups(subset, "doc_id", "text", maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(found == truth) // 16-bit-band pigeonhole: exact at distance <= 3
  }

  test("degenerate simhash bucket star-links instead of going quadratic") {
    // 200 identical docs share every band bucket: all-pairs would be
    // ~19900 candidates; with maxBucket=10 each bucket star-links to the
    // min id, and the identical digests pass the Hamming confirm.
    val d = (0 until 200).map(i => (i.toLong, "same text repeated here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(d, "doc_id", "text",
      maxHamming = 3, maxBucket = 10)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.length == 199) // O(m) star, not O(m²)
    assert(pairs.forall(_._1 == 0L)) // all linked to the representative
    assert(pairs.forall(_._3 == 0)) // identical docs: Hamming 0
  }

  test("simhash of near-identical docs differ in few bits") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and often"),
      (3L, "completely unrelated text about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val hs = Dedup.simhashDigests(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(2L)) < hamming(hs(1L), hs(3L)))
  }

  test("salted join equals plain join and spreads a hot key across salts") {
    // 5000 rows on ONE key + a long tail: the classic skew shape
    val big = ((1 to 5000).map(i => (1L, i.toLong)) ++
      (2L to 200L).map(k => (k, k * 10))).toDF("k", "payload")
    val small = (1L to 200L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = Relational.saltedJoin(big, small, "k", salt = 8)
    val plain = big.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // the hot key's rows actually land on several distinct salts
    val saltsUsed = big.filter(col("k") === 1L)
      .withColumn("_salt", Relational.saltColumn(8))
      .select("_salt").distinct().count()
    assert(saltsUsed >= 6, s"hot key used only $saltsUsed of 8 salts")
  }

  test("salted join spreads BYTE-IDENTICAL duplicate rows of a hot key") {
    // 10⁵ byte-identical rows: a content-hash salt gives them all ONE
    // salt (the duplicate-row skew corner — the hot key still floods a
    // single partition); the position-based round-robin must use at
    // least salt/2 distinct salt values, i.e. ≥ salt/2 distinct
    // (key, salt) join partitions.
    val dup = spark.range(100000).select(lit(1L).as("k"), lit(42L).as("payload"))
    val saltsUsed = dup.withColumn("_salt", Relational.saltColumn(8))
      .select("_salt").distinct().count()
    assert(saltsUsed >= 4, s"identical duplicates used only $saltsUsed of 8 salts")
    // and the join result is still exactly the plain join
    val small = Seq((1L, "dim1")).toDF("k", "name")
    val salted = Relational.saltedJoin(dup, small, "k", salt = 8)
    assert(salted.count() == 100000)
    assert(salted.exceptAll(dup.join(small, "k")).count() == 0)
  }

  test("brute-force ANN: self-similarity excluded, ranks ordered, exact") {
    val top = Similarity.bruteForceTopK(embs, embs.filter(col("id") < 3), k = 4)
    val rows = top.as[(Long, Long, Double, Int)].collect()
    assert(rows.forall { case (q, n, _, _) => q != n })
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    for ((_, rs) <- byQ) {
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._3).toSeq.sliding(2).forall {
        case Seq(x, y) => x >= y; case _ => true })
    }
  }

  test("LSH-bucketed ANN finds most of the true top-k") {
    val queries = embs.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(embs, queries, k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshBucketTopK(embs, queries, k = 3,
      planes = 3, tables = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low")
  }

  test("IVF ANN: full probe equals brute force; partial probe is a sound subset") {
    val queries = embs.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(embs, queries, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    // nprobe == nlist probes every list => identical to brute force
    val full = Similarity.ivfTopK(embs, queries, k = 3, nlist = 8, nprobe = 8)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full == exact)
    // partial probe: every emitted cosine is the true cosine, each
    // vector lands in exactly one list, and recall stays useful
    val part = Similarity.ivfTopK(embs, queries, k = 3, nlist = 8, nprobe = 3)
      .as[(Long, Long, Double, Int)].collect()
    val trueCos = Similarity.bruteForceTopK(embs, queries, k = Int.MaxValue)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(part.nonEmpty)
    for ((q, n, c, _) <- part) assert(math.abs(trueCos((q, n)) - c) < 1e-12)
    val recall = (exact.map(r => (r._1, r._2)) &
      part.map(r => (r._1, r._2)).toSet).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf recall $recall too low")
  }

  test("embedding near-dups: small blocks exact, big blocks a sound LSH subset") {
    val exact = Similarity.embeddingNearDups(embs, "label", threshold = 0.2,
      maxBlock = Int.MaxValue).as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val mixed = Similarity.embeddingNearDups(embs, "label", threshold = 0.2,
      maxBlock = 48).as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // every emitted pair is a true pair with the exact cosine
    assert(mixed.nonEmpty)
    for ((k, c) <- mixed) assert(exact.contains(k) && math.abs(exact(k) - c) < 1e-12)
    // and strongly-similar pairs survive the sub-bucketing (sign-LSH
    // keeps high-cosine pairs with high probability across 8 tables)
    val strong = exact.filter(_._2 >= 0.9).keySet
    val kept = strong.count(mixed.contains)
    assert(strong.isEmpty || kept.toDouble / strong.size >= 0.5,
      s"kept $kept of ${strong.size} strong pairs")
  }

  test("semanticDedup: clique keeps its lowest id, chains drop all followers") {
    import math.{cos, sin, toRadians => rad}
    // disjoint subspaces isolate the groups (cross-group cosine 0):
    //  dims 0-1: a 3-clique (0°, 20°, −20° — all pairwise cos > tau)
    //  dims 2-3: a chain at 0°/50°/100° — cos50 ≈ .643 > tau links
    //            10~11 and 11~12, but cos100 ≈ −.174 ≤ tau, so 12's
    //            only >tau neighbor (11) is itself dropped
    //  dim 4: a singleton
    val tau = 0.5
    val vecs = Seq(
      0L -> Array(1.0, 0.0, 0.0, 0.0, 0.0),
      1L -> Array(cos(rad(20)), sin(rad(20)), 0.0, 0.0, 0.0),
      2L -> Array(cos(rad(20)), -sin(rad(20)), 0.0, 0.0, 0.0),
      10L -> Array(0.0, 0.0, 1.0, 0.0, 0.0),
      11L -> Array(0.0, 0.0, cos(rad(50)), sin(rad(50)), 0.0),
      12L -> Array(0.0, 0.0, cos(rad(100)), sin(rad(100)), 0.0),
      20L -> Array(0.0, 0.0, 0.0, 0.0, 1.0)).toDF("id", "vec")
    val outDf = Similarity.semanticDedup(vecs, nlist = 1, tau = tau)
    val out = outDf.select("id", "keep").as[(Long, Int)].collect().toMap
    // every input row comes back exactly once with keep ∈ {0, 1}
    assert(out.keySet == Set(0L, 1L, 2L, 10L, 11L, 12L, 20L))
    assert(out.values.forall(k => k == 0 || k == 1))
    // clique: lowest id survives, both mates drop
    assert(out(0L) == 1 && out(1L) == 0 && out(2L) == 0)
    // chain: followers drop even though 12 has no SURVIVING near-dup
    assert(out(10L) == 1 && out(11L) == 0 && out(12L) == 0)
    // dissimilar singleton survives
    assert(out(20L) == 1)
    // the operator returns an eagerly-persisted frame — release it
    outDf.unpersist()
  }

  test("incremental semanticDedup: affected-cluster re-decide flips both ways") {
    // frozen 3-centroid quantizer from the base's lowest ids (1, 2, 4);
    // clusters live in disjoint-ish 2D directions so assignment is
    // unambiguous. tau = 0.9.
    val tau = 0.9
    val base = Seq(
      1L -> Array(1.0, 0.0),             // centroid A
      2L -> Array(0.0, 1.0),             // centroid B
      4L -> Array(-1.0, 0.0),            // centroid C
      5L -> Array(0.995, 0.0999),        // A-mate, dominated by 1
      6L -> Array(0.6, 0.8),             // B-mate, cos(2,6)=.8 <= tau: kept
      7L -> Array(-0.995, -0.0999)       // C-mate, dominated by 4
    ).toDF("id", "vec")
    val st0 = Similarity.preserveSemanticDedup(base, nlist = 3, tau = tau)
    val out0 = st0.out.select("id", "keep").as[(Long, Int)].collect().toMap
    assert(out0 == Map(1L -> 1, 2L -> 1, 4L -> 1, 5L -> 0, 6L -> 1, 7L -> 0))

    // delta: +3 (B-direction, cos(3,6) ≈ .998 > tau — UNTOUCHED 6 must
    // flip to dropped, 3 < 6 dominates); −1 (5's only dominator leaves —
    // UNTOUCHED 5 must flip back to kept). Cluster C is untouched by
    // the delta: 4/7's bits must carry over unchanged.
    val added = Seq(3L -> Array(0.55, 0.835)).toDF("id", "vec")
    val st1 = Similarity.continueSemanticDedup(st0, added,
      Seq(1L).toDF("id"))
    val out1 = st1.out.select("id", "keep").as[(Long, Int)].collect().toMap
    assert(out1 == Map(2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1, 6L -> 0, 7L -> 0),
      s"got $out1")

    // exactness: equals the batch operator over the post-delta vectors
    // under the SAME frozen quantizer
    val after = base.filter(col("id") =!= 1L).unionByName(added)
    val cents = base.filter(col("id").isin(1L, 2L, 4L))
    val batch = Similarity.semanticDedup(after, nlist = 3, tau = tau,
      centroids = Some(cents))
    val want = batch.select("id", "keep").as[(Long, Int)].collect().toMap
    assert(out1 == want)
    // full (id, cid, keep) agreement, not just keep bits
    val got3 = st1.out.select("id", "cid", "keep")
      .as[(Long, Long, Int)].collect().toSet
    val want3 = batch.select(col("id"), col("cid"),
        col("keep").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got3 == want3)
    batch.unpersist(); st0.release(); st1.release()
  }

  test("teraValidate compares keys in native type order") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("k", LongType)))
    def df(rows: Seq[Long], parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_)), parts), schema)
    // numerically sorted: [9, 10, ...] is sorted even though "10" < "9"
    // as strings (the bug the typed comparison fixes)
    assert(Relational.teraValidate(df(Seq(9L, 10L, 11L, 40L), 2), "k"))
    // one swapped pair within a partition
    assert(!Relational.teraValidate(df(Seq(9L, 40L, 11L), 1), "k"))
    // per-partition sorted but the partition boundary is out of order
    assert(!Relational.teraValidate(df(Seq(1L, 5L, 4L, 8L), 2), "k"))
    // string keys still validate
    val sdf = Seq("apple", "banana", "cherry").toDF("k").orderBy("k")
    assert(Relational.teraValidate(sdf, "k"))
  }

  test("terasort: sort validates and checksum equals the local in-order fold") {
    graft.functions.GraftFunctions.register(spark)
    val keyed = docs.limit(200).select(col("text"),
      element_at(graft.functions.GraftFunctions.token_codes(array(col("text"))), 1)
        .as("code"))
    val sorted = Relational.totalOrderSort(keyed, "text")
    val (ok, n, chk) = Relational.teraSummary(sorted, "text", "code")
    assert(ok)
    assert(n == keyed.count())
    val P = 1000000007L
    val expected = keyed.as[(String, Long)].collect().sortBy(_._1)
      .foldLeft(0L) { case (acc, (_, c)) => (acc * 131 + c) % P }
    assert(chk == expected)
    // an out-of-order frame fails the one-pass validation
    val bad = Seq(("b", 2L), ("a", 1L)).toDF("text", "code").coalesce(1)
    assert(!Relational.teraSummary(bad, "text", "code")._1)
  }

  test("secondary sort emits values in order-column order") {
    val df = Seq((1L, 3, "c"), (1L, 1, "a"), (1L, 2, "b"), (2L, 9, "z"))
      .toDF("k", "o", "v")
    val got = Relational.secondarySort(df, "k", Seq("o"), "v")
      .select(col("k"), concat_ws("", col("values")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "abc", 2L -> "z"))
  }

  test("applyDelta deletes, replaces and inserts") {
    val base = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val delta = Seq((2, "b", "-"), (3, "c2", "+"), (4, "d", "+"))
      .toDF("k", "v", "change")
    val got = Relational.applyDelta(base, delta, Seq("k"))
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a", 3 -> "c2", 4 -> "d"))
  }

  test("multimodal pack + stub decode keeps schema and parallel shape") {
    val packed = Multimodal.pack(docs.limit(50), "doc_id", "text", "text")
    assert(packed.schema("media").dataType.typeName == "binary")
    val feats = Multimodal.stubDecodeFeatures(packed, dim = 4)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getSeq[Double](2).length == 4))
  }

  test("partition-batched decode matches the columnar stub path") {
    val packed = Multimodal.pack(docs.limit(50), "doc_id", "text", "text")
    val columnar = Multimodal.stubDecodeFeatures(packed, dim = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1).toLong, r.getSeq[Double](2).toList)).toMap
    val batched = Multimodal.decodePartitioned(packed, dim = 4)
      .collect().map { case (id, n, f) => id -> (n, f.toList) }.toMap
    assert(batched == columnar)
  }

  test("graw pack/decode round-trip: handwritten bytes, both decode paths") {
    import org.apache.spark.sql.functions._
    // 2x2x2 image with hand-picked samples: channel 0 = {10,20,30,40},
    // channel 1 = {50,60,70,255} (interleaved row-major)
    val pix = Seq(10, 50, 20, 60, 30, 70, 40, 255)
    val df = Seq((7L, pix)).toDF("doc_id", "pixels")
    val packed = Multimodal.packRaw(df, "doc_id", "pixels", 2, 2, 2)
    val blob = packed.select("media").as[Array[Byte]].head()
    // byte-exact layout: magic, BE dims, channels, samples
    assert(blob.length == 9 + 8)
    assert(new String(blob.take(4), "UTF-8") == "GRW1")
    assert((blob(4) & 0xff, blob(5) & 0xff) == (0, 2))
    assert((blob(6) & 0xff, blob(7) & 0xff) == (0, 2))
    assert((blob(8) & 0xff) == 2)
    assert(blob.drop(9).map(_ & 0xff).toSeq == pix)
    val r = Multimodal.rawStats(packed)
      .selectExpr("width", "height", "channels", "channel_means").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == (2, 2, 2))
    assert(r.getSeq[Double](3) == Seq(25.0, (50 + 60 + 70 + 255) / 4.0))
    // the JVM twin sees the same bytes the same way
    val (w, h, c, ms) = Multimodal.rawBytesToStats(blob)
    assert((w, h, c) == (2, 2, 2) && ms.toSeq == r.getSeq[Double](3))
    // row sampling slices exactly row r's samples
    val rows = Multimodal.rawRowSample(packed, strideRows = 1)
      .orderBy("row").select("row", "samples")
      .as[(Int, Seq[Int])].collect().toSeq
    assert(rows == Seq((0, Seq(10, 50, 20, 60)), (1, Seq(30, 70, 40, 255))))
  }

  test("png pack/decode: lossless round-trip, real compression, loud failure") {
    import org.apache.spark.sql.functions._
    // ramp pixels compress well under PNG's scanline filters — the
    // size assert below checks the DEFLATE coder actually engaged
    val w = 16; val h = 16
    val pix = Array.tabulate(w * h * 3)(i => (i * 7 + 13) % 256)
    val df = Seq((7L, pix.toSeq)).toDF("doc_id", "pixels")
    val packed = Multimodal.packPng(df, "doc_id", "pixels", w, h)
    val blob = packed.select("media").as[Array[Byte]].head()
    // the PNG signature, then real compression vs the raw sample count
    assert((blob(0) & 0xff) == 0x89 &&
      new String(blob.slice(1, 4), "UTF-8") == "PNG")
    assert(blob.length < w * h * 3,
      s"png blob ${blob.length} B not smaller than raw ${w * h * 3} B")
    // LOSSLESS: the decode returns the exact input samples
    val (dw, dh, dpx) = Multimodal.pngDecode(blob)
    assert((dw, dh) == (w, h) && dpx.toSeq == pix.toSeq)
    // and the stats path agrees with the GRAW decode of the same pixels
    val s = Multimodal.pngStats(packed)
      .selectExpr("width", "height", "channels", "channel_means").head()
    val viaRaw = Multimodal.rawStats(
        Multimodal.packRaw(df, "doc_id", "pixels", w, h, 3))
      .selectExpr("channel_means").head().getSeq[Double](0)
    assert((s.getInt(0), s.getInt(1), s.getInt(2)) == (w, h, 3))
    assert(s.getSeq[Double](3) == viaRaw)
    // undecodable blobs fail loudly, never as silent nulls
    intercept[Exception] {
      Multimodal.pngDecode("not a png".getBytes("UTF-8"))
    }
    val bad = packed.select(col("id"),
      expr("substring(media, 1, 20)").as("media"))
    intercept[Exception] { Multimodal.pngStats(bad).collect() }
    // out-of-range samples fail at ENCODE time
    intercept[Exception] {
      Multimodal.packPng(Seq((1L, Seq(0, 1, 300))).toDF("doc_id", "pixels"),
        "doc_id", "pixels", 1, 1).collect()
    }
  }

  test("jpeg (lossy): dims exact, bounded round-trip error, real compression, loud failure") {
    // a SMOOTH image (low-frequency gradient): JPEG's DCT quantization
    // error on smooth content is small and its compression large —
    // both bounds below would fail on a codec wired up wrong
    val w = 32; val h = 32
    val pix = Array.tabulate(w * h * 3) { p =>
      val x = (p / 3) % w; val y = (p / 3) / w
      ((x * 3 + y * 2) + (p % 3) * 20) % 256
    }
    val blob = Multimodal.jpegEncode(pix, w, h)
    assert((blob(0) & 0xff) == 0xff && (blob(1) & 0xff) == 0xd8, // SOI
      "not a JPEG stream")
    assert(blob.length < w * h * 3,
      s"jpeg blob ${blob.length} B not smaller than raw ${w * h * 3} B")
    val (dw, dh, dpx) = Multimodal.jpegDecode(blob)
    assert((dw, dh) == (w, h))
    val mae = pix.zip(dpx).map { case (a, b) => math.abs(a - b) }.sum.toDouble / pix.length
    assert(mae < 8.0, f"jpeg round-trip MAE $mae%.1f too high for smooth content")
    intercept[Exception] { Multimodal.jpegDecode("garbage".getBytes("UTF-8")) }
  }

  test("wav pack/decode: byte-exact header, signed LE16 round-trip, both decode paths") {
    import org.apache.spark.sql.functions._
    // stereo, 3 frames, samples covering sign extremes — the LE16
    // signed fold is exactly what a wrong codec gets silently wrong
    val smp = Seq(0, -1, 1000, -1000, 32767, -32768)
    val df = Seq((3L, smp)).toDF("doc_id", "samples")
    val packed = Multimodal.packWav(df, "doc_id", "samples",
      channels = 2, sampleRate = 16000)
    val blob = packed.select("media").as[Array[Byte]].head()
    assert(blob.length == 44 + 12)
    assert(new String(blob.take(4), "UTF-8") == "RIFF")
    assert(new String(blob.slice(8, 12), "UTF-8") == "WAVE")
    assert(new String(blob.slice(36, 40), "UTF-8") == "data")
    // hand-checked LE16: 0→00 00, −1→ff ff, 32767→ff 7f, −32768→00 80
    assert((blob(44) & 0xff, blob(45) & 0xff) == (0x00, 0x00))
    assert((blob(46) & 0xff, blob(47) & 0xff) == (0xff, 0xff))
    assert((blob(52) & 0xff, blob(53) & 0xff) == (0xff, 0x7f))
    assert((blob(54) & 0xff, blob(55) & 0xff) == (0x00, 0x80))
    val r = Multimodal.wavStats(packed)
      .selectExpr("channels", "CAST(sample_rate AS BIGINT)",
        "CAST(n_frames AS BIGINT)", "channel_means").head()
    assert((r.getInt(0), r.getLong(1), r.getLong(2)) == (2, 16000L, 3L))
    val want = Seq((0 + 1000 + 32767) / 3.0, (-1 - 1000 - 32768) / 3.0)
    assert(r.getSeq[Double](3) == want)
    // the JVM twin sees the same bytes the same way
    val (c, rate, fr, ms) = Multimodal.wavBytesToStats(blob)
    assert((c, rate, fr) == (2, 16000, 3L) && ms.toSeq == want)
    // loud failures: bad magic, truncation, out-of-PCM16 sample
    val badMagic = packed.select(col("id"),
      concat(encode(lit("XXXX"), "UTF-8"),
        expr("substring(media, 5, octet_length(media) - 4)")).as("media"))
    intercept[Exception] { Multimodal.wavStats(badMagic).collect() }
    val short = packed.select(col("id"),
      expr("substring(media, 1, octet_length(media) - 1)").as("media"))
    intercept[Exception] { Multimodal.wavStats(short).collect() }
    intercept[IllegalArgumentException] {
      Multimodal.wavBytesToStats("RIFFxxxxWAVE".getBytes("UTF-8"))
    }
    intercept[Exception] {
      Multimodal.packWav(Seq((1L, Seq(40000))).toDF("doc_id", "samples"),
        "doc_id", "samples", 1, 8000).collect()
    }
    // DEGENERATE cases (round-14 ADVICE): a zero-frame WAV is a VALID
    // encode (packWav accepts an empty samples array) and must decode
    // to n_frames=0 with EMPTY means — not negative-offset header
    // reads through sequence(0,-1) and a 0/0 — on both decode paths
    val empty = Multimodal.packWav(
      Seq((9L, Seq.empty[Int])).toDF("doc_id", "samples"),
      "doc_id", "samples", channels = 2, sampleRate = 8000)
    val er = Multimodal.wavStats(empty)
      .selectExpr("CAST(n_frames AS BIGINT)", "channel_means").head()
    assert(er.getLong(0) == 0L && er.getSeq[Double](1).isEmpty)
    val eb = empty.select("media").as[Array[Byte]].head()
    val (_, _, efr, ems) = Multimodal.wavBytesToStats(eb)
    assert(efr == 0L && ems.isEmpty)
    // a zero-CHANNEL header can only be a corrupt blob (packWav pins
    // channels >= 1): loud failure, both paths
    val zeroCh = packed.select(col("id"),
      concat(expr("substring(media, 1, 22)"),
        unhex(lit("0000")),
        expr("substring(media, 25, octet_length(media) - 24)")).as("media"))
    intercept[Exception] { Multimodal.wavStats(zeroCh).collect() }
    locally {
      val bad = blob.clone(); bad(22) = 0; bad(23) = 0
      intercept[IllegalArgumentException] { Multimodal.wavBytesToStats(bad) }
    }
  }

  test("graw decode fails loudly on bad magic and on header/length mismatch") {
    import org.apache.spark.sql.functions._
    val good = Multimodal.packRaw(
      Seq((1L, Seq(1, 2, 3, 4))).toDF("doc_id", "pixels"), "doc_id",
      "pixels", 2, 2, 1)
    // corrupt the magic
    val badMagic = good.select(col("id"),
      concat(encode(lit("XXXX"), "UTF-8"),
        expr("substring(media, 5, octet_length(media) - 4)")).as("media"))
    val e1 = intercept[Exception] {
      Multimodal.rawStats(badMagic).collect()
    }
    assert(e1.getMessage.contains("bad magic") ||
      Option(e1.getCause).exists(_.getMessage.contains("bad magic")))
    // truncate a sample byte: header says 4 samples, body has 3
    val short = good.select(col("id"),
      expr("substring(media, 1, octet_length(media) - 1)").as("media"))
    val e2 = intercept[Exception] {
      Multimodal.rawStats(short).collect()
    }
    assert(e2.getMessage.contains("length/header mismatch") ||
      Option(e2.getCause).exists(_.getMessage.contains("length/header mismatch")))
    intercept[IllegalArgumentException] {
      Multimodal.rawBytesToStats("XXXX12345".getBytes("UTF-8"))
    }
  }

  test("decontaminate drops exactly the docs sharing an eval shingle") {
    val eval = Seq((900L, "the quick brown fox leaps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "something about the quick brown fox here"), // contains eval 3-gram
      (2L, "quick brown elsewhere entirely clean"),     // shares 2-grams only
      (3L, "the quick"),                                // < w tokens: never flagged
      (4L, "fully unrelated text body")
    ).toDF("doc_id", "text")
    val kept = graft.operators.Pipeline.decontaminate(
      corpus, "doc_id", "text", eval, "text", w = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"got $kept")
  }

  test("contaminationScore: distinct-shingle fractions, short docs zero") {
    val eval = Seq((900L, "the quick brown fox leaps"), (901L, "a b c"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "something about the quick brown fox here"), // 5 shingles, 2 hits
      (2L, "a b c a b c a b c"),   // 3 DISTINCT shingles, 1 hit (a b c)
      (3L, "the quick"),           // < w tokens: no shingles, frac 0
      (4L, "fully unrelated text body") // 2 shingles, 0 hits
    ).toDF("doc_id", "text")
    val r = graft.operators.Pipeline.contaminationScore(
      corpus, "doc_id", "text", eval, "text", w = 3)
      .as[(Long, Int, Int, Double)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 5, 2, 0.4)))
    assert(r(2L) == ((2L, 3, 1, 0.333333)))
    assert(r(3L) == ((3L, 0, 0, 0.0)))
    assert(r(4L) == ((4L, 2, 0, 0.0)))
  }

  test("repetitionStats: exact fractions, short-doc zero case, keep bit") {
    val d = Seq(
      (1L, "a b a b a b"),  // grams: "a b"x3, "b a"x2 -> n2=5, top 0.6, dup 1.0
      (2L, "x y z w"),      // all grams unique -> n2=3, top 1/3, dup 0
      (3L, "solo"),         // one token: no grams, fractions 0, kept
      (4L, "")              // empty: same
    ).toDF("doc_id", "text")
    val r = graft.operators.Pipeline
      .repetitionStats(d, "doc_id", "text", topFracMax = 0.5, dupFracMax = 0.5)
      .as[(Long, Int, Double, Double, Int)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 5, 0.6, 1.0, 0)))
    assert(r(2L) == ((2L, 3, 0.333333, 0.0, 1)))
    assert(r(3L) == ((3L, 0, 0.0, 0.0, 1)))
    assert(r(4L) == ((4L, 0, 0.0, 0.0, 1)))
    // 3-gram generalization: doc 1 has "a b a"x2 + "b a b"x2 -> ng=4,
    // top 0.5, dup 1.0; doc 2's two 3-grams are unique; short docs 0
    val r3 = graft.operators.Pipeline
      .repetitionStats(d, "doc_id", "text", topFracMax = 0.5,
        dupFracMax = 0.5, n = 3)
      .as[(Long, Int, Double, Double, Int)].collect()
      .map(t => t._1 -> t).toMap
    assert(r3(1L) == ((1L, 4, 0.5, 1.0, 0)))
    assert(r3(2L) == ((2L, 2, 0.5, 0.0, 1)))
    assert(r3(3L) == ((3L, 0, 0.0, 0.0, 1)))
    assert(r3(4L) == ((4L, 0, 0.0, 0.0, 1)))
  }

  test("lmScore: corpus-typical text scores below vocabulary soup; short docs kept") {
    // corpus of one dominant transition pattern + one doc of never-seen
    // transitions over the same vocabulary
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "mat the on sat cat the"), // same unigrams, unseen bigrams
      (5L, "solo"),                   // 1 token: nb 0, nll 0, kept
      (6L, "")                        // empty: same
    ).toDF("doc_id", "text")
    val r = graft.operators.Pipeline
      .lmScore(d, "doc_id", "text", k = 0.5, maxNll = 100.0)
      .as[(Long, Long, Double, Int)].collect().map(t => t._1 -> t).toMap
    assert(r.size == 6 && r.values.forall(_._4 == 1))
    assert(r(1L)._2 == 5 && r(1L) == r(2L).copy(_1 = 1L))
    // the shuffled doc's transitions are all count-1-smoothed → much
    // higher nll than the thrice-seen pattern
    assert(r(4L)._3 > r(1L)._3 + 0.5,
      s"soup=${r(4L)._3} typical=${r(1L)._3}")
    assert(r(5L) == ((5L, 0L, 0.0, 1)) && r(6L) == ((6L, 0L, 0.0, 1)))
    // exact spot value over hand-counted corpus stats: V=6 unigrams,
    // C(the)=8 (docs 1-4), C(cat)=C(sat)=C(on)=4; doc 1's five bigrams
    // each occur 3x corpus-wide
    val kV = 0.5 * 6
    def term(cab: Long, cw: Long) = -math.log((cab + 0.5) / (cw + kV))
    // doc 1 bigrams: (the,cat)3/the8 (cat,sat)3/cat4 (sat,on)3/sat4
    // (on,the)3/on4 (the,mat)3/the8
    val want = (term(3, 8) * 2 + term(3, 4) * 3) / 5
    assert(math.abs(r(1L)._3 - want) < 1e-6, s"got=${r(1L)._3} want=$want")
    // threshold splits on the rounded value
    val strict = graft.operators.Pipeline
      .lmScore(d, "doc_id", "text", k = 0.5,
        maxNll = (r(1L)._3 + r(4L)._3) / 2)
      .as[(Long, Long, Double, Int)].collect().map(t => t._1 -> t._4).toMap
    assert(strict(1L) == 1 && strict(4L) == 0)
    // frozen train/apply split: an OOV doc is pure smoothing —
    // every term -ln(k / (k·V)) = ln V — and in-vocab text scores as
    // under self-training (same counts, different score frame)
    val train = d.filter($"doc_id" <= 3L)
    val apply = Seq((7L, "the cat sat on the mat"),
      (8L, "zx qy wv zx qy")).toDF("doc_id", "text")
    val fr = graft.operators.Pipeline
      .lmScoreAgainst(train, apply, "doc_id", "text", k = 0.5,
        maxNll = 100.0)
      .as[(Long, Long, Double, Int)].collect().map(t => t._1 -> t).toMap
    // train vocab = {the,cat,sat,on,mat}: V=5, C(the)=6, others 3
    val kV5 = 0.5 * 5
    def t5(cab: Long, cw: Long) = -math.log((cab + 0.5) / (cw + kV5))
    val want7 = (t5(3, 6) * 2 + t5(3, 3) * 3) / 5
    assert(math.abs(fr(7L)._3 - want7) < 1e-6, s"got=${fr(7L)._3}")
    assert(math.abs(fr(8L)._3 - math.log(5.0)) < 1e-6,
      s"OOV doc must score ln V, got=${fr(8L)._3}")
  }

  test("lmScoreAgainst: a doc's frozen score is independent of the score batch") {
    // the property that makes frozen-model delta scoring sound: scoring
    // a doc alongside any other batch yields the same value as scoring
    // it alone (counts come from train only — nothing leaks from the
    // score side into the model)
    val train = (1L to 12L).map(i => (i, s"w$i x$i y$i z$i w$i x$i"))
      .toDF("doc_id", "text")
    val a = Seq((101L, "w1 x1 y1 unseen"), (102L, "x2 y2 z2 w2"))
      .toDF("doc_id", "text")
    val b = (201L to 208L).map(i => (i, s"noise n$i m$i w3 x3"))
      .toDF("doc_id", "text")
    def score(df: org.apache.spark.sql.DataFrame) = graft.operators.Pipeline
      .lmScoreAgainst(train, df, "doc_id", "text")
      .as[(Long, Long, Double, Int)].collect().map(t => t._1 -> t).toMap
    val alone = score(a)
    val together = score(a.unionByName(b)).filter(_._1 < 200L)
    assert(together == alone)
  }

  test("dupSpanStats: union coverage, in-doc repeats don't count, short docs kept") {
    val d = Seq(
      (1L, "a b c d e f"),   // shares "a b c" with 2, "c d e"/"d e f" with 3
      (2L, "a b c z"),       // cover {0,1,2} of 4
      (3L, "c d e f w"),     // cover {0,1,2,3} of 5
      (4L, "p q r p q r"),   // "p q r" repeats IN-DOC only: df 1, not dup
      (5L, "zz yy"),         // shorter than w: no spans
      (6L, "m n o q"), (7L, "m n o q") // exact dups: full coverage
    ).toDF("doc_id", "text")
    val out = graft.operators.Pipeline.dupSpanStats(d, "doc_id", "text",
      w = 3, maxFrac = 0.5)
    val r = out.as[(Long, Long, Long, Double, Int)].collect()
      .map(t => t._1 -> t).toMap
    // doc 1: dup spans at pos 0,2,3 -> covered {0..5} union = all 6
    assert(r(1L) == ((1L, 6L, 6L, 1.0, 0)))
    assert(r(2L) == ((2L, 4L, 3L, 0.75, 0)))
    assert(r(3L) == ((3L, 5L, 4L, 0.8, 0)))
    assert(r(4L) == ((4L, 6L, 0L, 0.0, 1)))
    assert(r(5L) == ((5L, 2L, 0L, 0.0, 1)))
    assert(r(6L) == ((6L, 4L, 4L, 1.0, 0)))
    assert(r(7L) == ((7L, 4L, 4L, 1.0, 0)))
    assert(out.count() == 7)
    out.unpersist()
  }

  test("cutDupSpans: shared passage excised everywhere, originals intact") {
    val d = Seq(
      (1L, "alpha beta gamma delta my own tail"),  // quotes the passage
      (2L, "head words alpha beta gamma delta"),   // quotes it too
      (3L, "dup dup dup dup"), (4L, "dup dup dup dup"), // exact pair
      (5L, "wholly original five words here"),
      (6L, "")
    ).toDF("doc_id", "text")
    val r = graft.operators.Pipeline.cutDupSpans(d, "doc_id", "text", w = 4)
      .as[(Long, String, Long, Long)].collect().map(t => t._1 -> t).toMap
    // "alpha beta gamma delta" (4 tokens) is duplicated; BOTH copies cut
    assert(r(1L) == ((1L, "my own tail", 3L, 4L)))
    assert(r(2L) == ((2L, "head words", 2L, 4L)))
    // exact duplicates collapse to empty husks (n_removed = full length)
    assert(r(3L) == ((3L, "", 0L, 4L)) && r(4L) == ((4L, "", 0L, 4L)))
    assert(r(5L) == ((5L, "wholly original five words here", 5L, 0L)))
    assert(r(6L) == ((6L, "", 0L, 0L)))
  }

  test("dedupLines: doc-frequency rule, order kept, husk docs survive empty") {
    val d = Seq(
      (1L, "unique one\nFOOTER\nunique two"),
      (2L, "FOOTER\nonly here\nFOOTER"), // in-doc repeat counts ONCE for df
      (3L, "FOOTER"),                    // all lines boilerplate -> husk
      (4L, "alpha\nbeta"),
      (5L, null.asInstanceOf[String])    // null text ≡ empty: one "" line
    ).toDF("doc_id", "text")
    // FOOTER df = 3 docs > 2 -> removed everywhere (both copies in doc
    // 2); every other line has df 1
    val out = graft.operators.Pipeline.dedupLines(d, "doc_id", "text",
      maxDocs = 2)
    val r = out.as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, "unique one\nunique two", 2L, 1L)))
    assert(r(2L) == ((2L, "only here", 1L, 2L)))
    assert(r(3L) == ((3L, "", 0L, 1L)))
    assert(r(4L) == ((4L, "alpha\nbeta", 2L, 0L)))
    assert(r(5L) == ((5L, "", 1L, 0L))) // kept husk, not dropped
    assert(out.count() == 5) // every input doc comes back exactly once
    out.unpersist()
    // the incremental twin must agree on the null-text rule
    val st = graft.operators.IncrementalLineDedup.preserveLines(
      d, "doc_id", "text", maxDocs = 2)
    assert(st.out.as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> t).toMap == r)
    st.release()
  }

  test("mixToBudget: integer rates, cap at 1000, unlisted sources drop") {
    val d = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L), (4L, "A", 10L),
      (5L, "B", 100L), (6L, "C", 5L)
    ).toDF("doc_id", "source", "ntok")
    // budget 60, A/B split 500/500: desired 30 each ->
    // rate_A = 30*1000/40 = 750, rate_B = 30*1000/100 = 300.
    // Knuth buckets: id1=761(>=750 drop) id2=522 id3=283 id4=44 keep;
    // id5=805(>=300 drop); C unlisted -> dropped.
    val kept = graft.operators.Pipeline.mixToBudget(
      d, "doc_id", "source", "ntok", budgetTokens = 60L,
      weightsPermille = Map("A" -> 500, "B" -> 500))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"got $kept")
    // A huge budget caps every listed source at 1000 permille.
    val all = graft.operators.Pipeline.mixToBudget(
      d, "doc_id", "source", "ntok", budgetTokens = 1000000L,
      weightsPermille = Map("A" -> 500, "B" -> 500))
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("tokens/shingles/fingerprint handle empty and short docs") {
    val d = Seq((1L, ""), (2L, "one"), (3L, "one two"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val r = d.select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).as("n"),
      size(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)).as("sh"),
      TextFunctions.fingerprint(TextFunctions.tokens(col("text"))).as("fp"))
      .as[(Long, Int, Int, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 0 && r(1L)._3 == 0 && r(1L)._4 == 0L)
    assert(r(2L)._2 == 1 && r(2L)._3 == 0)
    assert(r(3L)._2 == 2 && r(3L)._3 == 0)
    assert(r(4L)._2 == 4 && r(4L)._3 == 2)
  }
}
