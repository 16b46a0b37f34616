package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{langIdHeuristic, qualityScore, tokens}

/** End-to-end corpus cleaning — the composition a training-data
  * pipeline actually runs, chained from the individual operators so the
  * whole thing is one lazy plan:
  *
  *   1. quality floor ([[graft.functions.TextFunctions.qualityScore]]
  *      ≥ `minQuality`) and language filter
  *      ([[graft.functions.TextFunctions.langIdHeuristic]] == `lang`) —
  *      pure per-row projections, fused into the scan;
  *   2. exact dedup: lowest id survives per identical text (one shuffle
  *      keyed by text);
  *   3. near-dup drop: SimHash pairs within Hamming ≤ `maxHamming`
  *      over the survivors ([[Dedup.simhashNearDups]] — banded,
  *      bucket-capped), greedily dropping the higher id of each pair.
  *
  * Returns the surviving rows of `df` unchanged, as an EAGERLY
  * materialized catalog-visible cache: every intermediate cache the
  * composition creates (the dedup survivors, the SimHash digests, the
  * component labels) is released before returning, so the returned
  * frame's own `unpersist()` is the ONLY handle a library caller needs
  * — composing many cleans accumulates nothing (the cache-release
  * contract, same as `PreservedState.release`/`IncrResult.release`).
  * Deterministic end to end, so the `q_pipeline_clean` gate mirrors
  * every step in SQL.
  */
object Pipeline {

  /** Stage-1 quality/language predicate — ONE definition shared by both
    * batch cleans and the incremental continuation
    * ([[IncrementalPipeline.continueClean]]), whose gate-enforced
    * equivalence depends on the filter staying in lockstep. */
  private[operators] def keptOnly(df: DataFrame, textCol: String,
      minQuality: Double, lang: String): DataFrame = {
    val toksC = tokens(col(textCol))
    df.filter(qualityScore(toksC) >= minQuality &&
      langIdHeuristic(toksC) === lang)
  }

  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double, lang: String, maxHamming: Int = 3): DataFrame = {
    val kept = keptOnly(df, textCol, minQuality, lang)
    // exact dedup as groupBy-min + id semi-join, NOT a window over the
    // text: the groupBy partial-aggregates map-side, so a pathological
    // hot text (millions of identical docs) never floods one partition
    // the way a text-partitioned window would; the semi-join keys on
    // the unique id — skew-free by construction.
    val firstIds = kept.groupBy(col(textCol)).agg(min(col(idCol)).as("_keep"))
      .select(col("_keep"))
    val deduped = kept
      .join(firstIds, col(idCol) === col("_keep"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (pairs, releasePairs) =
      Dedup.simhashNearDupsWithRelease(deduped, idCol, textCol, maxHamming)
    val drop = pairs.select(col("b").as(idCol)).distinct()
    val out = deduped.join(drop, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    releasePairs()
    deduped.unpersist(blocking = false)
    out
  }

  /** [[cleanCorpus]] with COMPONENT-based near-dup dropping: the
    * SimHash pairs are clustered with
    * [[Dedup.connectedComponents]] and exactly ONE doc per cluster
    * survives (the minimum id). Near-duplication is treated as
    * transitive — pairs (1,3) and (2,3) collapse {1,2,3} to doc 1 —
    * where [[cleanCorpus]]'s greedy pair-drop would keep both 1 and 2
    * (it only drops the higher id of each pair). The transitive policy
    * is what fuzzy dedup at corpus scale wants: a boilerplate family is
    * one cluster, not a web of pairwise survivors. */
  def cleanCorpusByComponents(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double, lang: String, maxHamming: Int = 3): DataFrame = {
    val kept = keptOnly(df, textCol, minQuality, lang)
    val firstIds = kept.groupBy(col(textCol)).agg(min(col(idCol)).as("_keep"))
      .select(col("_keep"))
    val deduped = kept
      .join(firstIds, col(idCol) === col("_keep"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (rawPairs, releasePairs) =
      Dedup.simhashNearDupsWithRelease(deduped, idCol, textCol, maxHamming)
    val pairs = rawPairs.select("a", "b")
    val comps = Dedup.connectedComponents(pairs)
    val drop = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    val out = deduped.join(drop, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    releasePairs()
    comps.unpersist(blocking = false)
    deduped.unpersist(blocking = false)
    out
  }

  /** Stratified deterministic sampling: keep a row iff its Knuth-hash
    * bucket (id·2654435761 mod 1000) falls under its stratum's permille
    * rate — the "downsample boilerplate strata, keep rare strata whole"
    * rebalancing step of corpus curation. Pure map-side filter (no
    * shuffle, no RNG state): reproducible across engines and across
    * runs, and co-sampling different tables on the same id keeps rows
    * aligned. Strata not in `permille` fall back to `defaultPermille`.
    *
    * The bucket is computed modulo 1000 from the start:
    * (id·2654435761) mod 1000 ≡ ((id mod 1000)·761) mod 1000, so the
    * sample is IDENTICAL to the full-width multiply for every
    * non-negative id while the arithmetic never leaves ±10⁶ — the
    * naive `id * 2654435761L` overflows signed 64-bit at
    * id ≥ ~3.47·10⁹ (a plausible doc count at the 100 TB posture),
    * which ANSI mode (Spark 4's default) turns into a job-killing
    * ARITHMETIC_OVERFLOW. `pmod` keeps negative ids in [0, 1000) too,
    * where a signed `%` would yield a negative remainder that compares
    * below every rate (row always kept, silently skewing the rates).
    */
  def sampleByStrata(df: DataFrame, idCol: String, strataCol: String,
      permille: Map[String, Int], defaultPermille: Int = 0): DataFrame = {
    require(permille.values.forall(v => v >= 0 && v <= 1000) &&
      defaultPermille >= 0 && defaultPermille <= 1000, "rates are permille")
    val rate = permille.foldLeft(lit(defaultPermille)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val bucket = pmod(pmod(col(idCol), lit(1000L)) * lit(2654435761L % 1000L),
      lit(1000L))
    df.filter(bucket < rate)
  }

  /** Corpus mixing to a token budget: derive each source's permille
    * sampling rate so the expected surviving token count approximates
    * `budgetTokens · weight_s / 1000`, then apply the same Knuth-bucket
    * deterministic filter as [[sampleByStrata]] — the "rebalance N
    * heterogeneous sources into one training mixture" step. Sources
    * absent from `weightsPermille` get weight 0 (dropped).
    *
    * All rate arithmetic is integer (Long) so the oracle reproduces it
    * bit-for-bit: desired_s = budget·w_s div 1000;
    * rate_s = min(1000, desired_s·1000 div T_s). A source whose corpus
    * share already undershoots its target keeps everything (rate capped
    * at 1000) — mixing can only downsample, never invent tokens.
    * Overflow headroom: budget ≤ ~9·10¹⁴ tokens (a 100 TB corpus is
    * ~10¹³-10¹⁴) keeps desired·1000 inside signed 64-bit.
    *
    * Scale shape: one groupBy(source) partial-aggregated count whose
    * result is O(#sources) rows collected to the driver (documented
    * bound — source catalogs are small even when corpora are not),
    * then a pure map-side filter; no second shuffle, no RNG state, and
    * co-sampling sibling tables on the same id stays aligned.
    */
  def mixToBudget(df: DataFrame, idCol: String, sourceCol: String,
      ntokCol: String, budgetTokens: Long,
      weightsPermille: Map[String, Int]): DataFrame = {
    require(budgetTokens >= 0 && budgetTokens <= Long.MaxValue / 1000,
      "budget out of range")
    require(weightsPermille.values.forall(v => v >= 0 && v <= 1000),
      "weights are permille")
    // O(#sources) driver data: one row per distinct source value.
    val totals = df.groupBy(col(sourceCol)).agg(
      sum(col(ntokCol)).cast("long").as("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = totals.flatMap { case (src, t) =>
      weightsPermille.get(src).map { w =>
        val desired = budgetTokens * w / 1000L
        val r = if (t <= 0L) 0L else math.min(1000L, desired * 1000L / t)
        src -> r.toInt
      }
    }
    sampleByStrata(df, idCol, sourceCol, rates, defaultPermille = 0)
  }

  /** Gopher-style n-gram repetition metrics: for each document, the
    * fraction of its `n`-grams occupied by the single most frequent
    * one (`top_frac`) and the fraction occupied by `n`-grams that
    * occur more than once (`dup_frac`), plus the keep/drop decision
    * under the given ceilings — the repetition filters a quality
    * pipeline applies before training (boilerplate and generated spam
    * have pathological repetition long before any model-based score
    * notices; Gopher's table sweeps n = 2..4 for top-gram ceilings,
    * which is this operator at n = 2, 3, 4). Documents with fewer
    * than `n` tokens have no `n`-grams; both fractions are defined as
    * 0 and the document is kept.
    *
    * Scale shape: one explode + groupBy(doc, gram) with map-side
    * partial counts (a gram repeated within a doc combines before the
    * shuffle), then a groupBy(doc) rollup — the same two-shuffle shape
    * as [[tfidf]], keyed by doc id so no gram's global frequency is
    * ever materialized (repetition is per-document; there is no
    * corpus-wide hot key).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      topFracMax: Double = 0.20, dupFracMax: Double = 0.60,
      n: Int = 2): DataFrame = {
    require(n >= 2, s"repetitionStats: n must be >= 2, got $n")
    val grams = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"),
        when(size(col("_toks")) >= n,
          expr(s"transform(sequence(0, size(_toks) - $n), " +
            s"i -> concat_ws(' ', slice(_toks, i + 1, $n)))"))
          .otherwise(array().cast("array<string>")).as("_grams"))
    val base = df.select(col(idCol).as("doc_id"))
    val counts = grams
      .select(col("doc_id"), explode(col("_grams")).as("_g"))
      .groupBy(col("doc_id"), col("_g")).agg(count(lit(1)).as("_c"))
    val agg = counts.groupBy("doc_id").agg(
      sum(col("_c")).cast("long").as("_ng"),
      max(col("_c")).cast("long").as("_top"),
      sum(when(col("_c") > 1, col("_c")).otherwise(lit(0L)))
        .cast("long").as("_dup"))
    base.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_ng"), lit(0L)).cast("int").as("ng"),
        round(coalesce(col("_top").cast("double") / col("_ng"), lit(0.0)), 6)
          .as("top_frac"),
        round(coalesce(col("_dup").cast("double") / col("_ng"), lit(0.0)), 6)
          .as("dup_frac"))
      .withColumn("keep",
        (col("top_frac") <= topFracMax && col("dup_frac") <= dupFracMax)
          .cast("int"))
  }

  /** Statistical language-model quality scoring — the perplexity-filter
    * signal of CCNet (Wenzek et al., arXiv:1911.00359), with an
    * in-corpus add-k-smoothed bigram model standing in for the external
    * KenLM (no model artifacts exist in this environment, and an
    * in-corpus model is the self-supervised variant: documents whose
    * token transitions are unlike the corpus's own distribution score
    * high). Per document,
    *
    *   avg_nll = −(1/nb) · Σᵢ ln( (C(wᵢ,wᵢ₊₁) + k) / (C(wᵢ) + k·V) )
    *
    * over its nb = max(ntokens−1, 0) bigram occurrences, where C(·) are
    * CORPUS-wide bigram/unigram counts and V the vocabulary size.
    * Fluent corpus-typical text scores low; gibberish, shuffled tokens
    * and vocabulary soup score high. Returns (doc_id, nb, avg_nll,
    * keep) for every input row; docs with <2 tokens have nb 0, avg_nll
    * 0, keep 1; `keep` = avg_nll ≤ `maxNll`.
    *
    * Scale shape: two count aggregations (map-side combined) and two
    * key-partitioned joins, all on token keys. The per-doc bigram bag
    * is pre-counted (`_n` per (doc, a, b)) so repeated bigrams join
    * once, and the vocabulary size rides along as a broadcast 1-row
    * frame — no driver-side scalar, the whole score is one lazy plan.
    * The unigram join's probe side is Zipf-skewed by nature; AQE's
    * skew-join split handles the hot-token partitions (the corpus-wide
    * counts themselves partial-aggregate map-side, so no single
    * reducer sees a hot token's full occurrence stream). */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5, maxNll: Double = 3.5): DataFrame =
    lmScoreAgainst(df, df, idCol, textCol, k, maxNll)

  /** [[lmScore]] with the TRAIN/APPLY split a production filter runs:
    * the model's counts come from `train` (the curated reference
    * corpus), the scores from `score` (e.g. a fresh crawl delta) — so
    * scoring new data never retrains, and incremental ingest reuses a
    * frozen model the way CCNet reuses its pretrained KenLM. Bigrams
    * and unigrams unseen in `train` are pure-smoothing terms
    * (C(·) = 0 → ln(k / (k·V)) = −ln V for an OOV history), which is
    * exactly the heavy penalty out-of-distribution text should get. */
  def lmScoreAgainst(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, k: Double = 0.5, maxNll: Double = 3.5): DataFrame = {
    val uni = lmToksOf(train, idCol, textCol)
      .select(explode(col("_toks")).as("_a"))
      .groupBy("_a").agg(count(lit(1)).as("_cw"))
    val bi = lmBigramsOf(lmToksOf(train, idCol, textCol))
      .groupBy("_a", "_b").agg(count(lit(1)).as("_cab"))
    lmScoreFromCounts(uni, bi, score, idCol, textCol, k, maxNll)
  }

  /** ONE tokenize/bigram/score core for the self-trained, frozen and
    * incrementally-maintained ([[LmCountsStore]]) model variants — the
    * scoring semantics must not drift between them. `uni(_a, _cw)` /
    * `bi(_a, _b, _cab)` are the model's corpus counts, whatever their
    * provenance. */
  private[operators] def lmToksOf(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      tokens(coalesce(col(textCol), lit(""))).as("_toks"))

  private[operators] def lmBigramsOf(toks: DataFrame): DataFrame = toks
    .filter(size(col("_toks")) >= 2)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(_toks) - 1), " +
        "i -> struct(element_at(_toks, i) as _a, " +
        "element_at(_toks, i + 1) as _b))")).as("_e"))
    .select(col("doc_id"), col("_e._a").as("_a"), col("_e._b").as("_b"))

  private[operators] def lmScoreFromCounts(uni: DataFrame, bi: DataFrame,
      score: DataFrame, idCol: String, textCol: String, k: Double,
      maxNll: Double): DataFrame = {
    val vocab = uni.agg(count(lit(1)).cast("double").as("_v"))
    val bgDoc = lmBigramsOf(lmToksOf(score, idCol, textCol))
      .groupBy("doc_id", "_a", "_b").agg(count(lit(1)).as("_n"))
    val scored = bgDoc
      .join(bi, Seq("_a", "_b"), "left")
      .join(uni, Seq("_a"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id").agg(
        sum(col("_n")).as("_nb"),
        sum(col("_n").cast("double") *
          log((coalesce(col("_cab"), lit(0L)) + lit(k)) /
            (coalesce(col("_cw"), lit(0L)) + lit(k) * col("_v"))))
          .as("_s"))
    score.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_nb"), lit(0L)).cast("long").as("nb"),
        round(coalesce(-col("_s") / col("_nb"), lit(0.0)), 6).as("avg_nll"))
      .withColumn("keep", (col("avg_nll") <= maxNll).cast("int"))
  }

  /** Cross-document duplicated-SPAN statistics — the substring-level
    * dedup signal of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better" (arXiv:2107.06499): for each document,
    * the fraction of its tokens covered by at least one `w`-token
    * span that also occurs verbatim in ANOTHER document. Exact and
    * near duplicates score ~1.0; documents quoting a shared passage
    * score the passage's share; fully original text scores 0. Returns
    * (doc_id, n_tokens, n_covered, dup_frac, keep) for every input
    * row, `keep` = dup_frac ≤ `maxFrac` (documents shorter than `w`
    * tokens have no spans: dup_frac 0, kept).
    *
    * This is the windowed approximation of the paper's suffix-array
    * ExactSubstr dedup: a duplicated substring of length ≥ w is
    * detected exactly (every length-w window inside it is duplicated),
    * shorter ones are ignored by design — no suffix array needed, so
    * the whole computation is three shuffles of corpus-proportional
    * tables.
    *
    * Scale shape: one explode to (doc, pos, span) rows; span document
    * frequency is a distinct + groupBy(span) count with map-side
    * partial aggregation (hot boilerplate spans combine before the
    * shuffle); only spans with df ≥ 2 fan out ×w into covered
    * positions (duplicated material is the minority at corpus scale),
    * collapsed by a distinct before the per-doc rollup. Spans travel
    * as 64-bit xxhash64 digests (the state/shuffle-width object — see
    * [[IncrementalDupSpans.spansOf]] for the measured win and the
    * ~1e-5-per-20M-spans collision trade); positions and counts are
    * integer-exact, so the output still matches the string-based
    * oracle digit-for-digit barring a collision. Measured linear
    * 1x→100x (ScaleBench `dup_spans`).
    */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, maxFrac: Double = 0.5): DataFrame = {
    require(w >= 2, s"dupSpanStats: w must be >= 2, got $w")
    // span derivation and scoring are SHARED with the incremental twin
    // ([[IncrementalDupSpans]]) — one definition, no drift
    val spans = IncrementalDupSpans.spansOf(df, idCol, textCol, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a span is duplicated when it occurs in >= 2 DISTINCT documents —
    // in-doc repetition alone is repetitionStats' business, not dedup's
    val dupSpans = spans.select("doc_id", "s").distinct()
      .groupBy("s").agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= 2).select("s")
    val out = IncrementalDupSpans.scoreFor(spans,
      IncrementalDupSpans.ntoksOf(df, idCol, textCol), dupSpans, w, maxFrac)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    spans.unpersist(blocking = false)
    out
  }

  /** The ExactSubstr CUT — Lee et al. 2107.06499's actual
    * transformation, where [[dupSpanStats]] is its audit: REMOVE from
    * every document the tokens covered by a cross-document duplicated
    * `w`-token span, keeping one fluent survivor nowhere (the paper
    * deliberately cuts ALL copies: the surviving signal lives in the
    * rest of each document, and training-data loss beats duplication).
    * Returns one row per input document: (doc_id, clean, n_kept,
    * n_removed), `clean` the surviving tokens in original order —
    * documents with nothing duplicated come back whitespace-normalized
    * but intact, fully-duplicated documents as empty husks (the caller
    * decides; [[dupSpanStats]]' keep bit is the usual gate).
    *
    * Scale shape: the [[IncrementalDupSpans.spansOf]] digest windowing
    * and the same ×w covered-position fan-out as the audit (touches
    * only duplicated spans), then one posexplode and a per-doc
    * sort_array reassembly — all doc-keyed shuffles, no corpus-wide
    * hot key. */
  def cutDupSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    require(w >= 2, s"cutDupSpans: w must be >= 2, got $w")
    // span derivation and the cut itself are SHARED with the segmented
    // store's cut maintenance ([[IncrementalDupSpans.cutFor]]) — one
    // definition, no drift between batch and incremental
    val spans = IncrementalDupSpans.spansOf(df, idCol, textCol, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupSpans = spans.select("doc_id", "s").distinct()
      .groupBy("s").agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= 2).select("s")
    val out = IncrementalDupSpans.cutFor(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        spans, dupSpans, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    spans.unpersist(blocking = false)
    out
  }

  /** Corpus-level exact LINE deduplication — boilerplate removal (the
    * CCNet/RefinedWeb line-filter rule: a line repeated across many
    * documents is navigation/footer/template noise, not content).
    * Splits `textCol` on `sep`, drops every line whose DOCUMENT
    * frequency exceeds `maxDocs`, and reassembles each document with
    * its surviving lines in original order. Returns one row per input
    * document: (doc_id, clean, n_kept, n_removed) — a document whose
    * lines are all boilerplate comes back with `clean` empty, never
    * dropped (the caller decides what to do with husks).
    *
    * Scale shape: one explode; document frequency is a
    * distinct-(doc, line) + groupBy(line) count with map-side partial
    * aggregation (a boilerplate line hot across millions of docs
    * combines before the shuffle — no hot-key blowup); the bad-line
    * set is boilerplate-sized, so the anti-join broadcasts; reassembly
    * is one groupBy(doc) with an order-restoring sort over (pos, line)
    * structs. Eager + internal caches released — `unpersist()` on the
    * returned frame is the caller's only handle (the cache-release
    * contract, as [[cleanCorpus]]).
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      maxDocs: Long, sep: String = "\n"): DataFrame = {
    // line derivation and reassembly are SHARED with the incremental
    // twin ([[IncrementalLineDedup]]) — the incr ≡ batch oracle
    // depends on one definition of both
    val lines = IncrementalLineDedup.linesOf(df, idCol, textCol, sep)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = lines.select("doc_id", "line").distinct()
      .groupBy("line").agg(count(lit(1)).as("nd"))
    val out = IncrementalLineDedup.cleanFor(lines, dfreq, maxDocs, sep)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    lines.unpersist(blocking = false)
    out
  }

  /** Benchmark decontamination: drop every corpus document sharing at
    * least one word `w`-shingle with the evaluation set — the standard
    * containment rule for keeping test benchmarks out of training data
    * (exact n-gram overlap, threshold-free: one hit disqualifies, unlike
    * [[Dedup.ngramJaccardPairs]]' similarity confirm).
    *
    * Scale shape: the eval side collapses to its DISTINCT shingle set
    * (eval suites are tiny next to a 100 TB corpus — the semi-join's
    * build side, broadcast by the planner when it fits); the corpus side
    * is one scan + explode with map-side early-out via the semi-join —
    * a contaminated doc id is emitted once per matching shingle and
    * collapsed by the distinct before the final anti-join on the unique
    * doc id (skew-free by construction). Documents shorter than `w`
    * tokens produce no shingles and are never flagged.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, evalTextCol: String, w: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def shingled(df: DataFrame, tc: String, out: String) =
      df.select(explode(graft.functions.GraftFunctions
        .word_shingles(tokens(col(tc)), w)).as(out)).distinct()
    val evalShingles = shingled(evalSet, evalTextCol, "_es")
    val contaminated = corpus
      .select(col(idCol), explode(graft.functions.GraftFunctions
        .word_shingles(tokens(col(textCol)), w)).as("_cs"))
      .join(evalShingles, col("_cs") === col("_es"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Graded contamination: for each corpus document, the fraction of
    * its DISTINCT word `w`-shingles that appear anywhere in the
    * evaluation set — the continuous variant of [[decontaminate]]'s
    * one-hit-disqualifies rule, for pipelines that quarantine by
    * threshold (or audit how MUCH of a doc is benchmark text) instead
    * of dropping outright. Documents shorter than `w` tokens have no
    * shingles; their fraction is defined as 0.
    *
    * Scale shape: identical to [[decontaminate]] — the eval side
    * collapses to its distinct shingle set (broadcast-sized next to
    * the corpus); the corpus side is one scan + explode to per-doc
    * DISTINCT shingles, a LEFT join against the eval set to flag hits
    * (no row multiplication: the eval set is distinct on the join
    * key), and a groupBy(doc) rollup. Skew-free: every shuffle is
    * keyed by (doc, shingle) or doc id.
    */
  def contaminationScore(corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, evalTextCol: String, w: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val evalShingles = evalSet
      .select(explode(graft.functions.GraftFunctions
        .word_shingles(tokens(col(evalTextCol)), w)).as("_es"))
      .distinct().withColumn("_hit", lit(1L))
    val docShingles = corpus
      .select(col(idCol).as("doc_id"), explode(graft.functions.GraftFunctions
        .word_shingles(tokens(col(textCol)), w)).as("_cs"))
      .distinct()
    val agg = docShingles
      .join(evalShingles, col("_cs") === col("_es"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("_nsh"),
        sum(coalesce(col("_hit"), lit(0L))).as("_nhit"))
    corpus.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_nsh"), lit(0L)).cast("int").as("n_shingles"),
        coalesce(col("_nhit"), lit(0L)).cast("int").as("n_hits"),
        round(coalesce(col("_nhit").cast("double") / col("_nsh"), lit(0.0)), 6)
          .as("contam_frac"))
  }

  /** Corpus TF-IDF: per (doc, token) rows with term frequency, document
    * frequency, and `tf · ln(N / df)` — the standard relevance/keyword
    * weight a curation pipeline uses for corpus statistics and
    * lexical-similarity search.
    *
    * Scale shape: one explode + groupBy(doc, token) for tf (map-side
    * partial counts — a token repeated within a doc never leaves its
    * partition uncombined), one groupBy(token) for df (one row per
    * distinct token AFTER partial aggregation, so a stopword's df costs
    * one row per input partition, not one per occurrence), and a
    * token-keyed join to combine — the df side is one row per vocab
    * entry, orders of magnitude smaller than the corpus. N (total docs)
    * is a broadcast scalar via crossJoin of a 1-row aggregate, not a
    * driver round-trip, so the whole operator is one lazy plan.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksE = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val tf = toksE.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("_n"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf") * log(col("_n").cast("double") / col("df"))).as("tfidf"))
  }

  /** Sequence packing: assign documents to fixed-token-budget packs —
    * the "fill 4k-token training sequences from variable-length docs"
    * step of a pretraining pipeline. Documents are packed in stable
    * (strata, shard, id) order; a document whose running prefix sum
    * crosses a `budget` boundary starts the next pack (boundary-
    * crossing rule: pack = floor(prefix_sum_before_doc / budget) —
    * deterministic, order-stable, and windowable, unlike true first-fit
    * bin packing whose greedy reset is inherently sequential). A doc
    * longer than `budget` gets a pack of its own plus the overflow
    * (callers chunk oversized docs upstream).
    *
    * Scale shape: the only shuffle is the window's hash partition on
    * (strata, shard) — `shards` bounds the longest ordered scan to
    * ~|stratum|/shards regardless of corpus size, so no single task
    * ever sorts a whole stratum; packing is then a running sum per
    * partition. Returns `df` + (`n_tokens`, `shard`, `pack`).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, budget: Long, shards: Int = 64): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .withColumn("pack", expr(s"(_cum - n_tokens) div ${budget}L"))
      .drop("_cum")
  }

  /** PII scrubbing: replace e-mail addresses, phone numbers, and long
    * digit runs with typed placeholder tags, returning the scrubbed
    * text plus per-class match counts (the audit trail a compliance
    * pass keeps). Pure per-row projection — no shuffle, fused into the
    * scan, linear in corpus bytes at any scale. Patterns are anchored
    * to the portable regex subset (character classes + bounded
    * repetition + alternation — no backreferences or lookaround) that
    * Java's engine and RE2-family engines (the DuckDB oracle)
    * interpret identically. Replacement order matters and is fixed:
    * e-mails first (they contain digits), then phones, then bare
    * digit runs.
    *
    * Phone shapes covered (n_phone counts ALL of them):
    * 10-digit with `-`/`.`/space separators (`555-123-4567`,
    * `555.123.4567`), parenthesized area code (`(555) 123-4567`),
    * either with a `+CC` country prefix (`+1 555 123 4567`), and the
    * bare `+CC-NNN-NNNN` short form. Anything else digit-shaped
    * (7-digit locals, unseparated runs) still masks as <NUM> — the
    * audit counts are per THESE classes, not a phone-ness oracle.
    *
    * Alternation-order note: Java picks the first matching
    * alternative, RE2 the longest — the branches are arranged so the
    * first (optional-CC + 10-digit) is strictly longer than the
    * second (+CC-NNN-NNNN) whenever both match at a position, making
    * the two engines' choices coincide.
    */
  def scrubPii(df: DataFrame, textCol: String,
      outCol: String = "scrubbed"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "(\\+[0-9]{1,2}[- ])?(\\([0-9]{3}\\) ?|[0-9]{3}[-. ])" +
      "[0-9]{3}[-. ][0-9]{4}" +
      "|\\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}"
    val num = "[0-9]{4,}"
    df.withColumn("n_email", regexp_count(col(textCol), lit(email)))
      .withColumn("_s1", regexp_replace(col(textCol), email, "<EMAIL>"))
      .withColumn("n_phone", regexp_count(col("_s1"), lit(phone)))
      .withColumn("_s2", regexp_replace(col("_s1"), phone, "<PHONE>"))
      .withColumn("n_num", regexp_count(col("_s2"), lit(num)))
      .withColumn(outCol, regexp_replace(col("_s2"), num, "<NUM>"))
      .drop("_s1", "_s2")
  }
}
