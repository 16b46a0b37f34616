package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface
  * (tokenize, deterministic hashes, minhash, simhash, fingerprints,
  * language-ID and quality heuristics).
  *
  * No UDFs anywhere: the hot hash folds (token codes, minhash, simhash,
  * fingerprint) are native codegen'd expressions ([[TokenCodes]],
  * [[MinSeededHash]], [[SimHash32]], [[PolyFold]]); the rest are Spark
  * higher-order array functions (which execute via `CodegenFallback` —
  * fine off the hot path). Every hash is plain 64-bit modular
  * arithmetic so the DuckDB oracle can reproduce it bit-for-bit
  * (`list_reduce([ord(c) ...])` on the SQL side); each native
  * expression keeps its HOF twin (`*Hof`) for differential tests.
  *
  * The reference engine carries text as opaque `Text` values re-parsed
  * per operator (e.g. `IterKmeans.java:346-357`); here tokens become a
  * first-class array column Catalyst can prune and push down.
  */
object TextFunctions {

  /** Modulus shared by all polynomial hashes (fits products in Long). */
  val P: Long = 1000000007L

  /** Non-empty tokens split on runs of spaces. */
  def tokens(text: Column): Column =
    filter(split(text, " +"), t => t =!= lit(""))

  /** Polynomial rolling hash of a token's characters:
    * fold(h → h·31 + ord(c) mod P). Matches DuckDB
    * `list_reduce([ord(c)::BIGINT for c in string_split(t,'')], (a,b) -> (a*31+b)%P)`. */
  def tokenCode(token: Column): Column =
    aggregate(
      transform(split(token, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % P)

  /** Universal-hash family over token codes:
    * h_seed(t) = (a_s·code + b_s) mod P with LCG-mixed per-seed
    * constants — small multipliers (e.g. 2s+1) would leave the seeds'
    * minhashes correlated (they all track the minimum code) and wreck
    * LSH recall. a_s,b_s < P so a_s·code < 10¹⁸ stays in Long/BIGINT. */
  def seededHash(code: Column, seed: Column): Column = {
    val a = (lit(1103515245L) * (seed + 1) + 12345L) % P
    val b = (lit(22695477L) * (seed + 1) + 54321L) % P
    (a * code + b) % P
  }

  /** array<string> tokens → array<long> polynomial codes via the native
    * codegen'd [[TokenCodes]] expression (session must have
    * [[GraftFunctions.register]] applied — `graft.queries.Q.t` does). */
  def tokenCodes(toks: Column): Column = GraftFunctions.token_codes(toks)

  /** Minhash signature entry for one seed: min over tokens of the seeded
    * hash. NULL for documents with no tokens. Native codegen'd
    * ([[MinSeededHash]] ∘ [[TokenCodes]]); [[minhashHof]] is the
    * interpreted HOF formulation it is differentially tested against. */
  def minhash(toks: Column, seed: Column): Column =
    GraftFunctions.min_seeded_hash(tokenCodes(toks), seed)

  /** HOF formulation of [[minhash]] (interpreted `CodegenFallback`;
    * kept as the differential-testing twin of the native expression). */
  def minhashHof(toks: Column, seed: Column): Column =
    array_min(transform(toks, t => seededHash(tokenCode(t), seed)))

  /** Word w-shingles as strings ("a b c"). */
  def shingles(toks: Column, w: Int): Column = {
    val n = size(toks)
    when(n >= w,
      transform(sequence(lit(0), n - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
      .otherwise(array().cast("array<string>"))
  }

  /** 32-bit SimHash over token codes: bit b of the result is 1 iff
    * Σ_tokens (±1 per bit b of g(code)) > 0, with g = seededHash(·, 1).
    * Native codegen'd ([[SimHash32]] ∘ [[TokenCodes]]). */
  def simhash32(toks: Column): Column =
    GraftFunctions.simhash32(tokenCodes(toks))

  /** HOF formulation of [[simhash32]] (differential-testing twin). */
  def simhash32Hof(toks: Column): Column = {
    val hashes = transform(toks, t => seededHash(tokenCode(t), lit(1)))
    // mask for bit b as a column (pow is exact for b ≤ 31)
    def mask(b: Column): Column = pow(lit(2.0), b.cast("double")).cast("long")
    val bitSums = transform(sequence(lit(0), lit(31)), b =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(mask(b)) > 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(31)),
        (s, b) => when(s > 0, mask(b)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** Document fingerprint: rolling polynomial hash over token codes,
    * fold(h → h·131 + code(t) mod P). Native codegen'd
    * ([[PolyFold]] ∘ [[TokenCodes]]). */
  def fingerprint(toks: Column): Column =
    GraftFunctions.poly_fold(tokenCodes(toks), 131L)

  /** HOF formulation of [[fingerprint]] (differential-testing twin). */
  def fingerprintHof(toks: Column): Column =
    aggregate(transform(toks, tokenCode(_)), lit(0L),
      (acc, c) => (acc * 131 + c) % P)

  /** Stopword-ratio feature: fraction of tokens in `words`. */
  def wordRatio(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(set, t))).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean token length (0 for empty docs). */
  def avgTokenLen(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))

  /** English-marker stopwords used by the language-ID heuristic. */
  val EnglishMarkers: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** N-gram-heuristic language ID: high English-stopword ratio → "en";
    * otherwise buckets on a deterministic text statistic so the label is
    * reproducible (real model would plug in here). */
  def langIdHeuristic(toks: Column): Column = {
    val r = wordRatio(toks, EnglishMarkers)
    when(r >= 0.12, lit("en"))
      .when(avgTokenLen(toks) >= 5.0, lit("de"))
      .when(size(toks) % 3 === 0, lit("es"))
      .otherwise(lit("other"))
  }

  /** Composite quality score in [0,1]:
    * 0.4·min(1, nTokens/40) + 0.3·uniqRatio + 0.3·(1 − stopRatio). */
  def qualityScore(toks: Column): Column = {
    val n = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double")
    val uniqRatio = when(n > 0, uniq / n).otherwise(lit(0.0))
    val stop = wordRatio(toks, EnglishMarkers)
    least(n / 40.0, lit(1.0)) * 0.4 + uniqRatio * 0.3 + (lit(1.0) - stop) * 0.3
  }
}
