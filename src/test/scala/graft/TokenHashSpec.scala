package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions}

/** Differential tests: every native token-hash expression must agree
  * bit-for-bit with the interpreted HOF formulation it replaced. */
class TokenHashSpec extends SparkSpec {

  test("native minhash/simhash/fingerprint match HOF twins bit-for-bit") {
    GraftFunctions.register(spark)
    val toks = TextFunctions.tokens(col("text"))
    val cmp = spark.read.parquet(s"$sf/documents.parquet")
      .filter(size(toks) > 0)
      .select(
        TextFunctions.minhash(toks, lit(3)).as("n_mh"),
        TextFunctions.minhashHof(toks, lit(3)).as("h_mh"),
        TextFunctions.simhash32(toks).as("n_sh"),
        TextFunctions.simhash32Hof(toks).as("h_sh"),
        TextFunctions.fingerprint(toks).as("n_fp"),
        TextFunctions.fingerprintHof(toks).as("h_fp"))
    assert(cmp.count() > 0)
    assert(cmp.filter(
      col("n_mh") =!= col("h_mh") or col("n_sh") =!= col("h_sh") or
        col("n_fp") =!= col("h_fp")).count() == 0)
  }

  test("all minhash seeds agree with the HOF twin") {
    GraftFunctions.register(spark)
    val toks = TextFunctions.tokens(col("text"))
    val codes = TextFunctions.tokenCodes(toks)
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .filter(size(toks) > 0)
      .select(col("doc_id"), explode(sequence(lit(0), lit(7))).as("seed"),
        GraftFunctions.min_seeded_hash(codes, col("seed")).as("n"),
        TextFunctions.minhashHof(toks, col("seed")).as("h"))
    assert(df.filter(col("n") =!= col("h")).count() == 0)
  }

  test("native word shingles match the HOF formulation") {
    GraftFunctions.register(spark)
    val toks = TextFunctions.tokens(col("text"))
    val cmp = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        GraftFunctions.word_shingles(toks, 3).as("n"),
        array_distinct(TextFunctions.shingles(toks, 3)).as("h"))
    assert(cmp.filter(not(col("n") === col("h"))).count() == 0)
  }

  test("edge cases: empty token array and null input") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, None),
      (3L, Some(Seq("hello", "world")))
    ).toDF("id", "toks")
    val r = df.select(
      TextFunctions.minhash(col("toks"), lit(0)).as("mh"),
      TextFunctions.simhash32(col("toks")).as("sh"),
      TextFunctions.fingerprint(col("toks")).as("fp")).collect()
    assert(r(0).isNullAt(0) && r(0).getLong(1) == 0L && r(0).getLong(2) == 0L)
    assert(r(1).isNullAt(0) && r(1).isNullAt(1) && r(1).isNullAt(2))
    assert(!r(2).isNullAt(0) && r(2).getLong(2) != 0L)
  }
}
