package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — is a HigherOrderFunction chain, which Spark evaluates via
  * `CodegenFallback` (per-row interpreted lambdas, boxed closures). For
  * the similarity-search hot path (dedup/ANN scoring over billions of
  * vectors) that is the difference between staying inside a
  * whole-stage-codegen span and breaking it, so this is one of the few
  * places a custom `Expression` with `doGenCode` is genuinely warranted
  * (preference order (b) — compose-first didn't survive profiling).
  *
  * Semantics: Σ a(i)·b(i) folded in index order — bit-identical to the
  * HOF formulation and to the DuckDB oracle's `list_reduce` fold, so
  * swapping implementations cannot change results. Arrays of unequal
  * length yield null, exactly like the HOF chain (`zip_with` pads the
  * shorter array with nulls, the multiply turns them into null elements,
  * and the `aggregate` fold propagates null to the result). Null input →
  * null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Length mismatch returns null even for non-nullable inputs.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level access for the library's native
  * expressions (usable from SQL after [[GraftFunctions.register]]). */
object GraftFunctions {
  import org.apache.spark.sql.functions.call_function

  /** Column-level dot product (requires array<double> inputs; cast
    * first for float arrays). */
  def dot_product(a: Column, b: Column): Column = {
    // Column ⇄ Expression bridging goes through the session's function
    // registry so this works on both classic and connect Column APIs.
    call_function("graft_dot", a, b)
  }

  /** array<string> tokens → array<long> polynomial codes. */
  def token_codes(toks: Column): Column = call_function("graft_token_codes", toks)

  /** Minhash entry from precomputed codes (null for empty docs). */
  def min_seeded_hash(codes: Column, seed: Column): Column =
    call_function("graft_minhash", codes, seed.cast("long"))

  /** 32-bit SimHash digest from precomputed codes (seed 1). */
  def simhash32(codes: Column): Column = call_function("graft_simhash32", codes)

  /** Seeded 32-bit SimHash digest; independent seeds yield independent
    * digests (the 64-bit pairing digest is seeds 1 and 2 concatenated). */
  def simhash32Seeded(codes: Column, seed: Long): Column =
    call_function("graft_simhash32", codes,
      org.apache.spark.sql.functions.lit(seed))

  /** Rolling polynomial fold over codes (fingerprints: mult = 131). */
  def poly_fold(codes: Column, mult: Long): Column =
    call_function("graft_poly_fold", codes,
      org.apache.spark.sql.functions.lit(mult))

  /** Distinct word w-shingles (first-occurrence order). */
  def word_shingles(toks: Column, w: Int): Column =
    call_function("graft_shingles", toks,
      org.apache.spark.sql.functions.lit(w))

  /** PQ ADC lookup-sum: Σ_s lut(s)(codes(s)), index-order fold
    * (codegen'd — the ANN scan's per-row hot expression). */
  def pq_adc(codes: Column, lut: Column): Column =
    call_function("graft_pq_adc", codes, lut)

  /** Register graft's native functions on the session (idempotent — a
    * session that already has them is left untouched, so per-query
    * registration calls don't spam "replaced function" log warnings).
    * `synchronized`: overlapped store operations (graft.util.Par) may
    * race their first-use registration; the registry mutation must be
    * one writer at a time. */
  def register(spark: SparkSession): Unit = synchronized {
    val r = spark.sessionState.functionRegistry
    if (r.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles")))
      return
    r.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction(
      "graft_token_codes", exprs => TokenCodes(exprs(0)), "built-in")
    r.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinSeededHash(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction(
      "graft_simhash32", exprs => SimHash32(exprs(0),
        if (exprs.length > 1) foldableLong(exprs(1)) else 1L), "built-in")
    r.createOrReplaceTempFunction(
      "graft_poly_fold", exprs => PolyFold(exprs(0), foldableLong(exprs(1))),
      "built-in")
    r.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs(0), foldableLong(exprs(1)).toInt),
      "built-in")
    r.createOrReplaceTempFunction(
      "graft_pq_adc", exprs => PqAdcSum(exprs(0), exprs(1)), "built-in")
  }

  private def foldableLong(e: Expression): Long = e.eval() match {
    case l: Long    => l
    case i: Integer => i.toLong
    case other => throw new IllegalArgumentException(
      s"graft_poly_fold multiplier must be an integer literal, got $other")
  }
}
