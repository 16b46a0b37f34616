package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernels for the native token-hash expressions, written once and
  * called from both interpreted `eval` and generated code (the codegen
  * bodies are a single static call per row — no per-element virtual
  * dispatch, no boxing; inputs stay as `ArrayData`/`UTF8String`).
  *
  * All arithmetic is bit-identical to the HOF formulations in
  * [[TextFunctions]] and to the DuckDB oracle's `list_reduce` folds
  * (see the oracle parity rules): polynomial char hash mod P, LCG-mixed
  * seeded universal hashes, ±1 bit voting for SimHash.
  */
object TokenHashOps {
  val P: Long = 1000000007L

  /** Polynomial rolling hash over a token's code points:
    * fold(h → h·31 + cp mod P). Code points, not UTF-16 units, to match
    * Spark's `split(t, "")`+`ascii` (Java regex splits on code point
    * boundaries) and DuckDB's `ord`. */
  def tokenCode(t: UTF8String): Long = {
    val s = t.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  def tokenCodes(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = tokenCode(toks.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** LCG-mixed per-seed multiplier/offset (see TextFunctions.seededHash). */
  def seedA(seed: Long): Long = (1103515245L * (seed + 1) + 12345L) % P
  def seedB(seed: Long): Long = (22695477L * (seed + 1) + 54321L) % P

  /** min over codes of (a_s·code + b_s) mod P; caller handles empty. */
  def minSeededHash(codes: ArrayData, seed: Long): Long = {
    val a = seedA(seed)
    val b = seedB(seed)
    var m = Long.MaxValue
    var i = 0
    val n = codes.numElements()
    while (i < n) {
      val h = (a * codes.getLong(i) + b) % P
      if (h < m) m = h
      i += 1
    }
    m
  }

  /** 32-bit SimHash over token codes with g = seededHash(·, seed):
    * bit b set iff Σ_tokens(±1 per bit b of g(code)) > 0. Independent
    * seeds give independent 32-bit digests; two of them concatenate into
    * the 64-bit digest the pairing operator bands on. */
  def simhash32(codes: ArrayData, seed: Long = 1L): Long = {
    val a = seedA(seed)
    val b = seedB(seed)
    val sums = new Array[Int](32)
    var i = 0
    val n = codes.numElements()
    while (i < n) {
      val h = (a * codes.getLong(i) + b) % P
      var bit = 0
      while (bit < 32) {
        if ((h & (1L << bit)) > 0) sums(bit) += 1 else sums(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var r = 0L
    var bit = 0
    while (bit < 32) { if (sums(bit) > 0) r += (1L << bit); bit += 1 }
    r
  }

  private val ShingleSep = UTF8String.fromString(" ")

  /** Distinct word w-shingles in first-occurrence order; < w tokens →
    * empty. */
  def wordShingles(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= n - w) {
      val parts = new Array[UTF8String](w)
      var j = 0
      while (j < w) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(ShingleSep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** fold(acc → acc·mult + code mod P) from 0; empty array → 0. */
  def polyFold(codes: ArrayData, mult: Long): Long = {
    var acc = 0L
    var i = 0
    val n = codes.numElements()
    while (i < n) { acc = (acc * mult + codes.getLong(i)) % P; i += 1 }
    acc
  }

  private[functions] def requireType(
      e: Expression, t: DataType, fn: String, pos: String): TypeCheckResult =
    if (e.dataType == t ||
      ((e.dataType, t) match {
        case (ArrayType(a, _), ArrayType(b, _)) => a == b
        case _                                  => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires ${t.simpleString} for its $pos argument, got " +
        e.dataType.simpleString)
}

/** array<string> tokens → array<long> polynomial codes (computed ONCE
  * per document and reused across minhash seeds / simhash / fingerprint
  * — the HOF formulation re-derived them per seed). */
case class TokenCodes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TokenHashOps.requireType(child, ArrayType(StringType), "graft_token_codes", "only")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    TokenHashOps.tokenCodes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashOps.tokenCodes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (array<long> codes, long seed) → minhash signature entry: min over
  * codes of the seeded universal hash. Empty codes → null (matches
  * `array_min` over an empty transform). */
case class MinSeededHash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TokenHashOps.requireType(left, ArrayType(LongType), "graft_minhash", "first")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TokenHashOps.requireType(right, LongType, "graft_minhash", "second")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    if (codes.numElements() == 0) null
    else TokenHashOps.minSeededHash(codes, b.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.TokenHashOps.minSeededHash($a, $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<long> codes → 32-bit SimHash digest under hash-family seed
  * `seed` (empty codes → 0, matching the HOF bit-vote over an empty
  * array). `seed` is a plan-time constant; seed 1 is the classic digest,
  * seeds (1, 2) form the two halves of the pairing operator's 64-bit
  * digest. */
case class SimHash32(child: Expression, seed: Long = 1L) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TokenHashOps.requireType(child, ArrayType(LongType), "graft_simhash32", "first")
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    TokenHashOps.simhash32(a.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashOps.simhash32($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> tokens → DISTINCT word w-shingles ("a b c"), first
  * occurrence order — bit-identical to
  * `array_distinct(transform(sequence(0, n-w), i => concat_ws(" ",
  * slice(toks, i+1, w))))` but a single static call per row instead of
  * an interpreted HOF chain (the shingle pass dominated the n-gram
  * dedup wall time). Fewer than w tokens → empty array. */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "shingle width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    TokenHashOps.requireType(child, ArrayType(StringType), "graft_shingles", "first")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    TokenHashOps.wordShingles(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashOps.wordShingles($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> codes → fold(acc·mult + code mod P) from 0 (document
  * fingerprints: mult=131). `mult` is a plan-time constant. */
case class PolyFold(child: Expression, mult: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TokenHashOps.requireType(child, ArrayType(LongType), "graft_poly_fold", "first")
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    TokenHashOps.polyFold(a.asInstanceOf[ArrayData], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashOps.polyFold($c, ${mult}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
