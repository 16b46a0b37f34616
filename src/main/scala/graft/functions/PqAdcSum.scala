package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst ADC lookup-sum: Σ_s lut(s)(codes(s)) over an
  * `array<int>` of PQ codes and an `array<array<double>>` per-query
  * lookup table, folded in subspace order.
  *
  * The composable alternative —
  * `aggregate(zip_with(codes, lut, (c, l) => element_at(l, c + 1)), 0.0, _+_)`
  * — is a HigherOrderFunction chain evaluated via `CodegenFallback`:
  * per-row interpreted lambdas on the ONE expression the ADC scan runs
  * per stored vector. Measured at the 100× ScaleBench point, the
  * interpreted form made the PQ probe CPU-bound on warm local data
  * (4.2 s vs the raw probe's 1.1 s) even though it reads ~90× fewer
  * bytes — the byte win only pays when the scan leaves the page cache,
  * so the per-row cost must be codegen'd too (the [[DotProduct]]
  * precedent: preference order (b), compose-first didn't survive
  * profiling).
  *
  * Semantics — bit-identical to the HOF chain and to the DuckDB
  * oracle's s-ordered `list_reduce`: index-order fold; null input →
  * null; `codes` and `lut` of unequal length → null (like `zip_with`
  * padding); a code outside its sub-table's range → null (the lookup
  * has no defined value — construction never produces one, so null
  * marks a corrupted row rather than throwing mid-scan). Inner lut
  * arrays are produced by `collect_list` (never null elements); a null
  * sub-table still propagates null defensively.
  */
case class PqAdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires (array<int>, array<array<double>>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != lut.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (codes.isNullAt(i) || lut.isNullAt(i)) return null
        val sub = lut.getArray(i)
        val c = codes.getInt(i)
        if (c < 0 || c >= sub.numElements() || sub.isNullAt(c)) return null
        s += sub.getDouble(c)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val sub = ctx.freshName("sub")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (${ev.isNull} || $a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    org.apache.spark.sql.catalyst.util.ArrayData $sub = $b.getArray($i);
         |    int $c = $a.getInt($i);
         |    if ($c < 0 || $c >= $sub.numElements() || $sub.isNullAt($c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $sub.getDouble($c);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
