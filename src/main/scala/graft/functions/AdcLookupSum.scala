package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** ADC scoring kernel: `Σ_j tbl[j][codes[j]]` — the per-candidate distance
  * of a PQ-coded corpus vector against a query's precomputed subspace
  * distance tables ([[graft.sim.Quantize]]). Replaces the interpreted
  * `aggregate(sequence(0, m−1), 0.0, (acc, j) => acc +
  * element_at(element_at(tbl, j+1), element_at(codes, j+1) + 1))` fold —
  * ~5 interpreted dispatches per subspace per scored PAIR, the query-time
  * hot loop of the stored IVF-PQ index (guide §4).
  *
  * Exact semantics of the HOF form: the fold iterated a LITERAL `m` from
  * the index meta (the build writes both sides with exactly m subspaces),
  * so a stored codes array of any OTHER length — corrupt or
  * mixed-generation index — nulled the sum instead of silently scoring a
  * partial distance; `m` rides this expression for the same reason
  * (ADVICE r13). A null element anywhere nulls the sum; summation is a
  * left fold in subspace order (bit-identical floats). A structurally
  * impossible shape (tbl shorter than m, code id outside the codebook)
  * returns null.
  */
case class AdcLookupSum(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  require(m >= 1, s"m must be >= 1, got $m")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_lookup_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_lookup_sum expects (array<array<double>>, array<int>), " +
            s"got ${left.dataType} and ${right.dataType}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val tbl = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (codes.numElements() != m || tbl.numElements() < m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || tbl.isNullAt(j)) return null
      val row = tbl.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |if ($b.numElements() != $m || $a.numElements() < $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($b.isNullAt($j) || $a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    final org.apache.spark.sql.catalyst.util.ArrayData $row = $a.getArray($j);
         |    final int $c = $b.getInt($j);
         |    if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $row.getDouble($c);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
