package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd replacements for the two hottest
  * `aggregate(zip_with(...))` float folds (optimization guide §4: eliminate
  * non-codegen expressions in the hot path). HOFs evaluate their lambdas
  * interpreted, one dispatch per ELEMENT — a 64-dim dot product costs ~128
  * lambda evaluations plus a zipped-array allocation per evaluation site,
  * which dominates the row-scale encode/assign/signature stages
  * ([[graft.sim.Quantize]] PQ encode, [[graft.sim.Similarity]] hyperplane
  * codes) and the pair-scale ADC scoring.
  *
  * EXACT-SEMANTICS CONTRACT (the oracles replay these folds bit-for-bit):
  * each expression reproduces `aggregate(zip_with(a, b, f), 0.0, _ + _)`
  * including its null algebra — zip_with pads the shorter array with nulls
  * and a null element nulls the whole fold, so: null input → null, length
  * mismatch → null, any null element → null; otherwise a LEFT fold in
  * element order, so float summation order (and therefore every emitted
  * bit) is identical to the HOF form.
  */
private[graft] trait ArrayPairFold extends BinaryExpression
    with ImplicitCastInputTypes {
  // result type inferred: Seq[ArrayType] <: Seq[AbstractDataType], which is
  // private[sql] in Spark 4 and can't be named from here
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** scalar fold step on (x_i, y_i) */
  protected def step(x: Double, y: Double): Double
  /** java source for the fold step, e.g. s"$x * $y" */
  protected def stepCode(x: String, y: String): String

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += step(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $acc += ${stepCode(xi, yi)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** `Σ a_i·b_i` — the hyperplane-code / projection dot product. */
case class ArrayDot(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "array_dot"
  override protected def step(x: Double, y: Double): Double = x * y
  override protected def stepCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `Σ (a_i−b_i)²` — the PQ/ADC squared-L2 kernel. */
case class ArrayL2Sq(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "array_l2sq"
  override protected def step(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def stepCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
