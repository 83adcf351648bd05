package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity of two `array<double>` (or `array<float>`)
  * columns as a native Catalyst expression: one tight codegen'd loop
  * computing dot product and both norms together — no intermediate arrays,
  * no per-element lambda dispatch.
  *
  * This replaces the `aggregate(zip_with(...))` higher-order-function
  * composition on the quadratic similarity paths ([[graft.sim.Similarity]]):
  * HOFs are interpreted (CodegenFallback) and allocate a zipped array per
  * evaluated PAIR, which dominates brute-force/verification scoring.
  *
  * Float arrays (r14) are read NATIVELY, each element widened exactly to
  * double in-register — bit-identical to casting the array up front, with
  * neither the per-pair cast allocation nor the 2× shuffle bytes of
  * carrying pre-cast doubles through a pair-stage exchange (guide §2.3:
  * narrower types). Either side may independently be float or double; any
  * other element type still takes the implicit cast to `array<double>`.
  *
  * Null handling: null input → null (null-intolerant); arrays are compared
  * over the common prefix length; null ELEMENTS are read as 0.
  */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  private def accept(e: Expression) = e.dataType match {
    case ArrayType(FloatType, n) => ArrayType(FloatType, n)
    case _ => ArrayType(DoubleType)
  }

  // result type inferred: Seq[ArrayType] <: Seq[AbstractDataType], which is
  // private[sql] in Spark 4 and can't be named from here
  override def inputTypes = Seq(accept(left), accept(right))

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression) =
    e.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = isFloat(left); val yf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0
               else if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (y.isNullAt(i)) 0.0
               else if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX =
        if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY =
        if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $a.isNullAt($i) ? 0.0 : $getX;
         |  final double $yi = $b.isNullAt($i) ? 0.0 : $getY;
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
