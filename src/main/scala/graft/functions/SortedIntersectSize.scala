package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `|A ∩ B|` of two SORTED, de-duplicated arrays as one codegen'd merge
  * scan — the verification kernel of the set-similarity joins
  * ([[graft.dedup.MinHashLSH]], [[graft.dedup.Jaccard]]).
  *
  * Spark's `array_intersect` builds a hash set per evaluated PAIR and
  * materializes the intersection array just to take its size; on the
  * candidate-verification hot path (millions of pairs × ~100-element sets)
  * that allocation dominates. The merge scan is O(|A|+|B|) with zero
  * allocation. Sorting costs one `sort_array` per ROW upstream, amortized
  * over every pair the row participates in.
  *
  * Supports `array<long>` (hashed shingles) and `array<string>` (raw
  * shingles). Inputs MUST be sorted ascending (`sort_array`) and distinct;
  * null ELEMENTS (sorted first by sort_array) are skipped.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sorted_intersect_size"

  private lazy val elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"sorted_intersect_size expects array inputs, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
        if a == b && (a == LongType || a == StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_size expects two array<long> or two array<string>, " +
            s"got ${left.dataType} and ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && x.isNullAt(i)) i += 1
    while (j < m && y.isNullAt(j)) j += 1
    if (elemType == LongType) {
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < n && j < m) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val body = if (elemType == LongType) {
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |while ($i < $n && $j < $m) {
           |  final long $xv = $a.getLong($i);
           |  final long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
         """.stripMargin
      } else {
        val cmp = ctx.freshName("cmp")
        s"""
           |while ($i < $n && $j < $m) {
           |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($cmp == 0) { $c++; $i++; $j++; }
           |  else if ($cmp < 0) { $i++; } else { $j++; }
           |}
         """.stripMargin
      }
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $a.isNullAt($i)) $i++;
         |while ($j < $m && $b.isNullAt($j)) $j++;
         |$body
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
