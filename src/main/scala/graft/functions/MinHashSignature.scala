package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a hashed-shingle array as a native codegen'd
  * expression: for permutation j, `sig[j] = min over h of (h·a[j]+b[j]) mod p`
  * — the whole k×n loop runs as one generated Java nest instead of
  * k·n interpreted higher-order-function lambda dispatches (the
  * `aggregate(zip_with(...))` fold costs ~13M lambda evaluations per 5k-doc
  * batch at k=72).
  *
  * Inputs must already be reduced mod p (the hash projection does
  * `pmod(xxhash64(s), p)`), so `h·a + b < 2^62` never overflows a long.
  * Null elements are skipped; a null array yields null.
  */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(as.length == bs.length && as.nonEmpty, "need matching non-empty (a, b) params")

  override def inputTypes = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(p)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    val k = as.length
    nullSafeCodeGen(ctx, ev, input => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${p}L);
         |final int $n = $input.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$input.isNullAt($i)) {
         |    final long $h = $input.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
