package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash fingerprint of a token-hash array as one codegen'd
  * 64×n loop: bit i votes +1 when `(h·a[i] + b[i]) mod p < (p+1)/2`, the
  * fingerprint sets bit i when its vote sum is positive.
  *
  * Replaces the `aggregate(zip_with(...))` fold in the HOF formulation —
  * interpreted lambda dispatch per (token, bit) made d3 ~3× slower than the
  * xxhash64 bit-sampling it replaced; the generated nest brings it back.
  * Same constants as [[graft.dedup.SimHash.hashParams]] — the DuckDB oracle
  * is generated from them too, so all three agree bit-for-bit.
  *
  * Inputs must already be in [0, p) (`h·a + b < 2^62` never overflows).
  * Null elements are skipped; a null array yields null.
  */
case class SimHashFingerprint(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(as.length == 64 && bs.length == 64, "simhash needs exactly 64 (a, b) params")

  private val half = (p + 1) / 2

  override def inputTypes = Seq(ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "simhash_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          if ((h * as(j) + bs(j)) % p < half) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("simhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("simhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, input => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $votes = new int[64];
         |final int $n = $input.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$input.isNullAt($i)) {
         |    final long $h = $input.getLong($i);
         |    for (int $j = 0; $j < 64; $j++) {
         |      if (($h * $aRef[$j] + $bRef[$j]) % ${p}L < ${half}L) $votes[$j]++;
         |      else $votes[$j]--;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $fp |= 1L << $j;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
