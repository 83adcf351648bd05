package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as ONE codegen'd pass over the document string — semantically identical
  * to the HOF formulation in [[graft.dedup.Winnowing.fingerprints]] (and
  * therefore to the generated DuckDB oracle):
  *
  *   tokens  = split(lower(text), ' ')                  (empties kept)
  *   h(tok)  = fold(seed=7)  h*131 + codepoint  (mod 1e9+7)   — tokenHash
  *   gh(i)   = fold(0) over tokens i..i+k−1  acc*31 + h(tok) (mod 1e9+7)
  *   key(i)  = gh(i)·2^21 + (2^21−1 − i)     (rightmost-min tie-break)
  *   sel     = { min(key[s..s+w−1]) : 0 ≤ s ≤ ng−w }, distinct
  *
  * and each selected key unpacks to (gram_hash = key >> 21,
  * pos = 2^21−1 − (key & (2^21−1))). Documents with fewer than k+w−1
  * tokens yield an EMPTY array (the caller's explode drops them — the
  * same rows the HOF path's `size(toks) ≥ k+w−1` filter removed).
  *
  * The HOF pipeline this replaces was the d13/d14/t32 hot path measured
  * in round 14: per document it dispatched interpreted lambdas per gram
  * PER TOKEN PER CHARACTER (nested aggregate/filter/split), materialized
  * a per-character string array per token, then posexploded every gram
  * into a row so a per-document window (Exchange + Sort + Window) could
  * take the sliding minimum, then hash-aggregated the selections
  * distinct. This expression computes token hashes in one code-point walk
  * (the [[RabinFingerprint]] loop), gram hashes by Horner over them, the
  * sliding minimum with a monotonic deque (O(ng)), and dedups in place —
  * no Generate, no per-document Exchange/Sort/Window, no distinct
  * aggregate. The winnowing unit is the document, so per-row computation
  * is the scale-correct shape at any corpus size.
  *
  * `distinctHashes = true` additionally projects the selection to its
  * DISTINCT gram hashes (array<long>) — the exact frame
  * [[graft.dedup.Winnowing.nearDupCandidates]] consumed as
  * `fingerprints(...).select(id, gram_hash).distinct()`, with the
  * corpus-scale distinct exchange deleted (per-document distinctness is
  * free here, and rows are independent across documents by the id key).
  *
  * Emission order is ascending (by packed key, or by gram hash in
  * distinct mode) — the HOF's distinct order was partitioning-dependent
  * and every consumer (census aggregate, pair join, Verify's sorted-row
  * hash) is order-insensitive.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int,
                              distinctHashes: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType =
    if (distinctHashes) ArrayType(LongType, containsNull = false)
    else ArrayType(StructType(Seq(
      StructField("gram_hash", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))), containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String =
    if (distinctHashes) "winnow_gram_hashes" else "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    if (distinctHashes)
      WinnowFingerprints.hashesOf(input.asInstanceOf[UTF8String], k, w)
    else WinnowFingerprints.of(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (distinctHashes) "hashesOf" else "of"
    defineCodeGen(ctx, ev,
      input => s"graft.functions.WinnowFingerprints.$fn($input, $k, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  final val Mod = 1000000007L
  final val Seed = 7L
  final val PosBits = 21
  private final val Packed = 1L << PosBits
  private final val PosMask = Packed - 1

  /** Distinct selected packed keys, ascending. Empty when the document has
    * fewer than k+w−1 tokens. Shared by both emission modes and by the
    * interpreted and generated paths.
    */
  private def selectedKeys(input: UTF8String, k: Int, w: Int): Array[Long] = {
    val s = input.toLowerCase.toString
    // token hashes in one code-point walk (the RabinFingerprint loop shape:
    // ' ' closes a token; empty tokens hash to the seed)
    var nTok = 1
    var i = 0
    while (i < s.length) { // token count first, to size the array exactly
      if (s.charAt(i) == ' ') nTok += 1
      i += 1
    }
    if (nTok < k + w - 1) return Array.emptyLongArray
    val th = new Array[Long](nTok)
    var t = 0
    var h = Seed
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == ' ') { th(t) = h; t += 1; h = Seed }
      else h = (h * 131 + cp) % Mod
    }
    th(t) = h
    // packed gram keys: Horner over k token hashes, position in the low bits
    val ng = nTok - k + 1
    val keys = new Array[Long](ng)
    var g = 0
    while (g < ng) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31 + th(g + j)) % Mod; j += 1 }
      keys(g) = acc * Packed + (PosMask - g)
      g += 1
    }
    // sliding-window minimum over w keys (monotonic deque, O(ng))
    val nw = ng - w + 1
    val mins = new Array[Long](nw)
    val dq = new Array[Int](ng) // indices, increasing key order
    var head = 0
    var tail = 0 // exclusive
    g = 0
    while (g < ng) {
      while (tail > head && keys(dq(tail - 1)) >= keys(g)) tail -= 1
      dq(tail) = g; tail += 1
      if (dq(head) <= g - w) head += 1
      if (g >= w - 1) mins(g - w + 1) = keys(dq(head))
      g += 1
    }
    // distinct ascending: consecutive windows share minima, so sort+dedupe
    // over nw values is cheap and deterministic
    java.util.Arrays.sort(mins)
    var n = 0
    i = 0
    while (i < nw) {
      if (n == 0 || mins(i) != mins(n - 1)) { mins(n) = mins(i); n += 1 }
      i += 1
    }
    if (n == nw) mins else java.util.Arrays.copyOf(mins, n)
  }

  def of(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    val keys = selectedKeys(input, k, w)
    val out = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) {
      out(i) = InternalRow(keys(i) >> PosBits, PosMask - (keys(i) & PosMask))
      i += 1
    }
    new GenericArrayData(out)
  }

  def hashesOf(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    val keys = selectedKeys(input, k, w)
    // distinct by PACKED KEY ≠ distinct by hash: project then dedupe again
    val hs = new Array[Long](keys.length)
    var i = 0
    while (i < keys.length) { hs(i) = keys(i) >> PosBits; i += 1 }
    java.util.Arrays.sort(hs)
    var n = 0
    i = 0
    while (i < hs.length) {
      if (n == 0 || hs(i) != hs(n - 1)) { hs(n) = hs(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, n))
  }
}
