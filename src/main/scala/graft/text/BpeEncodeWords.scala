package graft.text

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The compiled BPE merge table a [[BpeEncodeWords]] expression applies:
  * rank-indexed pairs plus a lhs→rhs→ranks hash index. Built ONCE on the
  * driver and shipped to executors as a codegen reference object — the
  * scalable alternative to compiling one `aggregate` fold per rank into
  * the expression tree, which at the 16k–50k merges real tokenizers use
  * walls in the ANALYZER long before any data is read (a 16k-deep
  * expression chain per word: plan-size, canonicalization, and codegen all
  * grow with vocabulary; this object keeps the PLAN O(1) in table size).
  *
  * Semantics are EXACTLY the rank-ascending sweep of `Bpe.encodeWord`'s
  * fold chain (one greedy-leftmost non-overlapping pass per rank, ranks
  * ascending), for ANY table — constructive or not: the loop repeatedly
  * finds the minimum rank STRICTLY ABOVE the last applied rank that is
  * present among adjacent pairs and runs that single pass. Ranks it skips
  * are precisely the fold's no-op passes (their pair is absent, and a
  * no-op pass cannot change the present-pair set); ranks at or below the
  * last applied one are never revisited, exactly as the fold never
  * re-runs an earlier rank — so a pair a LATER merge re-creates (the
  * duplicate-output-symbol corner where "lowest-rank-first-to-fixpoint"
  * diverges from the sweep) stays unmerged in both. BpeSpec pins the
  * equivalence property against the fold on randomized words over a
  * ≥1k-rank table.
  *
  * Per word the loop costs O(L²) hash probes for word length L —
  * INDEPENDENT of table size, the property that makes 16k merges free.
  * Duplicate (lhs, rhs) entries keep ALL their ranks (sorted), so a pair
  * re-learned at a later rank still fires for occurrences created between
  * the two ranks, exactly like the fold's second pass.
  */
final class BpeMergeTable(merges: Seq[(String, String)]) extends Serializable {

  private val lhs: Array[String] = merges.map(_._1).toArray
  private val rhs: Array[String] = merges.map(_._2).toArray
  /** rank → merged output symbol, precomputed (the hot pass writes it). */
  private val out: Array[String] = merges.map { case (a, b) => a + b }.toArray

  /** lhs → rhs → ascending ranks. Ranks per pair is ~always length 1; the
    * array keeps re-learned pairs exact (see class doc).
    */
  private val index: java.util.HashMap[String, java.util.HashMap[String, Array[Int]]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Array[Int]]]()
    var r = 0
    while (r < lhs.length) {
      val inner = m.computeIfAbsent(lhs(r), _ =>
        new java.util.HashMap[String, Array[Int]]())
      val prev = inner.get(rhs(r))
      inner.put(rhs(r),
        if (prev == null) Array(r) else prev :+ r) // build-time only; tiny
      r += 1
    }
    m
  }

  /** Smallest rank of pair (a, b) strictly above `above`, or MaxValue. */
  private def rankAbove(a: String, b: String, above: Int): Int = {
    val inner = index.get(a)
    if (inner == null) return Int.MaxValue
    val ranks = inner.get(b)
    if (ranks == null) return Int.MaxValue
    var i = 0
    while (i < ranks.length) {
      if (ranks(i) > above) return ranks(i)
      i += 1
    }
    Int.MaxValue
  }

  /** Encode one (already lowercased) word: code-point symbols in, subword
    * strings out. Code points, not chars — Spark's `split(w, "")` keeps
    * surrogate pairs whole, and the fold path this must equal rides it.
    */
  private[text] def encodeWord(word: String): Array[UTF8String] = {
    val cps = word.codePoints().toArray
    if (cps.length == 0) return Array.empty
    val syms = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) {
      syms(i) = new String(Character.toChars(cps(i)))
      i += 1
    }
    var len = syms.length
    var last = -1
    var continue = len > 1
    while (continue) {
      // min present rank strictly above the last applied one
      var best = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val r = rankAbove(syms(i), syms(i + 1), last)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        // one greedy-leftmost non-overlapping pass for rank `best`; the
        // merged output never re-matches as lhs within its own pass
        // (fold's pend-reset), which i += 2 reproduces
        val a = lhs(best); val b = rhs(best); val ab = out(best)
        var w = 0
        i = 0
        while (i < len) {
          if (i + 1 < len && syms(i) == a && syms(i + 1) == b) {
            syms(w) = ab; i += 2
          } else { syms(w) = syms(i); i += 1 }
          w += 1
        }
        len = w
        last = best
        continue = len > 1
      }
    }
    val res = new Array[UTF8String](len)
    i = 0
    while (i < len) { res(i) = UTF8String.fromString(syms(i)); i += 1 }
    res
  }

  /** Per-thread word→subwords memo: corpus word distributions are Zipfian,
    * so most occurrences are repeats of a small head. ThreadLocal because
    * the table object may be shared across a JVM's task threads; bounded
    * (cleared past 64k entries) so a high-cardinality corpus can't grow it
    * without limit. Values are immutable (UTF8String) — sharing one array
    * across output rows is safe.
    */
  @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, Array[UTF8String]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[UTF8String]]())

  /** Encode a row's word array into its flattened subword array. */
  def encodeWords(words: ArrayData): ArrayData = {
    val m = memo.get()
    if (m.size() > 65536) m.clear()
    val outBuf = new java.util.ArrayList[AnyRef](words.numElements() * 2)
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        // .toString copies out of any reused row buffer before memoizing
        val w = words.getUTF8String(i).toString
        var enc = m.get(w)
        if (enc == null) { enc = encodeWord(w); m.put(w, enc) }
        var j = 0
        while (j < enc.length) { outBuf.add(enc(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(outBuf.toArray)
  }
}

/** Native BPE tokenizer-apply: `array<string>` of (lowercased, non-empty)
  * words in, flattened `array<string>` of subwords out, the whole merge
  * table riding as ONE codegen reference object. This is what lets
  * [[Bpe.encode]] apply a production-size (16k–50k merge) table: the plan
  * stays a constant-size projection inside whole-stage codegen — one
  * method call per row — instead of a per-rank fold chain whose analysis
  * and codegen grow with vocabulary. Exactly equal to the fold chain by
  * construction (see [[BpeMergeTable]]); BpeSpec pins the property.
  */
case class BpeEncodeWords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val table = new BpeMergeTable(merges)

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "bpe_encode_words"

  override protected def nullSafeEval(input: Any): Any =
    table.encodeWords(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encodeWords($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWords =
    copy(child = newChild)
}
