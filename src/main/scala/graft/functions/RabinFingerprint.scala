package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-sensitive Rabin–Karp document fingerprint as ONE codegen'd pass
  * over the string — semantically identical to the HOF formulation in
  * [[graft.text.TextAnalysis.fingerprintHof]] (and therefore to the
  * generated DuckDB oracle):
  *
  *   tokens   = split(lower(text), ' ')          (trailing/empty kept)
  *   h(tok)   = fold(seed=7)  h*131 + codepoint  (mod 1e9+7)
  *   doc acc  = fold(0)       acc*31 + h(tok)    (mod 1e9+7)
  *
  * The HOF path materializes lower-copy + token array + PER-CHARACTER
  * string array per row; this expression allocates one lowered String and
  * walks code points — the difference is the whole allocation budget of a
  * fingerprint pass over 100 TB. Equality with the HOF path is
  * property-spec'd (unicode, multi-space, empty inputs included).
  */
case class RabinFingerprint(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "rabin_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RabinFingerprint.of(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      input => s"graft.functions.RabinFingerprint.of($input)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RabinFingerprint {
  final val Mod = 1000000007L
  final val Seed = 7L

  /** Shared by interpreted and generated paths (the loop JITs identically
    * either way; codegen's win is skipping per-char expression dispatch).
    */
  def of(input: UTF8String): Long = {
    val s = input.toLowerCase.toString
    var acc = 0L
    var h = Seed
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == ' ') {
        acc = (acc * 31 + h) % Mod
        h = Seed
      } else {
        h = (h * 131 + cp) % Mod
      }
    }
    (acc * 31 + h) % Mod
  }
}
