package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions for SQL use:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  *   spark.sql("SELECT sorted_intersect_size(sa, sb) FROM pairs")
  *   spark.sql("SELECT rabin_fingerprint(text) FROM docs")
  *   spark.sql("SELECT minhash_signature(hashes, 72, 42) FROM docs")
  *   spark.sql("SELECT simhash_fingerprint(hashes, 64, 7) FROM docs")
  * }}}
  *
  * The minhash/simhash hash families are derived from (count, seed) at
  * PLAN time — the same `hashParams` generators the DataFrame API and the
  * generated DuckDB oracles use, so a SQL user gets bit-identical
  * signatures. Count/seed arguments must therefore be literals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** A foldable argument evaluated to Long at registration/plan time. */
  private def litLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int  => i.toLong
      case l: Long => l
      case other   => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        ArrayCosine(children.head, children(1))
      }))

    extensions.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "sorted_intersect_size takes exactly 2 (sorted array) arguments")
        SortedIntersectSize(children.head, children(1))
      }))

    extensions.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "minhash_signature(hashes array<long>, numHashes, seed)")
        val n = litLong(children(1), "numHashes").toInt
        val seed = litLong(children(2), "seed")
        val params = graft.dedup.MinHashLSH.hashParams(n, seed)
        MinHashSignature(children.head,
          params.map(_._1).toArray, params.map(_._2).toArray, graft.dedup.MinHashLSH.P)
      }))

    extensions.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(children.head)
      }))

    extensions.injectFunction((
      new FunctionIdentifier("rabin_fingerprint"),
      new ExpressionInfo(classOf[RabinFingerprint].getName, "rabin_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rabin_fingerprint takes exactly 1 argument")
        RabinFingerprint(children.head)
      }))

    extensions.injectFunction((
      new FunctionIdentifier("simhash_fingerprint"),
      new ExpressionInfo(classOf[SimHashFingerprint].getName, "simhash_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "simhash_fingerprint(hashes array<long>, bits, seed)")
        val bits = litLong(children(1), "bits").toInt
        val seed = litLong(children(2), "seed")
        val params = graft.dedup.SimHash.hashParams(bits, seed)
        SimHashFingerprint(children.head,
          params.map(_._1).toArray, params.map(_._2).toArray, graft.dedup.SimHash.P)
      }))
  }
}
