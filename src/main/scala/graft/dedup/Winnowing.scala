package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ScaleJoins
import graft.text.TextAnalysis

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 — the MOSS scheme): hash every k-token gram, slide a
  * w-gram window, and select each window's MINIMUM hash with the
  * RIGHTMOST-minimum tie-break; the distinct selected (hash, position)
  * set is the document's fingerprint.
  *
  * The guarantee exact fingerprints (t3) can't give: any shared token
  * run of length ≥ w+k−1 between two documents yields at least one
  * SHARED selected fingerprint, while the selected density stays ~2/(w+1)
  * of all grams — local plagiarism/copy detection at a fraction of the
  * full shingle volume.
  *
  * Scale shape: gram hashing is a per-row array HOF (no shuffle); the
  * only exchange is the per-document window — the winnowing unit is the
  * document, so partition width is bounded by document length, never by
  * corpus size.
  */
object Winnowing {

  /** Bits reserved for the position in the packed selection key — docs up
    * to 2^21 grams (≈2 M tokens). The packed encoding lets ONE `min` per
    * window implement "smallest hash, rightmost position wins ties":
    * high bits ascending hash, low bits DESCENDING position.
    */
  val PosBits = 21

  /** Selected fingerprints: (id, gram_hash, pos), distinct. Documents
    * shorter than w+k−1 tokens (no complete window) are dropped —
    * callers wanting whole-short-doc coverage can union t3-style full
    * fingerprints for those.
    *
    * Runs as the codegen'd [[graft.functions.WinnowFingerprints]] kernel:
    * one per-row pass (token hashes by code-point walk, gram Horner,
    * monotonic-deque window minimum, in-place dedup), exploded. The former
    * HOF+window formulation — kept below as [[fingerprintsHof]], the
    * executable specification WinnowingSpec pins the kernel against —
    * dispatched interpreted lambdas per gram per token per character and
    * paid a per-document Exchange+Sort+Window plus a distinct aggregate;
    * r14 measured it as the whole cost of d13/d14/t32.
    */
  def fingerprints(df: DataFrame, id: Column, text: Column,
                   k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    val idName = df.select(id).columns.head
    // explode of the empty array drops short docs — the HOF form's
    // size(tokens) >= k+w-1 filter, for free
    df.select(id, explode(asColumn(graft.functions.WinnowFingerprints(
        asExpression(text), k, w))).as("__fp"))
      .select(col(idName), col("__fp.gram_hash").as("gram_hash"),
        col("__fp.pos").as("pos"))
  }

  /** The HOF/built-ins formulation of [[fingerprints]] — the executable
    * specification (bit-identical output; property-spec'd against the
    * kernel on unicode/multi-space/short-doc corpora).
    */
  private[graft] def fingerprintsHof(df: DataFrame, id: Column, text: Column,
                                     k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val idName = df.select(id).columns.head
    val toks = TextAnalysis.tokens(text)
    val hp = lit(TextAnalysis.HashP)
    val ghs = transform(sequence(lit(0), size(col("__toks")) - k), i =>
      aggregate(slice(col("__toks"), i + 1, lit(k)), lit(0L),
        (acc, t) => pmod(acc * 31 + TextAnalysis.tokenHash(t), hp)))
    val packed = lit(1L << PosBits)
    val keyed = df
      .filter(size(toks) >= k + w - 1)
      .select(id, toks.as("__toks"))
      .select(col(idName), (size(col("__toks")) - k + 1).as("__ng"),
        posexplode(ghs).as(Seq("pos", "__gh")))
      .withColumn("__key",
        col("__gh") * packed + (packed - 1 - col("pos")))
    val win = Window.partitionBy(idName).orderBy("pos").rowsBetween(0, w - 1)
    keyed
      .withColumn("__sel", min("__key").over(win))
      // a window starts at every pos with w grams to its right; later
      // rows still served as frame members for earlier starts
      .filter(col("pos") <= col("__ng") - w)
      .select(col(idName), col("__sel")).distinct()
      .select(col(idName),
        shiftright(col("__sel"), PosBits).as("gram_hash"),
        (packed - 1 - (col("__sel").bitwiseAND(packed - 1))).as("pos"))
  }

  /** Near-duplicate candidate pairs from winnowing fingerprints: docs
    * sharing ≥ `minShared` selected gram hashes — the MOSS match step as
    * a corpus-scale join. Because winnowing guarantees a pick inside any
    * shared w+k−1-token run, local copies surface even when whole-doc
    * similarity (MinHash territory) is low: the complementary detector
    * to d2's global-Jaccard LSH.
    *
    * Scale shape: distinct (doc, hash) keys; hashes shared by more than
    * `maxBucket` docs are dropped via a broadcast anti join (boilerplate
    * guard — the [[graft.dedup.MinHashLSH.candidatePairs]] precedent);
    * the per-hash pair stage runs through
    * [[graft.ops.ScaleJoins.bucketedSelfPairs]] so one hot hash never
    * lands on one task; the final count-per-pair aggregation is the only
    * unbounded shuffle and its key set is the candidate pairs themselves.
    */
  def nearDupCandidates(df: DataFrame, id: Column, text: Column,
                        k: Int = 4, w: Int = 5, minShared: Int = 2,
                        maxBucket: Int = 500, salt: Int = 4): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    import org.apache.spark.sql.graftfn.{asColumn, asExpression}
    val idName = df.select(id).columns.head
    // Distinct (id, gram_hash) straight from the kernel's distinct-hash
    // mode: per-document distinctness is computed in the same per-row pass
    // as the selection, and rows are independent across documents by the id
    // key — so the former corpus-scale `.distinct()` EXCHANGE is gone, and
    // with it the reason to cache this frame (r13's cache was measured flat
    // and is reverted; the r14 kernel makes each re-evaluation a cheap
    // projection).
    val docHash = df.select(id, explode(asColumn(
        graft.functions.WinnowFingerprints(asExpression(text), k, w,
          distinctHashes = true))).as("gram_hash"))
    val oversized = docHash.groupBy("gram_hash")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).select("gram_hash")
    val kept = docHash.join(broadcast(oversized), Seq("gram_hash"), "left_anti")
    ScaleJoins.bucketedSelfPairs(kept, Seq("gram_hash"), idName, Nil, salt)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
