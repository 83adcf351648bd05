package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register array (Flajolet et al. 2007) as a native Catalyst
  * aggregate: `m` byte-sized registers, each the MAX "rank" of any hashed
  * value routed to its bucket. O(m) state per group, merges are elementwise
  * max (associative, commutative, idempotent — the partial-aggregation
  * contract for free), and — unlike Spark's built-in
  * `approx_count_distinct` HLL++, whose xxhash64-based registers no other
  * engine can reproduce — the full register array is deterministic integer
  * arithmetic over the engine-neutral input hash, so a SQL oracle replays
  * the SKETCH itself, not just a tolerance band around the estimate.
  *
  * Register math, fixed to the [[graft.text.TextAnalysis.HashP]] hash
  * domain `[0, 1e9+7)`: for hashed value `h`, bucket = `h mod m` and
  * `w = h div m < ⌈(1e9+7)/m⌉`. With `W` the bit width of that quotient
  * domain (`W = 64 − nlz(⌈(1e9+7)/m⌉ − 1)`), the rank is
  * `W − ⌊log2 w⌋` for `w ≥ 1` (∈ 1..W) and `W+1` for `w = 0` — the
  * "leading zeros + 1" of `w` read in a W-bit window. An empty bucket
  * stays 0, which the estimator reads as the 2⁰ term, exactly as in the
  * paper. `⌊log2 w⌋` is `63 − numberOfLeadingZeros(w)` here; an oracle
  * replays it as `floor(log2(w))`, exact because the gap between
  * `log2(2^k + 1)` and `k` is ≥ 2⁻ᵂ — astronomically wider than a double's
  * ulp at these magnitudes.
  *
  * Estimation happens OUTSIDE the aggregate
  * ([[graft.text.TextAnalysis.hllDistinct]]) so the raw-vs-linear-counting
  * regime choice is visible, replayable arithmetic rather than buried
  * state. KMV ([[KMinValues]]) remains the exact-below-k companion; HLL is
  * the constant-1-byte-per-register cardinality sketch for the 100 TB
  * regime, where even k longs per group×combiner is real memory.
  */
case class HllRegisters(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(m >= 2 && (m & (m - 1)) == 0 && m <= 65536,
    s"HLL needs a power-of-two register count in [2, 65536], got $m")

  /** Bit width of the bucket-quotient domain for the 1e9+7 hash modulus. */
  private val quotientBits: Int = {
    val maxW = (graft.text.TextAnalysis.HashP - 1) / m
    64 - java.lang.Long.numberOfLeadingZeros(maxW)
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_registers"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers expects a BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0 && h < graft.text.TextAnalysis.HashP,
        s"hll_registers input must lie in [0, ${graft.text.TextAnalysis.HashP}) — " +
          s"feed it the engine-neutral token hash, got $h")
      val bucket = (h % m).toInt
      val w = h / m
      val rank =
        if (w == 0) quotientBits + 1
        else quotientBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  // clone: merge mutates its left buffer in place, and the runtime may
  // hand back the same backing array it deserialized
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
