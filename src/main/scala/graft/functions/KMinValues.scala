package graft.functions

import java.nio.ByteBuffer
import java.util.TreeSet

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate: keeps the k smallest DISTINCT long values seen, in O(k)
  * state, and emits them as a sorted array. The classic estimator
  * (Bar-Yossef et al. 2002) then reads off a projection: with hashes
  * uniform on `[0, M)`, `E[distinct] ≈ (k-1) · M / h_(k)` — and when fewer
  * than k distinct values exist the sketch holds ALL of them, so the count
  * is exact by `size()`.
  *
  * Why not `collect_set`/`approx_count_distinct`: `collect_set`'s
  * aggregation state is UNBOUNDED (the whole distinct set rides every
  * partial buffer — at 100 TB the map-side combine itself OOMs), and
  * Spark's HLL++ is neither deterministic across engines nor replayable in
  * an oracle. This buffer is capped at k longs, `update`/`merge` are the
  * standard partial-aggregation contract (map-side combine keeps working,
  * merges are associative+commutative by construction), and fed an
  * engine-neutral hash ([[graft.text.TextAnalysis.tokenHash]]) the whole
  * sketch — not just its estimate — replays bit-for-bit in SQL.
  *
  * Feed it HASHED values: the estimator's uniformity assumption is the
  * hash's job, and set semantics (TreeSet) make duplicate inputs free.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[java.lang.Long]] {

  require(k >= 1, s"KMV needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "k_min_values"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"k_min_values expects a BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): TreeSet[java.lang.Long] =
    new TreeSet[java.lang.Long]()

  private def add(buf: TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }

  override def update(buf: TreeSet[java.lang.Long],
                      input: InternalRow): TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TreeSet[java.lang.Long],
                     b2: TreeSet[java.lang.Long]): TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
