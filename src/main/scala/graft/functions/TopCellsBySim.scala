package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** The IVF cell-assignment kernel ([[graft.sim.Ivf.assignCells]]) as ONE
  * native expression: given a vector and the packed centroid array, emit
  * the `keep` best cell ids ordered by (cosine DESC, cell ASC) — the
  * array the caller posexplodes into (probe_rank, cell).
  *
  * Replaces the interpreted HOF pipeline
  * `slice(array_sort(transform(cents, c => struct(coalesce(cosine, -Inf),
  * cell)), comparator), 1, keep)` — per ROW that was |cents| lambda
  * dispatches + |cents| struct allocations + an interpreted comparator per
  * sort comparison, the dominant per-vector cost of every assignment pass
  * (index build/append, k-means candidate generation, probe routing).
  *
  * EXACT-SEMANTICS CONTRACT (oracles replay the assignment): per centroid,
  * sim = the [[ArrayCosine]] loop over the common prefix length with null
  * elements read as 0 — and −∞ when either array is NULL (the
  * `coalesce(cosine, -Inf)` null-centroid/null-vector guard: a null
  * VECTOR still assigns to the lowest cells, exactly like the HOF form).
  * Ordering uses Spark's own double semantics
  * ([[SQLOrderingUtil.compareDoubles]]: NaN greatest, NaN = NaN, the
  * interpreted lambda's `<`/`>` route through the same function), ties on
  * the lower cell id, and the sort is `java.util.Arrays.sort` — the same
  * TimSort `array_sort` uses — so the result is bit-identical to the HOF
  * form on every input, degenerate vectors included.
  */
case class TopCellsBySim(emb: Expression, cents: Expression, keep: Int)
    extends Expression with CodegenFallback {

  require(keep >= 1, s"keep must be >= 1, got $keep")

  override def children: Seq[Expression] = Seq(emb, cents)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = cents.nullable
  override def prettyName: String = "top_cells_by_sim"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val centsOk = cents.dataType match {
      case ArrayType(st: StructType, _) if st.length == 2 =>
        st(0).dataType == IntegerType &&
          (st(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (centsOk && emb.dataType.isInstanceOf[ArrayType] &&
        emb.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_cells_by_sim expects (array<double>, array<struct<cell:int," +
          s"c_emb:array<double>>>), got ${emb.dataType} and ${cents.dataType}")
  }

  private def cosine(x: ArrayData, y: ArrayData): Double = {
    // exactly ArrayCosine.nullSafeEval: common prefix, null elements as 0
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yi = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def eval(input: InternalRow): Any = {
    val centsVal = cents.eval(input)
    if (centsVal == null) return null
    val ca = centsVal.asInstanceOf[ArrayData]
    val embVal = emb.eval(input) // may be null: sims all -Inf, like the HOF
    val x = embVal.asInstanceOf[ArrayData]
    val n = ca.numElements()
    val entries = new Array[Array[Double]](n) // (sim, cell) pairs
    var i = 0
    while (i < n) {
      if (ca.isNullAt(i)) {
        // a null struct element would have nulled the HOF's struct() too —
        // structurally impossible (collect_list skips nulls); sort it last
        entries(i) = Array(Double.NegativeInfinity, Int.MaxValue.toDouble)
      } else {
        val row = ca.getStruct(i, 2)
        val cell = row.getInt(0)
        val ce = if (row.isNullAt(1)) null else row.getArray(1)
        val sim =
          if (x == null || ce == null) Double.NegativeInfinity
          else cosine(x, ce)
        entries(i) = Array(sim, cell.toDouble)
      }
      i += 1
    }
    // identical comparator to the HOF lambda (sim DESC via Spark's
    // nan-aware double ordering, cell ASC), identical sort algorithm
    java.util.Arrays.sort(entries, new java.util.Comparator[Array[Double]] {
      override def compare(l: Array[Double], r: Array[Double]): Int = {
        val c = SQLOrderingUtil.compareDoubles(l(0), r(0))
        if (c > 0) -1
        else if (c < 0) 1
        else (l(1) - r(1)).toInt
      }
    })
    val k = math.min(keep, n)
    val out = new Array[Any](k)
    i = 0
    while (i < k) { out(i) = entries(i)(1).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(emb = newChildren(0), cents = newChildren(1))
}
