package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: reduce an embedding column to
  * `outDim` dimensions by dotting against `outDim` seeded gaussian
  * hyperplanes (the same deterministic generator the LSH index uses, so an
  * oracle can replay the exact matrix). Distances are preserved within
  * ~(1±ε) at outDim = O(ln n / ε²) — the cheap pre-filter in front of exact
  * cosine at corpus scale.
  *
  * Pure projection: the plane matrix is a plan-time literal (outDim × dim
  * doubles — kilobytes), each output dim is a sequential fold over
  * `zip_with(x, plane, *)` in index order, so the floating-point sum order
  * is reproducible on any engine. No shuffle, no UDF.
  */
object Project {

  def randomProject(df: DataFrame, id: Column, embedding: Column,
                    dim: Int, outDim: Int = 8, seed: Long = 7L): DataFrame = {
    require(outDim >= 1 && dim >= 1, "dims must be >= 1")
    val planes = Similarity.hyperplanes(outDim, dim, seed)
    val x = embedding.cast("array<double>")
    val outCols = planes.zipWithIndex.map { case (p, j) =>
      // native fold (guide §4): bit-identical to the HOF dot product
      round(org.apache.spark.sql.graftfn.asColumn(graft.functions.ArrayDot(
        org.apache.spark.sql.graftfn.asExpression(x),
        org.apache.spark.sql.graftfn.asExpression(typedLit(p.toSeq)))),
        6).as(s"y$j")
    }
    df.select(id +: outCols: _*)
  }
}
