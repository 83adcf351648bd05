package graft.ops

import org.apache.spark.sql.DataFrame

/** Set operations U1–U3 (SURVEY §2.7).
  *
  * `unionByName` is the safe Scala equivalent of the reference's SQL
  * `UNION ALL` over identically-listed columns — it aligns by name so a
  * column-order drift between branches can't silently mispair values.
  * Union is plan-level only (no shuffle); DISTINCT adds one shuffle.
  */
object SetOps {

  /** U1/U2/U3(ALL): accumulate N frames, preserving duplicates. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _)

  /** U3(DISTINCT): `(s1) UNION (s2)` — reference `script/main.py:42-53`. */
  def unionDistinct(dfs: Seq[DataFrame]): DataFrame =
    unionAll(dfs).distinct()

  /** Parameterized union mirroring the reference's `sparkUnion(glue_ctx,
    * union_type, ...)` API (`script/main.py:42-53`).
    */
  def union(dfs: Seq[DataFrame], unionType: String): DataFrame =
    unionType.toUpperCase match {
      case "ALL"      => unionAll(dfs)
      case "DISTINCT" => unionDistinct(dfs)
      case other      => throw new IllegalArgumentException(
        s"union type must be ALL or DISTINCT, got $other")
    }

  /** Schema-evolution union: frames whose columns drifted apart union BY
    * NAME, absent columns null-filled — the landed-history reality where
    * last year's partitions lack this year's columns (the read-side twin
    * of the writer-side mergeSchema in [[graft.io.Sources]]). Output
    * columns = the first frame's, then each later frame's new columns in
    * first-appearance order. Pure plan-level alignment — no shuffle, no
    * data movement beyond the union itself.
    */
  def unionByNameAligned(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "need at least one frame")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Type-widening union: frames whose SHARED columns drifted in TYPE
    * (int → long → double across snapshot generations — the other half of
    * schema evolution [[unionByNameAligned]] doesn't cover) union after
    * each column is cast to the WIDEST type any frame carries, following
    * Spark's numeric-promotion order; columns absent from a frame
    * null-fill as in the aligned union. `union` without this either
    * fails to resolve or silently truncates through positional casts —
    * widening first is the only lossless direction.
    *
    * Plan-level only: the casts are projections fused into each branch's
    * scan; no shuffle is added.
    */
  def unionWiden(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "need at least one frame")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    def rank(t: DataType): Int = t match {
      case ByteType => 1; case ShortType => 2; case IntegerType => 3
      case LongType => 4; case FloatType => 5; case DoubleType => 6
      case _ => 0
    }
    def widen(ts: Seq[DataType]): DataType = {
      val distinct = ts.distinct
      if (distinct.size == 1) distinct.head
      else {
        // a TYPE conflict must be all-numeric — silently casting a
        // string/decimal/date branch to a numeric would null or corrupt
        // it, the opposite of this op's lossless contract
        require(distinct.forall(rank(_) > 0),
          s"unionWiden: non-numeric type conflict: ${distinct.mkString(", ")}")
        val widest = distinct.maxBy(rank)
        // long ∪ float is the one pair where the max-rank pick is lossy
        // (float's 24-bit mantissa drops longs > 2^24) — promote to double
        if (widest == FloatType && distinct.exists(rank(_) == 4)) DoubleType
        else widest
      }
    }
    val widestByName: Map[String, DataType] = dfs
      .flatMap(_.schema.fields.map(f => f.name -> f.dataType))
      .groupBy(_._1)
      .map { case (n, ts) => n -> widen(ts.map(_._2)) }
    val cast = dfs.map { df =>
      df.select(df.columns.toSeq.map(c =>
        col(c).cast(widestByName(c)).as(c)): _*)
    }
    unionByNameAligned(cast)
  }
}
