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
}
