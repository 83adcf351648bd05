package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — J1/W1 (reference `0-merge_delete_query.sql:24-40`): for each
  * left row, attach the single most recent right row with
  * `right.ts <= left.ts` on equal keys.
  *
  * Plan shape: equi-join on `keys` (the range predicate rides along as a
  * join condition, so Catalyst plans a sort-merge join keyed on `keys` and
  * filters the range inside it — one shuffle per side), then a window dedup
  * keyed by the left row id to keep only the latest matching right row.
  *
  * Scale notes:
  *  - Match multiplicity is bounded by versions-per-key, so the intermediate
  *    blowup is (left rows) × (avg right versions per key). For CDC streams
  *    with deep history, pre-filter the right side to the look-back window
  *    first (the reference does exactly this with its 10-day window).
  *  - Both the join and the window shuffle on the same key family; Spark
  *    reuses the partitioning where possible, so the window adds a sort, not
  *    a second full shuffle.
  */
object AsOfJoin {

  /** Generic as-of: keep each left row's latest right match.
    *
    * @param leftId   unique id of a left row (window partition key — must be
    *                 unique per left row or results are ill-defined)
    * @param tiebreak right-side columns appended to the descending-ts order
    *                 to make the pick deterministic on ts ties
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(Column, Column)],
      leftTs: Column,
      rightTs: Column,
      leftId: Column,
      tiebreak: Seq[Column]): DataFrame = {
    val cond = keys.map { case (l, r) => l === r }.reduce(_ && _) && (rightTs <= leftTs)
    val joined = left.join(right, cond, "inner")
    val w = Window.partitionBy(leftId).orderBy(rightTs.desc +: tiebreak: _*)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** CDC delete-resurrection (reference `0-merge_delete_query.sql`, whole
    * file): tombstones carry no payload; resurrect each Delete by attaching
    * the payload of the most recent earlier non-deleted version of the same
    * entity, then union with the surviving non-deleted records.
    *
    * Output columns: entityKey, opCol, tsCol, payloadCols — tombstone rows
    * keep their own key/op/ts and borrow payload; non-deleted rows pass
    * through unchanged (reference `0-merge_delete_query.sql:50-58` UNION ALL).
    *
    * @param tiebreakCol extra version-side payload column name used to break
    *                    ts ties deterministically (e.g. a unique id)
    */
  def resurrectDeletes(
      df: DataFrame,
      entityKey: String,
      opCol: String,
      tsCol: String,
      deleteValue: String,
      payloadCols: Seq[String],
      tiebreakCol: String): DataFrame = {
    val deletes = df.filter(col(opCol) === deleteValue)
      .select(entityKey, opCol, tsCol)
      .alias("d")
    val versions = df.filter(col(opCol) =!= deleteValue)
      .select((Seq(entityKey, tsCol, tiebreakCol) ++ payloadCols).distinct.map(col): _*)
      .alias("v")

    val cond = col(s"d.$entityKey") === col(s"v.$entityKey") &&
      col(s"v.$tsCol") <= col(s"d.$tsCol")
    val w = Window
      .partitionBy(col(s"d.$entityKey"), col(s"d.$tsCol"))
      .orderBy(col(s"v.$tsCol").desc, col(s"v.$tiebreakCol").desc)

    val resurrected = deletes.join(versions, cond, "inner")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(
        col(s"d.$entityKey").as(entityKey) +:
          col(s"d.$opCol").as(opCol) +:
          col(s"d.$tsCol").as(tsCol) +:
          payloadCols.map(c => col(s"v.$c").as(c)): _*)

    val survivors = df.filter(col(opCol) =!= deleteValue)
      .select((Seq(entityKey, opCol, tsCol) ++ payloadCols).map(col): _*)

    resurrected.unionByName(survivors)
  }
}
