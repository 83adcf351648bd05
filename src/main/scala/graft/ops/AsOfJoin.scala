package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — J1/W1 (reference `0-merge_delete_query.sql:24-40`): for each
  * left row, attach the single most recent right row with
  * `right.ts <= left.ts` on equal keys.
  *
  * Plan shape: NOT the textbook range-join + row_number dedup — that
  * materializes |left| × (versions-per-key) intermediate rows, which
  * detonates on hot keys (a CDC stream with 1000 versions per entity pays a
  * 1000× blowup before the dedup window throws it away). Instead both
  * sides union into one stream per key, sorted by (ts, side, tiebreak), and
  * a running `last(payload, ignoreNulls)` window carries the latest right
  * payload forward into each left row: one shuffle + one sort per key,
  * ZERO intermediate blowup, O(n log n) regardless of version depth.
  *
  * Requirements: non-key column names must be disjoint between the sides
  * (same condition a plain join needs for unambiguous output).
  */
object AsOfJoin {

  /** Generic as-of: attach each left row's latest right match; left rows
    * with no earlier right row are dropped (inner semantics).
    *
    * @param keys     (leftKey, rightKey) column-name pairs
    * @param leftTs   left event-time column name
    * @param rightTs  right event-time column name (kept in the output)
    * @param tiebreak right column names breaking rightTs ties — HIGHEST
    *                 value wins, applied in order
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTs: String,
      rightTs: String,
      tiebreak: Seq[String]): DataFrame = {
    val keyNames = keys.map(_._1)
    val rKeyed = keys.foldLeft(right) { case (df, (l, r)) =>
      if (l == r) df else df.withColumnRenamed(r, l)
    }
    val payloadCols = rKeyed.columns.filterNot(keyNames.contains).toSeq

    val rTagged = rKeyed.select(
      keyNames.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__match")) ++
        tiebreak.map(c => col(c).as(s"__tb_$c")): _*)
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))

    // right rows sort before the left row they may serve at equal ts
    // (right.ts <= left.ts is inclusive); among rights, later tiebreak wins.
    val order = col("__ts").asc +: col("__side").asc +:
      tiebreak.map(c => col(s"__tb_$c").asc)
    val w = Window.partitionBy(keyNames.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged, allowMissingColumns = true)
      .withColumn("__m", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(left.columns.toSeq.map(col) ++ payloadCols.map(c => col(s"__m.$c")): _*)
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
    * Duplicate-tombstone tie rule (pinned to the reference): the reference
    * ranks the deletes×versions join `PARTITION BY (key, changeDate)`
    * (`0-merge_delete_query.sql:27-41`), so several tombstones sharing
    * (key, ts) produce ONE resurrected row, not one each. The tombstone
    * projection here is (key, op, ts) — duplicates are identical rows — so
    * a `distinct()` reproduces that collapse exactly.
    *
    * @param tiebreakCol version-side column breaking ts ties (highest wins)
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
      .distinct() // collapse duplicate (key, ts) tombstones — see tie rule
    val versions = df.filter(col(opCol) =!= deleteValue)
      .select((Seq(entityKey, tsCol, tiebreakCol) ++ payloadCols)
        .distinct.map(col): _*)
      .withColumnRenamed(tsCol, "__vts")

    val resurrected = asOf(deletes, versions,
        keys = Seq((entityKey, entityKey)),
        leftTs = tsCol, rightTs = "__vts",
        tiebreak = Seq(tiebreakCol))
      .select((Seq(entityKey, opCol, tsCol) ++ payloadCols).map(col): _*)

    val survivors = df.filter(col(opCol) =!= deleteValue)
      .select((Seq(entityKey, opCol, tsCol) ++ payloadCols).map(col): _*)

    resurrected.unionByName(survivors)
  }
}
