package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality report every ingestion pipeline
  * runs before trusting a new drop: per column, row count, null count,
  * exact distinct count. One row per profiled column, long format (a
  * profile TABLE survives schema evolution; a wide row would not).
  *
  * Plan: ONE scan. Spark compiles multi-column `count_distinct` into a
  * single Expand-based aggregate — the input replicates k+1 ways
  * map-side (one lane per distinct target + one for the plain counts),
  * each lane partial-aggregates on (value, gid) BEFORE its exchange, so
  * what shuffles is per-partition-distinct values, not raw rows; a
  * second 1-row exchange collapses the lane states. Two exchanges of
  * shrunken state vs k separate jobs re-scanning 100 TB each — the
  * right trade when the scan dominates. The `stack` melt to long format
  * runs on the 1-row result — free. Exact distincts on a truly
  * high-cardinality column still shuffle that column's distinct set;
  * swap in the KMV/HLL sketches ([[graft.functions]]) when ±1%
  * suffices.
  */
object Profile {

  def columns(df: DataFrame, colNames: Seq[String]): DataFrame = {
    require(colNames.nonEmpty && colNames.distinct == colNames,
      "need a non-empty, duplicate-free column list")
    require(colNames.forall(c => c.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"plain identifier column names only, got $colNames")
    val aggs = count(lit(1)).as("__n") +: colNames.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      count_distinct(col(c)).as(s"__nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = colNames.map(c => s"'$c', __nn_$c, __nd_$c")
      .mkString(", ")
    one.select(
        expr(s"stack(${colNames.size}, $stackArgs)" +
          " AS (column_name, __nonnull, n_distinct)"),
        col("__n"))
      .select(col("column_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nonnull")).as("n_nulls"),
        col("n_distinct"))
  }

  /** Referential-integrity check — one row per declared FK relationship:
    * child rows, orphan rows (child key value absent from the parent),
    * distinct orphan key values. The data-quality gate before any join
    * is trusted: an inner join silently DROPS orphans and a left join
    * silently NULLs them, so "how many are there" must be a first-class
    * report, not a surprise in downstream row counts.
    *
    * Plan per relationship: one LEFT ANTI join child→parent on the key
    * (the parent side aggregates to its distinct keys first), then a
    * 1-row count aggregate. No broadcast hint: a dimension parent
    * (nation, region) is small enough that AQE converts the anti join
    * to broadcast at runtime from the measured distinct-key size, but a
    * FACT parent (orders keys under lineitem→orders) is
    * warehouse-scale and an unconditional hint would OOM the driver at
    * 100 TB — the shuffled anti join on the key is the correct plan
    * there, and AQE picks per relationship. Null child keys count as
    * orphans (they too vanish in an inner join — that's what the
    * report is for). The per-relationship results union into one
    * long-format table.
    */
  def fkCheck(relationships: Seq[(String, DataFrame, Column, DataFrame,
      Column)]): DataFrame = {
    require(relationships.nonEmpty, "need at least one relationship")
    relationships.map { case (name, child, childKey, parent, parentKey) =>
      val orphans = child.select(childKey.as("__k"))
        .join(parent.select(parentKey.as("__k")).distinct(),
          Seq("__k"), "left_anti")
      val total = child.agg(count(lit(1)).as("n_child"))
      orphans.agg(count(lit(1)).as("n_orphans"),
          count_distinct(col("__k")).as("n_orphan_keys"))
        .crossJoin(total)
        .select(lit(name).as("relationship"), col("n_child"),
          col("n_orphans"), col("n_orphan_keys"))
    }.reduce(_ unionAll _)
  }

  /** Snapshot drift report — "did this week's drop change shape":
    * compares two partitions of one table (the PSI/data-drift gate a
    * pipeline runs before a new snapshot may feed training). One row
    * per dimension cell: row counts on each side, integer-ppm rates
    * (of each side's total), the rate delta, and each side's mean of
    * an integer measure (µ-units, floor) — nulls when a side is empty
    * in that cell.
    *
    * Plan: ONE scan, one shuffle on the dimension-bounded cell key
    * with conditional map-side partials (`sum(when(inB, …))`), then
    * whole-frame windows for the two totals — cell-scale rows only,
    * the same deliberate serial step as [[Concurrency]]. No join of
    * two scans: the snapshot flag is a predicate, not a table.
    */
  def snapshotDrift(df: DataFrame, dims: Seq[Column], inB: Column,
                    valueMicro: Column): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension column")
    val dimNames = dims.indices.map(i => s"dim${i + 1}")
    val sel = dims.zip(dimNames).map { case (c, n) => c.as(n) } ++
      Seq(inB.as("__b"), valueMicro.as("__v"))
    val cells = df.select(sel: _*)
      .groupBy(dimNames.map(col): _*)
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("__b"), col("__v"))).as("__va"),
        sum(when(col("__b"), col("__v"))).as("__vb"))
    val whole = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    cells
      .withColumn("__ta", sum(col("n_a")).over(whole))
      .withColumn("__tb", sum(col("n_b")).over(whole))
      .withColumn("rate_a_ppm", call_function("div",
        col("n_a") * lit(1000000L), col("__ta")))
      .withColumn("rate_b_ppm", call_function("div",
        col("n_b") * lit(1000000L), col("__tb")))
      .select((dimNames.map(col) ++ Seq(col("n_a"), col("n_b"),
        col("rate_a_ppm"), col("rate_b_ppm"),
        (col("rate_b_ppm") - col("rate_a_ppm")).as("drift_ppm"),
        when(col("n_a") > 0, call_function("div", col("__va"),
          col("n_a"))).as("mean_a_micro"),
        when(col("n_b") > 0, call_function("div", col("__vb"),
          col("n_b"))).as("mean_b_micro"))): _*)
  }

  /** Candidate-key uniqueness audit — the companion to [[fkCheck]] on the
    * other side of the join: before declaring a column THE key (and
    * building merges, SCD logic, or bucketing on it), measure how far it
    * is from unique. Per candidate: row count, distinct keys, keys with
    * duplicates, surplus rows (rows − keys — what a dedup would remove),
    * and the worst key's multiplicity. One rollup per candidate with
    * map-side partials; results union long-format like [[fkCheck]].
    */
  def keyCheck(candidates: Seq[(String, DataFrame, Column)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate key")
    candidates.map { case (name, df, key) =>
      df.select(key.as("__k"))
        .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("__c")).as("n_rows"),
          coalesce(sum(when(col("__c") > 1L, lit(1L))), lit(0L))
            .as("n_dup_keys"),
          max(col("__c")).as("max_multiplicity"))
        .select(lit(name).as("candidate"), col("n_rows"), col("n_keys"),
          col("n_dup_keys"),
          (col("n_rows") - col("n_keys")).as("n_surplus_rows"),
          col("max_multiplicity"))
    }.reduce(_ unionAll _)
  }

  /** Small-files audit — the layout-hygiene report behind every 100 TB
    * table: per file, row count and byte size (from the scan's own task
    * metadata — `input_file_name`/`input_file_block_length`, no
    * filesystem listing job), plus the file count the table SHOULD have
    * at `targetBytesPerFile` (ceiling division, exact integers). A
    * table whose `n_files` dwarfs the recommendation is the classic
    * small-files pathology (driver-side planning cost, per-file open
    * overhead, undersized row groups); the fix is a `coalesce` rewrite
    * sized by this report. One map-side rollup per file — the audit
    * costs one scan of file metadata columns, no data columns read.
    * Byte counts are scan-observed block coverage: exact for
    * single-block files (the small-files case this exists for), a
    * lower bound on a multi-block file whose tail block carries no
    * row-group midpoint (that block never surfaces a row).
    */
  def fileAudit(tables: Seq[(String, DataFrame)],
                targetBytesPerFile: Long = 128L * 1024 * 1024): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    require(targetBytesPerFile > 0, "target must be positive")
    val perFile = tables.map { case (name, df) =>
      // block grain first: a file bigger than maxPartitionBytes scans as
      // several blocks, each reporting its own length — per-file bytes
      // are the SUM over distinct blocks, never max(block length)
      df.select(lit(name).as("table_name"),
          regexp_extract(input_file_name(), "([^/]+)$", 1).as("file_name"),
          input_file_block_start().as("__blk"),
          input_file_block_length().as("__len"))
        .groupBy(col("table_name"), col("file_name"), col("__blk"))
        .agg(count(lit(1)).as("n_rows"), max(col("__len")).as("__blen"))
        .groupBy(col("table_name"), col("file_name"))
        .agg(sum(col("n_rows")).as("n_rows"), sum(col("__blen")).as("n_bytes"))
    }.reduce(_ unionAll _)
    perFile.groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
        sum(col("n_bytes")).as("n_bytes"))
      .withColumn("recommended_files",
        greatest(lit(1L), call_function("div",
          col("n_bytes") + (targetBytesPerFile - 1L),
          lit(targetBytesPerFile))))
  }
}
