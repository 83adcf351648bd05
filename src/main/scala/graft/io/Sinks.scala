package graft.io

import org.apache.spark.sql.DataFrame

/** Output sinks (SURVEY §2.1 K1–K3; reference `script/main.py:377-416`).
  *
  * Scale notes: the gzip JSON/CSV sinks mirror the reference's per-iteration
  * exports, which force a single file via `coalesce(1)` — fine for the
  * reference's small per-(country × distribution) exports, pathological at
  * 100 TB. Both sinks therefore take `singleFile: Boolean` so bulk exports
  * can keep one-file-per-partition parallelism; the default preserves the
  * reference behaviour.
  */
object Sinks {

  /** K1 (`script/main.py:377-384`): gzip JSON export. The reference writes
    * the nested-struct frame (built by `Reshape.nestSchema`); nesting is the
    * caller's choice — this sink only owns format/compression/layout.
    */
  def gzipJson(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").option("compression", "gzip").json(path)

  /** K2 (`script/main.py:386-393`): gzip CSV export with header, single
    * file via `coalesce(1)` like the reference.
    */
  def gzipCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite")
      .option("compression", "gzip").option("header", "true").csv(path)

  /** K3 (`script/main.py:395-416`): the reference's `purge_table(partition
    * predicate)` + append, i.e. delete-insert of exactly the partitions
    * present in `df`. Spark-native equivalent: dynamic partition overwrite —
    * only partitions with incoming rows are replaced, untouched partitions
    * survive. One session conf, no manual delete pass, safe to re-run
    * (idempotent month re-processing, SURVEY §2.10).
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCol: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Bucketed catalog table: pre-hash-partition AND pre-sort the data by
    * the join/agg key at write time. Two tables bucketed the same way join
    * with ZERO exchanges — the only way a recurring big-big join is viable
    * at 100 TB (pay the shuffle once at ingest, never per query). Requires
    * a catalog table (`saveAsTable`), not a bare path.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** ORC export — for consumers standardized on the ORC toolchain; same
    * writer semantics as the parquet paths (snappy via Spark defaults).
    */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
