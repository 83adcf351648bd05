package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (and the training-data extensions) gets a
  * named query over the synthetic tables plus, where SQL-expressible, an
  * equivalent DuckDB oracle in [[oracleSql]]. Column names are aliased
  * identically on both sides — the driver's compare sorts columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("w2_latest_per_key_day")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W2 (1-basedata_first_query.sql:4-5): latest version per (key, day).
    // Stand-in: latest lineitem per (l_orderkey, ship day); l_linenumber is
    // the unique tiebreaker (FIXTURES.md §8).
    "w2_latest_per_key_day" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      Dedup
        .latestPerKeyAndDay(li, col("l_orderkey"), col("l_shipdate"),
          Seq(col("l_linenumber").desc))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "w2_latest_per_key_day" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |       l_extendedprice, l_returnflag, l_shipdate
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY l_orderkey, CAST(l_shipdate AS DATE)
        |    ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin
  )
}
