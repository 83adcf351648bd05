package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.Sinks
import graft.ops.Reshape

/** Job orchestration (SURVEY §3.3; reference `script/main.py:221-418`):
  * source loads → CDC repair (cached, shared) → per-iteration stages with
  * per-iteration JSON + CSV exports → accumulated union → final partitioned
  * parquet write with delete-insert semantics (K3).
  *
  * Mirrors the reference's action schedule: the two per-iteration exports
  * materialize inside the loop; the accumulated union materializes once at
  * the final write. `BaseDataFirst` (stage 1) stays cached only while its
  * iteration runs (`script/main.py:324,370`).
  */
object ConsumeJob {

  /** @return the accumulated union that was written to `outDir/table`. */
  def run(spark: SparkSession, dir: String, outDir: String,
          params: ConsumeParams = ConsumeParams()): DataFrame = {
    val events = Tables.events(spark, dir).cache()
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val nation = Tables.nation(spark, dir)

    val repaired = ConsumePipeline.repairCdc(events).cache()
    val side = ConsumePipeline.SideInputs(orders, events,
      params.activityFrom, params.activityTo).cache()

    val perIteration = params.iterations.map { it =>
      val b1 = ConsumePipeline.baseFirst(repaired, customer)
        .filter(it.filter)
        .cache()
      // stage 3 + both exports read base2 repeatedly — cache like build()
      val b2 = ConsumePipeline.enrich(b1, side).cache()
      val b3 = ConsumePipeline.baseFinal(b2, params.monthStart, params.monthEnd)
      val out = ConsumePipeline.modify(b3, nation)
        .withColumn("iteration", lit(it.name))

      // K1: nested gzip JSON export (flat names re-nested on '_', F8).
      val json = Reshape.nestSchema(out.select("user_id", "event_type",
        "price_src", "partition_month", "n_name", "n_clicks", "n_views"))
      Sinks.gzipJson(json, s"$outDir/json/${it.name}")
      // K2: flat gzip CSV export.
      Sinks.gzipCsv(out.drop("props"), s"$outDir/csv/${it.name}")

      // The reference unpersists BaseDataFirst here; the accumulated union
      // then recomputes stage-1 lineage at the final write
      // (`script/main.py:370`, SURVEY §3.3) — an accepted cost there, but
      // pure waste, so we keep b1 cached until after the final action.
      (out, Seq(b1, b2))
    }

    val union = perIteration.map(_._1).reduce(_ unionByName _)
    // K3: delete-insert of the month partitions present in the result.
    Sinks.overwritePartitions(union, s"$outDir/table", "partition_month")

    perIteration.foreach(_._2.foreach(_.unpersist()))
    side.unpersist()
    repaired.unpersist()
    events.unpersist()
    union
  }
}
