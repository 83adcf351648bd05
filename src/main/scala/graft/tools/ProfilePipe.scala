package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft._
import graft.pipeline._

/** Dev utility: stage-level timing for the consume pipeline. */
object ProfilePipe {
  import Profile.time

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = Tables.events(spark, dir)
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)

    time("warm events count")(events.count())
    val repaired = ConsumePipeline.repairCdc(events).cache()
    time("stage0 repair")(println(repaired.count()))
    val side = ConsumePipeline.SideInputs(orders, events, "1996-01-01", "1998-01-01").cache()
    time("side inputs")(println(side.active.count() + side.userStats.count()))
    val b1 = ConsumePipeline.baseFirst(repaired, customer)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).cache()
    time("stage1 b1")(println(b1.count()))
    val b2 = ConsumePipeline.enrich(b1, side)
    time("stage2 enrich")(println(b2.count()))
    val b3 = ConsumePipeline.baseFinal(b2, "2024-01-15", "2024-02-01")
    time("stage3 final")(println(b3.count()))
    val full = ConsumePipeline.build(spark, dir)
    time("full build e2e")(println(full.count()))
    spark.stop()
  }
}
