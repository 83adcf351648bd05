package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Env
import graft.pipeline.{ConsumePipeline, ConsumeParams}

/** Measured cache-vs-bucketed rehearsal of the reference consume pipeline
  * (r12 verdict ask #3): SCALE.md's 100 TB prescription — swap the
  * loop-hoisted stage-1 `.cache()` (the reference's cache points,
  * `script/main.py:125,324`) for a user_id-bucketed catalog table — gets
  * wall-clock numbers and an exchange audit instead of a spec-only claim.
  *
  * Per mode: full pipeline wall (count of the final union) and, for the
  * bucketed mode, the per-iteration BASE-SIDE exchange count (collected
  * from the physical plan of one iteration's stage-2+3 composition over
  * the bucketed table, AQE off so the tree is final) — the number SCALE.md
  * claims is ZERO.
  *
  * {{{
  *   runMain graft.tools.PipeBucketedRehearsal /tmp/sf1
  * }}}
  */
object PipeBucketedRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PipeBucketedRehearsal <dataDir> [buckets]")
    val dir = args(0)
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = Env.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.ui.retainedJobs", "20")
      .config("spark.ui.retainedStages", "40")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.sql.ui.retainedExecutions", "5")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val table = s"graft_rehearsal_base1_${ProcessHandle.current().pid()}"

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[pipe-bucketed] $label $sec%.1f s ($rows rows)")
      sec
    }

    try {
      // cache posture first (the committed pipe_consume_e2e shape)
      val tCache = timed("cache-mode")(
        ConsumePipeline.build(spark, dir).count())
      spark.catalog.clearCache()
      // bucketed posture (stage-1 lands as the bucketed table)
      val tBucket = timed("bucketed-mode")(
        ConsumePipeline.buildBucketed(spark, dir,
          table = table, numBuckets = buckets).count())
      // exchange audit: one iteration's stage-2+3 over the bucketed table,
      // uncached so the scan is visible, AQE off so the tree is final
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val params = ConsumeParams()
      val side = ConsumePipeline.SideInputs(
        graft.Tables.orders(spark, dir), graft.Tables.events(spark, dir),
        params.activityFrom, params.activityTo)
      val b3 = ConsumePipeline.baseFinal(
        ConsumePipeline.enrich(
          spark.table(table).filter(params.iterations.head.filter), side),
        params.monthStart, params.monthEnd)
      val physical = b3.queryExecution.executedPlan
      def readsBase(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collect { case s: FileSourceScanExec
          if s.tableIdentifier.exists(_.table == table) => s }.nonEmpty
      val all = physical.collect { case e: ShuffleExchangeExec => e }
      val baseSide = all.filter(readsBase)
      println(f"""{"metric":"pipe_bucketed","cache_sec":$tCache%.1f,""" +
        f""""bucketed_sec":$tBucket%.1f,"buckets":$buckets,""" +
        s""""iter_exchanges_total":${all.size},""" +
        s""""iter_exchanges_base_side":${baseSide.size},"dir":"$dir"}""")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.stop()
    }
  }
}
