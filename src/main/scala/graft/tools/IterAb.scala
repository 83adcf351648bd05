package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Env

/** Dev utility: same-JVM interleaved A/B of AdaptiveIter.sizedRounds on
  * arbitrary SparkEntry queries
  * (`runMain graft.tools.IterAb <sfDir> <reps> <query...>`) — the host has
  * multi-minute throttle oscillations that poison cross-process
  * comparisons, so both arms run alternately in one process and the report
  * is per-arm minima/medians per query.
  */
object IterAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val names = if (args.length > 2) args.drop(2).toSeq else Seq("d7_semantic_dedup")
    val cpus = Env.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "5")
      .config("spark.ui.retainedJobs", "20")
      .config("spark.ui.retainedStages", "40")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, arm: Boolean): Double = {
      graft.ops.AdaptiveIter.enabled = arm
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.Bench.dropAllBlocks(spark)
      sec
    }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    names.foreach { name =>
      run(name, arm = false); run(name, arm = true) // warm both arms
      val rec = scala.collection.mutable.Map[Boolean, List[Double]]()
      for (_ <- 1 to reps; arm <- Seq(false, true))
        rec(arm) = run(name, arm) :: rec.getOrElse(arm, Nil)
      val off = rec(false); val on = rec(true)
      println(f"[iterab] $name OFF min=${off.min}%.2f med=${med(off)}%.2f " +
        f"ON min=${on.min}%.2f med=${med(on)}%.2f " +
        s"(off=${off.reverse.map(t => f"$t%.2f").mkString(",")} " +
        s"on=${on.reverse.map(t => f"$t%.2f").mkString(",")})")
    }
    graft.ops.AdaptiveIter.enabled = true
    spark.stop()
  }
}
