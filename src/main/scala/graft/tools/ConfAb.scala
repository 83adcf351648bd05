package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: same-JVM interleaved A/B of a BOOLEAN spark conf on
  * arbitrary SparkEntry queries
  * (`runMain graft.tools.ConfAb <conf> <sfDir> <reps> <query...>`) — the
  * host's multi-minute throttle oscillations poison cross-process
  * comparisons, so both arms run alternately in one process and the
  * report is per-arm minima/medians. Not part of the driver contract.
  */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val conf = args(0)
    val dir = args(1)
    val reps = args(2).toInt
    val names = args.drop(3).toSeq
    val cpus = graft.Env.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "5")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, arm: Boolean): Double = {
      spark.conf.set(conf, arm.toString)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.Bench.dropAllBlocks(spark)
      sec
    }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    names.foreach { name =>
      run(name, arm = false); run(name, arm = true) // warm both arms
      val rec = scala.collection.mutable.Map[Boolean, List[Double]]()
      for (_ <- 1 to reps; arm <- Seq(false, true))
        rec(arm) = run(name, arm) :: rec.getOrElse(arm, Nil)
      val off = rec(false); val on = rec(true)
      println(f"[confab] $name OFF min=${off.min}%.2f med=${med(off)}%.2f " +
        f"ON min=${on.min}%.2f med=${med(on)}%.2f " +
        s"(off=${off.reverse.map(t => f"$t%.2f").mkString(",")} " +
        s"on=${on.reverse.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
