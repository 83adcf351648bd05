package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Env, Tables}

/** Dev utility: same-JVM A/B of sequentialRules' default vs salted pair
  * stage (`runMain graft.tools.SeqAb <sfDir> [reps]`) — interleaved so a
  * host-throughput swing hits both arms equally, reporting per-arm minima.
  */
object SeqAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = Env.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(salt: Int): Double = {
      val t0 = System.nanoTime()
      graft.ops.Sequences.sequentialRules(Tables.orders(spark, dir),
        Tables.lineitem(spark, dir), minSupport = 3L, k = 100,
        salt = salt).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(1); run(8) // warmup both arms (JIT + codegen)
    val rec = scala.collection.mutable.Map[Int, List[Double]]()
    for (_ <- 1 to reps; salt <- Seq(1, 8))
      rec(salt) = run(salt) :: rec.getOrElse(salt, Nil)
    for ((salt, ts) <- rec.toSeq.sortBy(_._1))
      println(f"[seqab] salt=$salt min=${ts.min}%.2f all=${ts.reverse.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
