package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Env

/** Scaling-rehearsal runner: executes a comma-separated list of
  * SparkEntry queries once each against a data directory and prints one
  * `[rehearsal] name,seconds,rows` line per query.
  *
  * {{{
  *   runMain graft.tools.RehearsalRun /root/testdata/sf0.1 g1_pagerank,s3_ann_ivf_topk
  *   runMain graft.tools.RehearsalRun /tmp/sf1 g1_pagerank,s3_ann_ivf_topk
  * }}}
  *
  * Protocol matches the round-10 d-family rehearsal (SCALE.md "sf0.1 →
  * sf1"): cold JVM, one pass, no warmup, session config identical to
  * [[graft.Bench]] — so the sf0.1/sf1 wall-time RATIO is comparable even
  * though the absolute numbers carry first-execution JIT cost. Storage
  * blocks are dropped between queries the same way Bench does, so one
  * query's localCheckpoint rounds can't crowd a later query into spill.
  */
object RehearsalRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RehearsalRun <dataDir> <q1,q2,...>")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = Env.cpus
    // SPARK_GRAFT_SHUFFLE overrides the partition count: the knob the
    // SCALE.md table says scales with data (2–3× total cores on a real
    // cluster). The rehearsal's 10×/100× tiers on a FIXED 32 keep
    // per-partition reduce state growing with the tier — the d15 sf10
    // decade measured the difference between spill-thrash and linear.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[rehearsal] $name,$sec%.2f,$rows")
      // Bench's full cleanup, GC kick included — without it broadcast and
      // shuffle blocks accumulate across the list and inflate the later
      // queries' walls (the exact cross-query bleed the ratio table must
      // not carry)
      graft.Bench.dropAllBlocks(spark)
    }
    spark.stop()
  }
}
