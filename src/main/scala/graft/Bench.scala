package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  *
  * Two passes: an untimed warmup executes every query once (JIT + codegen
  * compilation + file-footer reads dominate first execution at small scale
  * factors — none of which exists in a long-lived production job), then the
  * timed pass reports steady-state numbers. Set SPARK_GRAFT_WARMUP=0 to
  * time cold instead.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      // bounded so the warmup can never more than ~double the bench wall
      // time on a slow/contended host
      val budgetNs =
        sys.env.getOrElse("SPARK_GRAFT_WARMUP_BUDGET_SEC", "180").toLong * 1000000000L
      val t0 = System.nanoTime()
      ordered.iterator.takeWhile(_ => System.nanoTime() - t0 < budgetNs)
        .foreach { case (_, fn) =>
          try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        }
      spark.sharedState.cacheManager.clearCache() // warm code, cold data
    }

    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
