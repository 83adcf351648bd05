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
  *
  * Output contract: the JSON line is the LAST line this process prints on
  * stdout (build.sbt routes forked output through undecorated), and is also
  * written to bench_out.json in the working directory as a parse-proof
  * fallback.
  */
object Bench {

  /** Previous-round per-query cost (sf0.1 seconds) — orders the warmup so
    * the expensive queries are guaranteed warm even if the warmup budget
    * runs out. Unlisted queries default to 0 and run last.
    */
  private val costHint: Map[String, Double] = Map(
    "d6_neardup_dedup" -> 44.1, "d4_jaccard_pairs" -> 16.7,
    "d2_minhash_neardup" -> 15.7, "pipe_consume_e2e" -> 7.7,
    "s3_ann_ivf_topk" -> 2.8, "d5_embedding_neardup" -> 2.4,
    "a1_argmax" -> 1.6, "w2_latest_per_key_day" -> 1.4,
    "s2_ann_lsh_topk" -> 1.3, "d3_simhash_neardup" -> 1.2,
    "w3_price_change_history" -> 1.2, "a2_sum_coalesce" -> 1.1,
    "j1_cdc_resurrect" -> 1.0, "j1_asof_join" -> 0.9,
    "j6_newer_exists" -> 0.9, "s1_ann_bruteforce_topk" -> 0.9)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      // bounded so the warmup can never more than ~double the bench wall
      // time on a slow/contended host; most-expensive-first so the heavy
      // queries are the LAST to lose warmup when the budget binds
      val budgetNs =
        sys.env.getOrElse("SPARK_GRAFT_WARMUP_BUDGET_SEC", "240").toLong * 1000000000L
      val t0 = System.nanoTime()
      ordered.sortBy { case (n, _) => -costHint.getOrElse(n, 0.0) }
        .iterator.takeWhile(_ => System.nanoTime() - t0 < budgetNs)
        .foreach { case (_, fn) =>
          try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        }
      spark.sharedState.cacheManager.clearCache() // warm code, cold data
    }

    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable => Some(e.toString.take(200)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    // failed queries report an explicit error, never a plausible wall time
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":${jstr(sfDir)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
    spark.stop()
    // last line on stdout, after Spark's shutdown logging
    println(line)
  }
}
