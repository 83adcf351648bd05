package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Env, Tables}
import graft.sim.Similarity

/** Scratch stage profiler for the d11 plan (round 10). */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Env.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $what ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, dir)
    emb.count()
    (1 to 3).foreach { rep =>
      val pairs = Similarity.kmeansCandidatePairs(emb, threshold = 0.4)
        .localCheckpoint(true)
      time(s"rep$rep pairs")(pairs.count())
      println(s"[prof] rep$rep n_pairs " + pairs.count())
      val labels = time(s"rep$rep cc")(
        graft.dedup.Clusters.connectedComponentsAlternating(pairs).count())
      val dedup = time(s"rep$rep full_semanticDedup")(
        Similarity.semanticDedup(emb, 0.4,
          Some(Similarity.kmeansCandidatePairs(emb, 0.4))).count())
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}
