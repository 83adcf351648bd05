package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Env, Tables}
import graft.sim.Similarity

/** Dev-only stage profiler for d9_semantic_dedup_lsh: times the candidate
  * generation, the pair dedup, and the clustering separately so a bench
  * regression can be attributed to a stage instead of re-guessed from the
  * end-to-end number. Not part of the driver contract.
  */
object ProfileD9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Env.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    emb.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 3).foreach { rep =>
      System.err.println(s"[profile] === rep $rep ===")
      val full = Similarity.lshCandidatePairs(emb, threshold = 0.4)
      val scored = time("1 candidates+cosine") { full.count() }
      System.err.println(s"[profile]   scored=$scored " +
        s"parts=${full.rdd.getNumPartitions}")
      time("2 full semanticDedup") {
        Similarity.semanticDedup(emb, 0.4,
          pairs = Some(full.select("id_a", "id_b"))).count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}
