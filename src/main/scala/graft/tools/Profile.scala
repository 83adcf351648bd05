package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft._
import graft.dedup.MinHashLSH

/** Dev utility: stage-level timing for heavy queries
  * (`runMain graft.tools.Profile <sfDir>`). Not part of the driver contract.
  */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir)
    val sigs = MinHashLSH.signatures(docs, col("doc_id"), col("text"), 72, 1, 42L).cache()
    time("signatures")(println("sigs=" + sigs.count()))
    val pairs = MinHashLSH.candidatePairs(sigs, 6)
    time("candidatePairs")(println("pairs=" + pairs.count()))
    val nd = MinHashLSH.nearDuplicates(docs, col("doc_id"), col("text"), 0.95)
    time("nearDuplicates e2e cold")(println("out=" + nd.count()))
    val nd2 = MinHashLSH.nearDuplicates(docs, col("doc_id"), col("text"), 0.95)
    time("nearDuplicates e2e warm")(println("out=" + nd2.count()))
    spark.stop()
  }
}
