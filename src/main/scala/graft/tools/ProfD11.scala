package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft._
import graft.sim.{Ivf, Similarity}

/** Dev utility: stage-wise cost of the d11 k-means candidate path
  * (`runMain graft.tools.ProfD11 <sfDir>`). Not part of the driver contract.
  */
object ProfD11 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profd11] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${graft.Env.cpus}]")
      .config("spark.sql.shuffle.partitions", graft.Env.cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = Tables.embeddings(spark, dir)
    noop(emb)
    val cents0 = Ivf.centroids(emb, 16)
    val cents = Ivf.refine(emb, cents0, 1, 64)
    val assigned = Ivf.assignProbes(emb, cents, "__kid", "__ku", 3)
    // warm
    noop(assigned)
    val pairs = Similarity.kmeansCandidatePairs(emb, threshold = 0.4)
    noop(pairs)

    (1 to 2).foreach { r =>
      time(s"rep$r refine (1 lloyd)")(noop(Ivf.refine(emb, cents0, 1, 64)))
      time(s"rep$r assignProbes noop")(noop(Ivf.assignProbes(emb, cents, "__kid", "__ku", 3)))
      time(s"rep$r kmeansCandidatePairs")(noop(Similarity.kmeansCandidatePairs(emb, threshold = 0.4)))
      time(s"rep$r full d11")(
        graft.SparkEntry.queries("d11_semantic_dedup_kmeans")(spark, dir).count())
      graft.Bench.dropAllBlocks(spark)
    }
    spark.stop()
  }
}
