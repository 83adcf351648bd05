package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft._
import graft.sim.{Ivf, Quantize}

/** Dev utility: isolate the per-stage cost of the IVF-PQ encode path
  * (`runMain graft.tools.ProfPq <sfDir>`). Not part of the driver contract.
  */
object ProfPq {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profpq] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Env.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm everything once
    noop(emb)
    val cPrep = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val cents = Ivf.centroids(cPrep, 16)
    noop(Ivf.assign(cPrep, cents, "neighbor_id", "__x"))
    noop(Quantize.productQuantize(emb, col("vec_id"), col("embedding"), 4, 4, 64))

    time("scan only")(noop(emb))
    time("centroids(16)")(noop(cents))
    time("assign")(noop(Ivf.assign(cPrep, cents, "neighbor_id", "__x")))
    time("assign 2nd")(noop(Ivf.assign(cPrep, cents, "neighbor_id", "__x")))
    time("productQuantize (encode)")(
      noop(Quantize.productQuantize(emb, col("vec_id"), col("embedding"), 4, 4, 64)))
    time("productQuantize 2nd")(
      noop(Quantize.productQuantize(emb, col("vec_id"), col("embedding"), 4, 4, 64)))

    if (sys.env.get("PROFPQ_WRITE").contains("1")) {
      val coded = Quantize.productQuantize(emb, col("vec_id"), col("embedding"), 4, 4, 64)
        .withColumn("cell", pmod(col("vec_id"), lit(16)).cast("int"))
      coded.write.mode("overwrite").partitionBy("cell").parquet("/tmp/profpq-w0") // warm
      time("write partitionBy (no rebalance)")(
        coded.write.mode("overwrite").partitionBy("cell").parquet("/tmp/profpq-w1"))
      time("write partitionBy (rebalance by cell)")(
        coded.hint("rebalance", col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet("/tmp/profpq-w2"))
      time("write partitionBy (repartition by cell)")(
        coded.repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet("/tmp/profpq-w3"))
      def nFiles(p: String) =
        java.nio.file.Files.walk(java.nio.file.Paths.get(p))
          .filter(f => f.toString.endsWith(".parquet")).count()
      println(s"[profpq] files no-rebalance=${nFiles("/tmp/profpq-w1")} " +
        s"rebalance=${nFiles("/tmp/profpq-w2")} repartition=${nFiles("/tmp/profpq-w3")}")
      time("read back (no rebalance)")(
        noop(spark.read.parquet("/tmp/profpq-w1")))
      time("read back (rebalance)")(
        noop(spark.read.parquet("/tmp/profpq-w2")))
      return
    }
    if (sys.env.get("PROFPQ_PLAN").contains("1")) {
      val coded = Quantize.productQuantize(emb, col("vec_id"), col("embedding"), 4, 4, 64)
      val plan = coded.queryExecution.executedPlan.toString
      println(s"[profpq] productQuantize plan chars=${plan.length}")
      println(plan.take(12000))
      return
    }

    val idx = s"/tmp/profpq-${ProcessHandle.current().pid()}"
    time("writeIvfPqIndex (build half)")(
      Quantize.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), idx,
        nCells = 16, m = 4, k = 4, dim = 64))
    time("appendIvfPqIndex (other half)")(
      Quantize.appendIvfPqIndex(emb.filter(col("vec_id") % 2 =!= 0), idx))
    time("ivfPqTopKStored")(
      noop(Quantize.ivfPqTopKStored(emb.filter(col("vec_id") % 50 === 0), idx,
        topK = 5, nProbe = 4)))
    time("writeIvfPqIndex 2nd")(
      Quantize.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), idx,
        nCells = 16, m = 4, k = 4, dim = 64))
    time("appendIvfPqIndex 2nd")(
      Quantize.appendIvfPqIndex(emb.filter(col("vec_id") % 2 =!= 0), idx))
    time("ivfPqTopKStored 2nd")(
      noop(Quantize.ivfPqTopKStored(emb.filter(col("vec_id") % 50 === 0), idx,
        topK = 5, nProbe = 4)))
    spark.stop()
  }
}
