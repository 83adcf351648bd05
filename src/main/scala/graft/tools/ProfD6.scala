package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: stage-attributed timing of the MinHash near-dup pipeline
  * (d6/d18 shape) — sets build, signatures, band keys, candidate join,
  * verification, clustering — each isolated behind a noop sink. Not part
  * of the driver contract.
  */
object ProfD6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${graft.Env.cpus}]")
      .config("spark.sql.shuffle.partitions", graft.Env.cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.MinHashLSH
    val docs = graft.Tables.documents(spark, dir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profd6] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    noop(MinHashLSH.nearDuplicates(docs, col("doc_id"), col("text"), 0.95))
    graft.Bench.dropAllBlocks(spark)
    for (r <- 1 to 2) {
      val sets = docs.select(col("doc_id").as("__id"),
        sort_array(array_distinct(transform(
          MinHashLSH.wordShingles(col("text"), 1), s => xxhash64(s)))).as("__set"))
      time(s"r$r sets-build")(noop(sets))
      val sigs = MinHashLSH.signatures(docs, col("doc_id"), col("text"), 72, 1, 42L)
      time(s"r$r signatures")(noop(sigs))
      time(s"r$r candidates")(noop(
        MinHashLSH.candidatePairs(sigs, 6, 72)))
      graft.Bench.dropAllBlocks(spark)
      time(s"r$r nearDuplicates-full")(noop(
        MinHashLSH.nearDuplicates(docs, col("doc_id"), col("text"), 0.95)))
      graft.Bench.dropAllBlocks(spark)
      time(s"r$r d6-full-query")(
        graft.SparkEntry.queries("d6_neardup_dedup")(spark, dir).count())
      graft.Bench.dropAllBlocks(spark)
    }
    spark.stop()
  }
}
