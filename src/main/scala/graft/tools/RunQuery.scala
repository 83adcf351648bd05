package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run a single SparkEntry query standalone. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name = args.lift(1).getOrElse("d6_neardup_dedup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    println(f"[runquery] $name rows=$n in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
