package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: cost of Tables.load (the per-query scan setup) —
  * `runMain graft.tools.ProfLoad <sfDir>`. Not part of the driver contract.
  */
object ProfLoad {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${graft.Env.cpus}]")
      .config("spark.sql.shuffle.partitions", graft.Env.cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm FS + codepaths
    (1 to 3).foreach(_ => graft.Tables.lineitem(spark, dir).count())
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => graft.Tables.lineitem(spark, dir))
      val mid = System.nanoTime()
      (1 to 20).foreach(_ => graft.Tables.documents(spark, dir))
      val t1 = System.nanoTime()
      println(f"[profload] rep $r 20x lineitem=${(mid - t0) / 1e9}%.3f s  " +
        f"20x documents=${(t1 - mid) / 1e9}%.3f s")
    }
    // decomposition: read vs rdd-planning vs schema-supplied read
    val path = s"$dir/lineitem.parquet"
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val dfs = (1 to 20).map(_ => spark.read.parquet(path))
      val t1 = System.nanoTime()
      dfs.foreach(df => df.rdd.getNumPartitions)
      val t2 = System.nanoTime()
      val schema = dfs.head.schema
      val dfs2 = (1 to 20).map(_ => spark.read.schema(schema).parquet(path))
      val t3 = System.nanoTime()
      println(f"[profload] rep $r 20x read=${(t1 - t0) / 1e9}%.3f s  " +
        f"20x rdd=${(t2 - t1) / 1e9}%.3f s  20x read(schema)=${(t3 - t2) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
