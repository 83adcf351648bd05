package graft

import org.apache.spark.sql.functions.col
import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("columns: exact nulls and distincts per column, long format") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (Some(2L), Some("b")),
      (None, Some("a"))
    ).toDF("k", "s")
    val out = Profile.columns(df, Seq("k", "s"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "k" -> ((4L, 1L, 2L)),
      "s" -> ((4L, 1L, 2L))))
  }

  test("fkCheck: orphans counted, null child keys are orphans too") {
    import org.apache.spark.sql.functions.col
    val child = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Profile.fkCheck(Seq(("c->p", child, col("fk"), parent,
        col("pk"))))
      .as[(String, Long, Long, Long)].collect().toSeq
    // 4 child rows; orphans: the 9 and the null; distinct orphan KEYS
    // counts only the 9 (count distinct ignores null)
    assert(out == Seq(("c->p", 4L, 2L, 1L)))
  }

  test("columns: one scan, Expand-based multi-distinct (two exchanges)") {
    val df = Seq((1L, "a")).toDF("k", "s")
    val plan = Profile.columns(df, Seq("k", "s"))
      .queryExecution.executedPlan.toString
    // lane dedup on (value, gid) + the 1-row collapse — never k jobs
    assert("Exchange".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Expand"), s"expected Expand-based multi-distinct:\n$plan")
    assert("LocalTableScan|Scan".r.findAllIn(plan).size == 1,
      s"profiling must be a single scan:\n$plan")
  }

  test("snapshotDrift: rates per side, integer means, empty-side nulls") {
    val df = Seq(
      ("x", false, 100L), ("x", false, 200L), ("y", false, 300L),
      ("x", true, 400L), ("z", true, 501L), ("z", true, 502L))
      .toDF("d", "b", "v")
    val out = Profile.snapshotDrift(df, Seq(col("d")), col("b"), col("v"))
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // totals: a side 3 rows, b side 3 rows
    assert(out("x") == (("x", 2L, 1L, 666666L, 333333L, -333333L,
      Some(150L), Some(400L))))
    assert(out("y") == (("y", 1L, 0L, 333333L, 0L, -333333L,
      Some(300L), None)))
    assert(out("z") == (("z", 0L, 2L, 0L, 666666L, 666666L,
      None, Some(501L))))
  }

  test("keyCheck: unique key reports zero surplus; dup key counts multiplicity") {
    import org.apache.spark.sql.functions.col
    val u = Seq(1L, 2L, 3L).toDF("k")
    val d = Seq(1L, 1L, 1L, 2L).toDF("k")
    val out = Profile.keyCheck(Seq(("u", u, col("k")), ("d", d, col("k"))))
      .orderBy("candidate")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("d", 4L, 2L, 1L, 2L, 3L),
      ("u", 3L, 3L, 0L, 0L, 1L)))
  }

  test("fileAudit: counts files and rows, recommendation is ceiling division") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("fileaudit").toString
    // 8 files of ~25 rows each — the classic over-fragmented layout
    spark.range(200).repartition(8).write.mode("overwrite").parquet(dir)
    val audited = spark.read.parquet(dir)
    val out = Profile.fileAudit(Seq(("frag", audited)),
        targetBytesPerFile = 1L << 20)
      .as[(String, Long, Long, Long, Long)].head()
    val (name, nFiles, nRows, nBytes, rec) = out
    assert(name == "frag" && nFiles == 8L && nRows == 200L)
    // real parquet files on disk: byte total matches the filesystem
    val fsBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    assert(nBytes == fsBytes, s"audit $nBytes vs fs $fsBytes")
    // 8 tiny files vs a 1 MiB target -> ONE recommended file
    assert(rec == 1L, s"expected 1 recommended file, got $rec")
    // ceiling division: 3 MiB of data at 1 MiB target -> 3 files
    assert((3L * (1L << 20) + (1L << 20) - 1) / (1L << 20) == 3L)
  }
}
