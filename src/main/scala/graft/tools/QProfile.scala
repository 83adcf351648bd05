package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev utility: per-query job/stage/task accounting under the BENCH session
  * shape (`runMain graft.tools.QProfile <sfDir> <query...>`). For each query
  * prints warm wall time plus the number of Spark jobs, stages and tasks it
  * scheduled and where the task time went — the measurement §1 of the
  * optimization guide asks for before touching anything. Not part of the
  * driver contract.
  */
object QProfile {
  private class Acc extends SparkListener {
    var jobs = 0
    var stages = 0
    var tasks = 0
    var taskTimeMs = 0L
    var shuffleReadB = 0L
    var shuffleWriteB = 0L
    val jobWall = mutable.ArrayBuffer[(Int, Long)]()
    private val jobStart = mutable.Map[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs += 1; jobStart(j.jobId) = j.time
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      jobStart.remove(j.jobId).foreach(t0 => jobWall += ((j.jobId, j.time - t0)))
    val stageDetail = mutable.ArrayBuffer[(Int, String, Int, Long)]()
    private val stageTaskMs = mutable.Map[Int, Long]()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
      stageDetail += ((s.stageInfo.stageId,
        s.stageInfo.name.takeWhile(_ != '\n').take(90), s.stageInfo.numTasks,
        stageTaskMs.getOrElse(s.stageInfo.stageId, 0L)))
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        stageTaskMs(t.stageId) = stageTaskMs.getOrElse(t.stageId, 0L) + m.executorRunTime
      }
    }
    def reset(): Unit = {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0
      shuffleReadB = 0; shuffleWriteB = 0; jobWall.clear(); jobStart.clear()
      stageDetail.clear(); stageTaskMs.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("d6_neardup_dedup")
    val cpus = graft.Env.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // warmup (JIT + codegen), then the measured run
      fn(spark, dir).count()
      graft.Bench.dropAllBlocks(spark)
      Thread.sleep(300)
      acc.reset()
      // QPROF_REPS>1: report the MIN wall over reps (throttle antidote);
      // stage/job accounting covers the LAST rep only
      val reps = sys.env.getOrElse("QPROF_REPS", "1").toInt.max(1)
      var rows = 0L
      var wall = Double.MaxValue
      for (r <- 1 to reps) {
        if (r == reps) { Thread.sleep(200); acc.reset() }
        val t0 = System.nanoTime()
        rows = fn(spark, dir).count()
        wall = math.min(wall, (System.nanoTime() - t0) / 1e9)
        graft.Bench.dropAllBlocks(spark)
      }
      // listener bus is async; give it a beat to drain
      Thread.sleep(500)
      val slow = acc.jobWall.sortBy(-_._2).take(8)
        .map { case (id, ms) => s"j$id=${ms}ms" }.mkString(" ")
      println(f"[qprof] $n wall=$wall%.2f s rows=$rows jobs=${acc.jobs} " +
        f"stages=${acc.stages} tasks=${acc.tasks} taskTime=${acc.taskTimeMs / 1000.0}%.1f s " +
        f"shufR=${acc.shuffleReadB / 1e6}%.1f MB shufW=${acc.shuffleWriteB / 1e6}%.1f MB " +
        s"slowest[$slow]")
      if (sys.env.get("QPROF_STAGES").contains("1"))
        acc.stageDetail.sortBy(-_._4).take(12).foreach { case (id, nm, nt, ms) =>
          println(f"[qprof]   stage $id%5d taskTime=${ms / 1000.0}%7.1f s tasks=$nt%4d  $nm")
        }
      graft.Bench.dropAllBlocks(spark)
    }
    spark.stop()
  }
}
