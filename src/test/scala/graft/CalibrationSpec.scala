package graft

import org.apache.spark.sql.functions._
import graft.ops.Calibration

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("bins: exact integer bin stats and signed gap") {
    // bin 0 = [0, 0.1): scores 50000/90000, one positive → pos_rate
    //        500000, mean 70000, gap +430000
    // bin 9: scores 950000/1000000 (exact 1.0 clamps into bin 9),
    //        zero positive → gap −975000
    val df = Seq(
      (50000L, 1L), (90000L, 0L), (950000L, 0L), (1000000L, 0L)
    ).toDF("s", "y")
    val out = Calibration.bins(df, col("s"), col("y"), nBins = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out == Map(
      0L -> ((2L, 1L, 70000L, 500000L, 430000L)),
      9L -> ((2L, 0L, 975000L, 0L, -975000L))))
  }

  test("bins: empty bins emit nothing; single bin degenerates to totals") {
    val df = Seq((200000L, 1L), (700000L, 0L)).toDF("s", "y")
    val ten = Calibration.bins(df, col("s"), col("y"), nBins = 10)
    assert(ten.count() == 2) // bins 2 and 7 only
    val one = Calibration.bins(df, col("s"), col("y"), nBins = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(one == ((0L, 2L, 1L, 450000L, 500000L, 50000L)))
  }
}
