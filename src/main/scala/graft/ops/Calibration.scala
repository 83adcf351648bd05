package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calibration-report bins (the reliability diagram, as a table): a
  * scored dataset — a quality classifier's output against a binary
  * outcome — is cut into equal-width score bins and each bin reports
  * its predicted vs realized positive rate. The gap column is the
  * signed per-bin miscalibration a filtering pipeline reads before
  * trusting a score threshold: a classifier that says "0.9" where only
  * 60 % are positive will silently skew any score-weighted sampling
  * (DSIR, quality-temperature mixing) built on it.
  *
  * Contract: `scorePpm` is an integer score in ppm of full scale
  * (0 … 10⁶ — the caller quantizes, same as every ppm emission in this
  * library), `label` is 0/1. `bin = min(score·nBins DIV 10⁶, nBins−1)`
  * so exactly-1.0 scores land in the top bin instead of one past it.
  * All emissions are integer (sums, DIV means, signed gap) —
  * engine-exact by construction.
  *
  * Plan: ONE data-scale exchange (the bin rollup, map-side partial
  * sums over ≤ nBins keys — effectively a reduce); every later frame is
  * bins-scale. Empty bins emit nothing by design — a reliability
  * diagram has no reading where no predictions fall.
  */
object Calibration {

  def bins(df: DataFrame, scorePpm: Column, label: Column,
           nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    df.select(
        least(call_function("div", scorePpm * nBins, lit(1000000L)),
          lit(nBins - 1L)).as("bin"),
        scorePpm.as("__s"), label.cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum("__y").as("n_pos"),
        call_function("div", sum("__s"), count(lit(1)))
          .as("mean_score_ppm"))
      .select(col("bin"), col("n"), col("n_pos"), col("mean_score_ppm"),
        call_function("div", col("n_pos") * 1000000L, col("n"))
          .as("pos_rate_ppm"))
      .withColumn("gap_ppm", col("pos_rate_ppm") - col("mean_score_ppm"))
  }
}
