package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard storage /
  * bandwidth lever for vector corpora (4× smaller than float32, and the
  * format ANN indexes serve from). Symmetric per-vector scheme:
  *
  *   scale = 127 / max|x_i|,   q_i = floor(x_i * scale + 0.5)
  *
  * `floor(x + 0.5)` is used instead of `round` on BOTH engines because
  * round-half tie behavior differs across engines while floor is IEEE-exact
  * everywhere — determinism beats a half-ULP of rounding bias here.
  *
  * Pure projection over the embedding array (HOFs only, no UDF, no
  * shuffle); reconstruction error comes back per vector so a pipeline can
  * gate on it.
  */
object Quantize {

  /** Guard for all-zero vectors: scale degenerates to 127/eps, quantized
    * values stay 0, error stays 0.
    */
  private val Eps = 1e-12

  def int8(df: DataFrame, id: Column, embedding: Column): DataFrame = {
    val x = embedding.cast("array<double>")
    val maxAbs = greatest(array_max(transform(x, v => abs(v))), lit(Eps))
    val scale = lit(127.0) / maxAbs
    val q = transform(x, v => floor(v * scale + lit(0.5)).cast("long"))
    val err = array_max(zip_with(x, q, (v, qi) => abs(v - qi.cast("double") / scale)))
    df.select(
      id,
      round(scale, 6).as("scale"),
      concat_ws(",", transform(q, _.cast("string"))).as("q_int8"),
      round(err, 6).as("max_abs_err"))
  }
}
