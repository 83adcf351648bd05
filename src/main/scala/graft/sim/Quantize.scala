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

  /** Product quantization — the codebook compression ANN indexes serve
    * from at scale (FAISS's IVF-PQ residual format, minus the IVF level
    * that [[Ivf]] already provides): the `dim`-vector splits into `m`
    * subvectors, each encoded as the id of its nearest entry in a
    * per-subspace codebook of `k` entries, so a vector stores as m small
    * ints (m·log2(k) bits) instead of dim floats. Distances against
    * compressed vectors then come from m table lookups (ADC) — that query
    * path composes from the codes this emits.
    *
    * Codebooks come from the SAME deterministic corpus pick as IVF's seed
    * centroids ([[Ivf.centroids]], affine id scramble — no xxhash64, so
    * the oracle replays it): k picked vectors, subspace j's codebook =
    * their j-th slices. Zero training iterations, deliberately — a
    * Lloyd-refined codebook is d11's oracle-replay domain; the pick keeps
    * this a pure, engine-replayable projection.
    *
    * Plan shape: ONE broadcast of the packed codebook row; encode +
    * reconstruction error are per-row HOF arithmetic — the corpus never
    * shuffles (the [[Ivf.assignCells]] pattern, per subspace). Argmin
    * folds run as sequential left folds so the float arithmetic is
    * bit-reproducible across engines; ties break on the lower code id.
    *
    * @param dim embedding dimensionality (array length) — like [[Ivf]],
    *            pass the value the schema guarantees; must divide by `m`.
    */
  def productQuantize(df: DataFrame, id: Column, embedding: Column,
                      m: Int = 4, k: Int = 4, dim: Int = 64): DataFrame = {
    require(m >= 1 && k >= 2, s"need m >= 1 subspaces and k >= 2 codes, got m=$m k=$k")
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val cb = Ivf.centroids(
      df.select(id.as("vec_id"), embedding.as("embedding"))
        .filter(embedding.isNotNull), k)
    val packed = broadcast(
      cb.agg(collect_list(struct(col("cell"), col("c_emb"))).as("__cb")))
    def l2sq(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    df.filter(embedding.isNotNull)
      .select(id.as("vec_id"), embedding.cast("array<double>").as("__x"))
      .crossJoin(packed)
      .withColumn("__sel", transform(sequence(lit(0), lit(m - 1)), j => {
        val start = j * sub + 1
        def part(a: Column): Column = slice(a, start, lit(sub))
        val scored = transform(col("__cb"), c =>
          struct(
            l2sq(part(col("__x")), part(c.getField("c_emb"))).as("d2"),
            c.getField("cell").as("cell"),
            part(c.getField("c_emb")).as("cvec")))
        element_at(array_sort(scored, (l, r) =>
          when(l.getField("d2") < r.getField("d2"), -1)
            .when(l.getField("d2") > r.getField("d2"), 1)
            .otherwise(l.getField("cell") - r.getField("cell"))), 1)
      }))
      .select(col("vec_id"),
        concat_ws(",", transform(col("__sel"),
          s => s.getField("cell").cast("string"))).as("codes"),
        round(sqrt(l2sq(col("__x"),
          flatten(transform(col("__sel"), _.getField("cvec"))))), 6)
          .as("recon_err"))
  }
}
