package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Static corpus mixing — the data-mixture step ahead of training: given
  * RELATIVE target weights per source, compute the per-source downsampling
  * rate realizing the closest achievable mixture without upsampling.
  * (Learned mixtures — DoReMi, Xie et al. 2023 — start from exactly this
  * static reweighting.)
  *
  * `rate_s = (target_s / actual_s) / max_u(target_u / actual_u)` — the
  * source with the highest target-to-actual ratio keeps everything, every
  * other source downsamples proportionally; a source with target 0 drops
  * outright. Targets are relative weights (they need not sum to 1: the
  * rate formula is scale-invariant).
  *
  * Scale shape: one aggregation shuffle keyed on source (partial map-side
  * combine), then two broadcast 1-row frames (corpus total, max ratio) —
  * no collect, no second pass over the corpus. The emitted rates feed
  * [[QualityFilters.hashSampleBucket]]-style deterministic sampling:
  * `keep ⟺ bucket · 1000 < rate_ppm` — an exact integer comparison.
  *
  * Shares and rates are emitted as INTEGER MICRO-UNITS (`_ppm` = parts per
  * million, bigint): three chained IEEE divisions amplify last-ulp noise,
  * so a rounded-DOUBLE output is representation-sensitive across engines
  * (a sub-1e-9 divergence is enough to flip a fixed-decimal rounding);
  * `cast(round(x·1e6) as bigint)` is engine-exact for any replay.
  */
object Mixing {

  def mixWeights(df: DataFrame, source: Column, nTokens: Column,
                 targetPermille: Map[String, Int],
                 defaultPermille: Int = 0): DataFrame = {
    val tgt = typedLit(targetPermille)
    val agg = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokens.cast("long")).as("n_tokens"))
    val total = agg.agg(sum("n_tokens").as("__tot"))
    val shares = agg.crossJoin(broadcast(total))
      .withColumn("__actual",
        coalesce(col("n_tokens"), lit(0L)).cast("double") / col("__tot"))
      .withColumn("__target",
        coalesce(element_at(tgt, col("source")), lit(defaultPermille))
          .cast("double") / 1000.0)
      // a source with zero token mass has nothing to sample — its ratio is
      // 0, NOT target/0 = Infinity, which would poison the max-ratio
      // normalizer and silently zero every other source's rate
      .withColumn("__ratio",
        when(col("__actual") > 0, col("__target") / col("__actual"))
          .otherwise(lit(0.0)))
    val maxRatio = shares.agg(max("__ratio").as("__maxr"))
    def ppm(c: Column): Column = round(c * 1e6).cast("long")
    shares.crossJoin(broadcast(maxRatio))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        ppm(col("__actual")).as("actual_share_ppm"),
        ppm(col("__target")).as("target_share_ppm"),
        // __maxr <= 0 means NO source has positive target mass (all-zero
        // token mass, or all targets zero): 0/0 would be NaN, which
        // compares false against every threshold and silently drops
        // nothing — emit the documented rate-0 drop explicitly instead
        when(col("__maxr") > 0, ppm(col("__ratio") / col("__maxr")))
          .otherwise(lit(0L)).as("sample_rate_ppm"))
  }

  /** Temperature-flattened sampling weights — the mC4/XLM-R multilingual
    * scheme: `w_s ∝ p_s^(1/T)`, flattening the natural source distribution
    * so low-resource sources are seen more than their raw share (and
    * high-resource ones less) without hand-written targets; [[mixWeights]]
    * is the hand-targeted sibling. The exponent is fixed at 1/2 (T = 2):
    * IEEE-754 `sqrt` is CORRECTLY ROUNDED in every engine, so the replay
    * is bit-exact where a general `pow` (allowed >0.5 ulp error, libm-
    * dependent) would be the t18 class of bug by construction.
    *
    * Engine-exactness: the normalizer `z = Σ_s round(√p_s · 1e6)` sums
    * INTEGERS (a float Σ√p would be partial-order-dependent across
    * engines and partitions); every emitted ratio is then a single IEEE
    * division of exact integer operands. `boost_ppm` = temp share over
    * actual share — the per-source up/down-sampling factor a realization
    * step ([[realizeMixture]]) would consume.
    *
    * Scale shape: one aggregation shuffle keyed on source, then two
    * broadcast 1-row frames (token total, integer normalizer) — the
    * [[mixWeights]] plan with sqrt in the middle.
    */
  def temperatureWeights(df: DataFrame, source: Column,
                         nTokens: Column): DataFrame = {
    val agg = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(nTokens.cast("long")), lit(0L)).as("n_tokens"))
    val total = agg.agg(sum("n_tokens").as("__tot"))
    val w = agg.crossJoin(broadcast(total))
      .withColumn("actual_share_ppm",
        round(col("n_tokens").cast("double") / col("__tot") * 1e6)
          .cast("long"))
      .withColumn("__w",
        round(sqrt(col("n_tokens").cast("double") / col("__tot")) * 1e6)
          .cast("long"))
    val z = w.agg(sum("__w").as("__z"))
    w.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("actual_share_ppm"),
        when(col("__z") > 0,
          round(col("__w").cast("double") * 1e6 / col("__z")).cast("long"))
          .otherwise(lit(0L)).as("temp_share_ppm"),
        // guard the zero-mass source (boost would divide by 0) and the
        // all-zero corpus (z = 0) — explicit 0, never NaN/Infinity
        when(col("__z") > 0 && col("n_tokens") > 0,
          round(col("__w").cast("double") * col("__tot") /
            (col("__z").cast("double") * col("n_tokens")) * 1e6).cast("long"))
          .otherwise(lit(0L)).as("boost_ppm"))
  }

  /** Exact-mixture realization WITH upsampling — the materialization step
    * when the mixture calls for repeating under-represented sources
    * (epoch-level upweighting à la DoReMi/Gopher data schedules) instead
    * of [[mixWeights]]'s keep-the-max downsampling: each document emits
    * `rate` copies, where `rate_s = target_s / actual_s` UNNORMALIZED —
    * sources above their target share thin out (rate < 1), sources below
    * it repeat (rate > 1), and the expected token mass realizes the target
    * mixture at the original corpus total.
    *
    * Fractional rates realize deterministically: every doc gets
    * `floor(rate)` copies plus one more iff its affine hash bucket (ppm)
    * falls below the fractional part — integer comparisons only, so the
    * copy set is reproducible and engine-replayable (same idiom as the
    * [[QualityFilters]] hash samplers). Rates ride as integer ppm; the
    * floor/frac split is integer `div`/`%`, never a float boundary.
    *
    * Scale shape: one agg shuffle keyed on source + a broadcast rate join
    * + a map-side `explode(sequence)` — output size is the realized corpus
    * (unavoidable), but nothing else grows.
    */
  def realizeMixture(df: DataFrame, id: Column, source: Column,
                     nTokens: Column, targetPermille: Map[String, Int],
                     defaultPermille: Int = 0): DataFrame = {
    import graft.sim.Ivf.{PickA, PickB, PickP}
    val tgt = typedLit(targetPermille)
    val agg = df.groupBy(source.as("source"))
      .agg(sum(nTokens.cast("long")).as("__n"))
    val total = agg.agg(sum("__n").as("__tot"))
    val rates = agg.crossJoin(broadcast(total))
      .withColumn("__actual",
        coalesce(col("__n"), lit(0L)).cast("double") / col("__tot"))
      .withColumn("__target",
        coalesce(element_at(tgt, col("source")), lit(defaultPermille))
          .cast("double") / 1000.0)
      .select(col("source"),
        when(col("__actual") > 0,
          round(col("__target") / col("__actual") * 1e6).cast("long"))
          .otherwise(lit(0L)).as("rate_ppm"))
    val idName = df.select(id).columns.head
    val bucket =
      pmod(pmod(id, lit(PickP)) * PickA + PickB, lit(PickP)) % 1000000L
    df.select(id, source.as("source"))
      .join(broadcast(rates), Seq("source"))
      .withColumn("__copies", expr("rate_ppm div 1000000") +
        when(bucket < col("rate_ppm") % 1000000L, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .select(col(idName), col("source"), col("rate_ppm"),
        explode(sequence(lit(0L), col("__copies") - 1)).as("copy_id"))
  }
}
