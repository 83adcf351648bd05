package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
  * combine), then broadcast 1-row frames (corpus total, argmax source) —
  * no collect, no second pass over the corpus (the per-source agg exchange
  * is reused across its consumers). The emitted rates feed
  * [[QualityFilters.hashSampleBucket]]-style deterministic sampling:
  * `keep ⟺ bucket · 1000 < rate_ppm` — an exact integer comparison.
  *
  * EMISSION IS PURE-INTEGER (`_ppm` = parts per million, bigint): no
  * double ever reaches an output column. A `round(double · 1e6)` emission
  * is engine-replay-unsafe even when every operand chain is IEEE — Spark's
  * `round` converts the double through its SHORTEST DECIMAL string
  * (`BigDecimal.valueOf`) before rounding, while other engines round the
  * binary value, so a result within one ulp of a .5 boundary flips between
  * engines. Instead:
  *   - `actual_share_ppm = n_s · 10⁶ DIV Σn`   (integer floor division);
  *   - `target_share_ppm = permille_s · 1000`  (exact);
  *   - `rate_s / rate_m = (t_s/n_s) / (t_m/n_m)` — the corpus total
  *     cancels algebraically, so
  *     `sample_rate_ppm = t_s · n_m · 10⁶ DIV (t_m · n_s)` where `m` is
  *     the argmax source, itself selected by EXACT rational comparison
  *     (cross-product anti-join over the tiny per-source frame; ties by
  *     source name — tie choice cannot change the output, since the floor
  *     of an exact rational is representation-independent).
  *
  * Int64 headroom: products ride as DECIMAL(38,0) (DuckDB replay:
  * HUGEINT), so `t_s · n_m · 10⁶` is exact to ~10³⁸ — with permille
  * targets ≤ 1000 that is ~10²⁹ tokens per source, far past any corpus
  * (int64 alone would cap `n_m` at ~9.2·10⁹ tokens). The argmax
  * cross-products `t_u · n_v` are exact to ~10³⁵ tokens likewise.
  */
object Mixing {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Integral floor division (`a div b` — Catalyst `IntegralDivide`,
    * result bigint): the only division that ever reaches an emitted
    * column. Operands here are non-negative, so floor ≡ truncate and the
    * DuckDB replay's `//` agrees exactly.
    */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  def mixWeights(df: DataFrame, source: Column, nTokens: Column,
                 targetPermille: Map[String, Int],
                 defaultPermille: Int = 0): DataFrame = {
    val tgt = typedLit(targetPermille)
    val agg = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(nTokens.cast("long")), lit(0L)).as("n_tokens"))
      .withColumn("__tgt",
        coalesce(element_at(tgt, col("source")), lit(defaultPermille))
          .cast("long"))
    val total = agg.agg(sum("n_tokens").as("__tot"))
    // Exact rational argmax of target/actual ≡ argmax of tgt_u/n_u over
    // sources with positive mass AND positive target (a zero-mass source
    // has nothing to sample — its ratio is 0, NOT tgt/0 = ∞, which would
    // poison the normalizer and silently zero every other source's rate).
    // `a` survives iff no `b` has a strictly larger ratio — compared by
    // cross-product, never by a float division.
    val candA = agg.filter(col("n_tokens") > 0 && col("__tgt") > 0)
      .select(col("source").as("__asrc"), col("__tgt").as("__at"),
        col("n_tokens").as("__an"))
    val candB = candA.select(col("__asrc").as("__bsrc"),
      col("__at").as("__bt"), col("__an").as("__bn"))
    val best = candA.join(broadcast(candB),
        (dec(col("__bt")) * col("__an") > dec(col("__at")) * col("__bn")) ||
        (dec(col("__bt")) * col("__an") === dec(col("__at")) * col("__bn") &&
          col("__bsrc") < col("__asrc")),
        "left_anti")
      // ≤ 1 row by construction; empty ⟺ no source has positive target
      // mass, in which case every rate is the documented explicit 0
      .agg(coalesce(first("__at"), lit(0L)).as("__mt"),
        coalesce(first("__an"), lit(0L)).as("__mn"))
    agg.crossJoin(broadcast(total)).crossJoin(broadcast(best))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        when(col("__tot") > 0,
          idiv(dec(col("n_tokens")) * lit(1000000L), col("__tot")))
          .otherwise(lit(0L)).as("actual_share_ppm"),
        (col("__tgt") * 1000L).as("target_share_ppm"),
        when(col("__mt") > 0 && col("n_tokens") > 0 && col("__tgt") > 0,
          idiv(dec(col("__tgt")) * col("__mn") * lit(1000000L),
            dec(col("__mt")) * col("n_tokens")))
          .otherwise(lit(0L)).as("sample_rate_ppm"))
  }

  /** Temperature-flattened sampling weights — the mC4/XLM-R multilingual
    * scheme: `w_s ∝ p_s^(1/T)`, flattening the natural source distribution
    * so low-resource sources are seen more than their raw share (and
    * high-resource ones less) without hand-written targets; [[mixWeights]]
    * is the hand-targeted sibling. The exponent is fixed at 1/2 (T = 2):
    * IEEE-754 `sqrt` is correctly rounded in every engine, where a general
    * `pow` (allowed >0.5 ulp error, libm-dependent) would diverge by
    * construction.
    *
    * Integerization: `w_micro = FLOOR(√(n/Σn) · 10⁶)` — the divide, sqrt,
    * and multiply are each single correctly-rounded IEEE ops, and `floor`
    * acts on the BINARY double directly, so the chain is deterministic
    * across conforming engines. (`round` would not be: Spark rounds the
    * double's shortest-decimal rendering, other engines round the binary
    * value — the t18/t40 hash-red class of round 6.) Every downstream
    * column is then integer floor division of exact operands:
    * `temp_share_ppm = w·10⁶ DIV z` with `z = Σ w_micro` an integer sum,
    * and `boost_ppm = w·Σn·10⁶ DIV (z·n)` — the per-source up/down-
    * sampling factor a realization step ([[realizeMixture]]) consumes.
    *
    * Int64 headroom: `w ≤ 10⁶` so `w·10⁶ ≤ 10¹²` always fits; the boost
    * numerator `w·Σn·10⁶` rides as DECIMAL(38,0) (replay: HUGEINT), exact
    * to ~10²⁶ corpus tokens.
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
        when(col("__tot") > 0,
          idiv(dec(col("n_tokens")) * lit(1000000L), col("__tot")))
          .otherwise(lit(0L)))
      .withColumn("__w",
        when(col("__tot") > 0,
          floor(sqrt(col("n_tokens").cast("double") / col("__tot")) * 1e6))
          .otherwise(lit(0L)))
    val z = w.agg(sum("__w").as("__z"))
    w.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("actual_share_ppm"),
        when(col("__z") > 0,
          idiv(col("__w") * lit(1000000L), col("__z")))
          .otherwise(lit(0L)).as("temp_share_ppm"),
        // guard the zero-mass source (boost would divide by 0) and the
        // all-zero corpus (z = 0) — explicit 0, never NaN/Infinity
        when(col("__z") > 0 && col("n_tokens") > 0,
          idiv(dec(col("__w")) * col("__tot") * lit(1000000L),
            dec(col("__z")) * col("n_tokens")))
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
    * `rate_ppm = t_s · Σn · 1000 DIV n_s` — pure-integer like the rest of
    * this module (`t_s/1000 · Σn/n_s · 10⁶` with the permille denominator
    * folded in), DECIMAL(38,0) product so headroom is ~10²⁹ corpus tokens.
    * Fractional rates realize deterministically: every doc gets
    * `floor(rate)` copies plus one more iff its affine hash bucket (ppm)
    * falls below the fractional part — integer comparisons only, so the
    * copy set is reproducible and engine-replayable (same idiom as the
    * [[QualityFilters]] hash samplers). The floor/frac split is integer
    * `div`/`%`, never a float boundary.
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
      .agg(coalesce(sum(nTokens.cast("long")), lit(0L)).as("__n"))
    val total = agg.agg(sum("__n").as("__tot"))
    val rates = agg.crossJoin(broadcast(total))
      .withColumn("__tgt",
        coalesce(element_at(tgt, col("source")), lit(defaultPermille))
          .cast("long"))
      .select(col("source"),
        when(col("__n") > 0 && col("__tgt") > 0,
          idiv(dec(col("__tgt")) * col("__tot") * lit(1000L), col("__n")))
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

  /** Largest-remainder (Hamilton) apportionment of an integer sample
    * budget across strata, proportional to each stratum's mass — the
    * exact way to turn mixing SHARES into whole-unit QUOTAS (shard
    * counts, sample sizes, per-source doc budgets). Floor quotas
    * `B·mᵢ DIV M` under-spend by `B − Σfloor < |strata|`; the shortfall
    * goes one unit each to the largest remainders `B·mᵢ mod M`
    * (tie → stratum ascending). Σalloc = B EXACTLY — no float quota ever
    * exists, so the replay is engine-exact and the budget never leaks a
    * unit (the naive `round(B·mᵢ/M)` both over- and under-spends).
    *
    * Plan: the mass rollup is the only data-scale shuffle; ranking runs
    * on the STRATA table (one row per source/lang/shard — thousands at
    * most), so the single-partition global sort the rank needs is
    * deliberate and harmless. Int64: `B·mᵢ < 2⁶³` — at B = 10⁶ that is
    * ~9.2×10¹² mass units per stratum; larger corpora pre-scale mass.
    */
  /** Balanced corpus slice: [[largestRemainder]] quotas REALIZED — for
    * a global document budget, each stratum contributes exactly its
    * mass-proportional Hamilton quota of documents, chosen by the
    * deterministic hash order (the [[QualityFilters.stratifiedTopN]]
    * order, so the pick is reproducible and unbiased by storage
    * layout). This is the mC4-style language-balanced subsetting step
    * as ONE operator: quota computation and realization fused, no
    * float share ever existing.
    *
    * Σ kept = budget exactly whenever every stratum holds at least its
    * quota in rows; a thinner stratum under-fills VISIBLY (its kept
    * count < `alloc` in the output — the shortfall is auditable, never
    * silently redistributed).
    *
    * Plan: the quota side is the largestRemainder plan (strata-scale);
    * the realization is one per-stratum window (rank by hash) + a
    * broadcast quota join — a single data-scale sort, no global
    * ordering anywhere.
    */
  def balancedSample(df: DataFrame, id: Column, stratum: Column,
                     mass: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = largestRemainder(df, stratum, mass, budget)
    val sName = df.select(stratum).columns.head
    val idName = df.select(id).columns.head
    val w = Window.partitionBy(col(sName))
      .orderBy(graft.text.TextAnalysis.tokenHash(id.cast("string")), id)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .join(broadcast(q.select(col("stratum").as(sName), col("alloc"))),
        Seq(sName))
      .filter(col("sample_rank") <= col("alloc"))
      .select(col(idName), col(sName), col("alloc"), col("sample_rank"))
  }

  def largestRemainder(df: DataFrame, stratum: Column, mass: Column,
                       budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val agg = df.groupBy(stratum.as("stratum"))
      .agg(coalesce(sum(mass.cast("long")), lit(0L)).as("mass"))
    val tot = agg.agg(sum("mass").as("__tot"))
    val q = agg.crossJoin(broadcast(tot))
      .select(col("stratum"), col("mass"),
        idiv(lit(budget) * col("mass"), col("__tot")).as("__base"),
        (lit(budget) * col("mass") % col("__tot")).as("__rem"))
    // strata-scale global window (single partition by design — see doc)
    val byRem = Window.orderBy(col("__rem").desc, col("stratum").asc)
    val whole = Window.partitionBy()
    q.select(col("stratum"), col("mass"), col("__base"),
        row_number().over(byRem).as("__rk"),
        sum("__base").over(whole).as("__spent"))
      .select(col("stratum"), col("mass"),
        (col("__base") + when(col("__rk") <= lit(budget) - col("__spent"),
          1L).otherwise(0L)).as("alloc"))
  }
}
