package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a production ANN stack needs both:
  *  - [[bruteForceTopK]] — exact, O(|queries| × |corpus|). Fine when the
  *    probe set is small (it usually is); the corpus side streams, nothing
  *    quadratic is materialized beyond the top-k windows.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus and queries bucket by
  *    sign-bit code; only same-bucket pairs are scored. Sub-linear work at
  *    the cost of recall; multiple code rotations (`tables`) trade compute
  *    back for recall.
  *
  * All math is double-precision array HOFs (zip_with/aggregate) — built-in
  * expressions, no UDF. Cosines are computed once per surviving pair.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, _ * _), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), _ + _))
    dot / (na * nb)
  }

  /** Exact top-k neighbors per query (self-match excluded), deterministic:
    * ties broken by corpus id ascending. Broadcast the probe side when it's
    * small — the corpus then streams through a single map stage.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     broadcastQueries: Boolean = true): DataFrame = {
    val q = (if (broadcastQueries) broadcast(queries) else queries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("q_emb"), col("c_emb")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("__rn").as("rank"))
  }

  /** Random-hyperplane LSH code: `planes` sign bits packed into a long. */
  def lshCode(emb: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(transform(emb, x => x.cast("double")), typedLit(p.toSeq), _ * _),
        lit(0.0), _ + _)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** Deterministic hyperplane set (seeded Box–Muller-ish gaussian). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Approximate top-k: only candidates sharing a bucket in at least one of
    * `tables` independent codes are scored. Recall grows with tables;
    * per-table bucket size shrinks with nPlanes.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int = 4, tables: Int = 8, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    // Few planes + many tables favors recall when true neighbors are only
    // weakly similar (cosine ~0.4): P(candidate) ≈ 1-(1-p^4)^8 with
    // p = 1-θ/π. More planes would shrink buckets but miss those neighbors.
    val codes = (0 until tables).map { t =>
      (t, hyperplanes(nPlanes, dim, seed + t))
    }
    def withCodes(df: DataFrame, idAs: String, embAs: String): DataFrame = {
      val codeStructs = array(codes.map { case (t, planes) =>
        struct(lit(t).as("tbl"), lshCode(col("embedding"), planes).as("code"))
      }: _*)
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        explode(codeStructs).as("bc"))
        .select(col(idAs), col(embAs), col("bc.tbl").as("tbl"), col("bc.code").as("code"))
    }
    val qc = withCodes(queries, "query_id", "q_emb")
    val cc = withCodes(corpus, "neighbor_id", "c_emb")
    val candidates = qc.join(cc, Seq("tbl", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "q_emb", "neighbor_id", "c_emb")
      .distinct()
    val scored = candidates
      .withColumn("cosine", round(cosine(col("q_emb"), col("c_emb")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** Embedding near-dup pairs: probe sample vs corpus, cosine ≥ threshold.
    * Exact; for full-corpus dedup at scale, run [[lshTopK]]-style bucketing
    * first.
    */
  def nearDupPairs(probes: DataFrame, corpus: DataFrame, threshold: Double): DataFrame = {
    val p = broadcast(probes.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")))
    val c = corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    c.join(p, col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
