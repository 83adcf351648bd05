package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window shaping for pretraining corpora: fixed-size token chunking
  * with overlap (the retrieval/pretraining "sliding window") and greedy
  * sequence packing of whole documents into capacity-bounded bins.
  *
  * Chunking is a Generate (explode) over a per-row token array — map-only,
  * no shuffle; output rows ≈ input tokens / stride. Packing needs a running
  * token total, which is a window — partitioned by a SHARD key (source,
  * date, bucket id) so the sort is per-shard and the job scales horizontally;
  * a global ORDER BY would serialize 100 TB through one partition, which is
  * exactly the plan this operator refuses to build.
  */
object Chunking {

  /** Overlapping token windows: chunk `k` covers tokens
    * `[1 + k*stride, 1 + k*stride + chunkSize)` (1-based), for every start
    * position ≤ the document's token count — so tails shorter than
    * `chunkSize` are kept and every token lands in ≥1 chunk when
    * `stride <= chunkSize`.
    */
  def chunk(df: DataFrame, id: Column, text: Column,
            chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkSize >= 1 && stride >= 1, "chunkSize and stride must be >= 1")
    val idName = df.select(id).columns.head
    df.select(id, TextAnalysis.tokens(text).as("__toks"))
      .select(col(idName), col("__toks"),
        posexplode(sequence(lit(1), size(col("__toks")), lit(stride)))
          .as(Seq("__pos", "__start")))
      .select(col(idName),
        col("__pos").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("__start"), lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("__toks"), col("__start"), lit(chunkSize)))
          .as("n_chunk_tokens"))
  }

  /** Prefix-partitioned in-order sequence packing: within each shard,
    * documents are assigned (by ascending `id`) to the bin their
    * cumulative-token prefix falls in —
    * `bin = floor(tokens_before_this_doc / capacity)`.
    *
    * Bins are NOT capacity-bounded: a document that straddles a bin
    * boundary stays in the earlier bin, so any bin can overflow by up to
    * one partial document (at most `doc_tokens - 1` tokens); the overflow
    * is resolved tokenizer-side by splitting the straddler across the two
    * sequences. The payoff is scale: one window sum, spillable sort, no
    * per-shard materialization. For hard capacity bounds at the cost of a
    * per-shard fold, use [[packBinsGreedy]].
    */
  def packBins(df: DataFrame, id: Column, shard: Column, nTokens: Column,
               capacity: Int): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    val w = Window.partitionBy(shard).orderBy(id)
    df.select(id, shard, nTokens.as("n_tokens"))
      .withColumn("bin_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) /
          lit(capacity.toDouble)).cast("long"))
  }

  /** TRUE greedy in-order packing: within each shard, walk documents by
    * ascending `id` keeping a running fill; a document that would overflow
    * the current non-empty bin OPENS A NEW BIN instead. Every bin is
    * capacity-bounded — the only overflow is a single document larger than
    * `capacity`, which gets a bin of its own (truncate tokenizer-side).
    *
    * The assignment is a chain recurrence (each bin depends on every prior
    * decision), which no window function can express — so each shard folds
    * sequentially: groupBy(shard) → sorted collect_list → one `aggregate`
    * HOF pass → explode. One shuffle (on the shard key), whole fold inside
    * codegen, no UDF.
    *
    * Cost model — the fold REBUILDS its output array every step
    * (Catalyst's array_append is copy-on-append), so a shard of n docs
    * costs O(n²) struct copies in one task: fine to ~10 k docs/shard
    * (≈5·10⁷ copies, sub-second), prohibitive at 10⁶. Keep shards at the
    * work-unit grain (source file, date bucket); for unbounded shards use
    * [[packBins]] and accept its boundary overflow. The id must be
    * NUMERIC (it is compared inside the fold's struct and cast to long) —
    * unlike [[packBins]], which preserves any orderable id type.
    */
  def packBinsGreedy(df: DataFrame, id: Column, shard: Column, nTokens: Column,
                     capacity: Int): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    val idName = df.select(id).columns.head
    val shardName = df.select(shard).columns.head
    val folded = df
      .select(shard.as(shardName),
        struct(id.cast("long").as("id"), nTokens.cast("long").as("n")).as("d"))
      .groupBy(col(shardName))
      .agg(sort_array(collect_list(col("d"))).as("ds"))
      .select(col(shardName), explode(expr(
        s"""aggregate(
           |  ds,
           |  named_struct(
           |    'bin', 0L, 'fill', 0L,
           |    'out', cast(array() as array<struct<id: bigint, n: bigint, bin_id: bigint>>)),
           |  (acc, x) -> if(acc.fill > 0 and acc.fill + x.n > ${capacity}L,
           |    named_struct('bin', acc.bin + 1L, 'fill', x.n,
           |      'out', array_append(acc.out,
           |        named_struct('id', x.id, 'n', x.n, 'bin_id', acc.bin + 1L))),
           |    named_struct('bin', acc.bin, 'fill', acc.fill + x.n,
           |      'out', array_append(acc.out,
           |        named_struct('id', x.id, 'n', x.n, 'bin_id', acc.bin)))),
           |  acc -> acc.out)""".stripMargin)).as("r"))
    folded.select(col(s"r.id").as(idName), col(shardName),
      col("r.n").as("n_tokens"), col("r.bin_id").as("bin_id"))
  }

  /** Deterministic epoch shuffle + shard assignment — the dataloader-export
    * step (WebDataset-style shard files, tf.data-style reshuffle per
    * epoch): every document gets a pseudo-random but REPRODUCIBLE position
    * for the given epoch, so a restarted job resumes the same order and two
    * trainers see the same stream. The permutation is the affine id
    * scramble with the epoch folded in ([[graft.sim.Ivf.PickA]] family —
    * pure modular arithmetic, so any engine replays it; a seeded RAND
    * would be engine- and partitioning-dependent).
    *
    * Scale shape: shard = scrambled key mod `nShards` (balanced in
    * expectation), position = rank WITHIN the shard — one hash-partitioned
    * window per shard, never a global sort (a global epoch ORDER BY would
    * serialize the corpus through one partition; trainers only need
    * within-shard order + a shard-level shuffle, which is exactly what
    * this emits).
    */
  def epochShards(df: DataFrame, id: Column, epoch: Int,
                  nShards: Int, carry: Seq[Column] = Nil): DataFrame = {
    require(epoch >= 0 && nShards >= 1, s"need epoch >= 0, nShards >= 1")
    import graft.sim.Ivf.{PickA, PickB, PickP}
    val idName = df.select(id).columns.head
    // fold the epoch into the affine increment: distinct epochs give
    // distinct (still bijective mod P) permutations of the id space
    val key = pmod(pmod(id, lit(PickP)) * PickA + PickB + lit(epoch) * 2654435761L,
      lit(PickP))
    val w = Window.partitionBy(col("__shard")).orderBy(col("__key"), col(idName))
    df.select((id +: carry) :+ key.as("__key"): _*)
      .withColumn("__shard", pmod(col("__key"), lit(nShards.toLong)))
      .withColumn("position", row_number().over(w) - 1)
      .drop("__key")
      .withColumnRenamed("__shard", "shard")
  }

  /** Length-bucketed batch assembly with a padding-waste report — the
    * sequence-bucketing trick every training loader uses: group
    * similar-length documents so each batch pads to ITS OWN max, not the
    * corpus max. Docs land in `n_tokens DIV binWidth` bins; within a bin
    * they batch in deterministic `doc_id` order, `batchSize` at a time.
    *
    * Emits one row per (bin, batch): `n_docs`, `max_len`, `sum_len`, and
    * `pad_waste_ppm = (n·max − Σlen)·10⁶ DIV (n·max)` — the fraction of
    * padded positions, pure integer (engine-exact). A trailing partial
    * batch reports honestly (n_docs < batchSize).
    *
    * Plan: one shuffle on the bin key, per-bin sort (bins are the
    * parallelism unit — no global order), then a same-key aggregate that
    * reuses the window's partitioning. Int64: `n·max·10⁶ < 2⁶³` needs
    * `max_len < 9.2×10¹² / batchSize` — context lengths never bind.
    */
  def lengthBatches(df: DataFrame, id: Column, text: Column,
                    binWidth: Int = 16, batchSize: Int = 8): DataFrame = {
    require(binWidth >= 1 && batchSize >= 1, "binWidth/batchSize must be >= 1")
    val d = df.select(id.as("__id"),
      size(split(lower(text), " ")).cast("long").as("__n"))
    val w = Window.partitionBy(col("bin")).orderBy(col("__id"))
    d.withColumn("bin", expr(s"__n div $binWidth"))
      .withColumn("batch",
        call_function("div", (row_number().over(w) - 1).cast("long"),
          lit(batchSize.toLong)))
      .groupBy(col("bin"), col("batch"))
      .agg(count(lit(1)).as("n_docs"), max("__n").as("max_len"),
        sum("__n").as("sum_len"))
      .withColumn("pad_waste_ppm",
        expr("((n_docs * max_len - sum_len) * 1000000) div (n_docs * max_len)"))
  }

  /** Curriculum schedule: docs staged easy→hard by GLOBAL difficulty
    * quantile, deterministically shuffled WITHIN each stage — the
    * curriculum-learning data order (train on stage 0 first, then 1, …)
    * with none of the two global sorts the naive form implies.
    *
    * Stage boundaries come from [[graft.ops.Quantiles.exact]] on the
    * integer difficulty (distinct-value-scale, crossing rule — engine
    * exact); `stage = #{boundaries strictly below the doc}` so stages are
    * ≈equal-mass with ties resolved identically on both engines. The
    * boundary row broadcasts (nStages−1 longs); within a stage the order
    * is the t25 affine permutation keyed by stage (distinct bijective
    * permutations per stage), ranked by a PER-STAGE window — parallelism
    * is the stage count × hash partitions of the rank shuffle, and no
    * corpus-scale ORDER BY ever forms.
    */
  /** Span-corruption mask schedule — the T5/UL2 denoising objective's
    * data-prep step: each document gets deterministic, NON-OVERLAPPING
    * corruption spans (one `spanLen`-token span per `window`-token block,
    * at an affine-pseudo-random offset inside its block), emitted as
    * (doc_id, span_idx, start, len) for the loader to replace with
    * sentinels. Block-local placement makes non-overlap structural — no
    * per-doc sequential greedy scan, so the op is one map-side explode
    * (Generate) over doc-scale rows, zero shuffles, and the schedule
    * replays bit-for-bit on any engine (the same affine constants as the
    * t25 epoch permutation). Corruption rate = spanLen/window (15% at
    * 3/20). Documents shorter than one block emit nothing; a trailing
    * partial block is never corrupted (honest rate accounting).
    */
  def spanCorruption(docs: DataFrame, id: Column, text: Column,
                     window: Int = 20, spanLen: Int = 3): DataFrame = {
    require(window >= 2 && spanLen >= 1 && spanLen < window,
      s"need 1 <= spanLen < window, got spanLen=$spanLen window=$window")
    import graft.sim.Ivf.{PickA, PickB, PickP}
    val offRange = (window - spanLen + 1).toLong
    docs
      .select(id.as("doc_id"),
        size(TextAnalysis.tokens(text)).cast("long").as("__n"))
      .filter(col("__n") >= window)
      .select(col("doc_id"),
        explode(sequence(lit(0L), expr(s"__n div $window") - 1))
          .as("span_idx"))
      .select(col("doc_id"), col("span_idx"),
        // doc_id reduces mod P BEFORE the multiply (the t25 idiom) —
        // 64-bit hash ids would overflow doc_id·A and diverge from the
        // oracle's exact BIGINT arithmetic
        (col("span_idx") * window +
          pmod(pmod(pmod(col("doc_id"), lit(PickP)) * PickA +
            col("span_idx") * PickB, lit(PickP)), lit(offRange)))
          .as("start"),
        lit(spanLen.toLong).as("len"))
  }

  def curriculum(docs: DataFrame, id: Column, difficulty: Column,
                 nStages: Int = 4): DataFrame = {
    require(nStages >= 2 && 1000000 % nStages == 0,
      s"nStages must be >= 2 and divide 1e6, got $nStages")
    import graft.sim.Ivf.{PickA, PickB, PickP}
    val idName = docs.select(id).columns.head
    val d = docs.select(id, difficulty.cast("long").as("difficulty"))
    val bounds = graft.ops.Quantiles.exact(
      d.select(lit(0L).as("__g"), col("difficulty")),
      col("__g"), col("difficulty"),
      (1 until nStages).map(i => s"__b$i" -> i * 1000000L / nStages))
      .drop("__g", "n")
    val stage = (1 until nStages)
      .map(i => when(col("difficulty") > col(s"__b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val keyed = d.join(broadcast(bounds))
      .withColumn("stage", stage)
      .withColumn("__k", pmod(pmod(col(idName), lit(PickP)) * PickA + PickB +
        col("stage") * 2654435761L, lit(PickP)))
    val w = Window.partitionBy(col("stage")).orderBy(col("__k"), col(idName))
    keyed.select(col(idName), col("stage"), col("difficulty"),
      (row_number().over(w) - 1).cast("long").as("position"))
  }
}
