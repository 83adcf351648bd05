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

  /** Greedy in-order sequence packing: within each shard, documents are
    * assigned (by ascending `id`) to the bin their cumulative-token prefix
    * falls in — `bin = floor(tokens_before_this_doc / capacity)`. A document
    * larger than `capacity` gets a bin of its own and overflows it (the
    * standard tokenizer-side behavior: truncate there, not here).
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
}
