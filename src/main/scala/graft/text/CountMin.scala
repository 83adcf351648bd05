package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimation:
  * a Depth×Width grid of counters where each item increments one cell per
  * row (pairwise-independent hashes) and a point estimate reads the MIN of
  * its cells — overestimates only, by at most ε·N with probability 1−δ
  * (ε = e/Width, δ = e^−Depth).
  *
  * Why it matters at 100 TB: exact token counts need a shuffle keyed on the
  * full vocabulary (billions of group keys); the sketch's aggregation state
  * is a CONSTANT Depth·Width cells regardless of vocabulary or corpus
  * size — it map-side combines to almost nothing and merges by cell-wise
  * addition, so frequency telemetry can ride along any pass over the data.
  * The row hashes are affine transforms of the engine-neutral
  * [[TextAnalysis.tokenHash]], so a SQL oracle replays every cell exactly.
  */
object CountMin {
  val Depth = 4
  val Width = 256

  /** Mod for the affine row hashes: 2^31−1 (Mersenne prime), keeping
    * `a·h + b` within int64 for h < [[TextAnalysis.HashP]].
    */
  val P = 2147483647L

  /** (a, b) per row — small primes, fixed so oracles replay them. */
  val Params: Seq[(Long, Long)] = Seq(
    (1103L, 12289L), (1231L, 24593L), (1433L, 49157L), (1571L, 98317L))

  /** Cell index of token-hash `h` in sketch row `row`. */
  def cellOf(h: Column, row: Int): Column = {
    val (a, b) = Params(row)
    pmod(pmod(h * a + b, lit(P)), lit(Width.toLong))
  }

  private def probes(h: Column): Column =
    explode(array((0 until Depth).map(r =>
      struct(lit(r).as("row"), cellOf(h, r).as("cell"))): _*))

  /** The sketch: (row, cell) → count over one token occurrence stream.
    * At most Depth·Width output rows; the explode is map-side and the
    * single aggregation partial-combines to the grid size.
    */
  def sketch(toks: DataFrame, tok: Column): DataFrame =
    toks.select(probes(TextAnalysis.tokenHash(tok)).as("__rc"))
      .select(col("__rc.row").as("row"), col("__rc.cell").as("cell"))
      .groupBy("row", "cell").agg(count(lit(1)).as("n"))

  /** Heavy-hitter report: the exact top-`topK` tokens (count desc, token
    * tiebreak) with their Count-Min estimates alongside the truth — the
    * query that certifies the sketch's error envelope. The sketch and the
    * probe set join on the tiny grid (broadcast), never on the corpus.
    */
  def heavyHitters(df: DataFrame, text: Column, topK: Int): DataFrame = {
    val toks = df.select(explode(TextAnalysis.tokens(text)).as("token"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
    val top = exact.orderBy(col("n_exact").desc, col("token")).limit(topK)
    top
      .select(col("token"), col("n_exact"),
        probes(TextAnalysis.tokenHash(col("token"))).as("__rc"))
      .select(col("token"), col("n_exact"),
        col("__rc.row").as("row"), col("__rc.cell").as("cell"))
      .join(broadcast(sketch(toks, col("token"))), Seq("row", "cell"))
      .groupBy("token", "n_exact")
      .agg(min(col("n")).as("n_est"))
  }
}
