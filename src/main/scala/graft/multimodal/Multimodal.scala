package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition feature extraction.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape. The actual media DECODING is stubbed (this container ships no
  * image/audio codecs): `decodeStub` is a deterministic fake standing in for
  * a JNI/library call. Swap `decodeStub` for a real decoder and nothing else
  * changes.
  *
  * Scale notes: feature extraction is `mapPartitions` (the Scala analogue of
  * `mapInPandas`) so a real decoder amortizes its init cost per PARTITION,
  * not per row — the pattern that matters at 100 TB, where per-row library
  * init dominates naive implementations. Binary payloads stay off the
  * shuffle: all ops here are narrow.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, n_bytes: Int, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int, features: Array[Float])

  /** Pack a text table into the multimodal layout: payload as binary +
    * metadata struct. In production the payload is the raw image/audio blob
    * landed from object storage.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("application/octet-stream").as("mime"),
      length(col("text")).cast("int").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB for the real media decode — a deterministic fake: a real
    * implementation would decode the image/audio here (e.g. via a JNI
    * codec) and emit pixel/sample buffers. The fake emits the raw bytes so
    * downstream shape logic is exercised honestly.
    */
  private def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** Feature extraction: decode (stubbed) then reduce to a fixed-size
    * float vector — here a `dim`-bucket byte histogram, normalized. Runs as
    * one pass per partition; decoder state would be initialized once per
    * partition in a real implementation.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real decoder/codec init would happen once, here
      rows.map { r =>
        val decoded = decodeStub(r.payload)
        val hist = new Array[Float](dim)
        decoded.foreach(b => hist((b & 0xff) % dim) += 1f)
        val n = math.max(decoded.length, 1).toFloat
        MediaFeatures(r.doc_id, r.mime, decoded.length, hist.map(_ / n))
      }
    }
  }

  /** STUB: image resize — a real implementation decodes, resamples to
    * (w, h), re-encodes. The fake deterministically truncates/pads the
    * payload to w*h bytes so output schema and sizes are exercised.
    */
  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    val target = w * h
    media.mapPartitions(_.map { r =>
      val out = java.util.Arrays.copyOf(decodeStub(r.payload), target)
      r.copy(n_bytes = target, payload = out)
    })
  }

  /** STUB: video frame sampling — a real implementation demuxes and grabs
    * every `stride`-th frame. The fake slices the payload at a fixed
    * stride, one output record per "frame", preserving the 1→N exploding
    * shape a real frame sampler has.
    */
  def frameSampleStub(media: Dataset[MediaRecord], stride: Int, frameBytes: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val decoded = decodeStub(r.payload)
      val frames = decoded.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
      frames.map { case (bytes, i) => (r.doc_id, i, bytes) }.toSeq
    }.toDF("doc_id", "frame_idx", "frame_payload")
  }

  /** Typed view of [[packDocuments]] output. */
  def asMediaDataset(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.as[MediaRecord]
  }
}
